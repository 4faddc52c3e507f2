package graft

import org.apache.spark.sql.SparkSession

/** Throwaway r18 profiling main: times each construction stage of the
  * trained cell-sized index (llm_ivf2_ann's shape) so the per-segment
  * cost is attributable. Not part of any graded surface. */
object ProfIvf2 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Preflight(spark, sfDir)
    spark.conf.set("spark.graft.pin.timing", "true")
    sys.env.get("GRAFT_PROF_NOCODEGEN").foreach(_ => spark.conf.set("spark.sql.codegen.wholeStage", "false"))
    sys.env.get("GRAFT_PROF_PINMODE").foreach(m => spark.conf.set("spark.graft.pin.mode", m))
    sys.env.get("GRAFT_PROF_NOAQE").foreach(_ => spark.conf.set("spark.sql.adaptive.enabled", "false"))
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[prof] $tag: ${(System.nanoTime() - t0) / 1e6}%.0f ms")
      r
    }
    for (rep <- 1 to 3) {
      System.err.println(s"[prof] === rep $rep")
      val df = time("construct full key")(
        SparkEntry.queries("llm_ivf2_ann")(spark, sfDir))
      time("noop exec")(
        df.write.format("noop").mode("overwrite").save())
      graft.operators.Scale.releasePins(spark, blocking = true)
    }
    spark.stop()
  }
}
