package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.streaming.{Sinks, StreamOps}

/** End-to-end streaming showcase: custom gate source → windowed gauge →
  * memory sink, plus the exactly-once foreachBatch parquet sink.
  * Run: sbt "runMain graft.StreamDemo"  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val gate = spark.readStream.format("graft.streaming.GateSource")
      .option("rowsPerBatch", 250).option("maxRows", 1000)
      .option("numPartitions", 4).load()
    val q = StreamOps.tumblingAgg(gate, "5 minutes").writeStream
      .outputMode("complete").format("memory").queryName("demo").start()
    q.processAllAvailable()
    q.stop()
    val buckets = spark.table("demo")
    println("STREAM_BUCKETS=" + buckets.count())
    buckets.orderBy(col("bucket"), col("event_type")).show(8, truncate = false)

    val out = java.nio.file.Files.createTempDirectory("demo_sink").toString
    val q2 = Sinks.foreachBatchParquet(
      spark.readStream.format("graft.streaming.GateSource")
        .option("rowsPerBatch", 300).option("maxRows", 900).load(), out).start()
    q2.processAllAvailable()
    q2.stop()
    println("SINK_ROWS=" + spark.read.parquet(s"$out/batch_*").count())

    // custom DSv2 sink: gate → epoch-committed TSV parts (exactly-once)
    val out2 = java.nio.file.Files.createTempDirectory("demo_gatesink").toString
    val cp = java.nio.file.Files.createTempDirectory("demo_gatesink_cp").toString
    val q3 = spark.readStream.format("graft.streaming.GateSource")
      .option("rowsPerBatch", 250).option("maxRows", 750).load()
      .writeStream.format("graft.streaming.GateSink")
      .option("path", out2).option("checkpointLocation", cp).start()
    q3.processAllAvailable()
    q3.stop()
    val epochs = new java.io.File(out2).listFiles()
      .count(_.getName.endsWith(".commit"))
    println("GATESINK_EPOCHS=" + epochs)
    spark.stop()
  }
}
