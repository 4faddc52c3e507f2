package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.streaming.{Sinks, StreamOps}

/** Custom DSv2 micro-batch source + sinks (SURVEY §2.A/§2.J): the gate
  * streams deterministic events in bounded micro-batches, so replays are
  * byte-identical — the property every assertion here leans on. */
class GateSourceSpec extends SparkSpec {

  import spark.implicits._

  private def gate(maxRows: Long, rowsPerBatch: Long = 100) =
    spark.readStream.format("graft.streaming.GateSource")
      .option("rowsPerBatch", rowsPerBatch)
      .option("maxRows", maxRows)
      .option("numPartitions", 4)
      .load()

  test("gate source streams exactly maxRows deterministic rows") {
    val q = gate(500).writeStream.outputMode("append")
      .format("memory").queryName("g_raw").start()
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("g_raw")
    assert(rows.count() == 500)
    assert(rows.agg(countDistinct($"event_id")).head().getLong(0) == 500)
    // replay: a second run of the same source yields identical content
    val q2 = gate(500).writeStream.outputMode("append")
      .format("memory").queryName("g_raw2").start()
    q2.processAllAvailable()
    q2.stop()
    val a = spark.table("g_raw").orderBy($"event_id").collect().toSeq
    val b = spark.table("g_raw2").orderBy($"event_id").collect().toSeq
    assert(a == b)
  }

  test("gate -> tumbling agg pipeline (streaming end-to-end)") {
    val q = StreamOps.tumblingAgg(gate(600), "5 minutes").writeStream
      .outputMode("complete").format("memory").queryName("g_agg").start()
    q.processAllAvailable()
    q.stop()
    val agg = spark.table("g_agg")
    // 600 events, one per minute -> 10 hours of buckets; counts sum back up
    assert(agg.agg(sum($"n")).head().getLong(0) == 600)
  }

  test("foreachBatch parquet sink is exactly-once per batch id") {
    val out = Files.createTempDirectory("graft_fbsink").toString
    val q = Sinks.foreachBatchParquet(gate(300), out).start()
    q.processAllAvailable()
    q.stop()
    val written = spark.read.parquet(s"$out/batch_*")
    assert(written.count() == 300)
    assert(written.select($"event_id").distinct().count() == 300)
  }

  test("checkpoint restart resumes the gate without replay or loss") {
    val out = Files.createTempDirectory("graft_ckpt_out").toString
    val ckpt = Files.createTempDirectory("graft_ckpt").toString
    val q1 = Sinks.foreachBatchParquet(gate(300), out)
      .option("checkpointLocation", ckpt).start()
    q1.processAllAvailable()
    q1.stop()
    // second run: same checkpoint, higher cap — must continue at row 300
    val q2 = Sinks.foreachBatchParquet(gate(600), out)
      .option("checkpointLocation", ckpt).start()
    q2.processAllAvailable()
    q2.stop()
    val rows = spark.read.parquet(s"$out/batch_*")
    assert(rows.count() == 600, "lost or duplicated rows across restart")
    assert(rows.select($"event_id").distinct().count() == 600)
  }

  test("foreach row sink delivers every row") {
    val key = s"t_${System.nanoTime()}"
    val q = gate(120).writeStream
      .foreach(new Sinks.BufferingWriter(key)).start()
    q.processAllAvailable()
    q.stop()
    val rows = Sinks.drain(key)
    assert(rows.size == 120)
  }
}
