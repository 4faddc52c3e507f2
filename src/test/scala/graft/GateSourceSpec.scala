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

  // ---- Kafka-shaped topic source (GateTopicSource) ----------------------

  /** Hand-built topic: partition p gets `counts(p)` records split into
    * segment files of `segRows` (base-offset-named, the layout contract) —
    * built WITHOUT the producer so these tests pin the on-disk format
    * itself. Returns the expected (partition, off, event_id) set. */
  private def mkTopic(dir: String, counts: Map[Int, Int],
      segRows: Int): Set[(Int, Long, Long)] = {
    val expect = Set.newBuilder[(Int, Long, Long)]
    counts.foreach { case (p, n) =>
      val pd = new java.io.File(dir, s"p=$p")
      pd.mkdirs()
      (0 until n).grouped(segRows).foreach { seg =>
        val base = seg.head.toLong
        val w = new java.io.PrintWriter(
          new java.io.File(pd, f"$base%020d.log"), "UTF-8")
        try seg.foreach { i =>
          val id = p * 1000L + i
          w.println(s"$id\t${1704067200000000L + i * 60000000L}\t${i % 7}\tclick\t${i / 2.0}")
          expect += ((p, i.toLong, id))
        } finally w.close()
      }
    }
    expect.result()
  }

  private def topicStream(dir: String, rowsPerBatch: Int) =
    spark.readStream.format("graft.streaming.GateTopicSource")
      .option("path", dir).option("rowsPerBatch", rowsPerBatch).load()

  test("topic source: every record exactly once, (partition, offset) identity") {
    val dir = Files.createTempDirectory("graft_topic1").toString
    val expect = mkTopic(dir, Map(0 -> 18, 1 -> 6), segRows = 7)
    val q = topicStream(dir, rowsPerBatch = 5).writeStream
      .outputMode("append").format("memory").queryName("t_topic1").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("t_topic1")
      .select($"partition", $"off", $"event_id").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(got.length == got.distinct.length, "duplicate (partition, off)")
    assert(got.toSet == expect, "lost or invented records")
  }

  test("topic source resolves under the registered short name (config seam)") {
    // r13 verdict #6: the Kafka swap must be CONFIG-driven — a deployment
    // changes format("gatetopic") to format("kafka") + connection options
    // (MIGRATION.md §sources maps them) without touching code. This pins
    // the META-INF/services registration that makes the short name work.
    val dir = Files.createTempDirectory("graft_topic_sn").toString
    val expect = mkTopic(dir, Map(0 -> 9, 1 -> 5), segRows = 4)
    val q = spark.readStream.format("gatetopic")
      .option("path", dir).option("rowsPerBatch", 6).load()
      .writeStream.outputMode("append").format("memory")
      .queryName("t_topic_sn").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("t_topic_sn")
      .select($"partition", $"off", $"event_id").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(got.toSet == expect && got.length == expect.size)
  }

  test("topic source: crash-resume lands mid-partition mid-segment, exactly once") {
    val dir = Files.createTempDirectory("graft_topic2").toString
    val out = Files.createTempDirectory("graft_topic2_out").toString
    val ckpt = Files.createTempDirectory("graft_topic2_ckpt").toString
    val expect = mkTopic(dir, Map(0 -> 12, 1 -> 12), segRows = 7)
    // rowsPerBatch=4 => batch 0 commits {0->2, 1->2} — INSIDE segment 0
    // of both partitions. Stop after the first committed batch, so the
    // restart must seek into a half-read segment file.
    val q1 = Sinks.foreachBatchParquet(topicStream(dir, 4), out)
      .option("checkpointLocation", ckpt).start()
    val deadline = System.nanoTime() + 60L * 1000000000L
    while (!new java.io.File(out, "batch_0").exists() &&
        System.nanoTime() < deadline) Thread.sleep(50)
    q1.stop()
    assert(new java.io.File(out, "batch_0").exists(), "no batch committed in 60s")
    // the log grows while the consumer is down (new sealed segment)
    val pd = new java.io.File(dir, "p=1")
    val w = new java.io.PrintWriter(new java.io.File(pd, f"${12L}%020d.log"), "UTF-8")
    try (12 until 15).foreach { i =>
      w.println(s"${1000L + i}\t${1704067200000000L + i * 60000000L}\t${i % 7}\tclick\t${i / 2.0}")
    } finally w.close()
    val expect2 = expect ++ (12 until 15).map(i => (1, i.toLong, 1000L + i))
    val q2 = Sinks.foreachBatchParquet(topicStream(dir, 4), out)
      .option("checkpointLocation", ckpt).start()
    q2.processAllAvailable()
    q2.stop()
    val got = spark.read.parquet(s"$out/batch_*")
      .select($"partition", $"off", $"event_id").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(got.length == got.distinct.length,
      "replayed records across the restart")
    assert(got.toSet == expect2, "lost records across the restart")
  }

  test("topic source: Trigger.AvailableNow backfills in bounded batches, then terminates") {
    val dir = Files.createTempDirectory("graft_topic3").toString
    val out = Files.createTempDirectory("graft_topic3_out").toString
    val expect = mkTopic(dir, Map(0 -> 13, 1 -> 11), segRows = 5)
    val q = Sinks.foreachBatchParquet(topicStream(dir, 6), out)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "AvailableNow did not terminate")
    val batches = Option(new java.io.File(out).listFiles()).get
      .count(_.getName.startsWith("batch_"))
    assert(batches > 1, "backfill was not admission-bounded")
    val got = spark.read.parquet(s"$out/batch_*")
      .select($"partition", $"off", $"event_id").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(got.length == got.distinct.length && got.toSet == expect)
  }

  test("topic batch twin == streaming content (GateTopic.readBatch)") {
    val dir = Files.createTempDirectory("graft_topic4").toString
    val expect = mkTopic(dir, Map(0 -> 9, 1 -> 9, 2 -> 9), segRows = 4)
    val got = graft.streaming.GateTopic.readBatch(spark, dir)
      .select($"partition", $"off", $"event_id").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(got.toSet == expect && got.length == expect.size)
  }

  test("topic stream through the event-time agg == stream_topic_agg batch twin") {
    val dir = Files.createTempDirectory("graft_topic5").toString
    graft.streaming.GateTopic.write(
      T(spark, sf001, "events"), dir, 4, segmentRows = 256)
    val q = topicStream(dir, rowsPerBatch = 700)
      .groupBy($"partition", date_trunc("DAY", $"ts").as("day"))
      .agg(count(lit(1)).as("n"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("t_topic_agg").start()
    q.processAllAvailable()
    q.stop()
    def norm(r: org.apache.spark.sql.Row) =
      (r.getInt(0), r.getTimestamp(1).getTime, r.getLong(2))
    val got = spark.table("t_topic_agg").collect().map(norm).sortBy(t => (t._1, t._2))
    val want = SparkEntry.queries("stream_topic_agg")(spark, sf001)
      .collect().map(norm).sortBy(t => (t._1, t._2))
    assert(got.nonEmpty && got.toSeq == want.toSeq)
  }

  test("ONE flow config runs over the topic as streaming backfill AND as batch") {
    import graft.flow.Flow
    val dir = Files.createTempDirectory("graft_topic6").toString
    graft.streaming.GateTopic.write(
      T(spark, sf001, "events"), dir, 4, segmentRows = 256)
    // the lambda-free deployment shape over the production-shaped ingress:
    // same spec, bound to the live stream and to the batch read-back
    val spec =
      """{"steps":[
        |{"op":"watermark","col":"ts","delay":"10 minutes"},
        |{"op":"filter","where":"value > 0"},
        |{"op":"agg","groupBy":["partition","window(ts, '1 day')"],
        | "aggs":["count(*) AS n"]},
        |{"op":"select","columns":["partition","window.start AS day","n"]}
        |]}""".stripMargin
    val q = Flow.compileOn(spark, sf001, topicStream(dir, 700), spec)
      .writeStream.outputMode("complete")
      .format("memory").queryName("t_topic_flow").start()
    q.processAllAvailable()
    q.stop()
    def norm(r: org.apache.spark.sql.Row) =
      (r.getInt(0), r.getTimestamp(1).getTime, r.getLong(2))
    val got = spark.table("t_topic_flow").collect().map(norm).sortBy(t => (t._1, t._2))
    val want = Flow.compileOn(spark, sf001,
        graft.streaming.GateTopic.readBatch(spark, dir), spec)
      .collect().map(norm).sortBy(t => (t._1, t._2))
    assert(got.nonEmpty && got.toSeq == want.toSeq,
      "flow-over-topic stream != flow-over-topic batch")
  }

  test("corrupt topic record fails with (partition, offset) provenance") {
    val dir = Files.createTempDirectory("graft_topic7").toString
    mkTopic(dir, Map(0 -> 4), segRows = 4)
    val w = new java.io.PrintWriter(
      new java.io.File(new java.io.File(dir, "p=0"), f"${4L}%020d.log"), "UTF-8")
    try w.println("this is not\ta valid record") finally w.close()
    val q = topicStream(dir, rowsPerBatch = 100).writeStream
      .outputMode("append").format("memory").queryName("t_topic_bad").start()
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.processAllAvailable()
    }
    q.stop()
    val msg = Option(ex.getCause).map(_.toString).getOrElse("") + ex.getMessage
    assert(msg.contains("p=0 offset 4") || msg.contains("corrupt record"),
      s"no provenance in failure: $msg")
  }
}
