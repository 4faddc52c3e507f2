package graft

import org.apache.spark.sql.functions._
import graft.streaming.EsHttp
import graft.streaming.EsHttp.BulkOp

/** Executable conformance runs for MIGRATION.md's external-system
  * checklists (r17 verdict #5): the E1–E7 Elasticsearch/Influx rows run
  * against an in-process LOOPBACK HTTP stub through the real
  * [[graft.streaming.EsHttp]] adapter (actual java.net.http round trips —
  * swap the URL and the same adapter body runs against a cluster), and
  * the two K-rows whose probes had no local pin yet (K5 data-loss
  * loudness, K10 partition growth) run against the file-backed
  * gatetopic broker. Each test names its checklist row; MIGRATION.md's
  * tables point back here.
  */
class ExternalConformanceSpec extends SparkSpec {

  import spark.implicits._

  private lazy val es = new StubEsServer().start()

  override def afterAll(): Unit = {
    es.stop()
    super.afterAll()
  }

  private def get(index: String, id: String): Option[(Long, String)] =
    es.docs(index).get(id).filter(_.live).map(d => (d.version, d.source))

  test("E1: stale external version never beats newer state (409, doc unchanged)") {
    val idx = "e1"
    val r1 = EsHttp.applyBulk(es.url, idx,
      Seq(BulkOp("index", "k", 5L, """{"v":"newer"}""")))
    assert(r1.applied == 1 && r1.conflicts == 0)
    // replay an OLDER version of the same key — the cluster must answer
    // version_conflict and keep the doc; the adapter must count-and-drop,
    // never retry the same stale version
    val r2 = EsHttp.applyBulk(es.url, idx,
      Seq(BulkOp("index", "k", 3L, """{"v":"stale"}""")))
    assert(r2.applied == 0 && r2.conflicts == 1, s"stale write not rejected: $r2")
    assert(get(idx, "k").contains((5L, """{"v":"newer"}""")), "doc changed")
  }

  test("E2: versioned delete tombstone blocks a stale pre-delete upsert") {
    val idx = "e2"
    EsHttp.applyBulk(es.url, idx, Seq(BulkOp("index", "k", 5L, """{"v":"a"}""")))
    val d = EsHttp.applyBulk(es.url, idx, Seq(BulkOp("delete", "k", 7L, "")))
    assert(d.applied == 1)
    // replay an upsert OLDER than the delete: the key must stay gone
    val r = EsHttp.applyBulk(es.url, idx,
      Seq(BulkOp("index", "k", 6L, """{"v":"zombie"}""")))
    assert(r.conflicts == 1 && get(idx, "k").isEmpty,
      "stale pre-delete upsert resurrected the key")
  }

  test("E3: gc_deletes under the replay horizon RESURRECTS; over it, 409") {
    val idx = "e3"
    // (a) the violation the checklist demonstrates: a 1-minute gc_deletes
    // with a 2-minute replay window loses the tombstone's version
    es.gcDeletesMs = 60000L
    EsHttp.applyBulk(es.url, idx, Seq(BulkOp("index", "r", 5L, """{"v":"a"}""")))
    EsHttp.applyBulk(es.url, idx, Seq(BulkOp("delete", "r", 7L, "")))
    es.clockMs.addAndGet(120000L): Unit // 2 minutes pass, tombstone GC'd
    val res = EsHttp.applyBulk(es.url, idx,
      Seq(BulkOp("index", "r", 6L, """{"v":"zombie"}""")))
    assert(res.applied == 1 && get(idx, "r").isDefined,
      "expected the DEMONSTRATED resurrection under a too-short gc_deletes")
    // (b) the production setting: horizon covers the replay window
    es.gcDeletesMs = Long.MaxValue
    EsHttp.applyBulk(es.url, idx, Seq(BulkOp("index", "s", 5L, """{"v":"a"}""")))
    EsHttp.applyBulk(es.url, idx, Seq(BulkOp("delete", "s", 7L, "")))
    es.clockMs.addAndGet(120000L): Unit
    val ok = EsHttp.applyBulk(es.url, idx,
      Seq(BulkOp("index", "s", 6L, """{"v":"zombie"}""")))
    assert(ok.conflicts == 1 && get(idx, "s").isEmpty,
      "tombstone within the horizon failed to block the stale upsert")
  }

  test("E4: a fresh checkpoint over a populated index aborts on batch 0") {
    val idx = "e4"
    val b = Seq((1L, 10L, "x")).toDF("user_id", "ver", "payload")
    // a previous checkpoint committed epochs up to 6
    EsHttp.upsertBatch(es.url, idx, b, batchId = 5L, "user_id", "ver")
    assert(EsHttp.committedEpoch(es.url, idx).contains(6L))
    // a NEW checkpoint restarts batch ids at 0 — batch 0 over committed
    // epoch 6 must abort loudly, never quietly no-op epoch by epoch
    val e = intercept[IllegalArgumentException] {
      EsHttp.upsertBatch(es.url, idx, b, batchId = 0L, "user_id", "ver")
    }
    assert(e.getMessage.contains("fresh checkpoint"), e.getMessage)
  }

  test("E5: a replayed epoch is idempotent — max one live doc per key") {
    val idx = "e5"
    val batch = Seq((1L, 100L, "a"), (2L, 100L, "b"), (3L, 100L, "c"))
      .toDF("user_id", "ver", "payload")
    val r1 = EsHttp.upsertBatch(es.url, idx, batch, 1L, "user_id", "ver")
    assert(r1.applied == 3)
    val before = es.docs(idx)
    // kill/restart replays the SAME batchId with identical contents: the
    // external versions re-arrive unchanged, so every item 409s and the
    // state is byte-identical — at-least-once upstream, exactly-once state
    val r2 = EsHttp.upsertBatch(es.url, idx, batch, 1L, "user_id", "ver")
    assert(r2.applied == 0 && r2.conflicts == 3, s"replay double-applied: $r2")
    assert(es.docs(idx) == before, "replay changed stored state")
    assert(es.liveCount(idx) == 4, // 3 keys + the epoch marker
      "duplicate docs after replay (auto-id would do this)")
  }

  test("E6: a failed (retryable) bulk throws so the batch replays — no gap") {
    val idx = "e6"
    val batch = Seq((1L, 100L, "a"), (2L, 100L, "b"))
      .toDF("user_id", "ver", "payload")
    es.close(idx) // induce the rejection (index closed → 503)
    intercept[java.io.IOException] {
      EsHttp.upsertBatch(es.url, idx, batch, 0L, "user_id", "ver")
    }
    assert(es.liveCount(idx) == 0, "a failed bulk partially applied")
    es.open(idx)
    // Structured Streaming retries the same batchId after the throw
    val r = EsHttp.upsertBatch(es.url, idx, batch, 0L, "user_id", "ver")
    assert(r.applied == 2 && es.liveCount(idx) == 3, // 2 keys + marker
      "retried batch did not land exactly once")
  }

  test("E7: sink-side schema fixed at the edge — mapping round-trips byte-for-byte") {
    val idx = "e7"
    val committedMapping =
      """{"properties":{"user_id":{"type":"long"},"ver":{"type":"long"},"payload":{"type":"keyword"}}}"""
    val (put, _) = {
      val req = java.net.http.HttpRequest.newBuilder(
        java.net.URI.create(s"${es.url}/$idx/_mapping"))
        .PUT(java.net.http.HttpRequest.BodyPublishers.ofString(committedMapping))
        .build()
      val resp = java.net.http.HttpClient.newHttpClient()
        .send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
      (resp.statusCode(), resp.body())
    }
    assert(put == 200)
    val got = {
      val req = java.net.http.HttpRequest.newBuilder(
        java.net.URI.create(s"${es.url}/$idx/_mapping")).GET().build()
      java.net.http.HttpClient.newHttpClient()
        .send(req, java.net.http.HttpResponse.BodyHandlers.ofString()).body()
    }
    assert(got == committedMapping, "mapping drifted across the wire")
  }

  test("E5/K7 end-to-end: streaming foreachBatch upserts through the wire, kill-shaped replay safe") {
    // the adapter as an actual foreachBatch body over a MemoryStream —
    // the full wire path under Structured Streaming's batch-id contract
    implicit val sqlCtx = spark.sqlContext
    val idx = "e5s"
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, String)]
    val url = es.url
    val q = mem.toDF().toDF("user_id", "ver", "payload")
      .writeStream.foreachBatch {
        (b: org.apache.spark.sql.DataFrame, id: Long) =>
          EsHttp.upsertBatch(url, idx, b, id, "user_id", "ver"): Unit
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("es_ckpt").toString)
      .start()
    try {
      mem.addData(Seq((1L, 1L, "a"), (2L, 1L, "b")))
      q.processAllAvailable()
      mem.addData(Seq((1L, 2L, "a2"), (3L, 1L, "c")))
      q.processAllAvailable()
    } finally q.stop()
    assert(get(idx, "1").contains((2L, """{"ver":2,"payload":"a2"}""")))
    assert(get(idx, "2").exists(_._1 == 1L))
    assert(get(idx, "3").exists(_._1 == 1L))
    assert(EsHttp.committedEpoch(es.url, idx).contains(2L))
  }

  // ---- gatetopic K-rows whose probes had no pin yet ----------------------

  private def topicStream(dir: String, rowsPerBatch: Int) =
    spark.readStream.format("gatetopic")
      .option("path", dir).option("rowsPerBatch", rowsPerBatch).load()

  private def mkSegment(dir: String, p: Int, base: Long, n: Int): Unit = {
    val pd = new java.io.File(dir, s"p=$p")
    pd.mkdirs()
    val w = new java.io.PrintWriter(
      new java.io.File(pd, f"$base%020d.log"), "UTF-8")
    try (0 until n).foreach { i =>
      val off = base + i
      w.println(s"${p * 10000L + off}\t${1704067200000000L + off * 60000000L}\t${off % 7}\tclick\t${off / 2.0}")
    } finally w.close()
  }

  test("K5: broker data loss is LOUD — an expired segment fails the restart") {
    val dir = java.nio.file.Files.createTempDirectory("k5_topic").toString
    val out = java.nio.file.Files.createTempDirectory("k5_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("k5_ckpt").toString
    mkSegment(dir, 0, 0L, 8)
    mkSegment(dir, 0, 8L, 8)
    // commit a position INSIDE segment 0 (rowsPerBatch 4 → batch 0 ends
    // at offset 4), then stop
    val q1 = graft.streaming.Sinks.foreachBatchParquet(topicStream(dir, 4), out)
      .option("checkpointLocation", ckpt).start()
    val deadline = System.nanoTime() + 60L * 1000000000L
    while (!new java.io.File(out, "batch_0").exists() &&
        System.nanoTime() < deadline) Thread.sleep(50)
    q1.stop()
    // retention expires segment 0 while the consumer is down
    val seg0 = new java.io.File(dir, f"p=0/${0L}%020d.log")
    assert(seg0.delete(), "fixture: could not expire segment 0")
    // restart: the checkpointed position points into the expired segment —
    // the query must FAIL naming the gap, never resume quietly at 8
    val q2 = graft.streaming.Sinks.foreachBatchParquet(topicStream(dir, 4), out)
      .option("checkpointLocation", ckpt).start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q2.processAllAvailable()
    }
    assert(e.getMessage.contains("not in the log") ||
      Option(e.getCause).exists(_.getMessage.contains("not in the log")),
      s"data loss did not fail loudly: ${e.getMessage}")
    q2.stop()
  }

  test("K10: partition growth extends the offset map — rows flow, no reset") {
    val dir = java.nio.file.Files.createTempDirectory("k10_topic").toString
    val out = java.nio.file.Files.createTempDirectory("k10_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("k10_ckpt").toString
    mkSegment(dir, 0, 0L, 6)
    mkSegment(dir, 1, 0L, 6)
    val q1 = graft.streaming.Sinks.foreachBatchParquet(topicStream(dir, 8), out)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    assert(q1.awaitTermination(120000))
    // a partition is ADDED while the consumer is down (Kafka: discovered
    // at the next micro-batch, starting at earliest) + p0 grows too
    mkSegment(dir, 2, 0L, 5)
    mkSegment(dir, 0, 6L, 2)
    val q2 = graft.streaming.Sinks.foreachBatchParquet(topicStream(dir, 8), out)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    assert(q2.awaitTermination(120000))
    val got = spark.read.parquet(s"$out/batch_*")
      .select($"partition", $"off").collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    assert(got.length == got.distinct.length, "partition add caused replay")
    val expect = (0L until 8L).map((0, _)) ++ (0L until 6L).map((1, _)) ++
      (0L until 5L).map((2, _))
    assert(got.toSet == expect.toSet,
      s"partition add lost rows: got ${got.length}, want ${expect.size}")
  }
}
