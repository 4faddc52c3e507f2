package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Long-run streaming soak (r14 verdict #4): the provider matrix proves
  * HDFS/RocksDB equivalence over a FEW batches; a 100 TB stream runs for
  * days, where the failure mode is state that never expires (monotone
  * store growth) or per-batch latency that trends up with batch count.
  * One stateful shape — watermarked dedup, the stream_dedup surface — is
  * driven through 300 micro-batches under RocksDB WITH changelog
  * checkpointing, and the engine must hold two curves:
  *
  *  - state size PLATEAUS at the watermark window's population
  *    (watermark-driven expiry actually evicts — the store ends orders of
  *    magnitude below total keys seen);
  *  - per-batch latency is FLAT (late-run batches no slower than
  *    mid-run ones beyond noise).
  *
  * The measured curve is recorded in PERF.md per round. */
class StreamSoakSpec extends SparkSpec {

  import spark.implicits._

  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  test("RocksDB+changelog, 300 batches: state plateaus, latency stays flat") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", RocksDb)
    spark.conf.set(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
      "true")
    try {
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[(java.sql.Timestamp, Long)]
      val base = java.sql.Timestamp.valueOf("2026-01-01 00:00:00").getTime
      val q = mem.toDF().toDF("ts", "k")
        .withWatermark("ts", "60 seconds")
        // event-time column in the dedup key = expirable state: rows
        // older than the watermark are evicted, so the store tracks the
        // window population, not the corpus
        .dropDuplicates("k", "ts")
        .writeStream.outputMode("append")
        .format("memory").queryName("soak_dedup")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("soak_cp").toString)
        .start()
      val nBatches = 300
      val rowsPerBatch = 10
      val curve = Seq.newBuilder[(Long, Long, Long)] // (batchId, stateRows, ms)
      var lastSeen = -1L
      for (b <- 0 until nBatches) {
        // 10 unique keys per batch, event time advancing 10 s per batch,
        // plus one in-batch duplicate to keep the dedup path honest
        val rows = (0 until rowsPerBatch).map { i =>
          (new java.sql.Timestamp(base + (b * 10L) * 1000L),
            (b.toLong * rowsPerBatch + i))
        }
        mem.addData(rows :+ rows.head)
        q.processAllAvailable()
        val p = q.lastProgress
        if (p != null && p.batchId != lastSeen &&
            p.stateOperators.nonEmpty) {
          lastSeen = p.batchId
          curve += ((p.batchId, p.stateOperators.head.numRowsTotal,
            p.batchDuration))
        }
      }
      q.processAllAvailable()
      q.stop()
      val pts = curve.result()
      assert(pts.size > nBatches / 2, s"too few progress points: ${pts.size}")

      // correctness floor: every distinct (k, ts) row came through once
      val out = spark.table("soak_dedup").count()
      assert(out == nBatches.toLong * rowsPerBatch,
        s"dedup emitted $out rows, want ${nBatches * rowsPerBatch}")

      // (1) expiry works at all: final state ≪ total keys seen. The
      // watermark holds ~60 s = ~6 batches of rows (+ commit lag).
      val finalState = pts.last._2
      assert(finalState < 300,
        s"state never expired: $finalState rows in store after " +
          s"${nBatches * rowsPerBatch} keys")
      // (2) plateau: the late-run peak must not exceed the mid-run peak
      // beyond noise — monotone growth would trip this immediately.
      val third = pts.size / 3
      val midPeak = pts.slice(third, 2 * third).map(_._2).max
      val latePeak = pts.drop(2 * third).map(_._2).max
      assert(latePeak <= midPeak * 3 / 2,
        s"state grows with batch count: mid peak $midPeak, late peak $latePeak")
      // (3) flat latency: compare medians, generous 3x for CI noise —
      // a leak-shaped trend (per-batch cost ∝ total state) would blow
      // far past this on 300 batches.
      def median(xs: Seq[Long]): Long = xs.sorted.apply(xs.size / 2)
      val midMs = median(pts.slice(third, 2 * third).map(_._3))
      val lateMs = median(pts.drop(2 * third).map(_._3))
      assert(lateMs <= math.max(midMs * 3, 1500),
        s"per-batch latency trends up: mid median ${midMs}ms, " +
          s"late median ${lateMs}ms")
      info(s"soak curve: ${pts.size} pts, state mid-peak $midPeak / " +
        s"late-peak $latePeak / final $finalState rows; " +
        s"latency mid ${midMs}ms / late ${lateMs}ms")
      spark.sql("DROP VIEW IF EXISTS soak_dedup"): Unit
    } finally {
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      spark.conf.unset(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled")
    }
  }
}
