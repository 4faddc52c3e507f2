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

  test("stateful-alert, 300 batches + mid-soak kill/restart on changelog") {
    // r15 verdict #4: the dedup soak proves the WATERMARK-driven store
    // plateaus; the alert machine's state dies by TIMEOUT
    // (flatMapGroupsWithState event-time timeout = the 24 h gap rule), a
    // different eviction path a days-long run also depends on. Same
    // 300-batch protocol under RocksDB + changelog, PLUS a mid-soak
    // kill/restart: the second half must resume from the changelog —
    // state carried (a run split across the kill still alerts with the
    // full count) and nothing reprocessed (the post-restart output holds
    // only post-restart batches).
    import graft.streaming.StreamOps
    import graft.streaming.StreamOps.{Alert, Event}
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", RocksDb)
    spark.conf.set(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
      "true")
    try {
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[Event]
      val cp = java.nio.file.Files.createTempDirectory("soak_alert_cp").toString
      // memory sink cannot recover a checkpoint — the restart goes through
      // the durable foreachBatch parquet sink (the production shape); each
      // query half writes its own out dir, so pre-kill and post-restart
      // output stay separable for the no-reprocessing check.
      def start(out: String) = graft.streaming.Sinks.foreachBatchParquet(
        StreamOps.statefulAlert(mem.toDS()).toDF(), out)
        .outputMode("append")
        .option("checkpointLocation", cp).start()
      val out1 = java.nio.file.Files.createTempDirectory("soak_alert_o1").toString
      val out2 = java.nio.file.Files.createTempDirectory("soak_alert_o2").toString
      def readBatches(out: String): org.apache.spark.sql.DataFrame = {
        val dirs = Option(new java.io.File(out).listFiles()).getOrElse(Array.empty)
          .filter(_.getName.startsWith("batch_"))
          .filter(d => Option(d.listFiles()).exists(_.exists(
            _.getName.endsWith(".parquet"))))
          .map(_.getPath)
        spark.read.parquet(dirs.toIndexedSeq: _*)
      }
      val base = java.sql.Timestamp.valueOf("2026-01-01 00:00:00").getTime
      val HourMs = 3600L * 1000L
      val usersPerBatch = 4
      val Sentinel = 9999999L
      // batch b: event time advances ONE HOUR per batch (so the 24 h
      // event-time timeout actually fires ~25 batches after a user's
      // last event — rotation makes the store a moving window, not a
      // corpus), 4 FRESH users, 3 consecutive errors each → exactly one
      // alert per user per batch.
      def batch(b: Int): Seq[Event] = {
        val ts = new java.sql.Timestamp(base + b * HourMs)
        for {
          u <- 0 until usersPerBatch
          j <- 0 until 3
        } yield Event(b.toLong * 100 + u * 10 + j, ts,
          b.toLong * usersPerBatch + u, "error", 0.0)
      }
      val curve = Seq.newBuilder[(Long, Long, Long)]
      var lastSeen = -1L
      def drive(q: org.apache.spark.sql.streaming.StreamingQuery,
          rows: Seq[Event]): Unit = {
        mem.addData(rows)
        q.processAllAvailable()
        val p = q.lastProgress
        if (p != null && p.batchId != lastSeen && p.stateOperators.nonEmpty) {
          lastSeen = p.batchId
          curve += ((p.batchId, p.stateOperators.head.numRowsTotal,
            p.batchDuration))
        }
      }
      // ---- first half: batches 0..149; batch 149 plants the sentinel
      // user with TWO errors — its run must survive the kill.
      val q1 = start(out1)
      for (b <- 0 until 150) {
        val planted = if (b == 149) Seq(
          Event(90001L, new java.sql.Timestamp(base + 149 * HourMs),
            Sentinel, "error", 0.0),
          Event(90002L, new java.sql.Timestamp(base + 149 * HourMs),
            Sentinel, "error", 0.0)) else Seq.empty
        drive(q1, batch(b) ++ planted)
      }
      q1.stop()
      // ---- kill/restart: a NEW query over the same checkpoint; its
      // first batch carries the sentinel's THIRD error, one hour later
      // (inside the 24 h gap window).
      val q2 = start(out2)
      for (b <- 150 until 300) {
        val planted = if (b == 150) Seq(
          Event(90003L, new java.sql.Timestamp(base + 150 * HourMs),
            Sentinel, "error", 0.0)) else Seq.empty
        drive(q2, batch(b) ++ planted)
      }
      q2.processAllAvailable()
      q2.stop()

      // changelog mode actually engaged (not a silent snapshot fallback)
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
        else Seq(f)
      assert(walk(new java.io.File(cp)).exists(_.getName.endsWith(".changelog")),
        "no .changelog files under the checkpoint — changelog never engaged")

      // correctness floor, split across the kill: first half = 150
      // batches × 4 alerts (the sentinel's 2-error run emits nothing);
      // second half = 150 × 4 + the sentinel alert.
      val firstHalf = readBatches(out1)
      val secondHalf = readBatches(out2)
      assert(firstHalf.count() == 150L * usersPerBatch,
        s"pre-kill alerts: ${firstHalf.count()}")
      assert(secondHalf.count() == 150L * usersPerBatch + 1,
        s"post-restart alerts: ${secondHalf.count()}")
      // state CARRIED across the restart: the sentinel alert exists and
      // its run_length is 3 — a fresh-state restart would count 1 and
      // emit nothing; a reprocessing restart would duplicate pre-kill
      // alerts into the second out dir (caught by the exact count above).
      val sent = secondHalf.filter(s"user_id = $Sentinel").collect()
      assert(sent.length == 1, s"sentinel alerts: ${sent.length}")
      assert(sent.head.getAs[Int]("run_length") == 3,
        "sentinel run did not carry across the changelog restart")
      val minPostId = secondHalf.filter(s"user_id <> $Sentinel")
        .agg(org.apache.spark.sql.functions.min("event_id")).head().getLong(0)
      assert(minPostId >= 150L * 100,
        s"pre-kill batch reprocessed after restart: event_id $minPostId")

      // the two soak curves, on the post-restart half (the long tail a
      // days-long run lives in): timeout-driven state plateau + flat
      // latency. ~25 h of users in flight ⇒ ~100 ErrorRun rows, far
      // below the 1 200 keys seen per half.
      val pts = curve.result().filter(_._1 >= 150)
      assert(pts.size > 100, s"too few post-restart progress points: ${pts.size}")
      val finalState = pts.last._2
      assert(finalState < 300,
        s"alert state never timed out: $finalState rows in store")
      val third = pts.size / 3
      val midPeak = pts.slice(third, 2 * third).map(_._2).max
      val latePeak = pts.drop(2 * third).map(_._2).max
      assert(latePeak <= midPeak * 3 / 2,
        s"alert state grows with batch count: mid $midPeak, late $latePeak")
      def median(xs: Seq[Long]): Long = xs.sorted.apply(xs.size / 2)
      val midMs = median(pts.slice(third, 2 * third).map(_._3))
      val lateMs = median(pts.drop(2 * third).map(_._3))
      assert(lateMs <= math.max(midMs * 3, 1500),
        s"per-batch latency trends up: mid ${midMs}ms, late ${lateMs}ms")
      info(s"alert soak: ${pts.size} post-restart pts, state mid-peak " +
        s"$midPeak / late-peak $latePeak / final $finalState rows; " +
        s"latency mid ${midMs}ms / late ${lateMs}ms")
    } finally {
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      spark.conf.unset(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled")
    }
  }

  test("resident-index stream, 100 batches: pin count constant, latency flat") {
    // r17 — the claim behind stream_semantic_dedup's 100 TB story,
    // MEASURED instead of asserted: the cell-sized base index is built
    // and pinned ONCE at stream setup, so over an unbounded stream the
    // persistent-RDD registry holds EXACTLY the one index generation
    // (building inside foreachBatch would add pins every trigger — the
    // monotone-registry leak this soak exists to catch) and per-batch
    // latency stays flat (a replayed index scan per batch would trend
    // with nothing here, but a growing registry drags the block
    // manager). Each batch carries one planted duplicate of a base
    // vector and one vector orthogonal to the whole base, so every
    // batch's verdicts are also exact.
    implicit val sqlCtx = spark.sqlContext
    graft.operators.Scale.releasePins(spark, blocking = true)
    val baseline = spark.sparkContext.getPersistentRDDs.keySet
    def vec(i: Int): Array[Float] = {
      val a = Array.fill(64)(0f); a(i) = 1f; a
    }
    val base = (0 until 32).map(i => (i.toLong, vec(i)))
      .toDF("vec_id", "embedding")
    val mem = MemoryStream[(Long, Array[Float])]
    val out = java.nio.file.Files.createTempDirectory("ssd_soak").toString
    val q = graft.streaming.StreamOps.semanticDedupStream(
      mem.toDF().toDF("vec_id", "embedding"), base, out)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ssd_soak_cp").toString)
      .start()
    val nBatches = 100
    val lat = Seq.newBuilder[Long]
    var pinsAfterFirst: Set[Int] = Set.empty
    try {
      for (b <- 0 until nBatches) {
        val dupId = 1000L + b
        val survId = 2000L + b
        val t0 = System.nanoTime()
        // dup = copy of base vector (b % 32); survivor = one-hot on a
        // dimension the base never uses (32..63 cycled)
        mem.addData(Seq((dupId, vec(b % 32)), (survId, vec(32 + b % 32))))
        q.processAllAvailable()
        lat += (System.nanoTime() - t0) / 1000000L
        val pins = (spark.sparkContext.getPersistentRDDs.keySet -- baseline)
          .toSet
        if (b == 0) {
          pinsAfterFirst = pins
          assert(pins.nonEmpty, "the resident index should pin RDDs")
        } else assert(pins == pinsAfterFirst,
          s"pin registry changed at batch $b: ${pins.size} ids vs " +
            s"${pinsAfterFirst.size} after batch 0 — the index is being " +
            "rebuilt or re-pinned per micro-batch")
      }
    } finally q.stop()
    // every batch's verdicts exact: dup flagged, orthogonal survivor not
    val got = spark.read.parquet((0 until nBatches)
      .map(b => s"$out/batch_$b"): _*)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got.size == 2 * nBatches)
    for (b <- 0 until nBatches) {
      assert(got(1000L + b), s"batch $b: planted duplicate not flagged")
      assert(!got(2000L + b), s"batch $b: orthogonal survivor flagged")
    }
    // flat latency: late-run median within noise of mid-run median
    def median(xs: Seq[Long]): Long = xs.sorted.apply(xs.size / 2)
    val pts = lat.result()
    val third = pts.size / 3
    val midMs = median(pts.slice(third, 2 * third))
    val lateMs = median(pts.drop(2 * third))
    assert(lateMs <= math.max(midMs * 3, 1500),
      s"per-batch latency trends up: mid median ${midMs}ms, " +
        s"late median ${lateMs}ms")
    info(s"resident-index soak: ${pts.size} batches, " +
      s"${pinsAfterFirst.size} pinned RDD ids constant throughout; " +
      s"latency mid ${midMs}ms / late ${lateMs}ms")
  }
}
