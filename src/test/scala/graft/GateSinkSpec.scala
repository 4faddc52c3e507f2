package graft

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.streaming.{GateSink, GateStreamingWrite}

/** Custom DSv2 streaming SINK: epoch-commit protocol — every row lands in
  * exactly one committed epoch directory, and a replayed epoch commit is a
  * no-op (exactly-once on storage from an at-least-once upstream). */
class GateSinkSpec extends SparkSpec {

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("gate source -> gate sink end-to-end, content matches the source") {
    val out = tmpDir("gate_sink_out")
    val cp = tmpDir("gate_sink_cp")
    val q = spark.readStream.format("graft.streaming.GateSource")
      .option("rowsPerBatch", 50).option("maxRows", 200)
      .option("numPartitions", 4).load()
      .writeStream.format("graft.streaming.GateSink")
      .option("path", out).option("checkpointLocation", cp)
      .start()
    q.processAllAvailable()
    q.stop()

    val markers = new File(out).listFiles().filter(_.getName.endsWith(".commit"))
    assert(markers.nonEmpty, "no committed epochs")
    val back = spark.read
      .schema(StructType(Seq(
        StructField("event_id", LongType), StructField("ts", LongType),
        StructField("user_id", LongType), StructField("event_type", StringType),
        StructField("value", DoubleType))))
      .option("sep", "\t")
      .csv(markers.map(m => new File(out,
        s"epoch=${m.getName.stripPrefix("epoch_").stripSuffix(".commit")}").getPath): _*)
    assert(back.count() == 200)
    assert(back.agg(countDistinct(col("event_id"))).head().getLong(0) == 200)
    // content equals a fresh replay of the same deterministic source
    val replay = spark.readStream.format("graft.streaming.GateSource")
      .option("rowsPerBatch", 200).option("maxRows", 200)
      .option("numPartitions", 4).load()
      .writeStream.outputMode("append").format("memory")
      .queryName("sink_replay").start()
    replay.processAllAvailable()
    replay.stop()
    val expected = spark.table("sink_replay")
      .select(col("event_id"), expr("unix_micros(ts)").as("ts"), col("user_id"),
        col("event_type"), col("value"))
      .orderBy(col("event_id")).collect().toSeq
    val got = back.orderBy(col("event_id")).collect().toSeq
    assert(got == expected)
  }

  test("checkpoint restart resumes epochs without duplicating rows") {
    val out = tmpDir("gate_sink_restart")
    val cp = tmpDir("gate_sink_restart_cp")
    def run(maxRows: Long): Unit = {
      val q = spark.readStream.format("graft.streaming.GateSource")
        .option("rowsPerBatch", 100).option("maxRows", maxRows)
        .option("numPartitions", 4).load()
        .writeStream.format("graft.streaming.GateSink")
        .option("path", out).option("checkpointLocation", cp)
        .start()
      q.processAllAvailable()
      q.stop()
    }
    run(300)  // first run: epochs for rows 0..299
    run(600)  // restart from the SAME checkpoint: must continue at row 300
    val committed = new File(out).listFiles()
      .filter(_.getName.endsWith(".commit"))
      .map(m => new File(out,
        s"epoch=${m.getName.stripPrefix("epoch_").stripSuffix(".commit")}").getPath)
    val back = spark.read
      .schema(StructType(Seq(
        StructField("event_id", LongType), StructField("ts", LongType),
        StructField("user_id", LongType), StructField("event_type", StringType),
        StructField("value", DoubleType))))
      .option("sep", "\t").csv(committed: _*)
    assert(back.count() == 600, "restart must not duplicate or drop rows")
    assert(back.agg(countDistinct(col("event_id"))).head().getLong(0) == 600)
  }

  test("replayed epoch commit is a no-op (exactly-once on storage)") {
    val out = tmpDir("gate_sink_replay")
    val schema = StructType(Seq(StructField("x", LongType)))
    val write = new GateStreamingWrite(out, schema)

    def partFile(body: String): GateSink.PartFile = {
      val tmp = new File(new File(out, "_tmp"), s"replay-${body.hashCode}.tsv")
      tmp.getParentFile.mkdirs()
      Files.write(tmp.toPath, body.getBytes(StandardCharsets.UTF_8))
      GateSink.PartFile(tmp.getAbsolutePath, body.linesIterator.size.toLong)
    }

    write.commit(7L, Array(partFile("1\n2\n")))
    val epochDir = new File(out, "epoch=7")
    assert(epochDir.listFiles().length == 1)
    assert(new File(out, "epoch_7.commit").exists())

    // upstream replays epoch 7: same data arrives again
    write.commit(7L, Array(partFile("1\n2\n")))
    assert(epochDir.listFiles().length == 1, "replay must not add part files")
    assert(!new File(out, "_tmp").listFiles().exists(_.getName.startsWith("replay-")),
      "replayed temp parts must be cleaned up")
  }

  test("crashed unmarked epoch is cleared before a replay commits (no dup rows)") {
    val out = tmpDir("gate_sink_crash")
    val schema = StructType(Seq(StructField("x", LongType)))
    val write = new GateStreamingWrite(out, schema)

    def partFile(name: String, body: String): GateSink.PartFile = {
      val tmp = new File(new File(out, "_tmp"), name)
      tmp.getParentFile.mkdirs()
      Files.write(tmp.toPath, body.getBytes(StandardCharsets.UTF_8))
      GateSink.PartFile(tmp.getAbsolutePath, body.linesIterator.size.toLong)
    }

    // Simulate a crash mid-commit: 3 part files landed in epoch=9/ but the
    // marker was never written.
    val epochDir = new File(out, "epoch=9")
    epochDir.mkdirs()
    (0 until 3).foreach { i =>
      Files.write(new File(epochDir, f"part-$i%05d.tsv").toPath,
        s"$i\n".getBytes(StandardCharsets.UTF_8))
    }

    // The replay arrives with FEWER partitions (2). Without cleanup the
    // crashed attempt's part-00002 would survive and be committed.
    write.commit(9L, Array(partFile("c0", "10\n"), partFile("c1", "11\n12\n")))
    assert(new File(out, "epoch_9.commit").exists())
    val parts = epochDir.listFiles().map(_.getName).sorted
    assert(parts.toSeq == Seq("part-00000.tsv", "part-00001.tsv"),
      s"crashed parts must not leak into the committed epoch: ${parts.toSeq}")
    val content = parts.flatMap(p =>
      new String(Files.readAllBytes(new File(epochDir, p).toPath),
        StandardCharsets.UTF_8).linesIterator).sorted.toSeq
    assert(content == Seq("10", "11", "12"))
  }

  test("keep-set upsert publishes exactly once across crash and replay") {
    import graft.streaming.KeepSetPublish
    import spark.implicits._
    val dir = tmpDir("keepset_pub")

    // epoch 0: base keep-set commits
    val base = Seq(1L, 2L, 3L).toDF("doc_id")
    assert(KeepSetPublish.publish(base, dir, 0L))
    assert(KeepSetPublish.latestEpoch(dir).contains(0L))

    // epoch 1 crashes mid-rename: an UNMARKED epoch dir with garbage —
    // readers must keep trusting epoch 0
    val crashed = new File(dir, "epoch=1")
    crashed.mkdirs()
    Files.write(new File(crashed, "part-junk.parquet").toPath,
      "not parquet".getBytes(StandardCharsets.UTF_8))
    assert(KeepSetPublish.latestEpoch(dir).contains(0L),
      "unmarked epoch must be invisible to readers")

    // the retry clears the crashed attempt and commits the merged set
    val merged = Seq(1L, 2L, 3L, 8L, 9L).toDF("doc_id")
    assert(KeepSetPublish.publish(merged, dir, 1L))
    assert(KeepSetPublish.latestEpoch(dir).contains(1L))
    assert(!new File(crashed, "part-junk.parquet").exists(),
      "crashed attempt's files must not leak into the committed epoch")

    // an at-least-once upstream replays epoch 1: byte-level no-op
    def snapshotState(): Seq[(String, Long)] =
      crashed.listFiles().map(f => (f.getName, f.lastModified())).sorted.toSeq
    val before = snapshotState()
    assert(!KeepSetPublish.publish(
      Seq(999L).toDF("doc_id"), dir, 1L), "replay must be a no-op")
    assert(snapshotState() == before, "replay must not touch committed files")

    // the published keep-set reads back exactly once, no duplicates
    val got = KeepSetPublish.readLatest(spark, dir)
      .orderBy($"doc_id").as[Long].collect().toSeq
    assert(got == Seq(1L, 2L, 3L, 8L, 9L))

    // a fresh directory with no committed epoch fails loudly, not empty
    intercept[IllegalStateException](
      KeepSetPublish.readLatest(spark, tmpDir("keepset_empty")))
  }
}
