package graft.streaming

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.unsafe.types.UTF8String

/** Kafka-SHAPED partitioned-offset topic, file-backed (the production
  * ingress every log-pipeline user has, re-expressed for an offline
  * environment — the r9 verdict's #1 missing shape):
  *
  *   - topic = a directory of partition subdirs `p=0 … p=N-1`;
  *   - partition = an append-only log of SEGMENT files named by their
  *     BASE OFFSET (`00000000000000000000.log`, `…128.log`, … — Kafka's
  *     log-segment naming), one tab-separated record per line;
  *   - record identity = (partition, offset); offsets are dense per
  *     partition and never reused, so a consumer position IS a
  *     per-partition offset map — exactly the Kafka consumer contract.
  *
  * The streaming side ([[GateTopicSource]]) is a DSv2 MicroBatchStream
  * whose `Offset` is that per-partition map: resume lands MID-partition,
  * mid-segment (the reader seeks by base offset + line skip), admission
  * control bounds each micro-batch, and Trigger.AvailableNow pins the
  * backfill end at start so a bounded catch-up run terminates. `commit`
  * is a no-op — the log retains records; the CHECKPOINT owns the
  * position, which is what makes crash-resume exactly-once for a
  * deterministic log (GateSourceSpec pins resume-mid-partition and
  * append-then-restart no-loss/no-replay).
  *
  * Scale shape: the driver touches file NAMES and LENGTHS only (the same
  * listing every file source pays; per-(path,length) record counts are
  * memoized, so an immutable closed segment is counted once); rows are
  * decoded executor-side, one task per (partition, offset-range). At
  * production scale the segment listing would come from a real broker's
  * index — every planner/reader contract here is the same.
  */
object GateTopic {

  /** Data columns (the gate event shape) — the streaming/batch read
    * prepends (partition, off). */
  val dataSchema: StructType = StructType(Seq(
    StructField("event_id", LongType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("value", DoubleType, nullable = false)))

  val schema: StructType = StructType(
    StructField("partition", IntegerType, nullable = false) +:
      StructField("off", LongType, nullable = false) +:
      dataSchema.fields.toSeq)

  private[streaming] def partitionDir(dir: String, p: Int) =
    new java.io.File(dir, s"p=$p")

  private[streaming] def listPartitions(dir: String): Seq[Int] =
    Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("p="))
      .map(_.getName.drop(2).toInt).sorted.toSeq

  /** Segment files of one partition as (baseOffset, file), base-offset
    * order — the filename IS the base offset (Kafka segment naming). */
  private[streaming] def segments(pDir: java.io.File): Seq[(Long, java.io.File)] =
    Option(pDir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".log"))
      .map(f => f.getName.stripSuffix(".log").toLong -> f)
      .sortBy(_._1).toSeq

  // (path, length) -> record count, SEALED segments only (a segment is
  // sealed once a later-based segment exists; the ACTIVE tail segment is
  // never cached — its length changes on every append, and caching it
  // would grow this map by one dead entry per append per partition on a
  // long-running stream). write() invalidates the paths it rewrites.
  private val countCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long), Long]()

  private def countLines(f: java.io.File): Long = {
    val src = scala.io.Source.fromFile(f, "UTF-8")
    try src.getLines().size.toLong finally src.close()
  }

  private[streaming] def recordCount(f: java.io.File,
      sealed_ : Boolean = true): Long =
    if (sealed_)
      countCache.computeIfAbsent((f.getAbsolutePath, f.length()),
        _ => countLines(f))
    else countLines(f)

  private def invalidateCounts(prefix: java.io.File): Unit = {
    val p = prefix.getAbsolutePath + java.io.File.separator
    countCache.keySet.removeIf(_._1.startsWith(p))
  }

  /** End offset (= record count) per partition. */
  private[streaming] def endOffsets(dir: String): Map[Int, Long] =
    listPartitions(dir).map { p =>
      val segs = segments(partitionDir(dir, p))
      p -> segs.zipWithIndex.map { case ((base, f), i) =>
        base + recordCount(f, sealed_ = i < segs.length - 1)
      }.foldLeft(0L)(math.max)
    }.toMap

  /** tab-separated record line; event_type carries no tabs/newlines by
    * construction (enforced at write). Doubles round-trip through
    * shortest-repr toString. */
  private[streaming] def encode(eventId: Long, tsUs: Long, userId: Long,
      etype: String, value: Double): String =
    s"$eventId\t$tsUs\t$userId\t$etype\t$value"

  private[streaming] def decode(line: String): (Long, Long, Long, String, Double) = {
    val a = line.split('\t')
    (a(0).toLong, a(1).toLong, a(2).toLong, a(3), a(4).toDouble)
  }

  /** Produce `df` (gate-event columns) into a topic directory: records
    * route to partition `floorMod(event_id, numPartitions)` (Kafka's
    * keyed-partitioner contract — one key, one partition, order within
    * the key preserved) and land in base-offset-named segment files of
    * `segmentRows` records each. Executor-parallel: one task per topic
    * partition writes its own log (a custom Partitioner routes by the
    * SAME function the oracle states), driver ships nothing. */
  def write(df: DataFrame, dir: String, numPartitions: Int,
      segmentRows: Int = 128): Unit = {
    import org.apache.spark.sql.functions._
    require(numPartitions > 0 && segmentRows > 0)
    listPartitions(dir).foreach { p =>
      val pd = partitionDir(dir, p)
      invalidateCounts(pd) // a rewrite may reuse (path, length) pairs
      Option(pd.listFiles()).getOrElse(Array.empty).foreach(_.delete())
      pd.delete()
    }
    (0 until numPartitions).foreach(p => partitionDir(dir, p).mkdirs())
    val n = numPartitions
    val sr = segmentRows
    val topicDir = dir
    // RDD escape hatch, used deliberately: a topic producer needs EXACT
    // partition routing (record key k -> partition k, Kafka's contract) +
    // log-order file IO per partition — repartitionAndSortWithinPartitions
    // does both in the one shuffle a producer fleet would pay anyway.
    df.select(col("event_id").cast("long"), unix_micros(col("ts")),
        col("user_id").cast("long"), col("event_type"),
        col("value").cast("double"))
      .queryExecution.toRdd // InternalRow, no Row boxing
      .map { r =>
        val id = r.getLong(0)
        ((java.lang.Math.floorMod(id, n.toLong).toInt, id),
          GateTopic.encode(id, r.getLong(1), r.getLong(2),
            { val s = r.getUTF8String(3).toString
              require(!s.contains('\t') && !s.contains('\n'),
                s"GateTopic: record field contains separator: '$s'"); s },
            r.getDouble(4)))
      }
      .repartitionAndSortWithinPartitions(new org.apache.spark.Partitioner {
        override def numPartitions: Int = n
        override def getPartition(key: Any): Int =
          key.asInstanceOf[(Int, Long)]._1
      })
      .foreachPartition { it =>
        val p = org.apache.spark.TaskContext.getPartitionId()
        val pd = partitionDir(topicDir, p)
        var off = 0L
        // BufferedWriter, NOT PrintWriter: PrintWriter swallows
        // IOExceptions behind checkError(), which would let a disk-full
        // producer task report success over a silently truncated log
        var w: java.io.BufferedWriter = null
        try {
          it.foreach { case (_, line) =>
            if (off % sr == 0L) {
              if (w != null) w.close()
              w = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
                new java.io.FileOutputStream(
                  new java.io.File(pd, f"$off%020d.log")),
                java.nio.charset.StandardCharsets.UTF_8))
            }
            w.write(line); w.newLine()
            off += 1L
          }
        } finally if (w != null) w.close()
      }
  }

  /** Batch twin: read the whole topic back as a DataFrame with
    * (partition, off) provenance — one task per SEGMENT file (not per
    * partition: a backfill's parallelism must scale with log size, not
    * with the topic's partition count; offsets are absolute via each
    * segment's base, so per-segment tasks lose no ordering information).
    * Driver handles names only. Used by the oracled `source_gate_topic`
    * key and as the backfill-equality reference in GateSourceSpec. */
  def readBatch(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val parts = listPartitions(dir)
    require(parts.nonEmpty, s"GateTopic.readBatch: no p=* dirs under $dir")
    val segs = parts.flatMap(p =>
      segments(partitionDir(dir, p)).map { case (base, f) =>
        (p, base, f.getAbsolutePath)
      })
    require(segs.nonEmpty, s"GateTopic.readBatch: no segment files under $dir")
    val rows = spark.sparkContext
      .parallelize(segs, segs.length)
      .flatMap { case (p, base, path) =>
        val src = scala.io.Source.fromFile(new java.io.File(path), "UTF-8")
        try src.getLines().zipWithIndex.map { case (line, i) =>
          val (id, tsUs, uid, et, v) = GateTopic.decode(line)
          (p, base + i, id, tsUs, uid, et, v)
        }.toList // materialize the segment BEFORE closing the handle
        finally src.close()
      }
    spark.createDataFrame(rows).toDF(
      "partition", "off", "event_id", "ts_us", "user_id", "event_type", "value")
      .select(col("partition"), col("off"), col("event_id"),
        timestamp_micros(col("ts_us")).as("ts"), col("user_id"),
        col("event_type"), col("value"))
  }
}

/** Streaming entry point. Registered under the short name `gatetopic`
  * (META-INF/services DataSourceRegister — the same registration seam
  * `format("kafka")` uses), and reachable by class name too:
  * {{{
  *   spark.readStream.format("gatetopic")            // or the class name
  *     .option("path", topicDir).option("rowsPerBatch", 64).load()
  * }}}
  * The production swap is config-driven, not code-driven: replace
  * `format("gatetopic")` + `path` with `format("kafka")` + `subscribe`/
  * `kafka.bootstrap.servers` — the offset model maps 1:1 (per-partition
  * dense offsets, checkpoint owns the position, commit is a progress
  * marker) so the checkpoint semantics transfer. MIGRATION.md §sources
  * documents the option mapping. */
class GateTopicSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "gatetopic"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GateTopic.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GateTopicTable
}

private class GateTopicTable extends Table with SupportsRead {
  override def name(): String = "graft_gate_topic"
  override def schema(): StructType = GateTopic.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    () => new GateTopicScan(opts)
}

private class GateTopicScan(options: CaseInsensitiveStringMap) extends Scan {
  override def readSchema(): StructType = GateTopic.schema
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream = {
    val path = options.get("path")
    require(path != null && path.nonEmpty,
      "GateTopicSource: required option 'path' (topic directory)")
    new GateTopicStream(path, options.getLong("rowsPerBatch", 512L))
  }
}

/** Consumer position: next offset to read, per partition (the Kafka
  * consumer-group position shape). JSON form is the sorted map, so two
  * equal positions always serialize identically. */
private[streaming] case class GateTopicOffset(offsets: Map[Int, Long])
    extends Offset {
  override def json(): String = offsets.toSeq.sorted
    .map { case (p, o) => s""""$p":$o""" }.mkString("{", ",", "}")
}

private[streaming] object GateTopicOffset {
  def parse(json: String): GateTopicOffset = {
    import org.json4s._
    GateTopicOffset(jackson.JsonMethods.parse(json) match {
      case JObject(fields) => fields.map {
        case (p, JInt(o))  => p.toInt -> o.toLong
        case (p, other)    => sys.error(s"bad offset for p=$p: $other")
      }.toMap
      case other => sys.error(s"bad GateTopicOffset json: $other")
    })
  }
}

private case class GateTopicRange(pDir: String, partition: Int,
    start: Long, end: Long) extends InputPartition

private class GateTopicStream(path: String, rowsPerBatch: Long)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  // Trigger.AvailableNow: the end offsets captured at query start — the
  // backfill reads UP TO this position in bounded admission-controlled
  // batches and then terminates, even if a producer keeps appending.
  @volatile private var pinnedEnd: Option[Map[Int, Long]] = None

  override def prepareForTriggerAvailableNow(): Unit =
    pinnedEnd = Some(GateTopic.endOffsets(path))

  override def initialOffset(): Offset = {
    val parts = GateTopic.listPartitions(path)
    require(parts.nonEmpty,
      s"GateTopicSource: no p=* partition dirs under $path")
    GateTopicOffset(parts.map(_ -> 0L).toMap)
  }

  /** One admission-controlled step from the ENGINE-supplied start (the
    * GateSource discipline — stateless, so checkpoint recovery just flows
    * the recovered position in here and the stream resumes mid-partition,
    * mid-segment): each partition advances by up to its fair share of
    * `rowsPerBatch`, toward what the log (or the AvailableNow pin) has. */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[GateTopicOffset].offsets
    val avail = pinnedEnd.getOrElse(GateTopic.endOffsets(path))
    val parts = avail.keySet ++ s.keySet
    val share = math.max(1L, rowsPerBatch / math.max(1, parts.size))
    GateTopicOffset(parts.map { p =>
      val from = s.getOrElse(p, 0L) // a partition created mid-stream starts at 0
      p -> math.min(avail.getOrElse(p, from), from + share)
    }.toMap)
  }

  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(rowsPerBatch)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is used via SupportsAdmissionControl")

  override def deserializeOffset(json: String): Offset =
    GateTopicOffset.parse(json)

  // The log retains records; the checkpoint owns the position (Kafka's
  // consumer model — commit is a progress marker, never a delete).
  override def commit(end: Offset): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GateTopicOffset].offsets
    val e = end.asInstanceOf[GateTopicOffset].offsets
    e.toSeq.sorted.collect {
      case (p, hi) if hi > s.getOrElse(p, 0L) =>
        GateTopicRange(GateTopic.partitionDir(path, p).getAbsolutePath,
          p, s.getOrElse(p, 0L), hi): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => {
      val r = partition.asInstanceOf[GateTopicRange]
      new PartitionReader[InternalRow] {
        // segments overlapping [start, end), base-offset order; the seek
        // is a base-offset file skip + a line skip inside the first file
        // (resume mid-segment)
        private val segs = GateTopic.segments(new java.io.File(r.pDir))
        private var segIdx = 0
        private var src: scala.io.Source = _
        private var lines: Iterator[String] = Iterator.empty
        private var off = r.start
        private var current: InternalRow = _

        private def openUntilPositioned(): Boolean = {
          while (!lines.hasNext) {
            if (src != null) { src.close(); src = null }
            if (segIdx >= segs.length) return false
            val (base, f) = segs(segIdx)
            segIdx += 1
            val cnt = GateTopic.recordCount(f,
              sealed_ = segIdx < segs.length) // tail segment still grows
            if (base + cnt > off) { // segment contains our position
              // fail LOUDLY on a log gap: if the first overlapping
              // segment starts past our offset (retention deleted a
              // segment, or a hand-built log skips a base), a silent
              // drop(<0) no-op would mislabel every record's offset
              require(base <= off, s"GateTopic: offset $off not in the " +
                s"log — first available segment starts at $base " +
                s"(partition dir ${r.pDir})")
              src = scala.io.Source.fromFile(f, "UTF-8")
              lines = src.getLines().drop((off - base).toInt)
            }
          }
          true
        }

        override def next(): Boolean = {
          if (off >= r.end) return false
          if (!openUntilPositioned()) return false
          val line = lines.next()
          // fail WITH provenance: a corrupt log line must name its
          // (partition, offset), not surface as a bare NumberFormatException
          val (id, tsUs, uid, et, v) =
            try GateTopic.decode(line)
            catch { case e: Exception => throw new IllegalStateException(
              s"GateTopic: corrupt record at p=${r.partition} offset $off " +
                s"under ${r.pDir}: '$line'", e) }
          current = InternalRow(r.partition, off, id, tsUs, uid,
            UTF8String.fromString(et), v)
          off += 1L
          true
        }
        override def get(): InternalRow = current
        override def close(): Unit = if (src != null) src.close()
      }
    }

  override def stop(): Unit = ()
}
