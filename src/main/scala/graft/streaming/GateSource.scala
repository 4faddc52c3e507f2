package graft.streaming

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Custom Structured Streaming source: a deterministic event "gate".
  *
  * The reference's gate [PK] is an acknowledged ingress point that buffers
  * and replays events. This DSv2 MicroBatchStream reproduces that shape with
  * a fully deterministic generator (seeded by row index), so tests can
  * assert exact results. Registered by class name:
  *
  * {{{
  *   spark.readStream.format("graft.streaming.GateSource")
  *     .option("rowsPerBatch", 100).option("maxRows", 1000)
  *     .option("numPartitions", 4).load()
  * }}}
  *
  * Offsets are row counts; each micro-batch emits `rowsPerBatch` rows split
  * across `numPartitions` input partitions (executor-parallel, no driver
  * materialization). `maxRows` caps the stream so `processAllAvailable()`
  * terminates in tests — a production gate would stream unbounded.
  */
class GateSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GateSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GateTable(new CaseInsensitiveStringMap(properties))
}

object GateSource {
  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("value", DoubleType, nullable = false)))

  private[streaming] val types = Array("click", "view", "signup", "purchase", "error")

  /** Deterministic row for a global row index (same on every replay —
    * the at-least-once gate's replay guarantee). */
  private[streaming] def row(i: Long, users: Long, baseMicros: Long): InternalRow = {
    val h = scala.util.hashing.byteswap64(i)
    InternalRow(
      i,
      baseMicros + i * 60L * 1000000L, // one event per minute of event time
      java.lang.Math.floorMod(h, users),
      UTF8String.fromString(types(java.lang.Math.floorMod(h >> 8, types.length.toLong).toInt)),
      java.lang.Math.floorMod(h >> 16, 10000L) / 100.0)
  }
}

private class GateTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = "graft_gate"
  override def schema(): StructType = GateSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    () => new GateScan(opts)
}

private class GateScan(options: CaseInsensitiveStringMap) extends Scan {
  override def readSchema(): StructType = GateSource.schema
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new GateStream(
      rowsPerBatch = options.getLong("rowsPerBatch", 100L),
      maxRows = options.getLong("maxRows", 1000L),
      numPartitions = options.getInt("numPartitions", 2),
      users = options.getLong("users", 10L),
      baseMicros = options.getLong("baseMicros", 1704067200000000L)) // 2024-01-01 UTC
}

private case class GateOffset(rows: Long) extends Offset {
  override def json(): String = rows.toString
}

private case class GateRange(start: Long, end: Long, users: Long,
    baseMicros: Long) extends InputPartition

private class GateStream(rowsPerBatch: Long, maxRows: Long, numPartitions: Int,
    users: Long, baseMicros: Long)
    extends MicroBatchStream with SupportsAdmissionControl {

  override def initialOffset(): Offset = GateOffset(0L)

  // Admission control: one bounded batch per trigger, computed FROM the
  // engine-supplied start offset. Stateless, so checkpoint restarts resume
  // exactly where the previous run committed (the recovered start simply
  // flows in here) — a mutable high-water mark cannot get this right.
  override def latestOffset(start: Offset, limit: ReadLimit): Offset =
    GateOffset(math.min(start.asInstanceOf[GateOffset].rows + rowsPerBatch, maxRows))

  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(rowsPerBatch)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is used via SupportsAdmissionControl")

  override def deserializeOffset(json: String): Offset = GateOffset(json.toLong)

  override def commit(end: Offset): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GateOffset].rows
    val e = end.asInstanceOf[GateOffset].rows
    val span = math.max(0L, e - s)
    val per = math.max(1L, (span + numPartitions - 1) / numPartitions)
    (s until e by per).map(b =>
      GateRange(b, math.min(b + per, e), users, baseMicros): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => {
      val r = partition.asInstanceOf[GateRange]
      new PartitionReader[InternalRow] {
        private var i = r.start - 1
        override def next(): Boolean = { i += 1; i < r.end }
        override def get(): InternalRow = GateSource.row(i, r.users, r.baseMicros)
        override def close(): Unit = ()
      }
    }

  override def stop(): Unit = ()
}
