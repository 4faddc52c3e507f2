package graft.streaming

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.connector.write.{DataWriter, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Custom Structured Streaming SINK: the durable side of the reference's
  * gate [PK] — acknowledged, replay-safe delivery — as a DSv2
  * `StreamingWrite` with a two-phase epoch commit:
  *
  *  1. executors write each partition's rows to an uncommitted temp file
  *     and report it in a [[GateSink.PartFile]] commit message;
  *  2. the driver's `commit(epochId, …)` moves the parts into
  *     `epoch=<id>/` and drops an `epoch_<id>.commit` marker LAST.
  *
  * A replayed epoch (at-least-once upstream) finds its marker and becomes a
  * no-op — at-least-once delivery turns into exactly-once on storage, the
  * same contract as the foreachBatch parquet sink but at the connector
  * layer where Spark drives the protocol. Readers only trust directories
  * whose marker exists. Local `java.nio` file ops keep the test surface
  * hermetic; a cluster deployment swaps in the Hadoop FileSystem API with
  * the same rename-last protocol.
  *
  * {{{
  *   df.writeStream.format("graft.streaming.GateSink")
  *     .option("path", dir).option("checkpointLocation", cp).start()
  * }}}
  *
  * Rows serialize as TSV; timestamps as epoch-micros longs.
  */
class GateSink extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType() // schema comes from the query via LogicalWriteInfo
  override def supportsExternalMetadata(): Boolean = true
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GateSinkTable(properties.get("path"))
}

private[streaming] class GateSinkTable(path: String)
    extends Table with SupportsWrite {
  require(path != null, "GateSink requires .option(\"path\", …)")
  override def name(): String = s"gate-sink($path)"
  override def schema(): StructType = new StructType()
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.STREAMING_WRITE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toStreaming: StreamingWrite =
          new GateStreamingWrite(path, info.schema())
      }
    }
}

private[graft] class GateStreamingWrite(dir: String, schema: StructType)
    extends StreamingWrite {

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new GateWriterFactory(dir, schema)

  /** Exactly-once: marker-last publish; a replayed epoch is a no-op. */
  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val marker = new File(dir, s"epoch_$epochId.commit")
    val parts = messages.collect { case p: GateSink.PartFile => p }
    if (marker.exists()) {
      parts.foreach(p => Files.deleteIfExists(Paths.get(p.tmpPath)))
      return
    }
    val epochDir = new File(dir, s"epoch=$epochId")
    // No marker ⇒ any existing epochDir contents are from an attempt that
    // crashed mid-move. A replay with fewer partitions would otherwise
    // leave the crashed attempt's extra part files in place and the marker
    // below would commit them — duplicated rows. Readers never trust an
    // unmarked dir, so clearing it here is safe.
    Option(epochDir.listFiles()).foreach(_.foreach(f => Files.delete(f.toPath)))
    epochDir.mkdirs()
    parts.zipWithIndex.foreach { case (p, i) =>
      Files.move(Paths.get(p.tmpPath),
        new File(epochDir, f"part-$i%05d.tsv").toPath,
        StandardCopyOption.REPLACE_EXISTING)
    }
    val totalRows = parts.map(_.rows).sum
    Files.write(marker.toPath,
      s"$totalRows\n".getBytes(StandardCharsets.UTF_8))
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    messages.collect { case p: GateSink.PartFile => p }
      .foreach(p => Files.deleteIfExists(Paths.get(p.tmpPath)))
}

private[streaming] class GateWriterFactory(dir: String, schema: StructType)
    extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new GateDataWriter(dir, schema, partitionId, taskId, epochId)
}

private[streaming] class GateDataWriter(dir: String, schema: StructType,
    partitionId: Int, taskId: Long, epochId: Long)
    extends DataWriter[InternalRow] {

  private val tmp = {
    val d = new File(dir, "_tmp")
    d.mkdirs()
    new File(d, s"epoch-$epochId-p$partitionId-t$taskId.tsv")
  }
  private val out = Files.newBufferedWriter(tmp.toPath, StandardCharsets.UTF_8)
  private var rows = 0L

  private def cell(row: InternalRow, i: Int): String = {
    if (row.isNullAt(i)) return ""
    schema.fields(i).dataType match {
      case StringType => row.getUTF8String(i).toString
      case LongType | TimestampType => row.getLong(i).toString
      case IntegerType => row.getInt(i).toString
      case DoubleType => row.getDouble(i).toString
      case FloatType => row.getFloat(i).toString
      case BooleanType => row.getBoolean(i).toString
      case dt => throw new UnsupportedOperationException(
        s"GateSink: unsupported column type $dt")
    }
  }

  override def write(row: InternalRow): Unit = {
    out.write(schema.indices.map(cell(row, _)).mkString("\t"))
    out.write("\n")
    rows += 1
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    GateSink.PartFile(tmp.getAbsolutePath, rows)
  }

  override def abort(): Unit = {
    out.close()
    Files.deleteIfExists(tmp.toPath): Unit
  }

  override def close(): Unit = ()
}

object GateSink {
  final case class PartFile(tmpPath: String, rows: Long)
    extends WriterCommitMessage
}
