package graft.streaming

import org.apache.spark.sql.{DataFrame, ForeachWriter, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

/** SURVEY.md §2.A sink surface — the reference's ES/Influx writers [PK]
  * re-expressed as Structured Streaming sinks. */
object Sinks {

  /** Exactly-once durable sink: idempotent per-batch parquet writes.
    * Replayed batch ids overwrite their own directory, so at-least-once
    * delivery from the source becomes exactly-once on storage — the
    * reference gate's ack semantics at the sink side. */
  def foreachBatchParquet(stream: DataFrame, outDir: String): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      batch.write.mode("overwrite").parquet(s"$outDir/batch_$batchId")
    }

  /** Per-row side-effecting sink (the ForeachWriter surface). Collects into
    * a process-global buffer keyed by runId — test instrumentation for
    * delivery semantics; a production impl would hold a client connection. */
  class BufferingWriter(runKey: String) extends ForeachWriter[Row] {
    override def open(partitionId: Long, epochId: Long): Boolean = true
    override def process(row: Row): Unit = Sinks.append(runKey, row)
    override def close(errorOrNull: Throwable): Unit = ()
  }

  private val buffers =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.Queue[Row]]()

  private[streaming] def append(key: String, row: Row): Unit =
    buffers.computeIfAbsent(key, _ => new java.util.concurrent.ConcurrentLinkedQueue[Row]())
      .add(row)

  def drain(key: String): Seq[Row] = {
    val q = buffers.remove(key)
    if (q == null) Seq.empty
    else { val b = Seq.newBuilder[Row]; q.forEach(r => b += r); b.result() }
  }
}
