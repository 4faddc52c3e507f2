package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Keyed-UPSERT external-sink analogue [PK: the reference ships its events
  * to Elasticsearch/InfluxDB, where the document `_id` (ES) / series key
  * (Influx) makes redelivery idempotent: writing the same key twice leaves
  * one live document]. This is that contract on storage Spark owns:
  *
  *  - **Keyed**: the target holds AT MOST ONE live row per key; an
  *    incoming row replaces the target row iff its VERSION is higher
  *    (ES external-versioning semantics — `version_type=external`), so
  *    the final state is independent of how rows were batched or
  *    redelivered. Version order must be total per key (callers end the
  *    version columns with a unique tie-break).
  *  - **Exactly-once across replays**: each applied micro-batch publishes
  *    the merged state as a new [[KeepSetPublish]] epoch (two-phase,
  *    marker-last), keyed by the streaming `batchId`. An at-least-once
  *    upstream replaying a committed batch is a no-op BEFORE any job runs
  *    — the same short-circuit the keep-set upsert key uses.
  *
  * Scale note: this demo publishes the FULL merged state per epoch — the
  * honest local stand-in for what a lake-table MERGE does per partition.
  * At 100 TB the same protocol applies per hash-bucket of the key (only
  * buckets containing batch keys rewrite; the epoch marker then commits a
  * manifest of bucket files instead of one directory) or maps 1:1 onto
  * Delta/Iceberg MERGE INTO with `txnAppId`/`txnVersion` = batchId —
  * MIGRATION.md §sinks documents the swap. */
object UpsertSink {

  /** Applies one micro-batch: merge-by-key (higher version wins; target
    * wins ties, so re-applying identical rows is stable), publish as epoch
    * `batchId`. Returns false — touching nothing — when `batchId` or any
    * later batch already committed (replay after restart). */
  def applyBatch(dir: String, batchId: Long, batch: DataFrame,
      keyCols: Seq[String], versionCols: Seq[String]): Boolean = {
    require(keyCols.nonEmpty && versionCols.nonEmpty,
      "UpsertSink.applyBatch: key and version columns are required")
    // Replay guard on the MARKER, not just the latest epoch: a replayed
    // batch 1 while epoch 2 exists must no-op too (monotone batch ids are
    // the streaming contract, so any committed epoch >= batchId means this
    // batch's effects are already folded into the live state).
    if (KeepSetPublish.latestEpoch(dir).exists(_ >= batchId)) return false
    val spark = batch.sparkSession
    val prev: DataFrame = KeepSetPublish.latestEpoch(dir) match {
      case Some(e) => KeepSetPublish.readEpoch(spark, dir, e)
      case None => spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], batch.schema)
    }
    // At EQUAL version the target row survives (_src: target=0 < batch=1,
    // ascending tie-break after version DESC) — ES external-versioning
    // rejects same-version writes for the same reason: a byte-identical
    // redelivery must not churn the live document.
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(versionCols.map(c => col(c).desc) :+ col("_src").asc: _*)
    val merged = prev.withColumn("_src", lit(0))
      .unionByName(batch.withColumn("_src", lit(1)))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_src", "_rn")
    KeepSetPublish.publish(merged, dir, batchId)
  }

  /** Structured Streaming wiring: `writeStream` → foreachBatch upsert.
    * The stream's batchId is the epoch id, so a checkpoint restart that
    * redelivers the last batch hits the marker and re-publishes nothing. */
  def foreachBatchUpsert(stream: DataFrame, dir: String,
      keyCols: Seq[String], versionCols: Seq[String]): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      applyBatch(dir, batchId, batch, keyCols, versionCols): Unit
    }

  /** Live target state (latest committed epoch). Includes tombstones when
    * the stream carries them — see [[readLive]]. */
  def readState(spark: SparkSession, dir: String): DataFrame =
    KeepSetPublish.readLatest(spark, dir)

  /** Live view over a target whose rows carry an operation column
    * (`'U'` upsert / `'D'` delete — the ES delete-by-`_id` surface): a
    * delete is just a row that WINS the version merge and is then hidden
    * from readers. Tombstones stay IN the stored state on purpose — the
    * evt_cdc_apply discipline: if a delete were dropped from storage, an
    * older upsert redelivered later would beat nothing and silently
    * resurrect the key; against the retained tombstone its lower version
    * loses, and a genuinely NEWER upsert still wins and resurrects.
    * Retention GC of old tombstones maps onto KeepSetPublish.expire. */
  def readLive(spark: SparkSession, dir: String, opCol: String,
      deleteOp: String = "D"): DataFrame =
    readState(spark, dir).filter(col(opCol) =!= deleteOp)

  /** Committed epoch ids, ascending (test/audit surface) — delegates to
    * the marker protocol's owner. */
  def committedEpochs(dir: String): Seq[Long] =
    KeepSetPublish.committedEpochs(dir)
}
