package graft.streaming

import org.apache.spark.sql.DataFrame

/** HTTP bulk-upsert sink adapter — the WIRE half of the keyed-upsert
  * story ([[UpsertSink]] is the storage-semantics half; MIGRATION.md's
  * E1–E7 checklist is the contract between them). Everything here is
  * plain JDK networking (java.net.http) against an Elasticsearch-shaped
  * bulk API, so the SAME adapter body that ExternalSinkConformanceSpec
  * drives against the in-process loopback stub runs against a real
  * cluster with only the URL swapped — that spec executes each E-row's
  * probe over an actual HTTP round trip, which is as far as "run the
  * checklist" can go in an offline sandbox.
  *
  * Per-item response discipline (E6 — a failed write never advances the
  * checkpoint):
  *   - 200/201: applied.
  *   - 409 `version_conflict`: the cluster REJECTED a stale version —
  *     that is the external-version merge working (E1/E2), counted and
  *     dropped, never retried as-is (a retry would be the same stale
  *     version again).
  *   - 400 (mapping/schema): routed to the returned dead-letter list —
  *     the DeadLetter surface's shape; retrying a schema error replays
  *     the same 400 forever.
  *   - 429/503 (backpressure / index closed): THROW — the foreachBatch
  *     body failing is what makes Structured Streaming retry the same
  *     batchId, so the batch replays instead of being skipped.
  */
object EsHttp {

  /** One bulk operation: `op` is "index" or "delete", `version` the
    * monotone EXTERNAL version (E1 — the same column [[UpsertSink]]
    * orders by), `source` the document JSON ("" for deletes). */
  final case class BulkOp(op: String, id: String, version: Long, source: String)

  final case class BulkResult(applied: Int, conflicts: Int,
    deadLetters: Seq[(String, String)])

  /** ES-style `version_type=external` NDJSON bulk body. */
  def bulkBody(ops: Seq[BulkOp]): String =
    ops.map { o =>
      val meta = s"""{"${o.op}":{"_id":"${o.id}","version":${o.version},"version_type":"external"}}"""
      if (o.op == "delete") meta else meta + "\n" + o.source
    }.mkString("", "\n", "\n")

  private def http = java.net.http.HttpClient.newHttpClient()

  private def send(method: String, url: String, body: String = "")
      : (Int, String) = {
    val b = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
    val req = (method match {
      case "GET" => b.GET()
      case "PUT" => b.PUT(java.net.http.HttpRequest.BodyPublishers.ofString(body))
      case "POST" => b.POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
    }).header("Content-Type", "application/x-ndjson").build()
    val resp = http.send(req,
      java.net.http.HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  /** POST the bulk body and scan PER-ITEM statuses (never only the
    * envelope — a 200 envelope routinely carries item-level failures). */
  def applyBulk(esUrl: String, index: String, ops: Seq[BulkOp]): BulkResult = {
    if (ops.isEmpty) return BulkResult(0, 0, Nil)
    val (status, body) = send("POST", s"$esUrl/$index/_bulk", bulkBody(ops))
    if (status == 429 || status == 503)
      throw new java.io.IOException(
        s"ES bulk rejected ($status) — failing the batch so it replays: $body")
    require(status == 200, s"ES bulk: unexpected HTTP $status: $body")
    import org.json4s._
    val items = jackson.JsonMethods.parse(body) \ "items" match {
      case JArray(xs) => xs
      case other => sys.error(s"ES bulk: malformed response: $other")
    }
    require(items.size == ops.size,
      s"ES bulk: ${ops.size} ops but ${items.size} item responses")
    var applied, conflicts = 0
    val dead = Seq.newBuilder[(String, String)]
    items.zip(ops).foreach { case (item, op) =>
      val inner = item \ op.op
      val st = inner \ "status" match {
        case JInt(s) => s.toInt
        case other => sys.error(s"ES bulk: item without status: $other")
      }
      st match {
        case 200 | 201 => applied += 1
        case 409 => conflicts += 1 // stale external version — E1/E2 working
        case 400 => dead += op.id -> jackson.JsonMethods.compact(
          jackson.JsonMethods.render(inner \ "error"))
        case 429 | 503 => throw new java.io.IOException(
          s"ES bulk: retryable item failure $st for ${op.id} — replay the batch")
        case other => sys.error(s"ES bulk: unexpected item status $other")
      }
    }
    BulkResult(applied, conflicts, dead.result())
  }

  /** The max committed epoch marker (E4): a fresh checkpoint restarts
    * batch ids at 0, and batch-id-keyed idempotence would then quietly
    * no-op over a populated index — so the committed epoch lives IN the
    * index as a reserved doc and batch 0 over a committed epoch > 0
    * fails loudly (the [[UpsertSink]] fresh-checkpoint guard, carried to
    * the wire). */
  val EpochMarkerId = "__graft_epoch__"

  def committedEpoch(esUrl: String, index: String): Option[Long] = {
    val (status, body) = send("GET", s"$esUrl/$index/_doc/$EpochMarkerId")
    if (status == 404) None
    else {
      import org.json4s._
      jackson.JsonMethods.parse(body) \ "_version" match {
        case JInt(v) => Some(v.toLong)
        case other => sys.error(s"ES: malformed marker doc: $other")
      }
    }
  }

  /** foreachBatch body: upsert a micro-batch keyed on `keyCol` with
    * external version `verCol` (rows with `opCol` = "delete" become
    * versioned tombstone deletes), guarded by the epoch marker. The
    * marker advances with version = batchId + 1 AFTER the batch's ops
    * land, so a replayed epoch re-sends its (idempotent, versioned) ops
    * and then 409s on the marker — both harmless (E5). Returns the
    * BulkResult for observability. */
  def upsertBatch(esUrl: String, index: String, batch: DataFrame,
      batchId: Long, keyCol: String, verCol: String,
      opCol: Option[String] = None): BulkResult = {
    committedEpoch(esUrl, index).foreach { epoch =>
      require(batchId > 0 || epoch == 0,
        s"fresh checkpoint (batchId 0) over $index with committed epoch " +
          s"$epoch — a new checkpoint requires a new index (E4 guard)")
    }
    import org.apache.spark.sql.functions._
    val cols = batch.columns.filterNot(c =>
      c == keyCol || opCol.contains(c)).toSeq
    // driver-side collect is CORRECT here: this runs inside foreachBatch
    // on micro-batch-sized data headed for one HTTP endpoint — a real
    // deployment fans out per-partition clients instead
    // (batch.foreachPartition), same per-item semantics.
    val rows = batch
      .select(col(keyCol).cast("string").as("__k"),
        col(verCol).cast("long").as("__v"),
        opCol.map(c => col(c).cast("string")).getOrElse(lit("index")).as("__op"),
        to_json(struct(cols.map(col): _*)).as("__doc"))
      .collect()
      .map(r => BulkOp(if (r.getString(2) == "delete") "delete" else "index",
        r.getString(0), r.getLong(1), r.getString(3)))
    val res = applyBulk(esUrl, index, rows.toSeq)
    // marker write rides the same versioned-upsert semantics: replays 409
    applyBulk(esUrl, index, Seq(BulkOp("index", EpochMarkerId, batchId + 1,
      s"""{"epoch":${batchId + 1}}"""))): Unit
    res
  }
}
