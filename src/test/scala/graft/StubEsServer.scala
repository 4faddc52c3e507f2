package graft

/** In-process LOOPBACK Elasticsearch-shaped stub (test fixture for the
  * MIGRATION.md E1–E7 conformance probes): a real JDK HttpServer on an
  * ephemeral localhost port speaking the tiny slice of the ES surface
  * the [[graft.streaming.EsHttp]] adapter uses — `_bulk` with
  * `version_type=external` per-item semantics, `_doc` reads, `_mapping`,
  * and `_close`/`_open` to induce retryable failures. The point is NOT
  * to reimplement ES; it is that each checklist row's probe executes
  * over an actual HTTP round trip against external-version semantics the
  * stub enforces independently of the adapter, so a contract drift in
  * either half fails a wire-level test instead of a unit test of itself.
  *
  * Versioning rules enforced (the ES `external` contract):
  *   - index: applied iff version > current (live OR un-GC'd tombstone);
  *     else 409.
  *   - delete: applied iff version > current; records a TOMBSTONE with
  *     that version and the (injectable) clock time.
  *   - tombstones older than `gcDeletesMs` are dropped lazily — after
  *     GC a stale index op no longer sees the tombstone's version and
  *     RESURRECTS the key (the E3 demonstration).
  */
class StubEsServer {
  import com.sun.net.httpserver.{HttpExchange, HttpServer}

  final case class Doc(version: Long, source: String, live: Boolean,
    deletedAtMs: Long)

  private val indices =
    new java.util.concurrent.ConcurrentHashMap[String,
      scala.collection.mutable.Map[String, Doc]]()
  private val closed = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private val mappings =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Injectable clock (ms) so gc_deletes horizons are testable without
    * sleeping. */
  val clockMs = new java.util.concurrent.atomic.AtomicLong(1000000L)

  /** Tombstone retention horizon (ms) — the `index.gc_deletes` knob. */
  @volatile var gcDeletesMs: Long = Long.MaxValue

  def close(index: String): Unit = closed.add(index): Unit
  def open(index: String): Unit = closed.remove(index): Unit

  def docs(index: String): Map[String, Doc] =
    state(index).synchronized { state(index).toMap }

  def liveCount(index: String): Int =
    docs(index).count { case (_, d) => d.live }

  private def state(index: String) =
    indices.computeIfAbsent(index, _ => scala.collection.mutable.Map())

  private def gc(m: scala.collection.mutable.Map[String, Doc]): Unit = {
    val horizon = clockMs.get() - gcDeletesMs
    val dead = m.collect {
      case (id, d) if !d.live && d.deletedAtMs <= horizon => id }
    dead.foreach(m.remove(_): Unit)
  }

  /** One bulk item under external versioning; returns the HTTP item
    * status. */
  private def applyOp(index: String, op: String, id: String, version: Long,
      source: String): Int = {
    val m = state(index)
    m.synchronized {
      gc(m)
      val cur = m.get(id)
      if (cur.exists(_.version >= version)) 409
      else op match {
        case "index" =>
          val created = cur.isEmpty || !cur.get.live
          m(id) = Doc(version, source, live = true, deletedAtMs = 0L)
          if (created) 201 else 200
        case "delete" =>
          m(id) = Doc(version, "", live = false, deletedAtMs = clockMs.get())
          200
        case other => sys.error(s"stub-es: unknown bulk op '$other'")
      }
    }
  }

  private var server: HttpServer = _

  def url: String =
    s"http://127.0.0.1:${server.getAddress.getPort}"

  private def respond(x: HttpExchange, status: Int, body: String): Unit = {
    val b = body.getBytes("UTF-8")
    x.sendResponseHeaders(status, b.length)
    x.getResponseBody.write(b)
    x.close()
  }

  def start(): StubEsServer = {
    server = HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (x: HttpExchange) => {
      try route(x)
      catch { case e: Exception =>
        respond(x, 500, s"""{"error":"${e.getMessage}"}""")
      }
    })
    server.start()
    this
  }

  def stop(): Unit = server.stop(0)

  private def route(x: HttpExchange): Unit = {
    val path = x.getRequestURI.getPath.stripPrefix("/").split("/").toSeq
    val body = new String(x.getRequestBody.readAllBytes(), "UTF-8")
    (x.getRequestMethod, path) match {
      case ("POST", Seq(index, "_bulk")) =>
        if (closed.contains(index)) {
          respond(x, 503, s"""{"error":"index $index is closed"}""")
          return
        }
        val lines = body.split("\n").filter(_.nonEmpty).iterator
        val items = Seq.newBuilder[String]
        var errors = false
        while (lines.hasNext) {
          val meta = lines.next()
          import org.json4s._
          val j = jackson.JsonMethods.parse(meta)
          val (op, inner) = (j \ "index", j \ "delete") match {
            case (JNothing, d) => ("delete", d)
            case (i, _) => ("index", i)
          }
          val id = inner \ "_id" match { case JString(s) => s
            case other => sys.error(s"bulk meta without _id: $other") }
          val ver = inner \ "version" match { case JInt(v) => v.toLong
            case other => sys.error(s"bulk meta without version: $other") }
          val vt = inner \ "version_type" match { case JString(s) => s
            case _ => "" }
          val src = if (op == "index") lines.next() else ""
          val status =
            if (vt != "external")
              400 // the stub REQUIRES external versioning — E1's setting
            else applyOp(index, op, id, ver, src)
          if (status >= 400) errors = true
          val err = if (status == 409)
            ""","error":{"type":"version_conflict_engine_exception"}"""
          else if (status == 400)
            ""","error":{"type":"mapper_parsing_exception","reason":"version_type must be external"}"""
          else ""
          items += s"""{"$op":{"_id":"$id","status":$status$err}}"""
        }
        respond(x, 200,
          s"""{"errors":$errors,"items":[${items.result().mkString(",")}]}""")
      case ("GET", Seq(index, "_doc", id)) =>
        docs(index).get(id).filter(_.live) match {
          case Some(d) => respond(x, 200,
            s"""{"_id":"$id","_version":${d.version},"found":true,"_source":${d.source}}""")
          case None => respond(x, 404, s"""{"_id":"$id","found":false}""")
        }
      case ("GET", Seq(index, "_mapping")) =>
        Option(mappings.get(index)) match {
          case Some(m) => respond(x, 200, m)
          case None => respond(x, 404, s"""{"error":"no mapping for $index"}""")
        }
      case ("PUT", Seq(index, "_mapping")) =>
        mappings.put(index, body)
        respond(x, 200, """{"acknowledged":true}""")
      case other =>
        respond(x, 400, s"""{"error":"stub-es: unhandled route $other"}""")
    }
  }
}
