package graft.flow

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Named-flow registry — the reference's management path [PK: eventstreams
  * named flows; Logstash pipelines.yml]: flow specs live as `<name>.json`
  * files in a registry directory and run BY NAME. Hot-update is re-read on
  * next run: every `run` loads the file fresh (batch semantics — a spec
  * edit lands on the next invocation, no daemon to signal), so operating a
  * deployed flow is editing a JSON file, never a code change.
  *
  * The directory defaults to `conf/flows` under the process CWD and is
  * overridable per session via `spark.graft.flow.dir` — tests point it at
  * scratch dirs; a cluster deployment points it at shared storage the
  * driver can read (specs are driver-side plan construction only, so the
  * executors never need the registry).
  */
object FlowRegistry {

  def registryDir(s: SparkSession): String =
    s.conf.getOption("spark.graft.flow.dir").getOrElse("conf/flows")

  /** Flow names available right now (sorted, for stable error text). */
  def available(s: SparkSession): Seq[String] = {
    val d = new java.io.File(registryDir(s))
    Option(d.listFiles()).toSeq.flatten
      .filter(f => f.isFile && f.getName.endsWith(".json"))
      .map(_.getName.stripSuffix(".json")).sorted.toSeq
  }

  /** Read a named spec, failing loudly — an unknown name must list what IS
    * deployed, not surface as a file-not-found stack. */
  def load(s: SparkSession, name: String): String = {
    require(name.matches("[A-Za-z0-9_-]+"),
      s"flow registry: name must be [A-Za-z0-9_-]+, got '$name'")
    val f = new java.io.File(registryDir(s), s"$name.json")
    if (!f.isFile)
      sys.error(s"flow registry: no flow named '$name' in " +
        s"${registryDir(s)} — available: " +
        (if (available(s).isEmpty) "(none)" else available(s).mkString(", ")))
    new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
  }

  /** Run a named single-output flow against the sf-dir tables. */
  def run(s: SparkSession, dataDir: String, name: String): DataFrame =
    Flow.compile(s, dataDir, load(s, name))

  /** Run a named routing flow (final step `route`). */
  def runRoutes(s: SparkSession, dataDir: String,
      name: String): Seq[(String, DataFrame)] =
    Flow.routes(s, dataDir, load(s, name))
}
