package graft

/** Registry-level invariants + every declared query runs on sf0.001.
  * Oracle VALUE parity is checked by tools/check.py against DuckDB (the
  * graded gate); these specs guard the Scala side. */
class OperatorRegistrySpec extends SparkSpec {

  test("every oracle key has a query twin") {
    val orphan = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphan.isEmpty, s"oracles without queries: $orphan")
  }

  test("no duplicate query keys across modules") {
    val keys = SparkEntry.all.map(_._1)
    assert(keys.distinct.size == keys.size,
      s"dups: ${keys.groupBy(identity).collect { case (k, v) if v.size > 1 => k }}")
  }

  test("entry returns rows (t1 smoke shape)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("SURVEY.md §2 inventory and SparkEntry stay in sync") {
    val survey = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SURVEY.md")))
    // every backticked key in the §2 tables that looks like an operator key
    val keyPattern = """`([a-z]+(?:_[a-z0-9]+)+)`""".r
    val prefixes = Seq("scan_", "source_", "sink_", "sql_", "project_",
      "filter_", "drop_", "join_", "sort_", "topk_", "set_", "agg_", "win_",
      "fn_", "evt_", "stream_", "llm_", "mm_", "sub_", "sample_", "scale_",
      "dq_", "flow_", "graph_")
    val surveyKeys = keyPattern.findAllMatchIn(survey).map(_.group(1))
      .filter(k => prefixes.exists(k.startsWith)).toSet -
      // narrative function mentions that are not declared keys
      "sort_array"
    val declared = SparkEntry.queries.keySet
    val undeclared = surveyKeys -- declared
    assert(undeclared.isEmpty, s"in SURVEY §2 but not implemented: $undeclared")
    val undocumented = declared -- surveyKeys
    assert(undocumented.isEmpty, s"implemented but missing from SURVEY: $undocumented")
  }

  // Every declared query must execute; join_anti legitimately returns 0
  // rows at sf0.001 (all customers have orders).
  private val mayBeEmpty = Set("join_anti")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"query runs: $name") {
      val n = fn(spark, sf001).count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned 0 rows")
    }
  }
}
