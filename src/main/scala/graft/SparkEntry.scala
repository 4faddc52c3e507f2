package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{AggWindowOps, DedupOps, DqOps, EventOps, FlowOps, GraphOps, LlmOps, MultimodalOps, RelationalOps, ScaleOps, SubqueryOps, TextOps}
import graft.functions.FnOps

/** Driver contract — see /root/repo/SURVEY.md §2 (operator inventory) and
  * §7.4 (cross-engine determinism rules). Each operator module colocates the
  * Spark query with its DuckDB oracle twin.
  */
object SparkEntry {

  /** All declared operators, in SURVEY.md §2 order. */
  val all: Seq[(String, Q)] =
    RelationalOps.defs ++ SubqueryOps.defs ++ AggWindowOps.defs ++
      FnOps.defs ++ EventOps.defs ++ LlmOps.defs ++ TextOps.defs ++
      DedupOps.defs ++ MultimodalOps.defs ++ ScaleOps.defs ++ DqOps.defs ++
      FlowOps.defs ++ GraphOps.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q1 shape (SURVEY §7.2): scan → filter → hash agg → sort. */
  def entry(spark: SparkSession): DataFrame =
    queries("agg_group_sums")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (k, q) => k -> q.fn }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.collect { case (k, Q(_, Some(sql))) => k -> sql }.toMap
}
