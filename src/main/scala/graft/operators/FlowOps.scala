package graft.operators

import graft.Q
import graft.Dsl.usEvents
import graft.flow.Flow

/** Declared keys for the declarative flow assembly (graft.flow.Flow): each
  * key's pipeline arrives as a JSON instruction list, is compiled into a
  * DataFrame chain, and is oracled against the SQL a hand-written twin
  * would run — the DuckDB gate proves compiled ≡ hand-written on VALUES,
  * FlowSpec proves it on PLANS (pushdown reaches the scan through the
  * compiled chain).
  */
object FlowOps {

  /** Star join + agg arriving as config: filter → two joins → money-
    * disciplined agg → total order. */
  val starAggSpec: String =
    """{"steps":[
      |{"op":"read","table":"customer"},
      |{"op":"filter","where":"c_mktsegment = 'BUILDING'"},
      |{"op":"join","right":{"steps":[{"op":"read","table":"orders"}]},
      | "on":"c_custkey = o_custkey"},
      |{"op":"join","right":{"steps":[{"op":"read","table":"lineitem"}]},
      | "on":"o_orderkey = l_orderkey"},
      |{"op":"agg","groupBy":["o_orderpriority"],
      | "aggs":["CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue",
      |         "count(*) AS n_lineitems"]},
      |{"op":"orderBy","by":["o_orderpriority"]}
      |]}""".stripMargin

  /** Corpus-curation pipeline arriving as config: quality filter → derived
    * token count → banding → per-(lang, band) rollup. */
  val docPipelineSpec: String =
    """{"steps":[
      |{"op":"read","table":"documents"},
      |{"op":"filter","where":"length(text) >= 100"},
      |{"op":"derive","as":"n_tokens","expr":"CAST(size(split(text, ' ')) AS BIGINT)"},
      |{"op":"derive","as":"band","expr":"CASE WHEN n_tokens >= 60 THEN 'long' WHEN n_tokens >= 20 THEN 'mid' ELSE 'short' END"},
      |{"op":"agg","groupBy":["lang","band"],
      | "aggs":["count(*) AS n_docs","CAST(sum(n_tokens) AS BIGINT) AS total_tokens"]},
      |{"op":"orderBy","by":["lang","band"]}
      |]}""".stripMargin

  /** Windowed top-N arriving as config — window functions need no special
    * instruction, they ride `derive`'s SQL expression. */
  val windowTopnSpec: String =
    """{"steps":[
      |{"op":"read","table":"events"},
      |{"op":"derive","as":"rn","expr":"row_number() over (partition by user_id order by ts, event_id)"},
      |{"op":"filter","where":"rn <= 3"},
      |{"op":"select","columns":["user_id","CAST(rn AS BIGINT) AS rn","event_id","event_type"]},
      |{"op":"orderBy","by":["user_id","rn"]}
      |]}""".stripMargin

  val defs: Seq[(String, Q)] = Seq(

    "flow_compiled_star_agg" -> Q(
      (s, d) => Flow.compile(s, d, starAggSpec),
      "SELECT o.o_orderpriority, " +
        "CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount) " +
        "AS DECIMAL(18,4))) AS DOUBLE) AS revenue, " +
        "COUNT(*) AS n_lineitems " +
        "FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey " +
        "JOIN lineitem l ON o.o_orderkey = l.l_orderkey " +
        "WHERE c.c_mktsegment = 'BUILDING' " +
        "GROUP BY 1 ORDER BY o_orderpriority"),

    "flow_compiled_doc_pipeline" -> Q(
      (s, d) => Flow.compile(s, d, docPipelineSpec),
      "WITH d AS (SELECT lang, " +
        "length(string_split(text, ' '))::BIGINT AS n_tokens " +
        "FROM documents WHERE length(text) >= 100), " +
        "b AS (SELECT lang, CASE WHEN n_tokens >= 60 THEN 'long' " +
        "WHEN n_tokens >= 20 THEN 'mid' ELSE 'short' END AS band, n_tokens " +
        "FROM d) " +
        "SELECT lang, band, COUNT(*)::BIGINT AS n_docs, " +
        "SUM(n_tokens)::BIGINT AS total_tokens " +
        "FROM b GROUP BY 1, 2 ORDER BY lang, band"),

    "flow_compiled_window_topn" -> Q(
      (s, d) => Flow.compile(s, d, windowTopnSpec),
      usEvents("SELECT user_id, rn, event_id, event_type FROM (" +
        "SELECT user_id, event_id, event_type, " +
        "row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn " +
        "FROM events) t WHERE rn <= 3 ORDER BY user_id, rn")),
  )
}
