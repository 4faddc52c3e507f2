package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, T}
import graft.Dsl.{dec, usEvents}
import graft.operators.PinSyntax._

/** Data-quality family: the profiling + expectation checks every pipeline
  * runs before trusting a table (the dbt-test / expectations shape). Not in
  * the reference's [PK] operator list but a first-class need of the 100 TB
  * north star: a curation pipeline that cannot assert its inputs' shape
  * ships silent corruption downstream.
  *
  * Scale notes: `dq_profile` is deliberately ONE corpus pass — the multi
  * count-distinct plans through Spark's Expand (a row multiply before the
  * shuffle), the standard price of an exact single-pass profile; for much
  * wider tables swap `count_distinct` for `approx_count_distinct` and the
  * Expand disappears. The unpivot-to-5-rows step reads a localCheckpoint
  * of the 1-row aggregate: WITHOUT it, column pruning specializes each
  * union branch into its own leaner aggregate (five corpus scans, and no
  * ReusedExchange either — the branches stop being canonically equal; the
  * measured failure mode, not a guess). `dq_checks` composes scalar
  * aggregates and an FK anti-join, each the already-proven shape.
  */
object DqOps {

  /** `ts` profiles in epoch SECONDS: epoch µs (~1.7e18) exceeds double's
    * exact-integer range (2^53) and would silently round in the num stats;
    * seconds (~1.7e9) are exact. */
  val defs: Seq[(String, Q)] = Seq(

    "dq_profile" -> Q(
      (s, d) => {
        val a0 = T(s, d, "events").agg(
          count(lit(1)).as("n"),
          // per column: non-null count, exact distinct, min, max
          count(col("event_id")).as("nn_eid"),
          count_distinct(col("event_id")).as("nd_eid"),
          min(col("event_id")).as("mn_eid"), max(col("event_id")).as("mx_eid"),
          count(col("user_id")).as("nn_uid"),
          count_distinct(col("user_id")).as("nd_uid"),
          min(col("user_id")).as("mn_uid"), max(col("user_id")).as("mx_uid"),
          count(col("value")).as("nn_val"),
          count_distinct(col("value")).as("nd_val"),
          min(col("value")).as("mn_val"), max(col("value")).as("mx_val"),
          count(col("event_type")).as("nn_typ"),
          count_distinct(col("event_type")).as("nd_typ"),
          min(col("event_type")).as("mn_typ"), max(col("event_type")).as("mx_typ"),
          count(col("ts")).as("nn_ts"),
          count_distinct(unix_micros(col("ts"))).as("nd_ts"),
          min(expr("unix_micros(ts) div 1000000")).as("mn_ts"),
          max(expr("unix_micros(ts) div 1000000")).as("mx_ts"))
        // one corpus pass: pin the 1-row profile before the 5-way unpivot
        // (r18: LAZY — the five branches dedupe through the checkpoint
        // cache inside the one consuming job; no separate pin job)
        val a = a0.pinnedLazy
        val nullStr = lit(null).cast("string")
        def num(name: String, nn: String, nd: String, mn: String, mx: String) =
          a.select(lit(name).as("column_name"), col("n").as("n_rows"),
            (col("n") - col(nn)).as("n_null"), col(nd).as("n_distinct"),
            col(mn).cast("double").as("min_num"),
            col(mx).cast("double").as("max_num"),
            nullStr.as("min_str"), nullStr.as("max_str"))
        val str = a.select(lit("event_type").as("column_name"),
          col("n").as("n_rows"), (col("n") - col("nn_typ")).as("n_null"),
          col("nd_typ").as("n_distinct"),
          lit(null).cast("double").as("min_num"),
          lit(null).cast("double").as("max_num"),
          col("mn_typ").as("min_str"), col("mx_typ").as("max_str"))
        num("event_id", "nn_eid", "nd_eid", "mn_eid", "mx_eid")
          .unionAll(num("user_id", "nn_uid", "nd_uid", "mn_uid", "mx_uid"))
          .unionAll(num("value", "nn_val", "nd_val", "mn_val", "mx_val"))
          .unionAll(num("ts", "nn_ts", "nd_ts", "mn_ts", "mx_ts"))
          .unionAll(str)
          .orderBy(col("column_name"))
      },
      graft.Dsl.usEvents("WITH a AS (SELECT COUNT(*) AS n, " +
        "COUNT(event_id) AS nn_eid, COUNT(DISTINCT event_id) AS nd_eid, " +
        "MIN(event_id) AS mn_eid, MAX(event_id) AS mx_eid, " +
        "COUNT(user_id) AS nn_uid, COUNT(DISTINCT user_id) AS nd_uid, " +
        "MIN(user_id) AS mn_uid, MAX(user_id) AS mx_uid, " +
        "COUNT(value) AS nn_val, COUNT(DISTINCT value) AS nd_val, " +
        "MIN(value) AS mn_val, MAX(value) AS mx_val, " +
        "COUNT(event_type) AS nn_typ, COUNT(DISTINCT event_type) AS nd_typ, " +
        "MIN(event_type) AS mn_typ, MAX(event_type) AS mx_typ, " +
        "COUNT(ts) AS nn_ts, COUNT(DISTINCT epoch_us(ts)) AS nd_ts, " +
        "MIN(epoch_us(ts) // 1000000) AS mn_ts, " +
        "MAX(epoch_us(ts) // 1000000) AS mx_ts FROM events) " +
        "SELECT * FROM (" +
        "SELECT 'event_id' AS column_name, n AS n_rows, " +
        "(n - nn_eid)::BIGINT AS n_null, nd_eid AS n_distinct, " +
        "CAST(mn_eid AS DOUBLE) AS min_num, CAST(mx_eid AS DOUBLE) AS max_num, " +
        "CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str " +
        "FROM a " +
        "UNION ALL SELECT 'user_id', n, (n - nn_uid)::BIGINT, nd_uid, " +
        "CAST(mn_uid AS DOUBLE), CAST(mx_uid AS DOUBLE), NULL, NULL FROM a " +
        "UNION ALL SELECT 'value', n, (n - nn_val)::BIGINT, nd_val, " +
        "CAST(mn_val AS DOUBLE), CAST(mx_val AS DOUBLE), NULL, NULL FROM a " +
        "UNION ALL SELECT 'ts', n, (n - nn_ts)::BIGINT, nd_ts, " +
        "CAST(mn_ts AS DOUBLE), CAST(mx_ts AS DOUBLE), NULL, NULL FROM a " +
        "UNION ALL SELECT 'event_type', n, (n - nn_typ)::BIGINT, nd_typ, " +
        "CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), mn_typ, mx_typ FROM a" +
        ") u ORDER BY column_name")),

    // Expectation suite: named checks, measured violation count, boolean
    // verdict — the contract a pipeline gates a publish on. The FK check is
    // the proven anti-join shape; everything else is scalar aggregates.
    "dq_checks" -> Q(
      (s, d) => {
        val e = T(s, d, "events")
        val eidDup = e.agg((count(lit(1)) -
          count_distinct(col("event_id"))).as("measured"))
          .select(lit("event_id_unique").as("check_name"), col("measured"))
        val uidNull = e.agg(sum(when(col("user_id").isNull, 1L)
          .otherwise(0L)).as("measured"))
          .select(lit("user_id_not_null").as("check_name"), col("measured"))
        val valNeg = e.agg(sum(when(col("value") < 0, 1L).otherwise(0L))
          .as("measured"))
          .select(lit("value_non_negative").as("check_name"), col("measured"))
        val orders = T(s, d, "orders")
        val cust = T(s, d, "customer")
        val fkOrphans = orders.join(cust,
            orders("o_custkey") === cust("c_custkey"), "left_anti")
          .agg(count(lit(1)).as("measured"))
          .select(lit("orders_customer_fk").as("check_name"), col("measured"))
        eidDup.unionAll(uidNull).unionAll(valNeg).unionAll(fkOrphans)
          .withColumn("passed", col("measured") === 0L)
          .orderBy(col("check_name"))
      },
      graft.Dsl.usEvents("SELECT check_name, measured, measured = 0 AS passed " +
        "FROM (" +
        "SELECT 'event_id_unique' AS check_name, " +
        "(COUNT(*) - COUNT(DISTINCT event_id))::BIGINT AS measured FROM events " +
        "UNION ALL SELECT 'user_id_not_null', " +
        "SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)::BIGINT FROM events " +
        "UNION ALL SELECT 'value_non_negative', " +
        "SUM(CASE WHEN value < 0 THEN 1 ELSE 0 END)::BIGINT FROM events " +
        "UNION ALL SELECT 'orders_customer_fk', COUNT(*)::BIGINT FROM orders o " +
        "WHERE NOT EXISTS (SELECT 1 FROM customer c " +
        "WHERE c.c_custkey = o.o_custkey)" +
        ") u ORDER BY check_name")),

    // Streaming twin of the expectation suite: per tumbling hour, row count
    // plus violation counts (null user_id, negative value) — the live
    // monitor a pipeline pages on, vs dq_checks' batch gate. Same windowed
    // hash-agg shape as stream_tumbling_agg (watermark bounds state);
    // StreamingSpec pins stream ≡ this twin.
    "stream_dq_monitor" -> Q(
      (s, d) => T(s, d, "events")
        .groupBy(date_trunc("HOUR", col("ts")).as("bucket"))
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("user_id").isNull, 1L).otherwise(0L)).as("n_null_user"),
          sum(when(col("value") < 0, 1L).otherwise(0L)).as("n_neg_value"))
        .orderBy(col("bucket")),
      graft.Dsl.usEvents("SELECT date_trunc('hour', ts) AS bucket, " +
        "COUNT(*) AS n_rows, " +
        "SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)::BIGINT " +
        "AS n_null_user, " +
        "SUM(CASE WHEN value < 0 THEN 1 ELSE 0 END)::BIGINT AS n_neg_value " +
        "FROM events GROUP BY 1 ORDER BY bucket")),

    // DEAD-LETTER ROUTING (round-8 addendum): the quarantine split every
    // ingest pipeline needs — rows that fail the parse gate route to a
    // dead-letter output WITH a reason, instead of poisoning the batch or
    // being dropped silently. The fixture's props are all clean, so the
    // demo synthesizes the raw log line a collector would emit and gives
    // two event types deterministic corruption: 'signup' lines lose their
    // payload field (grok no-match), 'error' lines get ':' → '=' inside
    // the JSON (grok matches, JSON corrupt). [[deadLetter]] returns BOTH
    // frames (parsed + quarantine) — DeadLetterSpec pins the split is a
    // partition; this key publishes the per-reason audit summary the
    // on-call reads. Scale shape: classification is ONE projection pass
    // (regex + JSON probe, all codegen builtins, no UDF), the summary a
    // 3-key hash agg; the quarantine side writes without re-scanning
    // (same classified frame, two filters). On this data every malformed
    // payload is also missing '$.k', so Spark's get_json_object-is-null
    // probe and DuckDB's json_valid-or-missing-key probe agree exactly.
    "dq_dead_letter" -> Q(
      (s, d) => {
        val (_, _, classified) = deadLetter(rawLines(s, d))
        classified.groupBy(col("reason"))
          .agg(count(lit(1)).as("n"),
            min(col("event_id")).as("first_id"),
            max(col("event_id")).as("last_id"))
          .orderBy(col("reason"))
      },
      "WITH raw AS (SELECT event_id, CASE event_type " +
        "WHEN 'signup' THEN event_id::VARCHAR || ' ' || event_type " +
        "WHEN 'error' THEN event_id::VARCHAR || ' ' || event_type || ' ' || " +
        "regexp_replace(props, ':', '=', 'g') " +
        "ELSE event_id::VARCHAR || ' ' || event_type || ' ' || props END " +
        "AS line FROM events), " +
        "cls AS (SELECT event_id, CASE " +
        "WHEN NOT regexp_matches(line, '^\\d+ [a-z]+ \\{.*\\}$') " +
        "THEN 'grok_no_match' " +
        "WHEN NOT json_valid(regexp_extract(line, " +
        "'^\\d+ [a-z]+ (\\{.*\\})$', 1)) OR json_extract(" +
        "regexp_extract(line, '^\\d+ [a-z]+ (\\{.*\\})$', 1), '$.k') IS NULL " +
        "THEN 'corrupt_json' ELSE 'ok' END AS reason FROM raw) " +
        "SELECT reason, COUNT(*)::BIGINT AS n, MIN(event_id) AS first_id, " +
        "MAX(event_id) AS last_id FROM cls GROUP BY 1 ORDER BY reason"),

    // Referential-integrity sweep (round-10): every FK edge of the star
    // schema in ONE report — (edge, child rows, orphans). dq_checks proves
    // one anti-join; this key is the whole-schema version a warehouse gate
    // actually runs nightly. Scale shape: each edge is a LEFT JOIN on the
    // parent KEY COLUMN only; truly dim-sized parents (region 5, nation
    // 25, supplier/part) broadcast under the optimizer's threshold on
    // their own, while fact-sized parents (orders, customer — they grow
    // with sf) take the keyed shuffle join a forced broadcast hint would
    // have turned into an executor OOM at 100 TB. Orphans = COUNT(parent
    // key IS NULL) — no anti-join materialization, and the six edges are
    // independent branches that union at the end (each scans only its own
    // two key columns).
    "dq_referential_integrity" -> Q(
      (s, d) => {
        def edge(name: String, childT: String, childK: String,
            parentT: String, parentK: String) = {
          val c = T(s, d, childT).select(col(childK))
          val p = T(s, d, parentT).select(col(parentK))
          c.join(p, c(childK) === p(parentK), "left")
            .agg(count(lit(1)).as("n_child"),
              sum(when(p(parentK).isNull, 1L).otherwise(0L)).as("n_orphans"))
            .select(lit(name).as("fk_edge"), col("n_child"), col("n_orphans"))
        }
        edge("customer_nation", "customer", "c_nationkey", "nation", "n_nationkey")
          .unionByName(edge("lineitem_orders", "lineitem", "l_orderkey",
            "orders", "o_orderkey"))
          .unionByName(edge("lineitem_part", "lineitem", "l_partkey",
            "part", "p_partkey"))
          .unionByName(edge("lineitem_supplier", "lineitem", "l_suppkey",
            "supplier", "s_suppkey"))
          .unionByName(edge("nation_region", "nation", "n_regionkey",
            "region", "r_regionkey"))
          .unionByName(edge("orders_customer", "orders", "o_custkey",
            "customer", "c_custkey"))
          .orderBy(col("fk_edge"))
      },
      "SELECT fk_edge, n_child, n_orphans FROM (" +
        "SELECT 'customer_nation' AS fk_edge, COUNT(*)::BIGINT AS n_child, " +
        "SUM(CASE WHEN n.n_nationkey IS NULL THEN 1 ELSE 0 END)::BIGINT " +
        "AS n_orphans FROM customer c LEFT JOIN nation n " +
        "ON c.c_nationkey = n.n_nationkey " +
        "UNION ALL SELECT 'lineitem_orders', COUNT(*)::BIGINT, " +
        "SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)::BIGINT " +
        "FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey " +
        "UNION ALL SELECT 'lineitem_part', COUNT(*)::BIGINT, " +
        "SUM(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END)::BIGINT " +
        "FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey " +
        "UNION ALL SELECT 'lineitem_supplier', COUNT(*)::BIGINT, " +
        "SUM(CASE WHEN sp.s_suppkey IS NULL THEN 1 ELSE 0 END)::BIGINT " +
        "FROM lineitem l LEFT JOIN supplier sp ON l.l_suppkey = sp.s_suppkey " +
        "UNION ALL SELECT 'nation_region', COUNT(*)::BIGINT, " +
        "SUM(CASE WHEN r.r_regionkey IS NULL THEN 1 ELSE 0 END)::BIGINT " +
        "FROM nation n LEFT JOIN region r ON n.n_regionkey = r.r_regionkey " +
        "UNION ALL SELECT 'orders_customer', COUNT(*)::BIGINT, " +
        "SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)::BIGINT " +
        "FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey" +
        ") t ORDER BY fk_edge"),

    // Distribution-drift detection (round-10) — the MLOps DQ gate: has
    // the value distribution shifted between a reference slice and a
    // current slice? (Here: event_id parity splits the fixture into two
    // deterministic halves; production points this at last-week vs
    // today.) Values bucket into deciles of the fixed [0, 250) domain;
    // the drift statistic is CHI-SQUARE, Σ(o−e)²/e — chosen over the
    // fashionable PSI precisely because PSI needs ln(), whose libm
    // rounding may differ between a JVM and DuckDB, while chi-square is
    // one rational per bucket. Overflow discipline (r11): the raw products
    // ref_t·cur_n reach 2⁶³ once totals hit ~1e10 rows, so the difference
    // (ref_t·cur_n − cur_t·ref_n) and the denominator run in 128-bit-exact
    // space — DECIMAL(38,0) here, HUGEINT in the oracle — good to ~1e11
    // rows per side; both are then cast to DOUBLE (round-to-nearest in
    // both engines) and the square + division are single IEEE double ops
    // both engines compute bit-identically. One scan, one 10-row pivot agg.
    "dq_chi_square_drift" -> Q(
      (s, d) => {
        val b = T(s, d, "events")
          .select((col("event_id") % 2 === 0).as("is_ref"),
            least(floor(col("value") / 25.0).cast("long"), lit(9L))
              .as("bucket"))
        val counts = b.groupBy(col("bucket"))
          .agg(sum(when(col("is_ref"), 1L).otherwise(0L)).as("ref_n"),
            sum(when(!col("is_ref"), 1L).otherwise(0L)).as("cur_n"))
        val tot = counts.agg(sum(col("ref_n")).as("ref_t"),
          sum(col("cur_n")).as("cur_t"))
        val d19 = org.apache.spark.sql.types.DecimalType(19, 0)
        def w(c: String) = col(c).cast(d19)
        counts.crossJoin(broadcast(tot))
          .select(col("bucket"), col("ref_n"), col("cur_n"),
            // scaled difference² / expected: difference and denominator in
            // exact DECIMAL(38,0), ONE double square + ONE double division
            ((w("ref_t") * w("cur_n") - w("cur_t") * w("ref_n"))
              .cast("double") *
              (w("ref_t") * w("cur_n") - w("cur_t") * w("ref_n"))
                .cast("double"))
              ./((w("ref_t") * w("cur_t") *
                (w("ref_n") + w("cur_n"))).cast("double"))
              .as("chi2_term"))
          .orderBy(col("bucket"))
      },
      usEvents("WITH b AS (SELECT event_id % 2 = 0 AS is_ref, " +
        "LEAST(CAST(floor(value / 25.0) AS BIGINT), 9) AS bucket " +
        "FROM events), " +
        "c AS (SELECT bucket, " +
        "SUM(CASE WHEN is_ref THEN 1 ELSE 0 END)::BIGINT AS ref_n, " +
        "SUM(CASE WHEN NOT is_ref THEN 1 ELSE 0 END)::BIGINT AS cur_n " +
        "FROM b GROUP BY 1), " +
        "t AS (SELECT SUM(ref_n)::BIGINT AS ref_t, " +
        "SUM(cur_n)::BIGINT AS cur_t FROM c) " +
        "SELECT bucket, ref_n, cur_n, " +
        "CAST(ref_t::HUGEINT * cur_n - cur_t::HUGEINT * ref_n AS DOUBLE) * " +
        "CAST(ref_t::HUGEINT * cur_n - cur_t::HUGEINT * ref_n AS DOUBLE) / " +
        "CAST(ref_t::HUGEINT * cur_t * (ref_n + cur_n) AS DOUBLE) AS chi2_term " +
        "FROM c CROSS JOIN t ORDER BY bucket")),

    // A/B-test significance gate (round-11) — the experimentation readout
    // every event platform ships: users split into two arms (user_id
    // parity — the deterministic assignment a real platform hashes), and
    // per event type the pooled two-proportion z-test decides whether the
    // arms' rates differ at α=0.05. The whole test is ONE cross-multiplied
    // inequality — z² > 3.8416 ⇔ 10⁴·(c1·n2−c2·n1)²·N > 38416·n1·n2·c·(N−c)
    // — with the difference and n1·n2 exact in DECIMAL(38,0)/HUGEINT and
    // the comparison in IEEE doubles built by the IDENTICAL left-assoc
    // expression tree on both engines (the chi-square discipline; exact
    // past 1e9-event arms). Rate deltas ship as integer micro-units. One
    // scan, one keyed agg + one broadcast 1-row arms frame.
    "dq_ab_significance" -> Q(
      (s, d) => {
        val d19 = org.apache.spark.sql.types.DecimalType(19, 0)
        val ev = T(s, d, "events")
          .select((col("user_id") % 2 === 0).as("arm_a"), col("event_type"))
        val arms = ev.agg(
          sum(when(col("arm_a"), 1L).otherwise(0L)).as("n1"),
          sum(when(!col("arm_a"), 1L).otherwise(0L)).as("n2"))
        ev.groupBy(col("event_type"))
          .agg(sum(when(col("arm_a"), 1L).otherwise(0L)).as("c1"),
            sum(when(!col("arm_a"), 1L).otherwise(0L)).as("c2"))
          .crossJoin(broadcast(arms))
          .withColumn("diff_d",
            (col("c1").cast(d19) * col("n2").cast(d19) -
              col("c2").cast(d19) * col("n1").cast(d19)).cast("double"))
          .select(col("event_type"), col("c1"), col("n1"), col("c2"), col("n2"),
            (expr("(c1 * 1000000) div n1") - expr("(c2 * 1000000) div n2"))
              .as("rate_diff_micro"),
            (lit(10000.0) * col("diff_d") * col("diff_d") *
              (col("n1") + col("n2")).cast("double") >
              lit(38416.0) *
                (col("n1").cast(d19) * col("n2").cast(d19)).cast("double") *
                (col("c1") + col("c2")).cast("double") *
                (col("n1") + col("n2") - col("c1") - col("c2")).cast("double"))
              .as("significant"))
          .orderBy(col("event_type"))
      },
      usEvents("WITH ev AS (SELECT user_id % 2 = 0 AS arm_a, event_type " +
        "FROM events), " +
        "arms AS (SELECT SUM(CASE WHEN arm_a THEN 1 ELSE 0 END)::BIGINT AS n1, " +
        "SUM(CASE WHEN NOT arm_a THEN 1 ELSE 0 END)::BIGINT AS n2 FROM ev), " +
        "c AS (SELECT event_type, " +
        "SUM(CASE WHEN arm_a THEN 1 ELSE 0 END)::BIGINT AS c1, " +
        "SUM(CASE WHEN NOT arm_a THEN 1 ELSE 0 END)::BIGINT AS c2 " +
        "FROM ev GROUP BY 1) " +
        "SELECT event_type, c1, n1, c2, n2, " +
        "(c1 * 1000000) // n1 - (c2 * 1000000) // n2 AS rate_diff_micro, " +
        "10000.0 * CAST(c1::HUGEINT * n2 - c2::HUGEINT * n1 AS DOUBLE) * " +
        "CAST(c1::HUGEINT * n2 - c2::HUGEINT * n1 AS DOUBLE) * " +
        "CAST(n1 + n2 AS DOUBLE) > " +
        "38416.0 * CAST(n1::HUGEINT * n2 AS DOUBLE) * " +
        "CAST(c1 + c2 AS DOUBLE) * CAST(n1 + n2 - c1 - c2 AS DOUBLE) " +
        "AS significant " +
        "FROM c CROSS JOIN arms ORDER BY event_type")),

    // Benford first-digit audit (round-11) — the forensic-accounting DQ
    // screen: natural multi-scale quantities follow log10(1+1/d) first-
    // digit frequencies, and a synthetic/tampered column does not. The
    // expected distribution ships as EXACT integer 1e5-scale constants
    // (30103+17609+…+4576 = 100000 — no log() crosses either engine), the
    // per-digit chi² term follows the dq_chi_square_drift overflow
    // discipline (difference exact in DECIMAL(38,0)/HUGEINT, square +
    // divide as identical left-assoc double trees — safe past 1e10 rows),
    // and the fixture's uniform `value` column rightly FAILS the law
    // (large terms), which is the screen's point. One scan, 9-row output.
    "dq_benford" -> Q(
      (s, d) => {
        val d19 = org.apache.spark.sql.types.DecimalType(19, 0)
        val exp = typedLit(Map(
          "1" -> 30103L, "2" -> 17609L, "3" -> 12494L, "4" -> 9691L,
          "5" -> 7918L, "6" -> 6695L, "7" -> 5799L, "8" -> 5115L,
          "9" -> 4576L))
        val counts = T(s, d, "events")
          .filter(col("value") >= 1.0)
          .select(substring(expr("cast(cast(floor(value) as bigint) as string)"),
            1, 1).as("digit"))
          .groupBy(col("digit")).agg(count(lit(1)).as("n_obs"))
          .withColumn("exp_100k", element_at(exp, col("digit")))
        val tot = counts.agg(sum(col("n_obs")).as("total"))
        counts.crossJoin(broadcast(tot))
          .select(col("digit"), col("n_obs"), col("exp_100k"), col("total"),
            ((col("n_obs").cast(d19) * lit(100000L).cast(d19) -
              col("total").cast(d19) * col("exp_100k").cast(d19))
              .cast("double") *
              (col("n_obs").cast(d19) * lit(100000L).cast(d19) -
                col("total").cast(d19) * col("exp_100k").cast(d19))
                .cast("double"))
              ./(lit(100000.0) * col("total").cast("double") *
                col("exp_100k").cast("double"))
              .as("chi2_term"))
          .orderBy(col("digit"))
      },
      usEvents("WITH c AS (SELECT substr((floor(value)::BIGINT)::VARCHAR, 1, 1) " +
        "AS digit, COUNT(*)::BIGINT AS n_obs FROM events WHERE value >= 1.0 " +
        "GROUP BY 1), " +
        "e AS (SELECT digit, n_obs, CASE digit WHEN '1' THEN 30103 " +
        "WHEN '2' THEN 17609 WHEN '3' THEN 12494 WHEN '4' THEN 9691 " +
        "WHEN '5' THEN 7918 WHEN '6' THEN 6695 WHEN '7' THEN 5799 " +
        "WHEN '8' THEN 5115 WHEN '9' THEN 4576 END::BIGINT AS exp_100k " +
        "FROM c), " +
        "t AS (SELECT SUM(n_obs)::BIGINT AS total FROM e) " +
        "SELECT digit, n_obs, exp_100k, total, " +
        "CAST(n_obs::HUGEINT * 100000 - total::HUGEINT * exp_100k AS DOUBLE) * " +
        "CAST(n_obs::HUGEINT * 100000 - total::HUGEINT * exp_100k AS DOUBLE) / " +
        "(100000.0 * CAST(total AS DOUBLE) * CAST(exp_100k AS DOUBLE)) " +
        "AS chi2_term " +
        "FROM e CROSS JOIN t ORDER BY digit")),

    // Group-sequential experiment monitoring (round-12) — the "peek during
    // the run" readout real platforms ship next to the fixed-horizon gate:
    // K=4 interim looks over the event timeline (equal µs quarters between
    // the corpus min/max ts — one integer division assigns the look), each
    // look testing the CUMULATIVE two-proportion statistic against an
    // O'Brien-Fleming-shaped boundary z_k² = z_K²·K/k, stricter early. The
    // boundary ships as EXACT integers — 163864 div k at 10⁴ scale
    // (z_K = 2.024, the textbook OBF final look) — and the test is the
    // dq_ab_significance cross-multiplied inequality with crit_k in place
    // of 38416: difference and products exact in DECIMAL(38,0)/HUGEINT,
    // identical left-assoc double trees both engines. first_crossed_look
    // rides an unpartitioned window over the |K|-row frame (4 rows — not
    // a scale risk). One scan + one keyed agg; the min/max frame is the
    // standard broadcast 1-row scalar.
    "dq_sequential_probe" -> Q(
      (s, d) => {
        val d19 = org.apache.spark.sql.types.DecimalType(19, 0)
        val evts = T(s, d, "events")
        val mm = evts.agg(min(unix_micros(col("ts"))).as("mn"),
          max(unix_micros(col("ts"))).as("mx"))
        val lk = evts
          .select((col("user_id") % 2 === 0).as("arm_a"),
            (col("event_type") === "purchase").as("conv"),
            unix_micros(col("ts")).as("eus"))
          .crossJoin(broadcast(mm))
          .withColumn("look",
            expr("1 + ((eus - mn) * 4) div (mx - mn + 1)"))
          .groupBy(col("look"))
          .agg(sum(when(col("arm_a"), 1L).otherwise(0L)).as("dn1"),
            sum(when(!col("arm_a"), 1L).otherwise(0L)).as("dn2"),
            sum(when(col("arm_a") && col("conv"), 1L).otherwise(0L)).as("dc1"),
            sum(when(!col("arm_a") && col("conv"), 1L).otherwise(0L)).as("dc2"))
        val cumW = Window.orderBy(col("look"))
          .rowsBetween(Window.unboundedPreceding, 0)
        val cum = lk.select(col("look"),
            sum(col("dn1")).over(cumW).as("n1"),
            sum(col("dn2")).over(cumW).as("n2"),
            sum(col("dc1")).over(cumW).as("c1"),
            sum(col("dc2")).over(cumW).as("c2"))
          .withColumn("crit_e4", expr("163864 div look").cast("long"))
          .withColumn("diff_d",
            (col("c1").cast(d19) * col("n2").cast(d19) -
              col("c2").cast(d19) * col("n1").cast(d19)).cast("double"))
          .withColumn("crossed",
            lit(10000.0) * col("diff_d") * col("diff_d") *
              (col("n1") + col("n2")).cast("double") >
              col("crit_e4").cast("double") *
                (col("n1").cast(d19) * col("n2").cast(d19)).cast("double") *
                (col("c1") + col("c2")).cast("double") *
                (col("n1") + col("n2") - col("c1") - col("c2")).cast("double"))
        cum.select(col("look"), col("n1"), col("c1"), col("n2"), col("c2"),
            col("crit_e4"), col("crossed"),
            min(when(col("crossed"), col("look"))).over(
              Window.rowsBetween(Window.unboundedPreceding,
                Window.unboundedFollowing)).as("first_crossed_look"))
          .orderBy(col("look"))
      },
      usEvents("WITH mm AS (SELECT epoch_us(MIN(ts)) AS mn, " +
        "epoch_us(MAX(ts)) AS mx FROM events), " +
        "ev AS (SELECT user_id % 2 = 0 AS arm_a, " +
        "event_type = 'purchase' AS conv, " +
        "1 + ((epoch_us(ts) - mn) * 4) // (mx - mn + 1) AS look " +
        "FROM events CROSS JOIN mm), " +
        "lk AS (SELECT look, " +
        "SUM(CASE WHEN arm_a THEN 1 ELSE 0 END)::BIGINT AS dn1, " +
        "SUM(CASE WHEN NOT arm_a THEN 1 ELSE 0 END)::BIGINT AS dn2, " +
        "SUM(CASE WHEN arm_a AND conv THEN 1 ELSE 0 END)::BIGINT AS dc1, " +
        "SUM(CASE WHEN NOT arm_a AND conv THEN 1 ELSE 0 END)::BIGINT AS dc2 " +
        "FROM ev GROUP BY 1), " +
        "cum AS (SELECT look, " +
        "SUM(dn1) OVER (ORDER BY look)::BIGINT AS n1, " +
        "SUM(dn2) OVER (ORDER BY look)::BIGINT AS n2, " +
        "SUM(dc1) OVER (ORDER BY look)::BIGINT AS c1, " +
        "SUM(dc2) OVER (ORDER BY look)::BIGINT AS c2 FROM lk), " +
        "t AS (SELECT look, n1, c1, n2, c2, " +
        "(163864 // look)::BIGINT AS crit_e4, " +
        "10000.0 * CAST(c1::HUGEINT * n2 - c2::HUGEINT * n1 AS DOUBLE) * " +
        "CAST(c1::HUGEINT * n2 - c2::HUGEINT * n1 AS DOUBLE) * " +
        "CAST(n1 + n2 AS DOUBLE) > " +
        "CAST(163864 // look AS DOUBLE) * " +
        "CAST(n1::HUGEINT * n2 AS DOUBLE) * CAST(c1 + c2 AS DOUBLE) * " +
        "CAST(n1 + n2 - c1 - c2 AS DOUBLE) AS crossed FROM cum) " +
        "SELECT look, n1, c1, n2, c2, crit_e4, crossed, " +
        "MIN(CASE WHEN crossed THEN look END) OVER ()::BIGINT " +
        "AS first_crossed_look FROM t ORDER BY look")),

    // Cross-table reconciliation (round-10) — the ledger-tieout DQ class:
    // does the rolled-up fact tie to the header? Per order, lineitem gross
    // revenue (DECIMAL-exact) vs o_totalprice, bucketed into a one-row
    // tieout report (n matched within tolerance / n above / n below /
    // total abs drift). TPC-H-style synthetic headers do NOT tie to their
    // lines, which is exactly what the report shape must surface; the
    // tolerance (1.0) and all comparisons run in DECIMAL so both engines
    // bucket identically. Scale: one keyed agg on l_orderkey (the fact
    // table's natural key — map-side partials), one broadcast-sized join
    // against headers at dim scale... orders is fact-sized, so this is the
    // standard shuffle-on-key join; the report is a scalar aggregate.
    "dq_reconcile_orders" -> Q(
      (s, d) => {
        val li = T(s, d, "lineitem")
          .groupBy(col("l_orderkey"))
          .agg(sum(dec(col("l_extendedprice")) *
            (lit(1).cast(graft.Dsl.Money) - dec(col("l_discount"))))
            .as("line_rev"))
        val o = T(s, d, "orders")
        val j = o.join(li, o("o_orderkey") === li("l_orderkey"), "left")
          .select(col("o_orderkey"),
            dec(col("o_totalprice")).as("header"),
            coalesce(col("line_rev"), lit(0).cast(graft.Dsl.Money))
              .cast(graft.Dsl.Money).as("lines"))
          .withColumn("diff", (col("header") - col("lines"))
            .cast(graft.Dsl.Money))
        j.agg(count(lit(1)).as("n_orders"),
            sum(when(abs(col("diff")) <= 1.0, 1L).otherwise(0L)).as("n_tied"),
            sum(when(col("diff") > 1.0, 1L).otherwise(0L)).as("n_header_over"),
            sum(when(col("diff") < -1.0, 1L).otherwise(0L)).as("n_header_under"),
            sum(abs(col("diff"))).cast("double").as("total_abs_drift"))
      },
      "WITH li AS (SELECT l_orderkey, " +
        "SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * " +
        "(CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) " +
        "AS line_rev FROM lineitem GROUP BY 1), " +
        "j AS (SELECT o.o_orderkey, " +
        "CAST(o.o_totalprice AS DECIMAL(18,4)) AS header, " +
        "CAST(COALESCE(li.line_rev, 0) AS DECIMAL(18,4)) AS lines " +
        "FROM orders o LEFT JOIN li ON o.o_orderkey = li.l_orderkey), " +
        "dd AS (SELECT CAST(header - lines AS DECIMAL(18,4)) AS diff FROM j) " +
        "SELECT COUNT(*)::BIGINT AS n_orders, " +
        "SUM(CASE WHEN abs(diff) <= 1.0 THEN 1 ELSE 0 END)::BIGINT AS n_tied, " +
        "SUM(CASE WHEN diff > 1.0 THEN 1 ELSE 0 END)::BIGINT AS n_header_over, " +
        "SUM(CASE WHEN diff < -1.0 THEN 1 ELSE 0 END)::BIGINT AS n_header_under, " +
        "CAST(SUM(abs(diff)) AS DOUBLE) AS total_abs_drift FROM dd"),

    // Multi-variant experiment readout (round-12; the r11 verdict's item 8)
    // — real platforms rarely stop at A/B: k=4 deterministic arms
    // (user_id % 4), per metric (event_type) the k-proportion chi-square
    // homogeneity test at α=0.05 / 3 df (critical value 7.8147). Each
    // arm's two table cells collapse algebraically to ONE term
    // diff_i²/(C·(N−C)·n_i) with diff_i = c_i·N − C·n_i — difference and
    // denominator factors EXACT in DECIMAL(38,0)/HUGEINT (safe past
    // 1e10-event arms), then one square + one divide per arm in doubles
    // and a FIXED left-assoc 4-term sum, so both engines build the
    // identical IEEE tree (the dq_chi_square_drift discipline, k-ary).
    // Arms pivot to fixed columns — no row-order-dependent double sum
    // crosses the engines. One scan, one keyed agg + one broadcast 1-row
    // arms frame; output is |event_type|-bounded.
    "dq_multivariant_significance" -> Q(
      (s, d) => {
        val d19 = org.apache.spark.sql.types.DecimalType(19, 0)
        val ev = T(s, d, "events")
          .select((col("user_id") % 4).as("arm"), col("event_type"))
        def cnt(i: Int) = sum(when(col("arm") === i, 1L).otherwise(0L))
        val arms = ev.agg(cnt(0).as("n0"), cnt(1).as("n1"),
          cnt(2).as("n2"), cnt(3).as("n3"))
        val base = ev.groupBy(col("event_type"))
          .agg(cnt(0).as("c0"), cnt(1).as("c1"), cnt(2).as("c2"),
            cnt(3).as("c3"))
          .crossJoin(broadcast(arms))
          .withColumn("bigN",
            col("n0") + col("n1") + col("n2") + col("n3"))
          .withColumn("bigC",
            col("c0") + col("c1") + col("c2") + col("c3"))
        def term(i: Int) = {
          val diff = (col(s"c$i").cast(d19) * col("bigN").cast(d19) -
            col("bigC").cast(d19) * col(s"n$i").cast(d19)).cast("double")
          diff * diff / (col("bigC").cast("double") *
            (col("bigN") - col("bigC")).cast("double") *
            col(s"n$i").cast("double"))
        }
        base.select(col("event_type"),
            col("c0"), col("c1"), col("c2"), col("c3"),
            expr("(c0 * 1000000) div n0").as("rate0_micro"),
            expr("(c1 * 1000000) div n1").as("rate1_micro"),
            expr("(c2 * 1000000) div n2").as("rate2_micro"),
            expr("(c3 * 1000000) div n3").as("rate3_micro"),
            (term(0) + term(1) + term(2) + term(3)).as("chi2"),
            (term(0) + term(1) + term(2) + term(3) > lit(7.8147))
              .as("significant"))
          .orderBy(col("event_type"))
      },
      usEvents("WITH ev AS (SELECT user_id % 4 AS arm, event_type " +
        "FROM events), " +
        "arms AS (SELECT " +
        "SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END)::BIGINT AS n0, " +
        "SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END)::BIGINT AS n1, " +
        "SUM(CASE WHEN arm = 2 THEN 1 ELSE 0 END)::BIGINT AS n2, " +
        "SUM(CASE WHEN arm = 3 THEN 1 ELSE 0 END)::BIGINT AS n3 FROM ev), " +
        "c AS (SELECT event_type, " +
        "SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END)::BIGINT AS c0, " +
        "SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END)::BIGINT AS c1, " +
        "SUM(CASE WHEN arm = 2 THEN 1 ELSE 0 END)::BIGINT AS c2, " +
        "SUM(CASE WHEN arm = 3 THEN 1 ELSE 0 END)::BIGINT AS c3 " +
        "FROM ev GROUP BY 1), " +
        "b AS (SELECT *, n0 + n1 + n2 + n3 AS bigN, " +
        "c0 + c1 + c2 + c3 AS bigC FROM c CROSS JOIN arms), " +
        "t AS (SELECT event_type, c0, c1, c2, c3, " +
        "(c0 * 1000000) // n0 AS rate0_micro, " +
        "(c1 * 1000000) // n1 AS rate1_micro, " +
        "(c2 * 1000000) // n2 AS rate2_micro, " +
        "(c3 * 1000000) // n3 AS rate3_micro, " +
        "CAST(c0::HUGEINT * bigN - bigC::HUGEINT * n0 AS DOUBLE) * " +
        "CAST(c0::HUGEINT * bigN - bigC::HUGEINT * n0 AS DOUBLE) / " +
        "(CAST(bigC AS DOUBLE) * CAST(bigN - bigC AS DOUBLE) * " +
        "CAST(n0 AS DOUBLE)) + " +
        "CAST(c1::HUGEINT * bigN - bigC::HUGEINT * n1 AS DOUBLE) * " +
        "CAST(c1::HUGEINT * bigN - bigC::HUGEINT * n1 AS DOUBLE) / " +
        "(CAST(bigC AS DOUBLE) * CAST(bigN - bigC AS DOUBLE) * " +
        "CAST(n1 AS DOUBLE)) + " +
        "CAST(c2::HUGEINT * bigN - bigC::HUGEINT * n2 AS DOUBLE) * " +
        "CAST(c2::HUGEINT * bigN - bigC::HUGEINT * n2 AS DOUBLE) / " +
        "(CAST(bigC AS DOUBLE) * CAST(bigN - bigC AS DOUBLE) * " +
        "CAST(n2 AS DOUBLE)) + " +
        "CAST(c3::HUGEINT * bigN - bigC::HUGEINT * n3 AS DOUBLE) * " +
        "CAST(c3::HUGEINT * bigN - bigC::HUGEINT * n3 AS DOUBLE) / " +
        "(CAST(bigC AS DOUBLE) * CAST(bigN - bigC AS DOUBLE) * " +
        "CAST(n3 AS DOUBLE)) AS chi2 FROM b) " +
        "SELECT event_type, c0, c1, c2, c3, rate0_micro, rate1_micro, " +
        "rate2_micro, rate3_micro, chi2, chi2 > 7.8147 AS significant " +
        "FROM t ORDER BY event_type")),

    // Sample-ratio-mismatch guard (round-12) — the experimentation
    // platform's FIRST gate, run before any readout key is believed: under
    // the user_id%2 assignment the two arms must hold the same number of
    // DISTINCT USERS (units, not events — an SRM on events would just
    // measure treatment effect). Per segment the 1-df chi-square collapses
    // to (a−b)²/(a+b); the alarm fires at p<0.001 (10.828), the standard
    // SRM threshold — a true SRM means the assignment itself is broken and
    // every downstream significance number is garbage. Counts are exact
    // BIGINTs; the compare runs as the identical left-assoc double tree in
    // both engines (the dq_ab_significance discipline; diff ≤ unit count
    // so the square stays well inside a double's exact-integer range until
    // ~9e7 units per segment — beyond that the 1000.0 scaling still keeps
    // the compare's relative error ~1e-16, far from the threshold). One
    // scan, two distinct-aggs, segment-sized output.
    "dq_srm_check" -> Q(
      (s, d) => {
        // unassigned rows (NULL unit id) don't belong in an SRM ratio,
        // and dropping them also pins the zero-denominator case shut
        // (Spark's div returns NULL where DuckDB's // errors — the one
        // way this key could diverge cross-engine on hostile data)
        val ev = T(s, d, "events").filter(col("user_id").isNotNull)
        ev.groupBy(col("event_type"))
          .agg(
            countDistinct(when(col("user_id") % 2 === 0, col("user_id")))
              .as("users_a"),
            countDistinct(when(col("user_id") % 2 =!= 0, col("user_id")))
              .as("users_b"))
          .select(col("event_type"), col("users_a"), col("users_b"),
            expr("(users_a * 1000000) div (users_a + users_b)")
              .as("share_a_micro"),
            (lit(1000.0) *
              (col("users_a") - col("users_b")).cast("double") *
              (col("users_a") - col("users_b")).cast("double") >
              lit(10828.0) *
                (col("users_a") + col("users_b")).cast("double"))
              .as("srm"))
          .orderBy(col("event_type"))
      },
      usEvents("WITH c AS (SELECT event_type, " +
        "COUNT(DISTINCT CASE WHEN user_id % 2 = 0 THEN user_id END)" +
        "::BIGINT AS users_a, " +
        "COUNT(DISTINCT CASE WHEN user_id % 2 <> 0 THEN user_id END)" +
        "::BIGINT AS users_b FROM events WHERE user_id IS NOT NULL " +
        "GROUP BY 1) " +
        "SELECT event_type, users_a, users_b, " +
        "(users_a * 1000000) // (users_a + users_b) AS share_a_micro, " +
        "1000.0 * CAST(users_a - users_b AS DOUBLE) * " +
        "CAST(users_a - users_b AS DOUBLE) > " +
        "10828.0 * CAST(users_a + users_b AS DOUBLE) AS srm " +
        "FROM c ORDER BY event_type")),
  )

  /** The synthetic raw ingest lines for the dead-letter demo (see key
    * comment): (event_id, line). */
  def rawLines(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    T(s, d, "events").select(col("event_id"),
      when(col("event_type") === "signup",
        concat_ws(" ", col("event_id"), col("event_type")))
        .when(col("event_type") === "error",
          concat_ws(" ", col("event_id"), col("event_type"),
            regexp_replace(col("props"), ":", "=")))
        .otherwise(concat_ws(" ", col("event_id"), col("event_type"),
          col("props"))).as("line"))

  /** Route raw lines through the parse gate: returns (parsed ok rows,
    * quarantine rows with reason, the full classified frame). The split is
    * two filters over ONE classified projection — the classifier runs
    * once, not per output. */
  def deadLetter(raw: org.apache.spark.sql.DataFrame)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame,
         org.apache.spark.sql.DataFrame) = {
    val pat = "^(\\d+) ([a-z]+) (\\{.*\\})$"
    val classified = raw
      .withColumn("payload", regexp_extract(col("line"), pat, 3))
      .withColumn("reason",
        when(!col("line").rlike(pat), "grok_no_match")
          .when(get_json_object(col("payload"), "$.k").isNull, "corrupt_json")
          .otherwise("ok"))
    val parsed = classified.filter(col("reason") === "ok")
      .select(col("event_id"),
        regexp_extract(col("line"), pat, 2).as("parsed_type"),
        get_json_object(col("payload"), "$.k").cast("long").as("k"))
    val quarantine = classified.filter(col("reason") =!= "ok")
      .select(col("event_id"), col("line"), col("reason"))
    (parsed, quarantine, classified)
  }

  /** The true streaming formulation behind `stream_dq_monitor`. */
  def dqMonitorStream(events: org.apache.spark.sql.DataFrame,
      watermark: String = "10 minutes"): org.apache.spark.sql.DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("user_id").isNull, 1L).otherwise(0L)).as("n_null_user"),
        sum(when(col("value") < 0, 1L).otherwise(0L)).as("n_neg_value"))
      .select(col("window.start").as("bucket"), col("n_rows"),
        col("n_null_user"), col("n_neg_value"))
}
