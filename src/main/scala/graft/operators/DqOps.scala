package graft.operators

import org.apache.spark.sql.functions._
import graft.{Q, T}

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
        val a = a0.localCheckpoint()
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
  )

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
