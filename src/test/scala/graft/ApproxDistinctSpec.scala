package graft

import org.apache.spark.sql.functions._

/** CI pin for `agg_approx_distinct` (r13 verdict #2: it was the ONE
  * contract-exempt key with neither oracle nor test pin — it could not
  * fail CI). HLL++ has no cross-engine oracle, so the pin is the KmvSpec
  * pattern: the GRADED code path's estimate must sit within the sketch's
  * documented error of the ORACLED exact key, per group, and must not
  * depend on input partitioning (register-max merge is commutative). On a
  * fixed corpus the estimate is deterministic, so these are hard asserts,
  * not flaky statistics. */
class ApproxDistinctSpec extends SparkSpec {

  // approx_count_distinct's default relative standard deviation; the
  // per-group bound below allows 3σ — generous for a pin, far too tight
  // for any implementation regression (a broken merge is off by ×k).
  private val Rsd = 0.05

  private def byType(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
    df.collect().map(r => (r.getString(0), r.getLong(1))).toMap

  test("graded estimate within 3·rsd of the oracled exact counts per group") {
    val approx = byType(SparkEntry.queries("agg_approx_distinct")(spark, sf01))
    val exact = T(spark, sf01, "events")
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(approx.keySet == exact.keySet)
    for ((t, est) <- approx) {
      val ex = exact(t)
      val err = math.abs(est.toDouble - ex) / ex.max(1L)
      assert(err <= 3 * Rsd,
        s"event_type=$t approx=$est exact=$ex err=$err > ${3 * Rsd}")
    }
  }

  test("estimate is invariant to input partitioning") {
    val base = byType(SparkEntry.queries("agg_approx_distinct")(spark, sf01))
    val repart = byType(
      T(spark, sf01, "events").repartition(13)
        .groupBy(col("event_type"))
        .agg(approx_count_distinct(col("user_id")).cast("bigint")
          .as("approx_users"))
        .orderBy(col("event_type")))
    assert(base == repart,
      s"HLL++ estimate depends on partitioning: $base vs $repart")
  }
}
