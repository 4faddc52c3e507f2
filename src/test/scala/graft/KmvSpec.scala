package graft

import org.apache.spark.sql.functions._
import graft.functions.KmvDistinct.kmvDistinct

/** Raw-buffer TypedImperativeAggregate sketch (SURVEY §2.L): exact below k,
  * bounded-error estimate above, deterministic regardless of partitioning. */
class KmvSpec extends SparkSpec {

  import spark.implicits._

  test("kmv is exact below k distinct values") {
    val got = T(spark, sf001, "events")
      .agg(kmvDistinct(spark)($"user_id").as("kmv")).head().getLong(0)
    val exact = T(spark, sf001, "events")
      .agg(countDistinct($"user_id")).head().getLong(0)
    assert(got == exact, s"kmv=$got exact=$exact")
  }

  test("kmv estimates within 25% above k, stable across repartitioning") {
    val li = T(spark, sf001, "lineitem")
    val exact = li.agg(countDistinct($"l_orderkey")).head().getLong(0)
    val est1 = li.agg(kmvDistinct(spark, k = 64)($"l_orderkey")).head().getLong(0)
    val est2 = li.repartition(13)
      .agg(kmvDistinct(spark, k = 64)($"l_orderkey")).head().getLong(0)
    assert(est1 == est2, s"estimate depends on partitioning: $est1 vs $est2")
    val err = math.abs(est1.toDouble - exact) / exact
    assert(err < 0.25, s"kmv=$est1 exact=$exact err=$err")
  }

  test("kmv works per-group") {
    val got = T(spark, sf001, "events")
      .groupBy($"event_type")
      .agg(kmvDistinct(spark)($"user_id").as("kmv"))
      .orderBy($"event_type")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val exact = T(spark, sf001, "events")
      .groupBy($"event_type")
      .agg(countDistinct($"user_id").as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == exact) // 15 users << k: exact everywhere
  }
}
