package graft

import org.apache.spark.sql.functions._
import graft.operators.Scale

/** Evidence for the 100 TB levers: salting preserves aggregate semantics
  * and bucketing removes the join-time shuffle. */
class ScaleSpec extends SparkSpec {

  import spark.implicits._

  test("salted two-phase sum/count == plain groupBy (skew-safe plan)") {
    val events = T(spark, sf001, "events")
    val salted = Scale.saltedSumCount(events, $"event_type", Dsl.dec($"value"))
      .select($"k", $"total".cast("double"), $"n")
      .orderBy($"k").collect().toSeq
    val plain = events.groupBy($"event_type")
      .agg(sum(Dsl.dec($"value")).cast("double").as("total"), count(lit(1)).as("n"))
      .orderBy($"event_type").collect().toSeq
    assert(salted.map(r => (r.getString(0), r.getDouble(1), r.getLong(2))) ==
      plain.map(r => (r.getString(0), r.getDouble(1), r.getLong(2))))
  }

  test("dynamic partition pruning reaches a partitioned fact scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    val o = T(spark, sf001, "orders").withColumn("o_year", year($"o_orderdate"))
    o.write.mode("overwrite").partitionBy("o_year").parquet(dir)
    val fact = spark.read.parquet(dir)
    // DPP wants a FILTERED, file-backed dim side (the filter becomes the
    // runtime partition-pruning subquery on the fact scan; local relations
    // are skipped by the benefit estimator).
    val dimDir = java.nio.file.Files.createTempDirectory("graft_dpp_dim").toString
    (1990 to 2005).map(y => (y, s"era_${y / 2 * 2}")).toDF("dy", "label")
      .write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
    val joined = fact.join(dim.hint("broadcast").filter($"label" === "era_1996"),
      $"o_year" === $"dy")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no DPP subquery in partition filters:\n$plan")
    assert(joined.count() ==
      o.filter($"o_year".isin(1996, 1997)).count())
  }

  test("bucketed join plans without a shuffle exchange") {
    val wh = java.nio.file.Files.createTempDirectory("graft_wh")
    val li = T(spark, sf001, "lineitem").select($"l_orderkey", $"l_quantity")
    val o = T(spark, sf001, "orders").select($"o_orderkey".as("l_orderkey"), $"o_totalprice")
    val joined = Scale.bucketedJoin(spark, li, o, "l_orderkey", 8,
      "graft_b_lineitem", "graft_b_orders")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")
    // and it still computes the right thing
    assert(joined.count() == li.join(o, "l_orderkey").count())
    spark.sql("DROP TABLE IF EXISTS graft_b_lineitem")
    spark.sql("DROP TABLE IF EXISTS graft_b_orders")
  }

  test("range-bucket join rides a HASH join keyed on (user_id, bucket)") {
    val plan = SparkEntry.queries("scale_range_bucket_join")(spark, sf001)
      .queryExecution.executedPlan.toString
    // the point of the rewrite: the interval residual hangs off an
    // equi-join whose key includes the time bucket, not a nested loop
    assert(!plan.contains("NestedLoop"), s"range join fell back to BNLJ:\n$plan")
    val hashJoinLine = plan.linesIterator
      .find(l => l.contains("HashJoin") && l.contains("bk"))
    assert(hashJoinLine.isDefined,
      s"no hash join keyed on the time bucket:\n$plan")
  }
}
