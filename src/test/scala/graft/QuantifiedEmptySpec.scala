package graft

import org.apache.spark.sql.functions._
import graft.operators.SubqueryOps

/** Drives SubqueryOps.quantified with a brand absent from the fixture, so
  * the bounds subquery is empty and the cnt=0 coalesce branch (SQL's
  * vacuous-truth ALL / empty-set-false ANY semantics) actually executes —
  * the registered key uses Brand#13, which exists, and never reaches it. */
class QuantifiedEmptySpec extends SparkSpec {

  test("empty quantified subquery: > ALL vacuously true, > ANY false") {
    val part = T(spark, sf001, "part")
    val brands = part.select("p_brand").distinct()
      .collect().map(_.getString(0)).toSet
    val absent = "Brand#99"
    assert(!brands.contains(absent), s"fixture unexpectedly has $absent")

    val out = SubqueryOps.quantified(part, absent)
    val n = part.count()
    assert(out.count() === n)
    assert(out.filter(!col("gt_all_b13")).count() === 0,
      "> ALL over an empty set must be vacuously TRUE on every row")
    assert(out.filter(col("gt_any_b13")).count() === 0,
      "> ANY over an empty set must be FALSE on every row")
  }

  test("non-empty quantified subquery keeps exact comparison semantics") {
    val part = T(spark, sf001, "part")
    val brand = part.select("p_brand").orderBy("p_brand")
      .limit(1).collect().head.getString(0)
    val mx = part.filter(col("p_brand") === brand)
      .agg(max("p_retailprice")).collect().head.getDouble(0)
    val out = SubqueryOps.quantified(part, brand)
    val gtAll = out.filter(col("gt_all_b13")).count()
    val expect = part.filter(col("p_retailprice") > mx).count()
    assert(gtAll === expect)
  }
}
