package graft

import org.apache.spark.sql.functions._

/** Semantic pins for the round-8 addendum keys, beyond the registry's
  * runs-and-nonempty gate and the DuckDB hash parity. */
class SurvivalPhashSpec extends SparkSpec {

  test("evt_survival_curve: S(0)=1, monotone non-increasing, 30 offsets") {
    val out = SparkEntry.queries("evt_survival_curve")(spark, sf001)
      .orderBy("offset_day").collect()
    assert(out.length === 30)
    val s0 = out.head
    assert(s0.getLong(0) === 0L)
    assert(s0.getLong(1) === s0.getLong(2),
      "every user survives to offset 0 (lifetime >= 0 by construction)")
    val survivals = out.map(_.getDouble(3))
    assert(survivals.head === 1.0)
    survivals.sliding(2).foreach { case Array(a, b) =>
      assert(b <= a, s"survival must be non-increasing, got $a -> $b")
    }
  }

  test("mm_phash_near_dup: exact duplicate payloads pair at hamming 0") {
    // dHash of identical byte streams is identical, so every exact-dup
    // text pair (the corpus ships some — llm_exact_dedup relies on them)
    // must appear in the near-dup output with hamming 0.
    val docs = T(spark, sf001, "documents").filter(length(col("text")) >= 33)
    val dupPairs = docs.select(col("doc_id").as("doc_a"), col("text"))
      .join(docs.select(col("doc_id").as("doc_b"), col("text")), "text")
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
    val out = SparkEntry.queries("mm_phash_near_dup")(spark, sf001)
    val missed = dupPairs.join(out.filter(col("hamming") === 0),
      Seq("doc_a", "doc_b"), "left_anti").count()
    assert(missed === 0, s"$missed exact-dup pairs absent at hamming 0")
    assert(out.filter(col("hamming") > 3).count() === 0)
  }
}
