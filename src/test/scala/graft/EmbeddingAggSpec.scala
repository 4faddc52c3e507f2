package graft

/** Pins the typed-Aggregator centroid to the oracled order-fixed fold:
  * both compute the same mean; the UDAF's partition-order summation may
  * differ by ulps, never more. */
class EmbeddingAggSpec extends SparkSpec {

  test("typed VectorMeanAgg centroid == oracled centroid within 1e-9") {
    val fixed = SparkEntry.queries("llm_embedding_agg")(spark, sf001)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val typed = SparkEntry.queries("llm_embedding_agg_typed")(spark, sf001)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(fixed.keySet == typed.keySet)
    assert(fixed.nonEmpty)
    val maxDiff = fixed.map { case (k, v) => math.abs(v - typed(k)) }.max
    assert(maxDiff < 1e-9, s"centroids diverged: $maxDiff")
  }
}
