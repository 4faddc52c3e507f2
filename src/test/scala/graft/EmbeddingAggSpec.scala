package graft

/** Pins the quantized-sum centroid to the exact typed-Aggregator mean:
  * the oracled key quantizes each element to floor(x*1e7) before the
  * (exact, associative) long sum, so it may differ from the true mean by
  * strictly less than 1e-7 per dimension — never more. Also asserts the
  * scale property that motivated the quantized formulation: NO
  * collect_list buffer anywhere in the executed plan (the former sorted
  * fold collected O(corpus/|labels|) doubles into one aggregation buffer —
  * OOM-shaped at 1e9 vectors).
  */
class EmbeddingAggSpec extends SparkSpec {

  test("quantized centroid == typed VectorMeanAgg centroid within 1e-7") {
    val fixed = SparkEntry.queries("llm_embedding_agg")(spark, sf001)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val typed = SparkEntry.queries("llm_embedding_agg_typed")(spark, sf001)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(fixed.keySet == typed.keySet)
    assert(fixed.nonEmpty)
    val maxDiff = fixed.map { case (k, v) => math.abs(v - typed(k)) }.max
    assert(maxDiff < 1e-7, s"centroids diverged: $maxDiff")
  }

  test("centroid keys carry no corpus-sized collect_list buffer in the plan") {
    // llm_embedding_agg: zero collect_list anywhere. llm_centroid_classify
    // keeps exactly ONE — the 64-struct-per-label array assembly over the
    // (|labels| x 64)-row perDim frame, bounded by dimensionality, never by
    // corpus size; the corpus-sized per-(label,dim) fold must be gone.
    def planOf(k: String) = {
      val df = SparkEntry.queries(k)(spark, sf001)
      df.collect() // force AQE-final plan
      df.queryExecution.executedPlan.toString
    }
    val pAgg = planOf("llm_embedding_agg")
    assert(!pAgg.contains("collect_list"),
      s"llm_embedding_agg buffers a collect_list:\n$pAgg")
    val pCls = planOf("llm_centroid_classify")
    // the corpus-sized fold collected the SCALAR xd; the surviving bounded
    // assembly collects struct(pos, c) off the aggregated perDim frame
    assert(!pCls.contains("collect_list(xd") &&
      !pCls.contains("sort_array(collect_list"),
      s"llm_centroid_classify still sorted-folds per (label, dim):\n$pCls")
  }
}
