package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFeatureExpressions

/** r18 optimization round: the shingle/span consumers swapped their
  * interpreted HOF builders for the native Shingles3 / SpanMd5s
  * expressions. Parity pins replay each native against the EXACT HOF
  * formulation it replaced on randomized token arrays (including the
  * short-doc clamp cases), so any drift in join separators, slice bounds
  * or md5 bytes fails here rather than at the oracle. */
class TextFeatureSpec extends SparkSpec {

  private def tokensDf(rows: Int, seed: Long) = {
    val rnd = new scala.util.Random(seed)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "x", "longword",
      "pipeline", "spark", "dedup", "q7")
    val data = (0 until rows).map { i =>
      // lengths spanning the clamp edges: 3..40 words (>= 3, the callers'
      // shared gate)
      val n = 3 + rnd.nextInt(38)
      (i.toLong, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))))
    }
    spark.createDataFrame(data).toDF("id", "words")
  }

  test("Shingles3 matches the transform HOF on every length >= 3") {
    val df = tokensDf(300, seed = 11L)
      .withColumn("hof", expr(graft.operators.Shingles.sparkExpr))
      .withColumn("nat", TextFeatureExpressions.shingles3(spark)(col("words")))
    assert(df.filter(col("hof") =!= col("nat")).count() === 0)
  }

  test("SpanMd5s matches the slice+concat+md5 HOF incl. short-doc clamp") {
    val short = Seq((1000L, Seq("a")), (1001L, Seq("a", "b")),
      (1002L, Seq("a", "b", "c", "d", "e", "f", "g")),
      (1003L, Seq("a", "b", "c", "d", "e", "f", "g", "h")),
      (1004L, Seq("a", "b", "c", "d", "e", "f", "g", "h", "i")))
    val df = tokensDf(300, seed = 12L)
      .unionByName(spark.createDataFrame(short).toDF("id", "words"))
      .withColumn("hof", expr(
        "transform(sequence(1, greatest(size(words) - 7, 1)), " +
          "i -> md5(concat_ws(' ', slice(words, i, 8))))"))
      .withColumn("nat", TextFeatureExpressions.spanMd5s(spark)(col("words")))
    assert(df.filter(col("hof") =!= col("nat")).count() === 0)
  }
}
