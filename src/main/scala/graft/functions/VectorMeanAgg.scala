package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY §2.L): element-wise mean of fixed-length
  * float vectors via a mutable (sums, count) buffer — the
  * `Aggregator[IN, BUF, OUT]` formulation of the embedding centroid.
  *
  * Partial aggregation is free: `reduce` runs map-side per partition and
  * `merge` combines partials, so only (64 doubles, count) per group crosses
  * the shuffle — not the vectors. Double summation order varies with
  * partitioning (≤1 ulp per element), hence the oracled twin
  * `llm_embedding_agg` uses the order-fixed fold; EmbeddingAggSpec pins
  * this one to it within 1e-9.
  */
class VectorMeanAgg(dim: Int)
    extends Aggregator[Seq[Float], (Array[Double], Long), Seq[Double]] {

  override def zero: (Array[Double], Long) = (new Array[Double](dim), 0L)

  override def reduce(b: (Array[Double], Long), v: Seq[Float]): (Array[Double], Long) = {
    val (sums, n) = b
    var i = 0
    while (i < dim && i < v.length) { sums(i) += v(i).toDouble; i += 1 }
    (sums, n + 1)
  }

  override def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
    var i = 0
    while (i < dim) { a._1(i) += b._1(i); i += 1 }
    (a._1, a._2 + b._2)
  }

  override def finish(r: (Array[Double], Long)): Seq[Double] =
    if (r._2 == 0L) Seq.fill(dim)(0.0)
    else r._1.map(_ / r._2).toSeq

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    Encoders.tuple(
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]](),
      Encoders.scalaLong)

  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}
