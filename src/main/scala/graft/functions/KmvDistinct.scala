package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64Function}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.sql.{Column, SparkSession}

/** KMV (k-minimum-values) distinct-count sketch as a raw-buffer
  * TypedImperativeAggregate — the SURVEY §2.L "exotic sketch" surface.
  *
  * Buffer = the k smallest xxhash64 values seen (unsigned order). Merge is a
  * set union + trim, so partial aggregation is exact sketch algebra: each
  * partition ships at most k longs, and estimates are independent of
  * partition order (fully deterministic for fixed input). Estimate:
  * (k-1) / fraction-of-hash-space-covered-by-kth-minimum; exact count when
  * fewer than k distinct hashes were seen.
  */
case class KmvDistinct(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {
  // k=0 would make eval read last() of an always-empty TreeSet; k=1 is
  // the smallest coherent sketch.
  require(k >= 1, s"KmvDistinct k must be >= 1, got $k")

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long](KmvDistinct.UnsignedOrd)

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      add(buf, XxHash64Function.hash(v, child.dataType, 42L))
    }
    buf
  }

  private def add(buf: java.util.TreeSet[java.lang.Long], h: Long): Unit = {
    buf.add(h)
    if (buf.size > k) buf.pollLast(): Unit
  }

  override def merge(a: java.util.TreeSet[java.lang.Long],
      b: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b.iterator()
    while (it.hasNext) add(a, it.next())
    a
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    if (buf.size < k) buf.size.toLong
    else {
      // kth minimum as a fraction of the unsigned 64-bit hash space,
      // computed from its top 32 bits to stay in double range.
      val kth = buf.last()
      val fraction = java.lang.Long.divideUnsigned(kth, 1L << 32).toDouble /
        (1L << 32).toDouble
      math.round((k - 1) / math.max(fraction, Double.MinPositiveValue))
    }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def withNewMutableAggBufferOffset(offset: Int): KmvDistinct =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KmvDistinct =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object KmvDistinct {
  /** Unsigned ordering, serializable (the expression ships to executors). */
  object UnsignedOrd extends java.util.Comparator[java.lang.Long] with Serializable {
    override def compare(a: java.lang.Long, b: java.lang.Long): Int =
      java.lang.Long.compareUnsigned(a, b)
  }

  /** Column handle via the function registry (like VectorExpressions).
    * k is encoded in the registered name: two aggregations built with
    * different k before analysis would otherwise both bind to whichever
    * registration ran last. */
  def kmvDistinct(spark: SparkSession, k: Int = 256)(c: Column): Column = {
    val fnName = s"graft_kmv_distinct_$k"
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      fnName, exprs => KmvDistinct(exprs.head, k).toAggregateExpression(),
      "built-in")
    org.apache.spark.sql.functions.call_function(fnName, c)
  }
}
