package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, SparkSession}

/** Exact-integer per-dimension vector sum for the trained-codebook update
  * (r18 optimization round): Σ floor(x·1e7) per dim as one array<long> —
  * arithmetically identical to the posexplode → SUM(floor(x·1e7)::long)
  * GROUP BY (cell, pos) → array_sort(collect_list(struct(pos, sq)))
  * two-aggregate chain it replaces (integer sums are order-free, so the
  * buffer merge order cannot matter), but in ONE partial-aggregable pass:
  * no 64× posexplode row blowup, one exchange of nlist long-arrays
  * instead of two exchanges of (cell, pos, partial) triples. Accepts
  * array<float> (the corpus) and array<double> (trained centroids fed
  * back), widening floats exactly before the quantize — the same
  * float→double path the cast took. */
case class QuantSumVec(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  private val childIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    val b = if (buf.length >= n) buf else java.util.Arrays.copyOf(buf, n)
    var i = 0
    while (i < n) {
      val x = if (childIsFloat) a.getFloat(i).toDouble else a.getDouble(i)
      b(i) += math.floor(x * 1e7).toLong
      i += 1
    }
    b
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    val (big, small) = if (b1.length >= b2.length) (b1, b2) else (b2, b1)
    var i = 0
    while (i < small.length) { big(i) += small(i); i += 1 }
    big
  }

  override def eval(buf: Array[Long]): Any =
    if (buf.length == 0) null else new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantSumVec =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantSumVec =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object QuantSumVecExpr {
  def quantSumVec(s: SparkSession)(v: Column): Column = {
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_quant_sum_vec",
      exprs => QuantSumVec(exprs.head).toAggregateExpression(), "built-in")
    org.apache.spark.sql.functions.call_function("graft_quant_sum_vec", v)
  }
}
