package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitter sketch as a raw-buffer
  * TypedImperativeAggregate (SURVEY §2.L sketch surface, alongside
  * [[KmvDistinct]]): at most k counters per partition, merged with the
  * Agarwal et al. mergeable-summaries rule (sum counts, subtract the
  * (k+1)-th largest, drop non-positive). Guarantee: every item with true
  * frequency > n/(k+1) survives to the final candidate set, regardless of
  * partition order or merge shape.
  *
  * The counts themselves are order-dependent (as in any MG sketch), so
  * `eval` emits only the CANDIDATE SET (sorted array<string>); callers
  * recount candidates exactly and filter by the threshold — making the
  * end-to-end heavy-hitters query fully deterministic and oracle-able
  * while the scan-side memory stays O(k) per partition.
  */
case class MisraGries(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.HashMap[String, java.lang.Long]] {
  require(k >= 1, s"MisraGries k must be >= 1, got $k")

  // Counters key on the string value itself; other types would silently
  // group by Catalyst-internal toString forms — reject at analysis.
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_mg_candidates requires a string column, got ${child.dataType}")

  override def createAggregationBuffer(): java.util.HashMap[String, java.lang.Long] =
    new java.util.HashMap[String, java.lang.Long]()

  override def update(buf: java.util.HashMap[String, java.lang.Long],
      input: InternalRow): java.util.HashMap[String, java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.toString
      val cur = buf.get(key)
      if (cur != null) buf.put(key, cur + 1L)
      else if (buf.size < k) buf.put(key, 1L)
      else decrementAll(buf, 1L)
    }
    buf
  }

  /** Subtract d from every counter, dropping non-positive entries. */
  private def decrementAll(buf: java.util.HashMap[String, java.lang.Long],
      d: Long): Unit = {
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val nv = e.getValue - d
      if (nv <= 0L) it.remove() else e.setValue(nv)
    }
  }

  override def merge(a: java.util.HashMap[String, java.lang.Long],
      b: java.util.HashMap[String, java.lang.Long]): java.util.HashMap[String, java.lang.Long] = {
    val bIt = b.entrySet().iterator()
    while (bIt.hasNext) {
      val e = bIt.next()
      val cur = a.get(e.getKey)
      a.put(e.getKey,
        if (cur == null) e.getValue else java.lang.Long.valueOf(cur + e.getValue))
    }
    if (a.size > k) {
      // subtract the (k+1)-th largest count — the mergeable-summaries trim
      val counts = new Array[Long](a.size)
      var i = 0
      val it = a.values().iterator()
      while (it.hasNext) { counts(i) = it.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val d = counts(counts.length - (k + 1)) // (k+1)-th largest
      decrementAll(a, d)
    }
    a
  }

  override def eval(buf: java.util.HashMap[String, java.lang.Long]): Any = {
    val keys = new Array[String](buf.size)
    buf.keySet().toArray[String](keys)
    java.util.Arrays.sort(keys, java.util.Comparator.naturalOrder[String]())
    new GenericArrayData(keys.map(UTF8String.fromString(_): Any))
  }

  override def serialize(buf: java.util.HashMap[String, java.lang.Long]): Array[Byte] = {
    var size = 4
    val it0 = buf.entrySet().iterator()
    val entries = Seq.newBuilder[(Array[Byte], Long)]
    while (it0.hasNext) {
      val e = it0.next()
      val b = e.getKey.getBytes(StandardCharsets.UTF_8)
      entries += ((b, e.getValue.longValue))
      size += 4 + b.length + 8
    }
    val es = entries.result()
    val bb = ByteBuffer.allocate(size)
    bb.putInt(es.size)
    es.foreach { case (b, v) => bb.putInt(b.length); bb.put(b); bb.putLong(v) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      buf.put(new String(b, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def withNewMutableAggBufferOffset(offset: Int): MisraGries =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MisraGries =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object MisraGries {
  /** Column handle; k is part of the registered name (see KmvDistinct). */
  def mgCandidates(spark: SparkSession, k: Int)(c: Column): Column = {
    val fnName = s"graft_mg_candidates_$k"
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      fnName, exprs => MisraGries(exprs.head, k).toAggregateExpression(),
      "built-in")
    org.apache.spark.sql.functions.call_function(fnName, c)
  }
}
