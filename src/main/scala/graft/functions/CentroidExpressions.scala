package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, SQLOrderingUtil}
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, SparkSession}

/** Per-row nearest/top-k centroid selection over a PACKED codebook array
  * (optimization round 19, guide §2.3 "aggregate before you shuffle" /
  * §2.4 "remove shuffles outright").
  *
  * Every IVF assignment in this repo used the same two-step shape: cross-
  * join the corpus against the broadcast codebook (materializing n × nlist
  * scored rows) and pick each vector's rank-1 / top-k rows with a
  * vec_id-keyed aggregate or window — one full corpus exchange (plus a sort,
  * for the window) per assignment pass, and the Lloyd training loop pays it
  * once per iteration. But the selection is a per-ROW decision: with the
  * codebook collapsed into ONE array<struct<cid, cemb, cnorm>> cell
  * (collect_list over the ≤ nlist codebook rows — the same bytes the
  * broadcast already shipped), the top-k scan runs inside the row's own
  * projection and the corpus never shuffles at all.
  *
  * Selection is IDENTICAL to
  * `row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) <= k`
  * and to the argmax1 max-of-struct aggregate it replaces:
  *  - sim = dot(emb, cemb) / (norm * cnorm), the dot being the exact
  *    sequential [[DotProductAny]] fold (each float widened before the
  *    multiply), so the doubles are bit-identical;
  *  - doubles compare by Spark's SQL total order (NaN largest,
  *    -0.0 == 0.0 — [[SQLOrderingUtil.compareDoubles]], the comparator
  *    behind BOTH window sorts and max());
  *  - ties break to the smaller cid; cids are unique within a codebook, so
  *    the (sim, cid) order is total and the result is independent of the
  *    packed array's (nondeterministic collect_list) element order.
  *
  * House discipline: one impl object serves the interpreted and generated
  * paths — no UDF, whole-stage codegen keeps the scan pipeline fused.
  */
object CentroidImpl extends Serializable {

  /** Spark SQL's double total order: NaN largest, -0.0 == 0.0. */
  private def cmp(x: Double, y: Double): Int =
    SQLOrderingUtil.compareDoubles(x, y)

  /** True when (s1, c1) orders strictly before (s2, c2) under
    * (sim DESC, cid ASC). */
  private def better(s1: Double, c1: Long, s2: Double, c2: Long): Boolean = {
    val c = cmp(s1, s2)
    c > 0 || (c == 0 && c1 < c2)
  }

  /** Top-k (sim, cid) of `emb` by (cosine DESC, cid ASC) over the packed
    * codebook, parallel arrays best-first; returns fewer than k when the
    * codebook is smaller (`filled`). embFloat / cembFloat select the
    * element accessor per side (corpus embeddings are float, trained
    * centroids double — the [[DotProductAny]] dispatch). */
  def topKRaw(emb: ArrayData, embFloat: Boolean, norm: Double,
      cents: ArrayData, cembFloat: Boolean, k: Int)
      : (Array[Double], Array[Long], Int) = {
    val m = cents.numElements()
    val kk = math.min(k, m)
    if (kk <= 0) return (Array.emptyDoubleArray, Array.emptyLongArray, 0)
    val sims = new Array[Double](kk)
    val cids = new Array[Long](kk)
    var filled = 0
    val d = emb.numElements()
    var ci = 0
    while (ci < m) {
      val c = cents.getStruct(ci, 3)
      val cid = c.getLong(0)
      val cemb = c.getArray(1)
      val cnorm = c.getDouble(2)
      val n = math.min(d, cemb.numElements())
      var s = 0.0
      var i = 0
      while (i < n) {
        val x = if (embFloat) emb.getFloat(i).toDouble else emb.getDouble(i)
        val y = if (cembFloat) cemb.getFloat(i).toDouble else cemb.getDouble(i)
        s += x * y
        i += 1
      }
      val sim = s / (norm * cnorm)
      var p = filled
      while (p > 0 && better(sim, cid, sims(p - 1), cids(p - 1))) p -= 1
      if (p < kk) {
        var j = math.min(filled, kk - 1)
        while (j > p) { sims(j) = sims(j - 1); cids(j) = cids(j - 1); j -= 1 }
        sims(p) = sim
        cids(p) = cid
        if (filled < kk) filled += 1
      }
      ci += 1
    }
    (sims, cids, filled)
  }

  /** [[topKRaw]] packaged as array<struct<sim, cid>> rows for the
    * [[TopCentroids]] expression. */
  def topK(emb: ArrayData, embFloat: Boolean, norm: Double,
      cents: ArrayData, cembFloat: Boolean, k: Int): GenericArrayData = {
    val (sims, cids, filled) = topKRaw(emb, embFloat, norm, cents, cembFloat, k)
    val out = new Array[Any](filled)
    var i = 0
    while (i < filled) {
      out(i) = org.apache.spark.sql.catalyst.InternalRow(sims(i), cids(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Rank-1 cid boxed, null on an empty codebook — the
    * [[NearestCentroid]] body. */
  def top1(emb: ArrayData, embFloat: Boolean, norm: Double,
      cents: ArrayData, cembFloat: Boolean): java.lang.Long = {
    val (_, cids, filled) = topKRaw(emb, embFloat, norm, cents, cembFloat, 1)
    if (filled == 0) null else java.lang.Long.valueOf(cids(0))
  }
}

/** Shared shape of the two centroid-selection expressions: children are
  * (embedding, norm, packed-codebook); element types resolved once from the
  * child schemas. */
trait CentroidSelect extends TernaryExpression {
  def emb: Expression
  def norm: Expression
  def cents: Expression
  override def first: Expression = emb
  override def second: Expression = norm
  override def third: Expression = cents

  protected def embFloat: Boolean = emb.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  protected def cembFloat: Boolean = cents.dataType match {
    case ArrayType(StructType(fields), _) if fields.length >= 2 =>
      fields(1).dataType match {
        case ArrayType(FloatType, _) => true
        case _ => false
      }
    case _ => false
  }
}

/** array<struct<sim, cid>> of the top-`k` centroids in (sim DESC, cid ASC)
  * order — the fused replacement for a rank-≤-k window over the n × nlist
  * scored cross-join. Carrying the sim lets two-level consumers merge each
  * probed L1 cell's LOCAL top-k into the global ranking (any global top-k
  * candidate is inside its own cell's local top-k, so the merge of locals
  * is exact). `k` is a plan-time constant (the probe width). */
case class TopCentroids(emb: Expression, norm: Expression,
    cents: Expression, k: Int) extends CentroidSelect {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("sim", DoubleType, nullable = false),
    StructField("cid", LongType, nullable = false))), containsNull = false)

  override protected def nullSafeEval(e: Any, n: Any, c: Any): Any =
    CentroidImpl.topK(e.asInstanceOf[ArrayData],
      embFloat, n.asInstanceOf[Double], c.asInstanceOf[ArrayData],
      cembFloat, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (e, n, c) =>
      s"""
         |${ev.value} = graft.functions.CentroidImpl.topK(
         |  $e, $embFloat, $n, $c, $cembFloat, $k);
       """.stripMargin)

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(emb = newFirst, norm = newSecond, cents = newThird)
}

/** The rank-1 cid — the fused replacement for the argmax1 aggregate (and
  * the rn = 1 window row). NULL on an empty codebook (an empty gated
  * branch never produces rows, but the expression stays total). */
case class NearestCentroid(emb: Expression, norm: Expression,
    cents: Expression) extends CentroidSelect {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override protected def nullSafeEval(e: Any, n: Any, c: Any): Any =
    CentroidImpl.top1(e.asInstanceOf[ArrayData], embFloat,
      n.asInstanceOf[Double], c.asInstanceOf[ArrayData], cembFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (e, n, c) => {
      val v = ctx.freshName("top1")
      s"""
         |java.lang.Long $v = graft.functions.CentroidImpl.top1(
         |  $e, $embFloat, $n, $c, $cembFloat);
         |if ($v == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $v.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(emb = newFirst, norm = newSecond, cents = newThird)
}

object CentroidExpressions {
  /** Column handles (register-on-use like [[VectorExpressions]]). */
  def topCentroids(spark: SparkSession)(emb: Column, norm: Column,
      cents: Column, k: Int): Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_top_cents", exprs => TopCentroids(exprs(0), exprs(1), exprs(2),
        GraftFunctions.intLit(exprs(3), "top cents k")), "built-in")
    org.apache.spark.sql.functions.call_function("graft_top_cents",
      emb, norm, cents, org.apache.spark.sql.functions.lit(k))
  }

  def nearestCentroid(spark: SparkSession)(emb: Column, norm: Column,
      cents: Column): Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_nearest_cent",
      exprs => NearestCentroid(exprs(0), exprs(1), exprs(2)), "built-in")
    org.apache.spark.sql.functions.call_function("graft_nearest_cent",
      emb, norm, cents)
  }
}
