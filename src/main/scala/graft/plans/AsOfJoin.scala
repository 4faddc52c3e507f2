package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, Ascending, Attribute, AttributeSeq, BindReferences, Expression, GenericInternalRow, JoinedRow, PredicateHelper, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native AS-OF JOIN — the one operator in the inventory whose semantics
  * Spark's built-ins cannot express as a single efficient operator, so it
  * gets the full custom-operator treatment (SURVEY §2.C `join_asof` notes;
  * custom-op preference ladder tier (c)): a logical node
  * ([[AsOfJoinNode]]), a planner strategy ([[AsOfJoinStrategy]], injected
  * via the public `spark.experimental.extraStrategies` hook), and a
  * physical operator ([[AsOfJoinExec]]).
  *
  * Semantics: for every left row, attach the LATEST right row of the same
  * key with `(right.ts, right.tie) <= (left.ts, left.tie)` lexicographically
  * (null-padded when none) — identical to the window/last_value(IGNORE
  * NULLS) formulation used by the `join_asof` query key and its DuckDB
  * oracle, including self-match and equal-timestamp tie behavior.
  *
  * Why a custom operator: the window formulation must union both streams
  * and run every row through a window exec carrying the union's full
  * payload; this exec declares `ClusteredDistribution(key)` +
  * `(key, ts, tie)` child orderings and then streams BOTH sides through
  * ONE forward-only merge pass per partition — no union materialization,
  * no window state, right side held one row at a time. At 100 TB that is
  * one co-partitioned shuffle per side (exactly what a sort-merge join
  * pays) with O(1) memory in the merge.
  *
  * v1 restrictions (enforced by the caller, `AsOfJoin.apply`): key is a
  * non-null integral column; ts is a TIMESTAMP/long; tie is a non-null
  * integral column unique per (key, ts) group on both sides.
  */
case class AsOfJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, leftTs: Expression, leftTie: Expression,
    rightKey: Expression, rightTs: Expression, rightTie: Expression)
  extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

/** Catalyst's generic PushDownPredicates cannot see through an unknown
  * node, so a Filter above [[AsOfJoinNode]] would otherwise stop there and
  * the scan would read everything. Left-only deterministic conjuncts are
  * safe to push: an as-of join emits every left row exactly once and the
  * right attachment depends only on that row's own values, so filtering
  * before ≡ filtering after. Once below the node, the stock rules carry
  * the predicate the rest of the way into the parquet scan. */
object PushFilterThroughAsOfJoin extends Rule[LogicalPlan] with PredicateHelper {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, a: AsOfJoinNode) =>
      val (pushable, rest) = splitConjunctivePredicates(cond)
        .partition(p => p.deterministic && p.references.subsetOf(a.left.outputSet))
      if (pushable.isEmpty) f
      else {
        val pushed = a.copy(left = Filter(pushable.reduce(And), a.left))
        rest.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: AsOfJoinNode =>
      AsOfJoinExec(planLater(n.left), planLater(n.right),
        n.leftKey, n.leftTs, n.leftTie, n.rightKey, n.rightTs, n.rightTie) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, leftTs: Expression, leftTie: Expression,
    rightKey: Expression, rightTs: Expression, rightTie: Expression)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // Co-partition on the key (one exchange per side, same price as SMJ)…
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  // …and sort each partition so the merge is a single forward pass.
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending),
      SortOrder(leftTie, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending),
      SortOrder(rightTie, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending),
      SortOrder(leftTie, Ascending))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val outAttrs = output // captured: closing over `this` isn't serializable
    val (lk, lt, lc) = (leftKey, leftTs, leftTie)
    val (rk, rt, rc) = (rightKey, rightTs, rightTie)
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // codegen'd 3-column (key, ts, tie) extractors — one generated
      // projection call per row instead of three interpreted evals
      val lProj = UnsafeProjection.create(
        Seq(lk, lt, lc).map(BindReferences.bindReference(_, AttributeSeq(lOut))))
      val rProj = UnsafeProjection.create(
        Seq(rk, rt, rc).map(BindReferences.bindReference(_, AttributeSeq(rOut))))
      val joined = new JoinedRow
      // SparkPlan's execute() contract expects UnsafeRow output (collect's
      // getByteArrayRdd casts); JoinedRow alone only works when a project
      // happens to sit above. One codegen'd projection per output row.
      // MUST bind against `output` (right side nullability-adjusted), not
      // the raw child attributes: BindReferences takes nullability from
      // the INPUT schema, and a non-nullable slot skips the null check and
      // writes 0 instead of null for the padded side.
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)
      val nullRight = new GenericInternalRow(rOut.length)
      val rBuf = rIter.buffered
      // Last right row consumed by the forward pass (rows are reused by
      // the iterator, so the held row must be a copy).
      var held: InternalRow = null
      var heldKey = 0L
      // getLong on a null slot silently reads 0 — reject nulls loudly
      // instead of mis-joining (v1 restriction: key/ts/tie non-null).
      def requireNoNulls(r: InternalRow, side: String): Unit =
        if (r.isNullAt(0) || r.isNullAt(1) || r.isNullAt(2))
          throw new IllegalStateException(
            s"AsOfJoin: null $side key/ts/tie value; v1 requires non-null " +
              "join columns (filter or coalesce them first)")
      lIter.map { l =>
        val lKeys = lProj(l)
        requireNoNulls(lKeys, "left")
        val lkv = lKeys.getLong(0)
        val ltv = lKeys.getLong(1)
        val lcv = lKeys.getLong(2)
        var advance = true
        while (advance && rBuf.hasNext) {
          val rKeys = rProj(rBuf.head)
          requireNoNulls(rKeys, "right")
          val rkv = rKeys.getLong(0)
          val eligible = rkv < lkv || (rkv == lkv && {
            val rtv = rKeys.getLong(1)
            rtv < ltv || (rtv == ltv && rKeys.getLong(2) <= lcv)
          })
          if (eligible) {
            held = rBuf.next().copy()
            heldKey = rkv
          } else advance = false
        }
        if (held != null && heldKey == lkv) outProj(joined(l, held))
        else outProj(joined(l, nullRight))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoin {
  /** As-of join two frames. Column names must be distinct across sides
    * (rename the right side first); key/tie integral non-null, ts a
    * timestamp. Registers the planner strategy idempotently via the
    * public experimental-methods hook. */
  def apply(leftDf: DataFrame, rightDf: DataFrame,
      leftKey: String, leftTs: String, leftTie: String,
      rightKey: String, rightTs: String, rightTie: String): DataFrame = {
    val spark = leftDf.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    if (!spark.experimental.extraOptimizations.contains(PushFilterThroughAsOfJoin))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ PushFilterThroughAsOfJoin
    val lPlan = leftDf.queryExecution.analyzed
    val rPlan = rightDf.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"no column $n in ${p.output.map(_.name)}"))
    // The exec compares all three columns as raw longs (getLong on an
    // UnsafeProjection), so anything not long-shaped must be widened or
    // rejected HERE — an IntegerType key read as a long would silently
    // zero-extend negatives into huge positives and mis-join.
    import org.apache.spark.sql.catalyst.expressions.Cast
    import org.apache.spark.sql.types._
    def asKey(a: Attribute, what: String): Expression = a.dataType match {
      case LongType => a
      case ByteType | ShortType | IntegerType => Cast(a, LongType)
      case other => throw new IllegalArgumentException(
        s"AsOfJoin $what column '${a.name}' must be an integral type, got $other")
    }
    def asTs(a: Attribute, what: String): Expression = a.dataType match {
      // TimestampType/NTZ store micros as a long; order-preserving as-is.
      case LongType | TimestampType | TimestampNTZType => a
      case ByteType | ShortType | IntegerType => Cast(a, LongType)
      case other => throw new IllegalArgumentException(
        s"AsOfJoin $what column '${a.name}' must be a timestamp or integral type, got $other")
    }
    val (lk, lt, lc) =
      (attr(lPlan, leftKey), attr(lPlan, leftTs), attr(lPlan, leftTie))
    val (rk, rt, rc) =
      (attr(rPlan, rightKey), attr(rPlan, rightTs), attr(rPlan, rightTie))
    GraftSqlBridge.ofRows(spark, AsOfJoinNode(lPlan, rPlan,
      asKey(lk, "left key"), asTs(lt, "left ts"), asKey(lc, "left tie"),
      asKey(rk, "right key"), asTs(rt, "right ts"), asKey(rc, "right tie")))
  }
}
