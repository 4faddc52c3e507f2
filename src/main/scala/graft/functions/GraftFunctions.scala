package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.unsafe.types.UTF8String

/** One-call registration of every custom graft function into a session's
  * function registry, making the whole custom surface usable from PURE SQL
  * (`spark.sql("SELECT graft_simhash64(...)")`) as well as the Column API —
  * the library entry point a user of the reference engine would call once
  * at session start. Idempotent; names are stable.
  *
  * | SQL name | signature | backing |
  * |---|---|---|
  * | `graft_dot_f(a, b)` | array<float> × array<float> → double | [[DotProductF]] codegen |
  * | `graft_simhash64(words)` | array<string> → bigint | [[SimHash64]] codegen |
  * | `graft_lsh_sigs(emb)` | array<float> → array<int> | [[LshSigs]] codegen |
  * | `graft_grok_capture(s, 'expr')` | string × grok-literal → array<string> | [[GrokCapture]] (grok compiled at plan time) |
  * | `graft_kmv_distinct(c[, k])` | any [, int literal] → bigint | [[KmvDistinct]] sketch agg |
  * | `graft_mg_candidates(c[, k])` | string [, int literal] → array<string> | [[MisraGries]] sketch agg |
  * | `graft_nfc(s)` | string → string | [[NfcNormalize]] codegen (UAX#15 NFC) |
  */
object GraftFunctions {

  private def intLit(e: Expression, what: String): Int = {
    require(e.foldable, s"$what must be a literal integer")
    val v = e.eval() match {
      case i: Int => i.toLong
      case l: Long => l
      case other => throw new IllegalArgumentException(
        s"$what must be a literal integer, got $other")
    }
    // silent Long truncation would turn 2^33 into k=0 and break the
    // sketch invariants without an error
    require(v >= 1 && v <= Int.MaxValue, s"$what must be in [1, 2^31), got $v")
    v.toInt
  }

  private def strLit(e: Expression, what: String): String = {
    require(e.foldable, s"$what must be a string literal")
    e.eval() match {
      case s: UTF8String => s.toString
      case other => throw new IllegalArgumentException(
        s"$what must be a string literal, got $other")
    }
  }

  def registerAll(spark: SparkSession): Unit = {
    val r = spark.sessionState.functionRegistry
    r.createOrReplaceTempFunction("graft_dot_f",
      exprs => DotProductF(exprs(0), exprs(1)), "built-in")
    r.createOrReplaceTempFunction("graft_simhash64",
      exprs => SimHash64(exprs.head), "built-in")
    r.createOrReplaceTempFunction("graft_lsh_sigs",
      exprs => LshSigs(exprs.head), "built-in")
    // grok from SQL: the %{NAME:field} expression compiles at plan time;
    // malformed patterns fail analysis, not execution
    r.createOrReplaceTempFunction("graft_grok_capture",
      exprs => GrokCapture(exprs(0),
        Grok.compile(strLit(exprs(1), "grok expression"))._1), "built-in")
    r.createOrReplaceTempFunction("graft_kmv_distinct",
      exprs => KmvDistinct(exprs.head,
        if (exprs.size > 1) intLit(exprs(1), "kmv k") else 256)
        .toAggregateExpression(), "built-in")
    r.createOrReplaceTempFunction("graft_mg_candidates",
      exprs => MisraGries(exprs.head,
        if (exprs.size > 1) intLit(exprs(1), "mg k") else 16)
        .toAggregateExpression(), "built-in")
    r.createOrReplaceTempFunction("graft_nfc",
      exprs => NfcNormalize(exprs.head), "built-in")
  }
}
