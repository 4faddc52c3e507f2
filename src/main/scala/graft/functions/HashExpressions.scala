package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}
import org.apache.spark.sql.{Column, SparkSession}

/** Shared machine-state implementations for the SimHash and LSH-signer
  * expressions: ONE definition serves both the interpreted `nullSafeEval`
  * path and the generated code (via `ctx.addReferenceObj`), so the two
  * paths cannot drift. Replaces the last two Scala UDFs in the dedup/ANN
  * family — as native expressions they stay inside whole-stage codegen
  * (no ScalaUDF boxing, no WrappedArray conversion per row).
  */
object SimHashImpl extends Serializable {
  /** Deterministic 64-bit SimHash over a word multiset — bit-identical to
    * the UDF it replaced (String.hashCode is specified; byteswap64 mixes). */
  def compute(words: ArrayData): Long = {
    val acc = new Array[Int](64)
    val n = words.numElements()
    var w = 0
    while (w < n) {
      val h = scala.util.hashing.byteswap64(
        words.getUTF8String(w).toString.hashCode.toLong * 0x9E3779B97F4A7C15L)
      var i = 0
      while (i < 64) { acc(i) += (if (((h >>> i) & 1L) == 1L) 1 else -1); i += 1 }
      w += 1
    }
    var sig = 0L
    var i = 0
    while (i < 64) { if (acc(i) > 0) sig |= (1L << i); i += 1 }
    sig
  }
}

/** Multi-table random-hyperplane LSH signer: `NTables` buckets of up to
  * `MaxBits` sign bits each, hyperplanes drawn once from a fixed seed
  * (deterministic across executors — the plane matrix is broadcast inside
  * the generated class as a reference object).
  *
  * The signer emits the FULL `MaxBits`-bit bucket; consumers mask it to an
  * n-dependent effective width ([[effBitsCaseSql]]) so bucket COUNT grows
  * with the corpus and per-bucket population stays ~[[TargetBucketPop]].
  * A fixed bucket count is the LSH twin of the fixed IVF codebook the r14
  * 10× probe caught: population per bucket grows ~n, candidate pairs ~n²
  * (the r15 full-suite probe measured `llm_ann_lsh` 64.7× at 10× data on
  * the old fixed 6-bit tables). Masking the LOW b bits ≡ using only the
  * first b hyperplanes of each table, so at any corpus size the key is a
  * plain prefix of one deterministic plane family. */
object LshSigsImpl extends Serializable {
  val NTables = 8
  /** Floor width — also the historical fixed width, so corpora up to
    * `32 << 6` vectors (every committed test fixture) keep bit-identical
    * buckets to the pre-r15 signer. */
  val Bits = 6
  /** Planes kept per table; the effective mask never exceeds this. 20 bits
    * ≈ 32-vector buckets at 33M vectors per shard — beyond that, shard the
    * index (the multi-table layout already is the sharding seam). */
  val MaxBits = 20
  /** Desired per-bucket population the effective width aims for. */
  val TargetBucketPop = 32
  val Dim = 64
  private val planes: Array[Array[Double]] = {
    // The first `Bits` planes of every table reproduce the historical
    // NTables×Bits matrix EXACTLY (same RNG stream, same order), so a
    // corpus small enough for the 6-bit floor hashes to the same buckets
    // the pre-widening signer produced; the widening planes are appended
    // from the continued stream.
    val rnd = new scala.util.Random(42)
    val legacy = Array.fill(NTables * Bits, Dim)(rnd.nextGaussian())
    val extra = Array.fill(NTables * (MaxBits - Bits), Dim)(rnd.nextGaussian())
    Array.tabulate(NTables * MaxBits) { r =>
      val t = r / MaxBits
      val j = r % MaxBits
      if (j < Bits) legacy(t * Bits + j)
      else extra(t * (MaxBits - Bits) + (j - Bits))
    }
  }

  /** The effective-bucket-width rule as a SQL CASE over a corpus-count
    * expression — the smallest b in [Bits, MaxBits] with
    * `n <= TargetBucketPop * 2^b`. Pure integer comparisons (no log2
    * float): bit-identical across Spark and DuckDB by construction. ONE
    * definition; the Spark side evaluates the same string via `expr`. */
  def effBitsCaseSql(nSql: String): String =
    (Bits until MaxBits).map(b =>
      s"WHEN $nSql <= ${TargetBucketPop.toLong << b} THEN $b")
      .mkString("CASE ", " ", s" ELSE $MaxBits END")

  /** DuckDB twin of the signer, one FULL-width bucket expression per table
    * over an `emb` DOUBLE[] column: the SAME plane literals
    * (Double.toString is shortest-round-trip, so DuckDB parses back the
    * identical bits) and the SAME summation order (`list_inner_product`
    * accumulates in index order, as does [[compute]]'s loop — float
    * operands widen to double exactly in both engines), so every sign bit
    * matches bit-for-bit and the LSH keys stay fully oracle-able despite
    * the seeded planes. Callers apply the same `% (1 << effBits)` mask as
    * the Spark side. */
  def duckBucketExprs(colSql: String): Seq[String] =
    (0 until NTables).map { t =>
      (0 until MaxBits).map { j =>
        val arr = planes(t * MaxBits + j).map(_.toString).mkString("[", ", ", "]")
        s"(CASE WHEN list_inner_product($colSql, $arr) > 0 THEN ${1 << j} ELSE 0 END)"
      }.mkString("(", " + ", ")")
    }

  def compute(emb: ArrayData): ArrayData = {
    val m = emb.numElements()
    // A mismatched embedding must fail loudly: silently hashing a prefix
    // (or padding with zeros) would bucket vectors of different models
    // together and the recall loss would be invisible.
    if (m != Dim) throw new IllegalArgumentException(
      s"LshSigs: expected $Dim-dim embedding, got $m")
    val out = new Array[Int](NTables)
    var t = 0
    while (t < NTables) {
      var bucket = 0
      var j = 0
      while (j < MaxBits) {
        val p = planes(t * MaxBits + j)
        var dp = 0.0
        var i = 0
        while (i < Dim) { dp += emb.getFloat(i) * p(i); i += 1 }
        if (dp > 0) bucket |= (1 << j)
        j += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }
}

/** words array<string> → 64-bit SimHash signature (codegen'd). */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override protected def nullSafeEval(a: Any): Any =
    SimHashImpl.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val impl = ctx.addReferenceObj("simhashImpl", SimHashImpl,
        SimHashImpl.getClass.getName)
      s"${ev.value} = $impl.compute($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** embedding array<float> → array<int> of per-table LSH buckets (codegen'd). */
case class LshSigs(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override protected def nullSafeEval(a: Any): Any =
    LshSigsImpl.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val impl = ctx.addReferenceObj("lshSigsImpl", LshSigsImpl,
        LshSigsImpl.getClass.getName)
      s"${ev.value} = $impl.compute($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashExpressions {
  /** Column handles via the session function registry (idempotent). */
  def simhash64(spark: SparkSession)(words: Column): Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_simhash64", exprs => SimHash64(exprs.head), "built-in")
    org.apache.spark.sql.functions.call_function("graft_simhash64", words)
  }

  def lshSigs(spark: SparkSession)(emb: Column): Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_lsh_sigs", exprs => LshSigs(exprs.head), "built-in")
    org.apache.spark.sql.functions.call_function("graft_lsh_sigs", emb)
  }
}
