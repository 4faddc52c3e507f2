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
  * | `graft_dot_a(a, b)` | array<float|double> × array<float|double> → double | [[DotProductAny]] codegen |
  * | `graft_simhash64(words)` | array<string> → bigint | [[SimHash64]] codegen |
  * | `graft_lsh_sigs(emb)` | array<float> → array<int> | [[LshSigs]] codegen |
  * | `graft_grok_capture(s, 'expr')` | string × grok-literal → array<string> | [[GrokCapture]] (grok compiled at plan time) |
  * | `graft_kmv_distinct(c[, k])` | any [, int literal] → bigint | [[KmvDistinct]] sketch agg |
  * | `graft_mg_candidates(c[, k])` | string [, int literal] → array<string> | [[MisraGries]] sketch agg |
  * | `graft_nfc(s)` | string → string | [[NfcNormalize]] codegen (UAX#15 NFC) |
  * | `graft_png_decode(b)` | binary → struct | [[PngDecode]] native decoder |
  * | `graft_bmp_decode(b)` | binary → struct | [[BmpDecode]] native decoder |
  * | `graft_jpeg_meta(b)` | binary → struct | [[JpegMeta]] header walk |
  * | `graft_gray_hist16(b)` | binary → array<bigint> | [[GrayHist16]] |
  * | `graft_wav_decode(b)` | binary → struct | [[WavDecode]] |
  *
  * No-Scala path: `--conf spark.sql.extensions=graft.GraftExtensions`
  * injects the same table at session build (spark-sql / Thrift / any
  * pure-SQL surface).
  */
object GraftFunctions {

  private[functions] def intLit(e: Expression, what: String): Int = {
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

  /** The ONE (SQL name → expression builder) table, shared by the two
    * registration paths: [[registerAll]] (per-session, programmatic) and
    * `graft.GraftExtensions` (config-time `spark.sql.extensions`
    * injection — the path a spark-sql / Thrift / notebook user reaches
    * without any Scala). One table so the SQL surface cannot fork. */
  private[graft] val builders: Seq[(String, Seq[Expression] => Expression)] =
    Seq(
      "graft_dot_f" -> (exprs => DotProductF(exprs(0), exprs(1))),
      "graft_dot_a" -> (exprs => DotProductAny(exprs(0), exprs(1))),
      "graft_simhash64" -> (exprs => SimHash64(exprs.head)),
      "graft_lsh_sigs" -> (exprs => LshSigs(exprs.head)),
      // grok from SQL: the %{NAME:field} expression compiles at plan time;
      // malformed patterns fail analysis, not execution
      "graft_grok_capture" -> (exprs => GrokCapture(exprs(0),
        Grok.compile(strLit(exprs(1), "grok expression"))._1)),
      "graft_kmv_distinct" -> (exprs => KmvDistinct(exprs.head,
        if (exprs.size > 1) intLit(exprs(1), "kmv k") else 256)
        .toAggregateExpression()),
      "graft_mg_candidates" -> (exprs => MisraGries(exprs.head,
        if (exprs.size > 1) intLit(exprs(1), "mg k") else 16)
        .toAggregateExpression()),
      "graft_nfc" -> (exprs => NfcNormalize(exprs.head)),
      // the multimodal decode/feature surface (r15): binary in, typed
      // struct/array out — the same native codegen expressions the mm_*
      // keys run, reachable from pure SQL
      "graft_png_decode" -> (exprs => PngDecode(exprs.head)),
      "graft_bmp_decode" -> (exprs => BmpDecode(exprs.head)),
      "graft_jpeg_meta" -> (exprs => JpegMeta(exprs.head)),
      "graft_gray_hist16" -> (exprs => GrayHist16(exprs.head)),
      "graft_wav_decode" -> (exprs => WavDecode(exprs.head)),
      // single-pass pixel/sample feature folds (r18 optimization round):
      // the native replacements for the mm_* keys' interpreted HOF chains,
      // exposed through the same two registration doors
      "graft_int_csv_md5" -> (exprs => IntCsvMd5(exprs.head)),
      "graft_int_sum_long" -> (exprs => IntSumLong(exprs.head)),
      "graft_wav_feats" -> (exprs => WavFeats(exprs.head)),
      "graft_frame_feats" -> (exprs => FrameFeats(exprs.head)),
      "graft_tile_sums" -> (exprs => TileSums(exprs(0), exprs(1), exprs(2))),
      "graft_edge_energy" -> (exprs => EdgeEnergy(exprs(0), exprs(1))),
      "graft_downsample2x" -> (exprs =>
        Downsample2x(exprs(0), exprs(1), exprs(2), exprs(3))),
      "graft_shingles3" -> (exprs => Shingles3(exprs.head)),
      "graft_span_md5s" -> (exprs => SpanMd5s(exprs.head)),
      "graft_quant_sum_vec" -> (exprs =>
        QuantSumVec(exprs.head).toAggregateExpression()),
      // fused per-row centroid selection (r19 optimization round): the
      // IVF assignment/probe passes without a vec_id exchange or window
      "graft_top_cents" -> (exprs => TopCentroids(exprs(0), exprs(1),
        exprs(2), intLit(exprs(3), "top cents k"))),
      "graft_nearest_cent" -> (exprs =>
        NearestCentroid(exprs(0), exprs(1), exprs(2))),
    )

  def registerAll(spark: SparkSession): Unit = {
    val r = spark.sessionState.functionRegistry
    builders.foreach { case (name, builder) =>
      r.createOrReplaceTempFunction(name, builder, "built-in")
    }
  }
}
