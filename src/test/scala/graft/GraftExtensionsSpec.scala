package graft

import org.apache.spark.sql.SparkSession

/** The config-time SQL surface (r14 verdict #6): `graft.GraftExtensions`
  * injected via `spark.sql.extensions` must expose the whole custom
  * function table to a session the user never touches Scala in — the
  * spark-sql / Thrift deployment shape. */
class GraftExtensionsSpec extends SparkSpec {

  /** A SEPARATE SparkSession on the shared SparkContext, built WITH the
    * extension — injectFunction only applies at session build, which is
    * exactly the point: no registerAll call ever runs against it.
    * `withExtensions(new GraftExtensions)` is the same injection path the
    * `spark.sql.extensions=graft.GraftExtensions` conf takes (the conf
    * list just reflection-instantiates the class and applies it) — the
    * conf itself is read from the SparkContext conf at context START, so
    * on a shared test context it cannot be exercised literally. */
  private lazy val ext: SparkSession = {
    spark // force the shared context first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions())
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    finally {
      SparkSession.setDefaultSession(SparkSpec.session)
      SparkSession.setActiveSession(SparkSpec.session)
    }
  }

  test("injected functions answer pure SQL with no registerAll call") {
    val row = ext.sql(
      """SELECT
        |  graft_dot_f(array(cast(1.0 as float), cast(2.0 as float)),
        |              array(cast(3.0 as float), cast(4.0 as float))) AS dot,
        |  graft_simhash64(split('a b c d e f', ' ')) AS sh,
        |  element_at(graft_grok_capture('n=42 w=hi',
        |    'n=%{INT:n} w=%{WORD:w}'), 1) AS n,
        |  graft_nfc('Café') AS nfc""".stripMargin).head()
    assert(row.getAs[Double]("dot") == 11.0)
    assert(row.getAs[String]("n") == "42")
    assert(row.getAs[String]("nfc") == "Café")
    // same answers as the programmatic registration path
    graft.functions.GraftFunctions.registerAll(spark)
    val viaApi = spark.sql(
      "SELECT graft_simhash64(split('a b c d e f', ' ')) AS sh").head()
    assert(row.getAs[Long]("sh") == viaApi.getAs[Long]("sh"))
    // sketch aggregates inject too (builder wraps toAggregateExpression)
    ext.range(0, 1000).selectExpr("id % 37 AS v")
      .createOrReplaceTempView("gx_agg")
    assert(ext.sql("SELECT graft_kmv_distinct(v) AS k FROM gx_agg")
      .head().getAs[Long]("k") == 37L)
  }

  test("a registry key runs end-to-end on the extension-built session") {
    val viaExt = SparkEntry.queries("fn_grok_patterns")(ext, sf001)
      .collect().toSeq
    val viaBase = SparkEntry.queries("fn_grok_patterns")(spark, sf001)
      .collect().toSeq
    assert(viaExt == viaBase)
    assert(viaExt.nonEmpty)
  }

  test("EVERY registry entry answers pure SQL on the extension session") {
    // r15 verdict #7: the parity proof must enumerate the full function
    // table, not one exemplar — a for-loop over GraftFunctions.builders
    // (the authoritative registry BOTH doors share) that fails on any
    // unregistered, renamed, or smoke-less entry. The smoke map is the
    // per-signature SQL invocation; the two-way set equality below makes
    // adding a function without extending this sweep a test failure, and
    // renaming one without updating the SQL surface an Undefined-function
    // failure inside the loop.
    import org.apache.spark.sql.functions.lit
    def b(tag: String): Array[Byte] = s"gx sweep $tag payload".getBytes("UTF-8")
    ext.range(1).select(
      lit(graft.functions.PngImpl.synth(b("png"))).as("bin_png"),
      lit(graft.functions.BmpImpl.synth(b("bmp"))).as("bin_bmp"),
      lit(graft.functions.JpegImpl.synth(b("jpg"))).as("bin_jpg"),
      lit(graft.functions.WavImpl.synth(b("wav"))).as("bin_wav"))
      .createOrReplaceTempView("gx_sweep")
    val smoke = Map(
      "graft_dot_f" ->
        "graft_dot_f(array(float(1), float(2)), array(float(3), float(4)))",
      "graft_dot_a" ->
        "graft_dot_a(array(float(1), float(2)), array(double(3), double(4)))",
      "graft_simhash64" -> "graft_simhash64(split('a b c d', ' '))",
      "graft_lsh_sigs" -> "graft_lsh_sigs(transform(sequence(1, 64), i -> float(i)))",
      "graft_grok_capture" ->
        "element_at(graft_grok_capture('n=42', 'n=%{INT:n}'), 1)",
      "graft_kmv_distinct" -> "graft_kmv_distinct(bin_png)",
      "graft_mg_candidates" -> "element_at(graft_mg_candidates('w'), 1)",
      "graft_nfc" -> "graft_nfc('Café')",
      "graft_png_decode" -> "graft_png_decode(bin_png).width",
      "graft_bmp_decode" -> "graft_bmp_decode(bin_bmp).width",
      "graft_jpeg_meta" -> "graft_jpeg_meta(bin_jpg).width",
      "graft_gray_hist16" -> "element_at(graft_gray_hist16(array(0, 17, 255)), 1)",
      "graft_wav_decode" -> "graft_wav_decode(bin_wav).sample_rate",
      // r18 optimization round: the single-pass native folds
      "graft_int_csv_md5" -> "graft_int_csv_md5(array(1, 2, 3))",
      "graft_int_sum_long" -> "graft_int_sum_long(array(1, 2, 3))",
      "graft_wav_feats" -> "graft_wav_feats(array(-3, 4, 5)).energy",
      "graft_frame_feats" ->
        "element_at(graft_frame_feats(array(-3, 4, 5)), 1).energy",
      "graft_tile_sums" ->
        "element_at(graft_tile_sums(sequence(1, 80), 10, 8), 1)",
      "graft_edge_energy" ->
        "graft_edge_energy(sequence(1, 80), 10).h_energy",
      "graft_downsample2x" ->
        ("element_at(graft_downsample2x(sequence(1, 80), 10, " +
          "bigint(5), bigint(4)), 1)"),
      "graft_shingles3" -> "element_at(graft_shingles3(split('a b c d', ' ')), 1)",
      "graft_span_md5s" -> "element_at(graft_span_md5s(split('a b c', ' ')), 1)",
      "graft_quant_sum_vec" ->
        "element_at(graft_quant_sum_vec(array(float(0.5), float(1))), 1)",
      // r19 optimization round: the fused per-row centroid selection
      "graft_nearest_cent" ->
        ("graft_nearest_cent(array(float(1), float(0)), double(1), " +
          "array(named_struct('cid', bigint(7), 'cemb', " +
          "array(double(1), double(0)), 'cnorm', double(1))))"),
      "graft_top_cents" ->
        ("element_at(graft_top_cents(array(float(1), float(0)), double(1), " +
          "array(named_struct('cid', bigint(7), 'cemb', " +
          "array(double(1), double(0)), 'cnorm', double(1))), 2), 1).cid"))
    val names = graft.functions.GraftFunctions.builders.map(_._1)
    assert(names.distinct.size == names.size, "duplicate registry names")
    assert(names.toSet == smoke.keySet,
      s"registry/sweep drift: registry-only=${names.toSet -- smoke.keySet} " +
        s"sweep-only=${smoke.keySet -- names.toSet}")
    for (n <- names) {
      val row = ext.sql(s"SELECT ${smoke(n)} AS x FROM gx_sweep").head()
      assert(!row.isNullAt(0), s"$n returned null on its SQL smoke")
    }
  }

  test("fn_grok_patterns' logic as PURE SQL TEXT matches the key") {
    // The r14 verdict's done-criterion: an existing key's logic driven
    // entirely through spark.sql("SELECT graft_grok_capture(…)") text —
    // the same msg synthesis, the same compiled grok, zero Column API.
    T(ext, sf001, "events").createOrReplaceTempView("gx_events")
    val viaSql = ext.sql(
      """SELECT event_id,
        |  g[0] AS ts_str, g[1] AS level, g[2] AS client_ip,
        |  g[3] AS username, g[4] AS req_id, g[5] AS took
        |FROM (
        |  SELECT event_id, graft_grok_capture(concat_ws(' ',
        |    date_format(ts, "yyyy-MM-dd'T'HH:mm:ss"),
        |    CASE event_type WHEN 'click' THEN 'INFO' WHEN 'view' THEN 'DEBUG'
        |      WHEN 'purchase' THEN 'NOTICE' WHEN 'error' THEN 'ERROR'
        |      ELSE 'WARN' END,
        |    concat('10.', CAST(user_id % 250 AS STRING), '.0.',
        |           CAST(event_id % 250 AS STRING)),
        |    concat('user=u', CAST(user_id AS STRING)),
        |    concat('req_id=', CAST(event_id AS STRING)),
        |    concat('took=', CAST(event_id % 100 AS STRING), '.',
        |           CAST(user_id % 10 AS STRING))),
        |    '%{TIMESTAMP_ISO8601:ts_str} %{LOGLEVEL:level} %{IP:client_ip} user=%{USERNAME:username} req_id=%{INT:req_id:int} took=%{NUMBER:took:float}'
        |  ) AS g FROM gx_events)
        |ORDER BY event_id""".stripMargin)
    val key = SparkEntry.queries("fn_grok_patterns")(ext, sf001)
    // compare value-by-value as strings (the SQL twin keeps raw captures;
    // the key applies the :int/:float coercions — string forms agree)
    def asStrings(df: org.apache.spark.sql.DataFrame): Seq[Seq[String]] =
      df.select(df.columns.map(c =>
        org.apache.spark.sql.functions.col(c).cast("string")): _*)
        .collect().toSeq.map(r =>
          (0 until r.length).map(i => if (r.isNullAt(i)) "∅" else r.getString(i)))
    val a = asStrings(viaSql)
    val b = asStrings(key)
    assert(a.nonEmpty && a.size == b.size)
    assert(a == b, s"SQL-text twin diverged from the key")
  }
}
