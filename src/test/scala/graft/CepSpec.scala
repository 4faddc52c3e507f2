package graft

import graft.flow.Cep

/** Pins the Cep pattern→regex compiler: emitted subset, contiguity and
  * token-boundary semantics (via Java's engine — the oracle gate covers
  * RE2 agreement on the same strings), plus the count-mode position
  * semantics through the flow op. */
class CepSpec extends SparkSpec {

  private def m(pattern: String, path: String): Boolean =
    java.util.regex.Pattern.compile(Cep.compile(pattern)).matcher(path).find()

  test("literal chain matches contiguously, anywhere in the path") {
    assert(m("a>b", "a>b>c>"))
    assert(m("b>c", "a>b>c>"))
    assert(!m("a>c", "a>b>c>"), "contiguity: b between a and c must block")
  }

  test("token boundaries: no substring aliasing") {
    assert(!m("view", "preview>"), "token 'view' must not match 'preview'")
    assert(!m("pre", "preview>"), "prefix must not match a longer token")
    assert(m("preview", "preview>"))
  }

  test("quantifiers and alternation") {
    assert(m("a>(b|c)*>d", "a>d>"))
    assert(m("a>(b|c)*>d", "a>b>c>b>d>"))
    assert(!m("a>(b|c)*>d", "a>b>x>d>"))
    assert(m("a>b+>c", "a>b>b>c>"))
    assert(!m("a>b+>c", "a>c>"))
    assert(m("a>b?>c", "a>c>"))
  }

  test("wildcard token") {
    assert(m("a>.>c", "a>x>c>"))
    assert(!m("a>.>c", "a>c>"))
    assert(m("a>.*>c", "a>c>"))
    assert(m("a>.*>c", "a>x>y>c>"))
  }

  test("count mode: literalSteps parses atoms, rejects quantifiers") {
    assert(Cep.literalSteps("a>(b|c)>.") ==
      Seq(Some(Seq("a")), Some(Seq("b", "c")), None))
    intercept[IllegalArgumentException](Cep.literalSteps("a>b*>c"))
    intercept[IllegalArgumentException](Cep.literalSteps("a>b+"))
    intercept[IllegalArgumentException](Cep.literalSteps("a?>b"))
  }

  test("count mode positions: adjacent and overlapping runs all count") {
    val df = spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row("view>click>view>click>"),
        org.apache.spark.sql.Row("view>view>view>"),
        org.apache.spark.sql.Row("click>")),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("path",
          org.apache.spark.sql.types.StringType))))
    val spec =
      """{"steps":[
        |{"op":"cep","field":"path","as":"c_vc","mode":"count","pattern":"view>click"},
        |{"op":"cep","field":"path","as":"c_vv","mode":"count","pattern":"view>view"}
        |]}""".stripMargin
    val got = graft.flow.Flow.compileOn(spark, sf001, df, spec)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(
      ("view>click>view>click>", 2L, 0L),
      ("view>view>view>", 0L, 2L), // overlapping positions 1 and 2 both count
      ("click>", 0L, 0L)))
  }

  test("within bound: only occurrences whose span fits the window count") {
    import org.apache.spark.sql.{Row, types => t}
    val schema = t.StructType(Seq(
      t.StructField("path", t.StringType),
      t.StructField("eps", t.ArrayType(t.LongType))))
    // gaps (µs): 100s, 700s, 50s — view starts at positions 1, 2, 3
    val df = spark.createDataFrame(
      java.util.Arrays.asList(
        Row("view>view>view>click>",
          Seq(0L, 100000000L, 800000000L, 850000000L))),
      schema)
    def count(spec: String): Long =
      graft.flow.Flow.compileOn(spark, sf001, df, spec).collect()(0).getLong(0)
    def specFor(extra: String): String =
      s"""{"steps":[{"op":"cep","field":"path","as":"c","mode":"count",
         | "pattern":"view>."$extra},
         |{"op":"agg","groupBy":[],"aggs":["CAST(sum(c) AS BIGINT) AS c"]}]}"""
        .stripMargin
    assert(count(specFor("")) == 3L) // unbounded: all 3 starts
    assert(count(specFor(""","within_s":600,"epochs":"eps"""")) == 2L,
      "the 700s gap must fall out of a 600s window")
    assert(count(specFor(""","within_s":0,"epochs":"eps"""")) == 0L,
      "degenerate 0s window matches nothing with positive gaps")
    assert(count(specFor(""","within_s":100000,"epochs":"eps"""")) == 3L,
      "a huge window degenerates to the unbounded count")
  }

  test("skip past_last: greedy non-overlapping scan vs start-position count") {
    import org.apache.spark.sql.{Row, types => t}
    val df = spark.createDataFrame(
      java.util.Arrays.asList(
        Row("view>view>view>click>"), // starts 1,2,3 → overlap 3, greedy 2
        Row("view>click>"), //            start 1     → 1, 1
        Row("error>")), //                              0, 0
      t.StructType(Seq(t.StructField("path", t.StringType))))
    val spec =
      """{"steps":[
        |{"op":"cep","field":"path","as":"c_all","mode":"count",
        | "pattern":"(view|click)>(view|click)"},
        |{"op":"cep","field":"path","as":"c_noov","mode":"count",
        | "pattern":"(view|click)>(view|click)","skip":"past_last"}
        |]}""".stripMargin
    val got = graft.flow.Flow.compileOn(spark, sf001, df, spec)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(
      ("view>view>view>click>", 3L, 2L),
      ("view>click>", 1L, 1L),
      ("error>", 0L, 0L)))
    got.foreach { case (_, all, noov) => assert(noov <= all) }
  }

  test("within bound without epochs fails loudly") {
    import org.apache.spark.sql.{Row, types => t}
    val df = spark.createDataFrame(
      java.util.Arrays.asList(Row("a>b>")),
      t.StructType(Seq(t.StructField("path", t.StringType))))
    val spec =
      """{"steps":[{"op":"cep","field":"path","as":"c","mode":"count",
        | "pattern":"a>b","within_s":60}]}""".stripMargin
    intercept[RuntimeException](
      graft.flow.Flow.compileOn(spark, sf001, df, spec).collect())
  }

  test("expandedSteps: bounded quantifier expansion arithmetic") {
    // quantifier-free ≡ literalSteps, exactly one expansion
    assert(Cep.expandedSteps("a>(b|c)>.") == Seq(Cep.literalSteps("a>(b|c)>.")))
    // a>b*>c at max_rep 2: lengths 2, 3, 4
    val e = Cep.expandedSteps("a>b*>c", 2)
    assert(e.map(_.length).sorted == Seq(2, 3, 4))
    assert(e.contains(Seq(Some(Seq("a")), Some(Seq("c")))))
    assert(e.contains(Seq(Some(Seq("a")), Some(Seq("b")), Some(Seq("b")),
      Some(Seq("c")))))
    // `?` is {0,1} regardless of max_rep; `+` is {1..max_rep}
    assert(Cep.expandedSteps("a?>b", 5).map(_.length).sorted == Seq(1, 2))
    assert(Cep.expandedSteps("a>b+", 3).map(_.length).sorted == Seq(2, 3, 4))
    // wildcard quantifies too
    assert(Cep.expandedSteps("a>.?>c").map(_.length).sorted == Seq(2, 3))
    // all-optional (empty match) and bare quantifiers reject loudly
    intercept[IllegalArgumentException](Cep.expandedSteps("a?>b*"))
    intercept[IllegalArgumentException](Cep.expandedSteps("*>b"))
    // expansion cap: 7 starred steps at max_rep 2 = 3^7 > 64
    intercept[IllegalArgumentException](
      Cep.expandedSteps("a*>b*>c*>d*>e*>f*>g*", 2))
  }

  test("count mode: quantified patterns count existentially per start") {
    import org.apache.spark.sql.{Row, types => t}
    val df = spark.createDataFrame(
      java.util.Arrays.asList(
        Row("a>b>b>c>"), // a>b*>c: the 4-window at 1 (two b's)
        Row("a>c>"),     // the 0-rep window
        Row("a>a>c>"),   // starts 1 (a>a?>c via 3-window) and 2 (2-window)
        Row("a>b>b>b>c>")), // run of 3 b's: beyond max_rep 2 — NOT counted
      t.StructType(Seq(t.StructField("path", t.StringType))))
    val spec =
      """{"steps":[
        |{"op":"cep","field":"path","as":"c_abc","mode":"count",
        | "pattern":"a>b*>c","max_rep":2},
        |{"op":"cep","field":"path","as":"c_aac","mode":"count",
        | "pattern":"a>a?>c"}
        |]}""".stripMargin
    val got = graft.flow.Flow.compileOn(spark, sf001, df, spec)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(
      ("a>b>b>c>", 1L, 0L),
      ("a>c>", 1L, 1L),
      ("a>a>c>", 1L, 2L),
      ("a>b>b>b>c>", 0L, 0L)))
  }

  test("permute: all orderings, existential per start, caps and rejects") {
    // 3 steps → 3! orderings, every one length 3
    val p = Cep.permuteSteps("a>b>c")
    assert(p.size == 6 && p.forall(_.length == 3))
    assert(p.contains(Seq(Some(Seq("c")), Some(Seq("a")), Some(Seq("b")))))
    // quantifiers inside a permute reject via the literal parse
    intercept[IllegalArgumentException](Cep.permuteSteps("a>b*>c"))
    // single step and 5!-explosion reject loudly
    intercept[IllegalArgumentException](Cep.permuteSteps("a"))
    intercept[IllegalArgumentException](Cep.permuteSteps("a>b>c>d>e"))

    import org.apache.spark.sql.{Row, types => t}
    val df = spark.createDataFrame(
      java.util.Arrays.asList(
        Row("c>a>b>"),   // reversed-ish order: counts (1 start)
        Row("a>b>c>a>"), // windows at 1 and 2: (a,b,c) and (b,c,a) — 2
        Row("a>b>b>c>"), // no 3-window holds all three distinct — 0
        Row("a>b>")),    // shorter than the window — 0
      t.StructType(Seq(t.StructField("path", t.StringType))))
    val spec =
      """{"steps":[{"op":"cep","field":"path","as":"c","mode":"count",
        | "pattern":"a>b>c","permute":true}]}""".stripMargin
    val got = graft.flow.Flow.compileOn(spark, sf001, df, spec)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(("c>a>b>", 1L), ("a>b>c>a>", 2L),
      ("a>b>b>c>", 0L), ("a>b>", 0L)))
  }

  test("skip past_last rejects quantified patterns loudly") {
    import org.apache.spark.sql.{Row, types => t}
    val df = spark.createDataFrame(
      java.util.Arrays.asList(Row("a>b>")),
      t.StructType(Seq(t.StructField("path", t.StringType))))
    val spec =
      """{"steps":[{"op":"cep","field":"path","as":"c","mode":"count",
        | "pattern":"a>b*>c","skip":"past_last"}]}""".stripMargin
    intercept[IllegalArgumentException](
      graft.flow.Flow.compileOn(spark, sf001, df, spec).collect())
  }

  test("bad patterns fail loudly") {
    intercept[IllegalArgumentException](Cep.compile(""))
    intercept[IllegalArgumentException](Cep.compile("a>>b"))
    intercept[IllegalArgumentException](Cep.compile("a>"))
    intercept[IllegalArgumentException](Cep.compile("a>(b|)>c"))
    intercept[IllegalArgumentException](Cep.compile("a>B>c"))
    intercept[IllegalArgumentException](Cep.compile("a>b.c"))
  }
}
