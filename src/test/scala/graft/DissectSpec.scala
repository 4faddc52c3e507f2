package graft

import org.apache.spark.sql.functions.col
import graft.functions.Dissect

/** Unit pins for the dissect compiler (functions/Dissect.scala): field
  * extraction, the all-or-nothing no-match contract, strict trailing
  * literals, and the ambiguous patterns that must be rejected at compile
  * time. */
class DissectSpec extends SparkSpec {

  import spark.implicits._

  private def run(pattern: String, lines: String*): Seq[Seq[String]] = {
    val df = lines.toDF("line")
    val fs = Dissect.fields(col("line"), pattern)
    df.select(fs.map { case (n, c) => c.as(n) }: _*)
      .collect().toSeq.map(r => (0 until r.length).map(i =>
        if (r.isNullAt(i)) null else r.getString(i)))
  }

  test("fields extract positionally between literal separators") {
    val got = run("%{ip} - %{user} [%{ts}] %{msg}",
      "10.0.0.1 - alice [2026-01-01T00:00:00] GET /index")
    assert(got == Seq(Seq("10.0.0.1", "alice", "2026-01-01T00:00:00",
      "GET /index")))
  }

  test("leftmost separator wins — fields capture minimal text") {
    // the second ' - ' belongs to the msg, not the separator search
    val got = run("%{a} - %{b}", "x - y - z")
    assert(got == Seq(Seq("x", "y - z")))
  }

  test("missing separator nulls EVERY field (all-or-nothing)") {
    val got = run("%{id} %{type} [%{user}] %{rest}",
      "7 signup no-bracket-section here")
    assert(got == Seq(Seq(null, null, null, null)))
  }

  test("leading literal must match; empty captures are allowed") {
    assert(run("id=%{id} v=%{v}", "id= v=3") == Seq(Seq("", "3")))
    assert(run("id=%{id} v=%{v}", "xd=1 v=3") == Seq(Seq(null, null)))
  }

  test("a trailing literal must consume the line end") {
    assert(run("[%{x}]", "[a]") == Seq(Seq("a")))
    assert(run("[%{x}]", "[a] trailing") == Seq(Seq(null)))
  }

  test("null line yields null fields, not an error") {
    val df = Seq(Some("a b"), None).map(Tuple1(_)).toDF("line")
    val fs = Dissect.fields(col("line"), "%{x} %{y}")
    val rows = df.select(fs.map { case (n, c) => c.as(n) }: _*).collect()
    assert(rows(0).getString(0) == "a" && rows(1).isNullAt(0))
  }

  test("ambiguous or malformed patterns are rejected at compile time") {
    intercept[IllegalArgumentException](Dissect.parse("no tokens at all"))
    intercept[IllegalArgumentException](Dissect.parse("%{a}%{b}"))
    intercept[IllegalArgumentException](Dissect.parse("%{a} %{a}"))
  }
}
