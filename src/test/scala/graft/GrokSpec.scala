package graft

import org.apache.spark.sql.functions._
import graft.functions.Grok

/** Grok pattern-library compiler + extraction semantics. */
class GrokSpec extends SparkSpec {

  import spark.implicits._

  test("compile: named refs become capture groups in order; types recorded") {
    val (re, fields) = Grok.compile("%{INT:n:int} %{WORD:w} %{NUMBER:x:float}")
    assert(fields.map(f => (f.name, f.coerce, f.group)) ==
      Seq(("n", Some("int"), 1), ("w", None, 2), ("x", Some("float"), 3)))
    val m = java.util.regex.Pattern.compile(re).matcher("-42 hello 3.14")
    assert(m.find())
    assert(m.group(1) == "-42" && m.group(2) == "hello" && m.group(3) == "3.14")
  }

  test("compile: nested dictionary refs expand non-capturing (NUMBER -> BASE10NUM)") {
    val (re, fields) = Grok.compile("%{NUMBER:x}")
    assert(fields == Seq(Grok.Field("x", None, 1)))
    // exactly ONE capturing group: nested expansion must not shift indices
    assert(java.util.regex.Pattern.compile(re).matcher("1.5").groupCount() == 1)
  }

  test("compile: unknown pattern throws") {
    intercept[IllegalArgumentException](Grok.compile("%{NOPE:x}"))
  }

  test("compile: malformed reference fails loudly, not silently-never-matching") {
    // bad coercion: Ref can't parse it, so the %{...} would survive as
    // literal text and kill the whole match — must throw instead
    intercept[IllegalArgumentException](Grok.compile("%{INT:status:bool}"))
    // bad field name (dash not allowed)
    intercept[IllegalArgumentException](Grok.compile("%{WORD:ts-str}"))
  }

  test("compile: raw user capture group rejected (would shift field indices)") {
    val ex = intercept[IllegalArgumentException](
      Grok.compile("(foo|bar) %{INT:n:int}"))
    assert(ex.getMessage.contains("non-capturing"))
    // non-capturing literal group is fine
    val (_, fs) = Grok.compile("(?:foo|bar) %{INT:n:int}")
    assert(fs.map(_.group) == Seq(1))
  }

  test("compile: duplicate field name rejected (would emit ambiguous schema)") {
    val ex = intercept[IllegalArgumentException](
      Grok.compile("%{INT:x:int} %{INT:x:int}"))
    assert(ex.getMessage.contains("duplicate field name"))
    // distinct names with the same pattern are fine
    val (_, fs) = Grok.compile("%{INT:x:int} %{INT:y:int}")
    assert(fs.map(_.name) == Seq("x", "y"))
  }

  test("apache-style access log line extracts typed fields end-to-end") {
    val pat = "%{IPORHOST:client} %{USER:ident} %{USER:auth} " +
      "\\[%{HTTPDATE:when}\\] \"%{WORD:verb} %{NOTSPACE:path} " +
      "HTTP/%{NUMBER:httpver:float}\" %{INT:status:int} %{INT:bytes:int}"
    val line = "203.0.113.9 - frank [10/Oct/2000:13:55:36 -0700] " +
      "\"GET /apache_pb.gif HTTP/1.0\" 200 2326"
    val row = Seq(line).toDF("msg")
      .select(Grok.columns(col("msg"), pat): _*).collect().head
    assert(row.getAs[String]("client") == "203.0.113.9")
    assert(row.getAs[String]("auth") == "frank")
    assert(row.getAs[String]("when") == "10/Oct/2000:13:55:36 -0700")
    assert(row.getAs[String]("verb") == "GET")
    assert(row.getAs[String]("path") == "/apache_pb.gif")
    assert(row.getAs[Long]("status") == 200L)
    assert(row.getAs[Long]("bytes") == 2326L)
  }

  test("non-matching line yields empty strings and null numerics, not errors") {
    val row = Seq("no numbers here at all########")
      .toDF("msg")
      .select(Grok.columns(col("msg"), "q=%{INT:q:int} ip=%{IP:ip}"): _*)
      .collect().head
    assert(row.isNullAt(row.fieldIndex("q")))
    assert(row.getAs[String]("ip") == "")
  }

  test("one-pass capture path == per-field regexp_extract path") {
    val pat = "%{LOGLEVEL:level} %{IP:ip} n=%{INT:n:int} x=%{NUMBER:x:float}"
    val lines = Seq(
      "INFO 10.1.2.3 n=42 x=3.5",
      "ERROR 255.0.0.1 n=-7 x=.25",
      "garbage line with no fields").toDF("msg")
    val perField = lines.select(
      graft.functions.Grok.columns(col("msg"), pat): _*).collect().toSeq
    val onePass = lines.select(
      graft.functions.Grok.columnsOnePass(spark)(col("msg"), pat): _*)
      .collect().toSeq
    assert(onePass == perField)
  }

  test("null input line yields null fields in both extraction paths") {
    val df = Seq[Option[String]](None, Some("n=5")).toDF("msg")
    Seq(
      df.select(Grok.columns(col("msg"), "n=%{INT:n:int}"): _*),
      df.select(Grok.columnsOnePass(spark)(col("msg"), "n=%{INT:n:int}"): _*)
    ).foreach { out =>
      val rows = out.collect()
      assert(rows.exists(_.isNullAt(0)) && rows.exists(r => !r.isNullAt(0)))
    }
  }

  test("dispatch: first-match-wins, union fields, no-match all-null") {
    val fmts = Seq(
      "^err code=%{INT:code:int} user=%{USERNAME:user}$",
      "^ok user=%{USERNAME:user} ms=%{NUMBER:ms:float}$")
    val df = Seq("err code=7 user=bob", "ok user=eve ms=1.5", "nonsense")
      .toDF("msg")
      .withColumn("fmt", Grok.dispatchFormatId(fmts)(col("msg")))
    val out = df.select(col("fmt") +:
      Grok.dispatchFields(spark)(col("msg"), col("fmt"), fmts): _*)
    assert(out.columns.toSeq == Seq("fmt", "code", "user", "ms"))
    val rows = out.collect().toSeq
    assert(rows(0).getLong(0) == 0L && rows(0).getLong(1) == 7L &&
      rows(0).getString(2) == "bob" && rows(0).isNullAt(3))
    assert(rows(1).getLong(0) == 1L && rows(1).isNullAt(1) &&
      rows(1).getString(2) == "eve" && rows(1).getDouble(3) == 1.5)
    assert(rows(2).getLong(0) == -1L && rows(2).isNullAt(1) &&
      rows(2).isNullAt(2) && rows(2).isNullAt(3))
  }

  test("one-pass dispatchStruct equals the two-step dispatch (r18 opt)") {
    val fmts = Seq(
      "^err code=%{INT:code:int} user=%{USERNAME:user}$",
      "^ok user=%{USERNAME:user} ms=%{NUMBER:ms:float}$",
      "^warn host=%{WORD:host} code=%{INT:code:int}$")
    val df = Seq("err code=7 user=bob", "ok user=eve ms=1.5", "nonsense",
      "warn host=h9 code=42", "err code=1 user=x", "").toDF("msg")
    val twoStep = df
      .withColumn("fmt", Grok.dispatchFormatId(fmts)(col("msg")))
      .select(col("fmt") +:
        Grok.dispatchFields(spark)(col("msg"), col("fmt"), fmts): _*)
    val onePass = df
      .withColumn("dx", Grok.dispatchStruct(spark)(col("msg"), fmts))
      .select(col("dx.fmt").as("fmt") +:
        Grok.dispatchFieldsFromStruct(col("dx"), fmts): _*)
    assert(onePass.columns.toSeq == twoStep.columns.toSeq)
    assert(onePass.collect().toSeq == twoStep.collect().toSeq)
  }

  test("dispatch: conflicting coercions for one field name are rejected") {
    val e = intercept[IllegalArgumentException] {
      Grok.dispatchFields(spark)(col("msg"), lit(0L), Seq(
        "^a=%{INT:v:int}$", "^b=%{NUMBER:v:float}$"))
    }
    assert(e.getMessage.contains("conflicting coercions"))
  }

  test("IPV4 rejects out-of-range octets") {
    val (re, _) = Grok.compile("^%{IP:ip}$")
    val p = java.util.regex.Pattern.compile(re)
    assert(p.matcher("255.255.255.255").find())
    assert(p.matcher("10.0.0.1").find())
    assert(!p.matcher("256.1.1.1").find())
    assert(!p.matcher("1.2.3").find())
  }
}
