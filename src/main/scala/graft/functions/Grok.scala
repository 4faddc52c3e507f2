package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Grok pattern library (SURVEY §2.H [PK] — the reference's flagship
  * field-extraction instruction): a named-pattern dictionary in the
  * Logstash-compatible `%{NAME:field}` / `%{NAME:field:type}` syntax,
  * compiled to ONE plain regex whose capture groups are exactly the named
  * fields, in order. Extraction is then stock codegen'd `regexp_extract` —
  * no UDF, scan-pushdown-friendly, and the identical regex string runs in
  * DuckDB (RE2), which is what makes the operator oracle-able.
  *
  * Dictionary entries are authored with NON-capturing groups only, so the
  * group numbering of a compiled expression is fully determined by the
  * user's named references. Nested `%{NAME}` references inside dictionary
  * entries expand recursively (also non-capturing).
  *
  * Supported coercions: `:int` → LongType, `:float` → DoubleType
  * (grok's two standard coercions); default is string.
  */
/** Regex-once implementation shared by [[GrokCapture]]'s eval and codegen
  * paths: first match's capture groups as an array<string> (unmatched
  * groups and non-matching lines yield "" — regexp_extract semantics). */
final class RegexGroupsImpl(regex: String) extends Serializable {
  @transient private lazy val pattern = java.util.regex.Pattern.compile(regex)
  @transient private lazy val nGroups = pattern.matcher("").groupCount()

  def compute(s: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val m = pattern.matcher(s.toString)
    val out = new Array[Any](nGroups)
    val found = m.find()
    var i = 0
    while (i < nGroups) {
      val g = if (found) m.group(i + 1) else null
      out(i) = org.apache.spark.unsafe.types.UTF8String
        .fromString(if (g == null) "" else g)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** string → array<string> of all capture groups from ONE regex pass. */
case class GrokCapture(child: org.apache.spark.sql.catalyst.expressions.Expression,
    regex: String)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}

  override def dataType: org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StringType, containsNull = false)

  @transient private lazy val impl = new RegexGroupsImpl(regex)

  override protected def nullSafeEval(a: Any): Any =
    impl.compute(a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("grokCaptureImpl", impl,
        classOf[RegexGroupsImpl].getName)
      s"${ev.value} = $ref.compute($a);"
    })

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    copy(child = newChild)
}

/** One-pass multi-format dispatch impl (r18 optimization round, guide
  * §1.2 step 2): tries each compiled regex in ORDER with one Matcher.find
  * per attempted format and stops at the first match — struct(fmt BIGINT,
  * caps ARRAY<STRING>): fmt = winning format index (-1 when none), caps =
  * the winner's capture groups (unmatched groups "", exactly
  * [[RegexGroupsImpl]]), null caps when no format matches. The two-step
  * shape it replaces (N rlike dispatches + N full GrokCapture arrays, all
  * evaluated EAGERLY per row by codegen subexpression elimination) paid
  * ~2N regex passes per row; this pays matched-index + 1 (first-match-wins
  * short circuit), identical results. */
final class GrokDispatchImpl(regexes: Seq[String]) extends Serializable {
  @transient private lazy val patterns =
    regexes.map(java.util.regex.Pattern.compile).toArray
  @transient private lazy val nGroups =
    patterns.map(_.matcher("").groupCount())

  def compute(s: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.sql.catalyst.InternalRow = {
    val str = s.toString
    var i = 0
    while (i < patterns.length) {
      val m = patterns(i).matcher(str)
      if (m.find()) {
        val n = nGroups(i)
        val out = new Array[Any](n)
        var g = 0
        while (g < n) {
          val v = m.group(g + 1)
          out(g) = org.apache.spark.unsafe.types.UTF8String
            .fromString(if (v == null) "" else v)
          g += 1
        }
        return org.apache.spark.sql.catalyst.InternalRow(i.toLong,
          new org.apache.spark.sql.catalyst.util.GenericArrayData(out))
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(-1L, null)
  }
}

/** string → struct(fmt, caps) via [[GrokDispatchImpl]] (codegen'd). */
case class GrokDispatch(child: org.apache.spark.sql.catalyst.expressions.Expression,
    regexes: Seq[String])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  import org.apache.spark.sql.types._

  override def dataType: DataType = StructType(Seq(
    StructField("fmt", LongType, nullable = false),
    StructField("caps", ArrayType(StringType, containsNull = false),
      nullable = true)))

  @transient private lazy val impl = new GrokDispatchImpl(regexes)

  override protected def nullSafeEval(a: Any): Any =
    impl.compute(a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("grokDispatchImpl", impl,
        classOf[GrokDispatchImpl].getName)
      s"${ev.value} = $ref.compute($a);"
    })

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    copy(child = newChild)
}

object Grok {

  /** Core pattern dictionary — the patterns a log pipeline uses daily.
    * All groups non-capturing; RE2-safe (no backrefs, no lookaround). */
  val patterns: Map[String, String] = Map(
    "WORD" -> """\b\w+\b""",
    "NOTSPACE" -> """\S+""",
    "SPACE" -> """\s*""",
    "DATA" -> """.*?""",
    "GREEDYDATA" -> """.*""",
    "INT" -> """[+-]?[0-9]+""",
    "NONNEGINT" -> """[0-9]+""",
    "BASE10NUM" -> """[+-]?(?:[0-9]+(?:\.[0-9]+)?|\.[0-9]+)""",
    "NUMBER" -> """%{BASE10NUM}""",
    "BASE16NUM" -> """(?:0[xX])?[0-9a-fA-F]+""",
    "POSINT" -> """\b[1-9][0-9]*\b""",
    "IPV4" -> ("""(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)""" +
      """(?:\.(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)){3}"""),
    "IP" -> """%{IPV4}""",
    "HOSTNAME" -> ("""\b(?:[0-9A-Za-z][0-9A-Za-z-]{0,62})""" +
      """(?:\.(?:[0-9A-Za-z][0-9A-Za-z-]{0,62}))*\.?\b"""),
    "IPORHOST" -> """(?:%{IP}|%{HOSTNAME})""",
    "USERNAME" -> """[a-zA-Z0-9._-]+""",
    "USER" -> """%{USERNAME}""",
    "UUID" -> """[A-Fa-f0-9]{8}-(?:[A-Fa-f0-9]{4}-){3}[A-Fa-f0-9]{12}""",
    "MAC" -> """(?:[0-9A-Fa-f]{2}:){5}[0-9A-Fa-f]{2}""",
    "LOGLEVEL" -> ("""(?:[Aa]lert|ALERT|[Tt]race|TRACE|[Dd]ebug|DEBUG|""" +
      """[Nn]otice|NOTICE|[Ii]nfo|INFO|[Ww]arn(?:ing)?|WARN(?:ING)?|""" +
      """[Ee]rr(?:or)?|ERR(?:OR)?|[Cc]rit(?:ical)?|CRIT(?:ICAL)?|""" +
      """[Ff]atal|FATAL|[Ss]evere|SEVERE|[Ee]merg(?:ency)?|EMERG(?:ENCY)?)"""),
    "YEAR" -> """(?:\d\d){1,2}""",
    "MONTHNUM" -> """(?:0?[1-9]|1[0-2])""",
    "MONTHDAY" -> """(?:0[1-9]|[12][0-9]|3[01]|[1-9])""",
    "MONTH" -> ("""\b(?:Jan(?:uary)?|Feb(?:ruary)?|Mar(?:ch)?|Apr(?:il)?|""" +
      """May|Jun(?:e)?|Jul(?:y)?|Aug(?:ust)?|Sep(?:tember)?|Oct(?:ober)?|""" +
      """Nov(?:ember)?|Dec(?:ember)?)\b"""),
    "HOUR" -> """(?:2[0123]|[01]?[0-9])""",
    "MINUTE" -> """[0-5][0-9]""",
    "SECOND" -> """(?:[0-5]?[0-9]|60)(?:[:.,][0-9]+)?""",
    "TIME" -> """%{HOUR}:%{MINUTE}(?::%{SECOND})?""",
    "ISO8601_TIMEZONE" -> """(?:Z|[+-]%{HOUR}(?::?%{MINUTE}))""",
    "TIMESTAMP_ISO8601" -> ("""%{YEAR}-%{MONTHNUM}-%{MONTHDAY}[T ]""" +
      """%{HOUR}:?%{MINUTE}(?::?%{SECOND})?%{ISO8601_TIMEZONE}?"""),
    "HTTPDATE" -> """%{MONTHDAY}/%{MONTH}/%{YEAR}:%{TIME} %{INT}""",
    "QUOTEDSTRING" -> """"[^"]*"""",
    "UNIXPATH" -> """(?:/[\w_%!$@:.,+~-]*)+""",
    "URIPROTO" -> """[A-Za-z](?:[A-Za-z0-9+\-.]+)*""")

  /** One named field of a compiled expression: output name, optional
    * coercion ("int" | "float"), and its regex capture-group index. */
  final case class Field(name: String, coerce: Option[String], group: Int)

  private val Ref =
    """%\{(\w+)(?::([A-Za-z0-9_]+))?(?::(int|float))?\}""".r

  /** Recursively expand a dictionary pattern (non-capturing). */
  private def expand(name: String, seen: Set[String]): String = {
    require(!seen(name), s"grok: cyclic pattern reference %{$name}")
    val body = patterns.getOrElse(name,
      throw new IllegalArgumentException(s"grok: unknown pattern %{$name}"))
    Ref.replaceAllIn(body, m => java.util.regex.Matcher.quoteReplacement(
      "(?:" + expand(m.group(1), seen + name) + ")"))
  }

  /** Compile a grok expression to (regex, fields). Named references become
    * capture groups in order of appearance; anonymous references are
    * non-capturing; everything outside `%{}` passes through as regex. */
  def compile(expression: String): (String, Seq[Field]) = {
    val fields = Seq.newBuilder[Field]
    var g = 0
    val regex = Ref.replaceAllIn(expression, m => {
      val exp = expand(m.group(1), Set.empty)
      val out = Option(m.group(2)) match {
        case Some(f) =>
          g += 1
          fields += Field(f, Option(m.group(3)), g)
          "(" + exp + ")"
        case None => "(?:" + exp + ")"
      }
      java.util.regex.Matcher.quoteReplacement(out)
    })
    val fs = fields.result()
    // A malformed reference (bad coercion like :bool, or a field name with
    // chars outside [A-Za-z0-9_]) fails Ref and would otherwise pass
    // through as literal regex text — the whole pattern then never matches
    // and every field silently extracts "". Fail loudly instead.
    require(!regex.contains("%{"),
      s"grok: malformed %{...} reference survives in compiled regex " +
        s"(bad coercion or field name?): $regex")
    // A raw '(' capture group written by the user would shift every
    // subsequent field onto the wrong group index — on BOTH engines, so
    // even the oracle couldn't catch it. Reject; (?:...) is fine.
    val actualGroups =
      java.util.regex.Pattern.compile(regex).matcher("").groupCount()
    require(actualGroups == fs.length,
      s"grok: expression contains ${actualGroups - fs.length} raw capture " +
        "group(s); use non-capturing (?:...) for literal parentheses")
    // A repeated field name (two %{INT:x} refs) would emit duplicate
    // output columns — an ambiguous schema that fails only downstream.
    // Match Dissect's contract and fail loudly at compile instead.
    val dupNames = fs.map(_.name).groupBy(identity).collect {
      case (n, occ) if occ.length > 1 => n
    }
    require(dupNames.isEmpty,
      s"grok: duplicate field name(s) ${dupNames.mkString(", ")}; each " +
        "field may be captured once per expression")
    (regex, fs)
  }

  /** Typed Spark columns — one `regexp_extract` (codegen'd) per named
    * field of the grok expression. A non-matching line yields "" (and
    * null after a numeric coercion via try-semantics below). */
  def columns(c: Column, expression: String): Seq[Column] = {
    val (re, fs) = compile(expression)
    fs.map(f => coerced(regexp_extract(c, re, f.group), f))
  }

  /** One definition of field coercion for BOTH extraction paths — they are
    * spec-pinned identical and must not drift. */
  private def coerced(raw: Column, f: Field): Column =
    (f.coerce match {
      // A non-matching line extracts "" which must become null, not an
      // ANSI cast error; matched text is castable by pattern construction.
      case Some("int") => nullIfEmpty(raw).cast("long")
      case Some("float") => nullIfEmpty(raw).cast("double")
      case Some(other) => throw new IllegalArgumentException(
        s"grok: unsupported coercion :$other")
      case None => raw
    }).as(f.name)

  private def nullIfEmpty(c: Column): Column =
    when(length(c) === 0, lit(null)).otherwise(c)

  /** One-pass extraction: ONE regex match per row via [[GrokCapture]]
    * (all capture groups into an array<string>), each field then a cheap
    * `element_at` + coercion. The shared capture subexpression is
    * deduplicated by codegen subexpression elimination, so an N-field
    * grok costs one Matcher.find instead of N — the difference shows on
    * wide patterns (the 6-field log line runs ~6× less regex work).
    * Field-level semantics are identical to [[columns]] (spec-pinned). */
  def columnsOnePass(spark: SparkSession)(c: Column, expression: String): Seq[Column] =
    columnsOnePassCompiled(spark)(c, compile(expression))

  /** Same, on an already-compiled (regex, fields) pair — callers that also
    * need the field NAMES (the Flow grok instruction) compile once and
    * pass the result here instead of paying a second dictionary
    * expansion. */
  def columnsOnePassCompiled(spark: SparkSession)(c: Column,
      compiled: (String, Seq[Field])): Seq[Column] = {
    val (re, fs) = compiled
    // Name by full MD5 of the regex: a 32-bit hashCode collision between
    // two live patterns would silently rewire one to the other's regex.
    val fname = "graft_grok_" + graft.Dsl.md5Hex(re)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      fname, exprs => GrokCapture(exprs.head, re), "built-in")
    val groups = org.apache.spark.sql.functions.call_function(fname, c)
    fs.map(f => coerced(element_at(groups, f.group), f))
  }

  /** Field layout of a multi-format dispatch: the UNION of all formats'
    * fields in first-appearance order, each with its coercion and the
    * (formatIdx, captureGroup) slots that define it. A field name used by
    * two formats must agree on coercion — a :int in one format and raw
    * string in another would give the column a format-dependent type. */
  private def unionFields(compiled: Seq[(String, Seq[Field])])
      : Seq[(String, Option[String], Seq[(Int, Int)])] = {
    val order = scala.collection.mutable.LinkedHashMap[
      String, (Option[String], List[(Int, Int)])]()
    compiled.zipWithIndex.foreach { case ((_, fs), i) =>
      fs.foreach { f =>
        order.get(f.name) match {
          case None => order(f.name) = (f.coerce, List(i -> f.group))
          case Some((co, lst)) =>
            require(co == f.coerce,
              s"grok dispatch: field '${f.name}' has conflicting coercions " +
                s"($co vs ${f.coerce}) across formats")
            order(f.name) = (co, lst :+ (i -> f.group))
        }
      }
    }
    order.toSeq.map { case (n, (co, lst)) => (n, co, lst) }
  }

  /** Logstash-style multi-format dispatch, step 1: which format matched?
    * First-match-wins across the expression list; -1 = no format matched.
    * Author formats ANCHORED (`^...`) — both engines use substring-match
    * regex semantics, so an unanchored catch-all would shadow everything
    * after it. */
  def dispatchFormatId(expressions: Seq[String])(c: Column): Column =
    expressions.map(compile).map(_._1).zipWithIndex.foldRight(lit(-1L)) {
      case ((re, i), acc) => when(c.rlike(re), lit(i.toLong)).otherwise(acc)
    }

  /** Step 2: the union-of-fields columns, each taken from the winning
    * format's one-pass capture array (null where the winner doesn't define
    * the field, and for no-match rows). Pass the PROJECTED format-id column
    * (from [[dispatchFormatId]] via withColumn) so the N rlike dispatches
    * are planned once, not once per field. */
  def dispatchFields(spark: SparkSession)(c: Column, fmtId: Column,
      expressions: Seq[String]): Seq[Column] = {
    val compiled = expressions.map(compile)
    val captures = compiled.map { case (re, _) =>
      val fname = "graft_grok_" + graft.Dsl.md5Hex(re)
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        fname, exprs => GrokCapture(exprs.head, re), "built-in")
      org.apache.spark.sql.functions.call_function(fname, c)
    }
    unionFields(compiled).map { case (name, co, defs) =>
      val raw = defs.foldRight(lit(null).cast("string")) { case ((i, g), acc) =>
        when(fmtId === i.toLong, element_at(captures(i), g)).otherwise(acc)
      }
      coerced(raw, Field(name, co, 0))
    }
  }

  /** ONE-PASS dispatch column (r18 optimization): struct(fmt, caps) from a
    * single [[GrokDispatch]] evaluation — project it once with withColumn,
    * then take format_id from `.getField("fmt")` and the union fields from
    * [[dispatchFieldsFromStruct]]. Replaces the dispatchFormatId +
    * dispatchFields pair on the hot path (still spec-pinned equal to them;
    * both remain for the pinned semantics tests). */
  def dispatchStruct(spark: SparkSession)(c: Column,
      expressions: Seq[String]): Column = {
    val res = expressions.map(compile).map(_._1)
    val fname = "graft_grok_dx_" + graft.Dsl.md5Hex(res.mkString(" "))
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      fname, exprs => GrokDispatch(exprs.head, res), "built-in")
    org.apache.spark.sql.functions.call_function(fname, c)
  }

  /** The union-of-fields columns off a [[dispatchStruct]] column: same
    * per-field when-chain and coercions as [[dispatchFields]], but reading
    * the ONE winning capture array instead of N per-format arrays. */
  def dispatchFieldsFromStruct(dx: Column,
      expressions: Seq[String]): Seq[Column] = {
    val compiled = expressions.map(compile)
    unionFields(compiled).map { case (name, co, defs) =>
      val raw = defs.foldRight(lit(null).cast("string")) { case ((i, g), acc) =>
        when(dx.getField("fmt") === i.toLong,
          element_at(dx.getField("caps"), g)).otherwise(acc)
      }
      coerced(raw, Field(name, co, 0))
    }
  }

  /** DuckDB twin of [[dispatchFormatId]] (emit as `... AS fmt` in an inner
    * subquery; INTEGER — cast to BIGINT at the final projection). */
  def duckDispatchFormatId(colSql: String, expressions: Seq[String]): String =
    "CASE " + expressions.map(compile).map(_._1).zipWithIndex.map {
      case (re, i) =>
        s"WHEN regexp_matches($colSql, ${sqlLit(re)}) THEN $i"
    }.mkString(" ") + " ELSE -1 END"

  /** DuckDB twin of [[dispatchFields]]: expressions referencing the
    * dispatch column `fmtCol` computed by [[duckDispatchFormatId]]. */
  def duckDispatchFields(colSql: String, fmtCol: String,
      expressions: Seq[String]): Seq[String] = {
    val compiled = expressions.map(compile)
    unionFields(compiled).map { case (name, co, defs) =>
      val chain = "CASE " + defs.map { case (i, g) =>
        s"WHEN $fmtCol = $i THEN " +
          s"regexp_extract($colSql, ${sqlLit(compiled(i)._1)}, $g)"
      }.mkString(" ") + " END"
      val typed = co match {
        case Some("int") => s"TRY_CAST($chain AS BIGINT)"
        case Some("float") => s"TRY_CAST($chain AS DOUBLE)"
        case Some(other) => throw new IllegalArgumentException(
          s"grok: unsupported coercion :$other")
        case None => chain
      }
      s"$typed AS $name"
    }
  }

  private def sqlLit(re: String): String = "'" + re.replace("'", "''") + "'"

  /** The SAME extraction as DuckDB SQL select-expressions (same compiled
    * regex, same group indices, same coercions) — the oracle twin
    * generator. DuckDB's regexp engine is RE2; the dictionary avoids
    * constructs RE2 lacks. */
  def duckExprs(colSql: String, expression: String): Seq[String] = {
    val (re, fs) = compile(expression)
    val reLit = "'" + re.replace("'", "''") + "'"
    fs.map { f =>
      val raw = s"regexp_extract($colSql, $reLit, ${f.group})"
      val typed = f.coerce match {
        case Some("int") => s"TRY_CAST($raw AS BIGINT)"
        case Some("float") => s"TRY_CAST($raw AS DOUBLE)"
        case Some(other) => throw new IllegalArgumentException(
          s"grok: unsupported coercion :$other")
        case None => raw
      }
      s"$typed AS ${f.name}"
    }
  }
}
