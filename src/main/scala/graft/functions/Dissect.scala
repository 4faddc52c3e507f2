package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dissect-style positional parsing [PK: Logstash dissect filter] — the
  * cheap sibling of grok for delimiter-shaped logs: a pattern of
  * `%{field}` tokens between LITERAL separators, compiled to a chain of
  * locate/substring expressions. No regex engine in the hot path, no
  * backtracking — per row it is a left-to-right scan for each separator's
  * next occurrence, exactly the dissect contract (each field captures the
  * minimal text up to the leftmost occurrence of the next literal).
  *
  * Compilation happens ONCE at plan-build time (driver side); what ships
  * to executors is plain `locate`/`substring` catalyst builtins, fully
  * inside whole-stage codegen. A non-matching line (a separator missing,
  * the leading literal absent, or trailing text after a final literal)
  * yields NULL for every field — the caller routes those to a dead-letter
  * the same way grok no-matches route.
  *
  * Semantic note pinned by the oracle twin: leftmost-sequential literal
  * search is equivalent to a LAZY regex `^(.*?)sep1(.*?)sep2...$` over
  * regex-escaped literals, which is how the DuckDB oracle states the same
  * parse.
  */
object Dissect {

  private val Token = "%\\{([A-Za-z0-9_]+)\\}".r

  /** Split a pattern into (leading literal, per-field (name, trailing
    * literal)) — the last field's trailing literal may be empty (field
    * captures the rest of the line). Fails loudly on the ambiguous
    * shapes: zero fields, adjacent fields with no separator between them
    * (nothing decides where one ends), duplicate names. */
  private[graft] def parse(pattern: String): (String, Seq[(String, String)]) = {
    val ms = Token.findAllMatchIn(pattern).toList
    require(ms.nonEmpty, s"dissect: no %{field} tokens in '$pattern'")
    val leading = pattern.substring(0, ms.head.start)
    val fields = ms.zipWithIndex.map { case (m, i) =>
      val end = if (i + 1 < ms.length) ms(i + 1).start else pattern.length
      (m.group(1), pattern.substring(m.end, end))
    }
    fields.init.foreach { case (f, sep) =>
      require(sep.nonEmpty,
        s"dissect: field '%{$f}' is adjacent to the next field — " +
          "a separator literal must sit between fields")
    }
    val names = fields.map(_._1)
    require(names.distinct.length == names.length,
      s"dissect: duplicate field names in $names")
    (leading, fields)
  }

  /** Compile `pattern` against a line column: one (name, value) column per
    * field, every value NULL unless the whole pattern matches. */
  def fields(line: Column, pattern: String): Seq[(String, Column)] = {
    val (leading, fs) = parse(pattern)
    // 1-based positions, SQL locate/substring convention. The fold carries
    // (position after what's consumed, match predicate so far); every
    // field value is wrapped with the FINAL predicate at the end, so a
    // later missing separator nulls earlier fields too (all-or-nothing,
    // the dissect contract).
    var matched: Column =
      if (leading.isEmpty) lit(true) else line.startsWith(leading)
    var pos: Column = lit(leading.length + 1)
    val raw = fs.map { case (name, sep) =>
      if (sep.isEmpty) {
        name -> call_function("substring", line, pos)
      } else {
        val loc = call_function("locate", lit(sep), line, pos)
        matched = matched && loc > 0
        val v = call_function("substring", line, pos, loc - pos)
        pos = loc + lit(sep.length)
        name -> v
      }
    }
    // A trailing literal must CONSUME the line end — "a [b] extra" does
    // not match "%{x} [%{y}]".
    if (fs.last._2.nonEmpty) matched = matched && (pos === length(line) + 1)
    val ok = matched
    raw.map { case (n, v) => n -> when(ok, v) }
  }
}
