package graft.flow

/** Compact sequence-pattern (CEP) grammar → ONE portable regex — the
  * general form of the reference's signal-correlation story ("detect
  * pattern A→B*→C within a session") and of SQL MATCH_RECOGNIZE's pattern
  * clause, re-expressed Spark-first: the per-session event-type sequence
  * is materialized as a bounded token string (`a>b>c>`, every token
  * trailing-separated — the evt_top_paths rn-cap discipline bounds it
  * before any state is built), and the pattern compiles to a single
  * regular expression evaluated by `regexp_like` inside whole-stage
  * codegen. No NFA interpreter in the hot path, no per-row state machine
  * object — the regex engine IS the state machine.
  *
  * Grammar (token names are lower-snake event types):
  * {{{
  *   pattern := step ('>' step)*          steps match CONTIGUOUSLY
  *   step    := atom quant?               quant: '*' | '+' | '?'
  *   atom    := name | '(' name ('|' name)* ')' | '.'   ('.' = any token)
  * }}}
  * e.g. `view>(view|click)*>purchase` — a view, any browse run, a buy.
  *
  * The compiled regex uses only alternation, non-capturing groups and
  * greedy quantifiers — the subset Java's engine (Spark) and RE2 (DuckDB)
  * evaluate identically, so the SAME compiled string is embedded in the
  * oracle SQL and the match is bit-portable. A match is an unanchored
  * contiguous window: `(?:^|>)` pins the first step to a token boundary,
  * and every token's trailing `>` pins the last step to a whole token.
  */
object Cep {
  private val Name = "[a-z][a-z0-9_]*"

  /** COUNT-mode parse: a quantifier-free pattern as its step atoms —
    * `Some(alternatives)` per literal step, `None` for the `.` wildcard.
    * Occurrence counting uses POSITION semantics over the token array
    * (every start index whose k-token window matches — well-defined,
    * overlap-friendly, and identical in any engine) because regex-based
    * counting cannot be made boundary-exact without lookbehind, which
    * RE2 (the oracle engine) does not support. Quantified steps make a
    * count ambiguous, so they are rejected loudly. */
  def literalSteps(pattern: String): Seq[Option[Seq[String]]] = {
    require(pattern.nonEmpty, "cep: empty pattern")
    val steps = pattern.split(">", -1).toSeq
    require(steps.forall(_.nonEmpty),
      s"cep: empty step in '$pattern' (doubled or trailing '>')")
    steps.map { s0 =>
      require(!Set('*', '+', '?').contains(s0.last),
        s"cep: count mode requires a quantifier-free pattern, got '$s0' in '$pattern'")
      if (s0 == ".") None
      else if (s0.startsWith("(") && s0.endsWith(")")) {
        val alts = s0.substring(1, s0.length - 1).split("[|]", -1).toSeq
        require(alts.nonEmpty && alts.forall(_.matches(Name)),
          s"cep: bad alternation '$s0' in '$pattern'")
        Some(alts)
      } else {
        require(s0.matches(Name),
          s"cep: bad token '$s0' in '$pattern' (want $Name | (a|b) | .)")
        Some(Seq(s0))
      }
    }
  }

  def compile(pattern: String): String = {
    require(pattern.nonEmpty, "cep: empty pattern")
    val steps = pattern.split(">", -1).toSeq
    require(steps.forall(_.nonEmpty),
      s"cep: empty step in '$pattern' (doubled or trailing '>')")
    val compiled = steps.map { s0 =>
      val (body, quant) =
        if (Set('*', '+', '?').contains(s0.last)) (s0.init, s0.last.toString)
        else (s0, "")
      val atom =
        if (body == ".") "[^>]+"
        else if (body.startsWith("(") && body.endsWith(")")) {
          val alts = body.substring(1, body.length - 1).split("[|]", -1).toSeq
          require(alts.nonEmpty && alts.forall(_.matches(Name)),
            s"cep: bad alternation '$body' in '$pattern'")
          alts.mkString("|")
        } else {
          require(body.matches(Name),
            s"cep: bad token '$body' in '$pattern' (want ${Name} | (a|b) | .)")
          body
        }
      s"(?:(?:$atom)>)$quant"
    }
    "(?:^|>)" + compiled.mkString
  }
}
