package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, T}
import graft.Dsl._

/** Text-analysis operators for the LLM-data pipeline (north star mandate):
  * language-ID (lexicon heuristic), quality scoring, token counting
  * (whitespace + BPE-ish subword estimate), document fingerprinting.
  *
  * Determinism: all scores are exact integer arithmetic plus single double
  * divisions with identical expression trees in both engines (no ln/round
  * on accumulated doubles). All hashes are md5/sha256 (hex in both).
  */
object TextOps {

  /** Marker lexicon for the language-ID heuristic. The corpus is synthetic
    * word soup, so markers are drawn from its shared vocabulary — the
    * operator shape (dictionary join → per-lang scores → argmax) is what a
    * real lexicon/n-gram classifier uses at scale. */
  private val lexicon: Seq[(String, String)] = Seq(
    "the" -> "en", "a" -> "en", "table" -> "en",
    "slow" -> "es", "agg" -> "es", "merge" -> "es",
    "customer" -> "de", "hash" -> "de", "big" -> "de",
    "scan" -> "fr", "data" -> "fr", "batch" -> "fr",
    "join" -> "zh", "small" -> "zh", "row" -> "zh")

  private val lexiconSqlValues: String =
    lexicon.map { case (w, l) => s"('$w','$l')" }.mkString(", ")

  private val shingleCte = Shingles.duckCte(distinct = false, carryText = true)

  /** Gopher rule flags per document — ONE definition shared by
    * `llm_gopher_quality` and the corpus-selection composite
    * (`llm_corpus_select` in DedupOps), so the rule thresholds cannot
    * drift between the standalone report and the pipeline query. */
  private[operators] def gopherFlags(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    T(s, d, "documents")
      .withColumn("words", split(col("text"), " "))
      .select(col("doc_id"), col("n_chars"),
        big(size(col("words"))).as("n_words"),
        big(size(filter(col("words"),
          w => w === "a" || w === "the"))).as("stop_hits"))
      .withColumn("mean_word_len",
        (col("n_chars") - col("n_words") + lit(1L)).cast("double") / col("n_words"))
      .withColumn("word_count_ok",
        col("n_words") >= 10 && col("n_words") <= 1000)
      .withColumn("word_len_ok",
        col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0)
      .withColumn("stop_ok", col("stop_hits") >= 1)
      .withColumn("keep",
        col("word_count_ok") && col("word_len_ok") && col("stop_ok"))
      .select(col("doc_id"), col("n_words"), col("mean_word_len"),
        col("stop_hits"), col("word_count_ok"), col("word_len_ok"),
        col("stop_ok"), col("keep"))

  /** DuckDB twin of [[gopherFlags]] (a full SELECT body — wrap as a
    * derived table or CTE). */
  private[operators] val gopherFlagsSql: String =
    "SELECT doc_id, n_words, mean_word_len, stop_hits, " +
      "n_words >= 10 AND n_words <= 1000 AS word_count_ok, " +
      "mean_word_len >= 3.0 AND mean_word_len <= 10.0 AS word_len_ok, " +
      "stop_hits >= 1 AS stop_ok, " +
      "(n_words >= 10 AND n_words <= 1000) AND " +
      "(mean_word_len >= 3.0 AND mean_word_len <= 10.0) AND " +
      "stop_hits >= 1 AS keep FROM (" +
      "SELECT doc_id, n_words, stop_hits, " +
      "CAST(n_chars - n_words + 1 AS DOUBLE) / n_words AS mean_word_len FROM (" +
      "SELECT doc_id, n_chars, len(string_split(text, ' '))::BIGINT AS n_words, " +
      "len(list_filter(string_split(text, ' '), x -> x = 'a' OR x = 'the'))::BIGINT " +
      "AS stop_hits FROM documents) a) b"

  val defs: Seq[(String, Q)] = Seq(

    // Dictionary-join language ID: hit counts per candidate lang, argmax
    // with lang tie-break; docs with zero hits classify as 'und'.
    "llm_lang_id" -> Q(
      (s, d) => {
        val docs = T(s, d, "documents")
        val words = docs.select(col("doc_id"),
          explode(split(col("text"), " ")).as("word"))
        val lex = s.createDataFrame(lexicon).toDF("word", "cand_lang")
        val scores = words.join(broadcast(lex), "word")
          .groupBy(col("doc_id"), col("cand_lang"))
          .agg(count(lit(1)).as("score"))
          .withColumn("rn", row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
              .orderBy(col("score").desc, col("cand_lang"))))
          .filter(col("rn") === 1)
        docs.select(col("doc_id"), col("lang").as("actual_lang"))
          .join(scores, Seq("doc_id"), "left")
          .select(col("doc_id"), col("actual_lang"),
            coalesce(col("cand_lang"), lit("und")).as("pred_lang"),
            coalesce(col("score"), lit(0L)).as("score"))
          .orderBy(col("doc_id"))
      },
      "SELECT d.doc_id, d.lang AS actual_lang, " +
        "COALESCE(s.cand_lang, 'und') AS pred_lang, COALESCE(s.score, 0) AS score " +
        "FROM documents d LEFT JOIN (" +
        "SELECT doc_id, cand_lang, score FROM (" +
        "SELECT doc_id, cand_lang, COUNT(*) AS score, row_number() OVER " +
        "(PARTITION BY doc_id ORDER BY COUNT(*) DESC, cand_lang) AS rn " +
        "FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents) w " +
        s"JOIN (VALUES $lexiconSqlValues) lex(word, cand_lang) ON w.word = lex.word " +
        "GROUP BY doc_id, cand_lang) t WHERE rn = 1) s ON d.doc_id = s.doc_id " +
        "ORDER BY d.doc_id"),

    // Quality profile: token counts, mean token length, stopword ratio and
    // a blended score — exact ints + single-division doubles throughout.
    "llm_quality_score" -> Q(
      (s, d) => T(s, d, "documents")
        .withColumn("words", split(col("text"), " "))
        .select(col("doc_id"), col("n_chars"),
          big(size(col("words"))).as("n_tokens"),
          big(size(filter(col("words"),
            w => w === "a" || w === "the"))).as("stop_hits"))
        .withColumn("avg_token_len",
          (col("n_chars") - col("n_tokens") + lit(1L)).cast("double") / col("n_tokens"))
        .withColumn("stop_ratio", col("stop_hits").cast("double") / col("n_tokens"))
        .withColumn("quality",
          col("avg_token_len") - lit(10.0) * col("stop_ratio"))
        .orderBy(col("doc_id")),
      "SELECT doc_id, n_chars, n_tokens, stop_hits, avg_token_len, stop_ratio, " +
        "avg_token_len - 10.0 * stop_ratio AS quality FROM (" +
        "SELECT doc_id, n_chars, n_tokens, stop_hits, " +
        "CAST(n_chars - n_tokens + 1 AS DOUBLE) / n_tokens AS avg_token_len, " +
        "CAST(stop_hits AS DOUBLE) / n_tokens AS stop_ratio FROM (" +
        "SELECT doc_id, n_chars, " +
        "len(string_split(text, ' '))::BIGINT AS n_tokens, " +
        "len(list_filter(string_split(text, ' '), x -> x = 'a' OR x = 'the'))::BIGINT AS stop_hits " +
        "FROM documents) a) b ORDER BY doc_id"),

    // Token counting: whitespace words + a BPE-ish subword estimate
    // (ceil(len/4) per word, exact integer math).
    "llm_token_count" -> Q(
      (s, d) => T(s, d, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_words"),
          sum(big(expr("(length(word) + 3) div 4"))).as("n_subwords"))
        .orderBy(col("doc_id")),
      "SELECT doc_id, COUNT(*) AS n_words, " +
        "SUM((length(word) + 3) // 4)::BIGINT AS n_subwords " +
        "FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word " +
        "FROM documents) w GROUP BY doc_id ORDER BY doc_id"),

    // Fingerprinting: whole-text md5 plus min/max shingle md5 (the
    // winnowing-style selection a rolling-hash fingerprinter keeps).
    // Shingles are exploded and hashed in ONE codegen'd pass feeding a hash
    // aggregate (min/max) — the interpreted transform(.., md5) HOF variant
    // measured 7.1s at sf0.1; this shape also avoids materializing the
    // per-doc fingerprint array. text_md5 is computed BEFORE the explode so
    // only a 32-char hex (not the document body) rides the exploded rows,
    // and grouping on (doc_id, text_md5) keeps it to a single shuffle.
    "llm_fingerprint" -> Q(
      (s, d) => T(s, d, "documents")
        .withColumn("words", split(col("text"), " "))
        .filter(size(col("words")) >= 3)
        .select(col("doc_id"), md5(col("text")).as("text_md5"),
          explode(graft.functions.TextFeatureExpressions.shingles3(s)(col("words"))).as("sh"))
        .groupBy(col("doc_id"), col("text_md5"))
        .agg(min(md5(col("sh"))).as("min_shingle_md5"),
          max(md5(col("sh"))).as("max_shingle_md5"))
        .select(col("doc_id"), col("text_md5"),
          col("min_shingle_md5"), col("max_shingle_md5"))
        .orderBy(col("doc_id")),
      shingleCte +
        "SELECT doc_id, md5(min(text)) AS text_md5, min(md5(s)) AS min_shingle_md5, " +
        "max(md5(s)) AS max_shingle_md5 FROM sh GROUP BY doc_id ORDER BY doc_id"),

    // Repetition score: 1 - distinct/total 3-gram shingles — the repeated-
    // n-gram quality filter an LLM-data pipeline runs before training.
    // One explode + one hash aggregate; ratio is a single double division
    // over exact counts.
    "llm_repetition" -> Q(
      (s, d) => T(s, d, "documents")
        .withColumn("words", split(col("text"), " "))
        .filter(size(col("words")) >= 3)
        .select(col("doc_id"), explode(graft.functions.TextFeatureExpressions.shingles3(s)(col("words"))).as("s"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_shingles"),
          countDistinct(col("s")).as("n_distinct"))
        .withColumn("repetition", lit(1.0) -
          col("n_distinct").cast("double") / col("n_shingles").cast("double"))
        .orderBy(col("doc_id")),
      Shingles.duckCte(distinct = false) +
        "SELECT doc_id, COUNT(*)::BIGINT AS n_shingles, " +
        "COUNT(DISTINCT s)::BIGINT AS n_distinct, " +
        "1.0 - CAST(COUNT(DISTINCT s) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) " +
        "AS repetition FROM sh GROUP BY doc_id ORDER BY doc_id"),

    // Benchmark-contamination check: fraction of each candidate doc's
    // distinct shingles that appear anywhere in the benchmark slice
    // (doc_id < 25 stands in for the held-out eval set). The shingle
    // equi-join (semi) is the keyed shuffle that replaces scanning the
    // benchmark per candidate — the shape that survives a 100 TB corpus
    // against a fixed benchmark set (which would broadcast).
    "llm_contamination" -> Q(
      (s, d) => {
        val sh = T(s, d, "documents")
          .withColumn("words", split(col("text"), " "))
          .filter(size(col("words")) >= 3)
          .select(col("doc_id"), explode(graft.functions.TextFeatureExpressions.shingles3(s)(col("words"))).as("s"))
          .distinct()
        val bench = sh.filter(col("doc_id") < 25).select(col("s")).distinct()
        val cand = sh.filter(col("doc_id") >= 25)
        val tot = cand.groupBy(col("doc_id")).agg(count(lit(1)).as("n_shingles"))
        val hits = cand.join(bench, Seq("s"), "left_semi")
          .groupBy(col("doc_id")).agg(count(lit(1)).as("n_contam"))
        tot.join(hits, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_shingles"),
            coalesce(col("n_contam"), lit(0L)).as("n_contam"))
          .withColumn("contamination",
            col("n_contam").cast("double") / col("n_shingles").cast("double"))
          .orderBy(col("doc_id"))
      },
      Shingles.duckCte(distinct = true) +
        ", b AS (SELECT DISTINCT s FROM sh WHERE doc_id < 25), " +
        "c AS (SELECT doc_id, s FROM sh WHERE doc_id >= 25), " +
        "tot AS (SELECT doc_id, COUNT(*) AS n_shingles FROM c GROUP BY 1), " +
        "hit AS (SELECT doc_id, COUNT(*) AS n_contam FROM c " +
        "WHERE s IN (SELECT s FROM b) GROUP BY 1) " +
        "SELECT t.doc_id, t.n_shingles::BIGINT AS n_shingles, " +
        "COALESCE(h.n_contam, 0)::BIGINT AS n_contam, " +
        "CAST(COALESCE(h.n_contam, 0) AS DOUBLE) / CAST(t.n_shingles AS DOUBLE) " +
        "AS contamination FROM tot t LEFT JOIN hit h ON t.doc_id = h.doc_id " +
        "ORDER BY t.doc_id"),

    // Stratified deterministic sampling: EXACTLY ceil(25%) of every lang
    // stratum, chosen by md5 rank — reproducible across engines,
    // partitionings, and reruns (rand()/TABLESAMPLE are none of these).
    // One window pass per stratum; no collect, no global sort.
    // Deterministic train/val/test split — the LAST step before a corpus
    // ships to training. Pure HASH-THRESHOLD assignment on the first two
    // hex chars of a salted md5 (≈246/5/5 of 256 ⇒ ~96/2/2%): O(1) per
    // row, no sort, no window, no shuffle beyond the 3-row rollup — the
    // only split method that holds at 100 TB (rank/ntile splits need a
    // global order) and stays stable when the corpus grows (a doc's
    // split never changes, the re-train invariant). Output is the
    // per-split audit frame: doc/lang counts + id checksum.
    "llm_train_split" -> Q(
      (s, d) => T(s, d, "documents")
        .select(col("doc_id"), col("lang"),
          substring(md5(concat(lit("split:"), col("doc_id").cast("string"))),
            1, 2).as("h2"))
        .withColumn("split",
          when(col("h2") < "f6", "train")
            .when(col("h2") < "fb", "val").otherwise("test"))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("lang")).as("n_langs"),
          sum(col("doc_id")).as("id_checksum"))
        .orderBy(col("split")),
      "SELECT split, COUNT(*) AS n_docs, " +
        "COUNT(DISTINCT lang)::BIGINT AS n_langs, " +
        "SUM(doc_id)::BIGINT AS id_checksum FROM (" +
        "SELECT doc_id, lang, CASE " +
        "WHEN substr(md5('split:' || doc_id::VARCHAR), 1, 2) < 'f6' THEN 'train' " +
        "WHEN substr(md5('split:' || doc_id::VARCHAR), 1, 2) < 'fb' THEN 'val' " +
        "ELSE 'test' END AS split FROM documents) t " +
        "GROUP BY 1 ORDER BY 1"),

    "llm_stratified_sample" -> Q(
      (s, d) => {
        val byLang = org.apache.spark.sql.expressions.Window
          .partitionBy(col("lang")).orderBy(col("h"), col("doc_id"))
        T(s, d, "documents")
          .select(col("doc_id"), col("lang"),
            md5(col("doc_id").cast("string")).as("h"))
          .withColumn("rn", row_number().over(byLang))
          .withColumn("n_lang", count(lit(1)).over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))))
          .filter(col("rn") <= expr("(n_lang + 3) div 4"))
          .select(col("doc_id"), col("lang"), big(col("rn")).as("rn"))
          .orderBy(col("doc_id"))
      },
      "SELECT doc_id, lang, rn FROM (" +
        "SELECT doc_id, lang, row_number() OVER (PARTITION BY lang " +
        "ORDER BY md5(doc_id::VARCHAR), doc_id) AS rn, " +
        "count(*) OVER (PARTITION BY lang) AS n_lang FROM documents) t " +
        "WHERE rn <= (n_lang + 3) // 4 ORDER BY doc_id"),

    // WEIGHTED sample draw (r14) — priority sampling [PK: Duffield, Lund,
    // Thorup, "Priority sampling for estimation of arbitrary subset sums",
    // JACM'07]: each doc gets priority w/u (w = n_chars as the quality/
    // length weight, u ~ U(0,1] derived from md5(doc_id) — deterministic,
    // replayable), and the sample is the top-k by priority — inclusion
    // probability min(1, w/τ), the standard weighted-sample-without-
    // replacement a corpus-curation pass uses to over-draw long/high-
    // quality documents. Deliberately priority sampling rather than
    // Efraimidis–Spirakis u^(1/w): the priority needs ONE IEEE division
    // (bit-identical cross-engine), where the exponential form needs
    // ln/pow — libm transcendentals whose last-ulp differences are
    // engine-specific (this file's header rule). Scale shape: per-row
    // codegen priority + TakeOrderedAndProject top-k (distributed partial
    // top-50 per partition, never a global sort); the 50-row rank window
    // runs on the already-reduced frame.
    "llm_priority_sample" -> Q(
      (s, d) => {
        val h = md5Bits60(concat(lit("ps:"), col("doc_id").cast("string")))
        val u = (h + 1).cast("double") /
          lit(1152921504606846976L).cast("double") // (h+1) / 2^60 — exact
        T(s, d, "documents")
          .select(col("doc_id"), col("n_chars"),
            (col("n_chars").cast("double") / u).as("pri"))
          .orderBy(col("pri").desc, col("doc_id")).limit(50)
          .withColumn("rank", big(row_number().over(Window
            .orderBy(col("pri").desc, col("doc_id")))))
          .select(col("doc_id"), col("n_chars"), col("rank"))
          .orderBy(col("rank"))
      },
      "SELECT doc_id, n_chars, rank FROM (" +
        "SELECT doc_id, n_chars, row_number() OVER (" +
        "ORDER BY pri DESC, doc_id)::BIGINT AS rank FROM (" +
        "SELECT doc_id, n_chars, n_chars::DOUBLE / " +
        s"((${md5Bits60Sql("'ps:' || doc_id::VARCHAR")} " +
        "+ 1)::DOUBLE / 1152921504606846976.0) AS pri FROM documents) t) z " +
        "WHERE rank <= 50 ORDER BY rank"),

    // PII-style redaction: digit runs masked, hit counts kept (the scrub +
    // audit-trail pair). Runs on the JSON props column — the dynamic-schema
    // payload a real pipeline scrubs before training.
    "llm_pii_redact" -> Q(
      (s, d) => T(s, d, "events")
        .filter(col("props").isNotNull)
        .select(col("event_id"),
          regexp_replace(col("props"), "[0-9]+", "#").as("redacted"),
          expr("cast(size(regexp_extract_all(props, '[0-9]+', 0)) as bigint)")
            .as("n_hits"))
        .orderBy(col("event_id")),
      "SELECT event_id, regexp_replace(props, '[0-9]+', '#', 'g') AS redacted, " +
        "len(regexp_extract_all(props, '[0-9]+'))::BIGINT AS n_hits " +
        "FROM events WHERE props IS NOT NULL ORDER BY event_id"),

    // Typed PII patterns (round-10) — llm_pii_redact masks digit runs;
    // real governance needs TYPED detectors (email, phone, ssn-shaped,
    // ip) each with its own placeholder, applied in one pass with
    // per-type hit counts for the audit log. PII is synthesized
    // deterministically into the text (the planted ground truth the
    // detector must count exactly: 1 email + 1 phone per doc, an
    // ssn-shape on doc_id % 3, an ip on doc_id % 5); the replace chain
    // runs most-specific-first so the ssn pattern cannot half-match a
    // phone. Identical regex class syntax both engines; one codegen
    // projection pass.
    "llm_pii_patterns" -> Q(
      (s, d) => {
        val planted = T(s, d, "documents").select(col("doc_id"),
          concat(col("text"),
            lit(" contact: user"), col("doc_id").cast("string"),
            lit("@mail.example.com tel: +1-555-01"),
            lpad(pmod(col("doc_id"), lit(100)).cast("string"), 2, "0"),
            when(col("doc_id") % 3 === 0,
              concat(lit(" ssn: 123-45-6"),
                lpad(pmod(col("doc_id"), lit(1000)).cast("string"), 3, "0")))
              .otherwise(lit("")),
            when(col("doc_id") % 5 === 0,
              concat(lit(" ip: 10.0."),
                pmod(col("doc_id"), lit(256)).cast("string"), lit(".7")))
              .otherwise(lit(""))).as("body"))
        // [.] / [+] character classes instead of backslash escapes: the
        // SAME pattern string then survives Scala, Spark SQL literal
        // parsing (expr), and DuckDB SQL unchanged — backslashes would be
        // eaten differently at each layer (e.g. Spark SQL turns '\.' into
        // '.', silently making the ip dots match ANY separator)
        val email = "[a-z0-9]+@[a-z.]+[.][a-z]+"
        val phone = "[+]1-[0-9]{3}-[0-9]{4}"
        val ssn = "[0-9]{3}-[0-9]{2}-[0-9]{4}"
        val ip = "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}"
        planted.select(col("doc_id"),
            expr(s"cast(size(regexp_extract_all(body, '$email', 0)) as bigint)")
              .as("n_email"),
            expr(s"cast(size(regexp_extract_all(body, '$ssn', 0)) as bigint)")
              .as("n_ssn"),
            expr(s"cast(size(regexp_extract_all(body, '$ip', 0)) as bigint)")
              .as("n_ip"),
            md5(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
              col("body"), email, "<EMAIL>"), ssn, "<SSN>"),
              phone, "<PHONE>"), ip, "<IP>")).as("redacted_md5"))
          .orderBy(col("doc_id"))
      },
      "SELECT doc_id, " +
        "len(regexp_extract_all(body, '[a-z0-9]+@[a-z.]+[.][a-z]+'))::BIGINT " +
        "AS n_email, " +
        "len(regexp_extract_all(body, '[0-9]{3}-[0-9]{2}-[0-9]{4}'))::BIGINT " +
        "AS n_ssn, " +
        "len(regexp_extract_all(body, " +
        "'[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}'))::BIGINT AS n_ip, " +
        "md5(regexp_replace(regexp_replace(regexp_replace(regexp_replace(" +
        "body, '[a-z0-9]+@[a-z.]+[.][a-z]+', '<EMAIL>', 'g'), " +
        "'[0-9]{3}-[0-9]{2}-[0-9]{4}', '<SSN>', 'g'), " +
        "'[+]1-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g'), " +
        "'[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}', '<IP>', 'g')) " +
        "AS redacted_md5 FROM (" +
        "SELECT doc_id, text || ' contact: user' || doc_id || " +
        "'@mail.example.com tel: +1-555-01' || " +
        "lpad((doc_id % 100)::VARCHAR, 2, '0') || " +
        "CASE WHEN doc_id % 3 = 0 THEN ' ssn: 123-45-6' || " +
        "lpad((doc_id % 1000)::VARCHAR, 3, '0') ELSE '' END || " +
        "CASE WHEN doc_id % 5 = 0 THEN ' ip: 10.0.' || " +
        "(doc_id % 256)::VARCHAR || '.7' ELSE '' END AS body " +
        "FROM documents) p ORDER BY doc_id"),

    // Sequence packing (concat-and-chop): assign each doc its token span in
    // a per-lang packed token stream and the 2048-token context window its
    // span starts in — the greedy packing step of an LLM pretraining
    // pipeline. One running-sum window per stratum; packing per lang (not
    // globally) is the keyed shape that scales — a global pack order would
    // be a single-partition window.
    "llm_pack_sequences" -> Q(
      (s, d) => {
        val byLang = org.apache.spark.sql.expressions.Window
          .partitionBy(col("lang")).orderBy(col("doc_id"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
        T(s, d, "documents")
          .select(col("doc_id"), col("lang"),
            big(size(split(col("text"), " "))).as("n_tokens"))
          .withColumn("start_tok",
            coalesce(sum(col("n_tokens")).over(byLang), lit(0L)))
          .select(col("doc_id"), col("lang"), col("n_tokens"), col("start_tok"),
            expr("start_tok div 2048").as("pack_id"),
            expr("start_tok % 2048").as("pack_pos"))
          .orderBy(col("doc_id"))
      },
      "SELECT doc_id, lang, n_tokens, start_tok::BIGINT AS start_tok, " +
        "(start_tok // 2048)::BIGINT AS pack_id, " +
        "(start_tok % 2048)::BIGINT AS pack_pos FROM (" +
        "SELECT doc_id, lang, len(string_split(text, ' '))::BIGINT AS n_tokens, " +
        "COALESCE(SUM(len(string_split(text, ' '))::BIGINT) OVER (" +
        "PARTITION BY lang ORDER BY doc_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_tok " +
        "FROM documents) t ORDER BY doc_id"),

    // BPE training, first merge step: the top-5 most frequent adjacent
    // character pairs per lang stratum (what byte-pair encoding would
    // merge first). r17 (verdict #5): the pair explode runs over the
    // DISTINCT (lang, word) vocabulary with a carried multiplicity, not
    // over every word occurrence — a natural-language corpus repeats its
    // vocabulary heavily (Zipf), so the word-dedup hash aggregate
    // (map-side partial, the cheapest shuffle in the plan) shrinks the
    // expensive stage (per-character explode + substring) by the
    // repetition factor, and the pair count becomes sum(multiplicity).
    // This is exactly how production BPE trainers batch their pair
    // counts. Result-identical; the oracle keeps the direct
    // one-row-per-occurrence formulation, so the rewrite itself is
    // hash-checked. Words stay short (space tokens), so the
    // substring-from-index scans stay O(word) — a text-direct variant
    // measured O(len^2) per document and was discarded in-round.
    "llm_bpe_pairs" -> Q(
      (s, d) => T(s, d, "documents")
        .select(col("lang"), explode(split(col("text"), " ")).as("word"))
        .filter(length(col("word")) >= 2)
        .groupBy(col("lang"), col("word"))
        .agg(count(lit(1)).as("wn"))
        .select(col("lang"), col("wn"), explode(expr(
          "transform(sequence(1, length(word) - 1), i -> substring(word, i, 2))"))
          .as("pair"))
        .groupBy(col("lang"), col("pair"))
        .agg(sum(col("wn")).as("n"))
        .withColumn("rn", big(row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))
            .orderBy(col("n").desc, col("pair")))))
        .filter(col("rn") <= 5)
        .select(col("lang"), col("pair"), col("n"), col("rn"))
        .orderBy(col("lang"), col("rn")),
      "SELECT lang, pair, n, rn FROM (" +
        "SELECT lang, pair, n, row_number() OVER (PARTITION BY lang " +
        "ORDER BY n DESC, pair)::BIGINT AS rn FROM (" +
        "SELECT lang, substring(word, i::INT, 2) AS pair, COUNT(*)::BIGINT AS n " +
        "FROM (SELECT lang, word, unnest(generate_series(1, length(word) - 1)) AS i " +
        "FROM (SELECT lang, unnest(string_split(text, ' ')) AS word " +
        "FROM documents) w WHERE length(word) >= 2) p GROUP BY 1, 2) c) r " +
        "WHERE rn <= 5 ORDER BY lang, rn"),

    // Iterative BPE TRAINING (round-11) — llm_bpe_pairs runs only the
    // first merge; this key runs the real trainer loop: 3 merge rounds
    // per lang stratum, each round (a) counting adjacent SYMBOL pairs
    // over the current segmentation, (b) electing the most frequent pair
    // (ties break on pair text — merge-order determinism is spec-pinned),
    // (c) re-segmenting every word with a LEFT-TO-RIGHT NON-OVERLAPPING
    // merge fold (the real BPE rule: 'a a a' under merge (a,a) → [aa, a])
    // expressed as ONE aggregate() lambda — Spark's aggregate() and
    // DuckDB's list_reduce() fold identically, so the oracle re-runs the
    // whole trainer as per-round CTEs. Output is the merge table
    // (lang × round → pair, count). Scale shape: the trainer runs on the
    // WEIGHTED VOCABULARY, not raw occurrences — the corpus is collapsed
    // once to (lang, word, cnt) and every later pass (pair counts, merge
    // folds) touches one row per DISTINCT word with its multiplicity (the
    // structure real tokenizer trainers use: pair counts are Σ cnt, so
    // the merge table is bit-identical to per-occurrence counting while
    // the per-round work is vocab-sized, not corpus-sized). Per the
    // pagerank discipline each round's vocab frame is PINNED so round N
    // never re-derives rounds 1..N-1; the elected-pair frame is
    // lang-sized; iteration count is a constant.
    "llm_bpe_train" -> Q(
      (s, d) => bpeTrain(s, d)._3.orderBy(col("lang"), col("round")),
      bpeDuckCtes(finalMerge = false) + " " +
        "SELECT lang, round, pair, n FROM (" +
        "SELECT lang, 1::BIGINT AS round, pair, n FROM t1 UNION ALL " +
        "SELECT lang, 2::BIGINT, pair, n FROM t2 UNION ALL " +
        "SELECT lang, 3::BIGINT, pair, n FROM t3) m ORDER BY lang, round"),

    // BPE APPLICATION (round-11) — the trainer's consumer: re-segment the
    // corpus with the 3 learned merges and report the compression the
    // vocabulary buys per lang (the number a tokenizer build is actually
    // judged on: symbols before vs after, saved count, ratio in integer
    // micro-units). Reuses the exact trainer chain (one definition, both
    // keys) on the weighted vocab; the oracle extends the same CTE chain
    // through the final merge and aggregates per-occurrence — equal by
    // the Σcnt identity. Output is |langs| rows.
    "llm_bpe_apply" -> Q(
      (s, d) => {
        val (vocab0, vocab3, _) = bpeTrain(s, d)
        val before = vocab0.groupBy(col("lang"))
          .agg(sum(col("cnt")).as("n_words"),
            sum(col("cnt") * size(split(col("ws"), " "))).as("syms_before"))
        val after = vocab3.groupBy(col("lang"))
          .agg(sum(col("cnt") * size(split(col("ws"), " "))).as("syms_after"))
        before.join(after, "lang")
          .select(col("lang"), col("n_words"), col("syms_before"),
            col("syms_after"),
            (col("syms_before") - col("syms_after")).as("saved"),
            expr("(syms_after * 1000000) div syms_before").as("ratio_micro"))
          .orderBy(col("lang"))
      },
      bpeDuckCtes(finalMerge = true) + " " +
        "SELECT lang, n_words, syms_before, syms_after, " +
        "syms_before - syms_after AS saved, " +
        "(syms_after * 1000000) // syms_before AS ratio_micro FROM (" +
        "SELECT lang, COUNT(*)::BIGINT AS n_words, " +
        "SUM(len(string_split(ws, ' ')))::BIGINT AS syms_before " +
        "FROM w0 GROUP BY 1) b JOIN (" +
        "SELECT lang, SUM(len(string_split(ws, ' ')))::BIGINT AS syms_after " +
        "FROM w3 GROUP BY 1) a USING (lang) ORDER BY lang"),

    // Gopher-style rule filter: per-document quality gates (token count
    // band, mean-word-length band, stopword presence) and the combined
    // keep flag — the rule-based pre-filter of a training-data pipeline.
    // Exact ints + one double division; booleans identical cross-engine.
    "llm_gopher_quality" -> Q(
      (s, d) => gopherFlags(s, d).orderBy(col("doc_id")),
      gopherFlagsSql + " ORDER BY doc_id"),

    // Preference-pair mining (round-12) — the DPO/RLHF data-prep shape: per
    // language, documents rank by a deterministic integer quality score
    // (stop_hits·10⁵ + n_words — the gopher signals, fixed-point so no
    // float ever orders rows) and the i-th best pairs with the i-th worst
    // (i ≤ 4), STRICT margin only — ties and self-pairs drop, so a group
    // smaller than 2·K yields fewer (possibly zero) pairs rather than a
    // degenerate chosen==rejected row. Two window passes (score desc /
    // asc, doc_id tiebreaks both total orders) + one tiny (lang, idx)
    // equi-join; WindowGroupLimit pushes both rank≤4 filters below the
    // exchange, so at corpus scale only K rows per group survive the
    // shuffle. The pair frame is what a reward-model/DPO trainer joins
    // text back onto — ids + scores only ship here.
    "llm_preference_pairs" -> Q(
      (s, d) => {
        val scored = T(s, d, "documents")
          .withColumn("words", split(col("text"), " "))
          .select(col("doc_id"), col("lang"),
            (big(size(filter(col("words"),
              w => w === "a" || w === "the"))) * lit(100000L) +
              big(size(col("words")))).as("score"))
        val best = scored.withColumn("pair_idx", row_number().over(
          Window.partitionBy(col("lang"))
            .orderBy(col("score").desc, col("doc_id"))))
          .filter(col("pair_idx") <= 4)
          .select(col("lang"), big(col("pair_idx")).as("pair_idx"),
            col("doc_id").as("chosen_doc_id"), col("score").as("chosen_score"))
        val worst = scored.withColumn("pair_idx", row_number().over(
          Window.partitionBy(col("lang"))
            .orderBy(col("score"), col("doc_id").desc)))
          .filter(col("pair_idx") <= 4)
          .select(col("lang"), big(col("pair_idx")).as("pair_idx"),
            col("doc_id").as("rejected_doc_id"),
            col("score").as("rejected_score"))
        best.join(worst, Seq("lang", "pair_idx"))
          .filter(col("chosen_score") > col("rejected_score"))
          .select(col("lang"), col("pair_idx"), col("chosen_doc_id"),
            col("chosen_score"), col("rejected_doc_id"), col("rejected_score"),
            (col("chosen_score") - col("rejected_score")).as("margin"))
          .orderBy(col("lang"), col("pair_idx"))
      },
      "WITH sc AS (SELECT doc_id, lang, " +
        "len(list_filter(string_split(text, ' '), x -> x = 'a' OR x = 'the'))" +
        "::BIGINT * 100000 + len(string_split(text, ' '))::BIGINT AS score " +
        "FROM documents), " +
        "b AS (SELECT lang, row_number() OVER (PARTITION BY lang " +
        "ORDER BY score DESC, doc_id)::BIGINT AS pair_idx, " +
        "doc_id AS chosen_doc_id, score AS chosen_score FROM sc " +
        "QUALIFY pair_idx <= 4), " +
        "w AS (SELECT lang, row_number() OVER (PARTITION BY lang " +
        "ORDER BY score, doc_id DESC)::BIGINT AS pair_idx, " +
        "doc_id AS rejected_doc_id, score AS rejected_score FROM sc " +
        "QUALIFY pair_idx <= 4) " +
        "SELECT lang, pair_idx, chosen_doc_id, chosen_score, " +
        "rejected_doc_id, rejected_score, " +
        "chosen_score - rejected_score AS margin " +
        "FROM b JOIN w USING (lang, pair_idx) " +
        "WHERE chosen_score > rejected_score ORDER BY lang, pair_idx"),

    // Fixed-size overlapping chunker — the training/RAG prep step that is
    // llm_pack_sequences' inverse: window 32 tokens, stride 24 (8-token
    // overlap), chunk starts at 0, 24, 48, … while < n_tokens, the tail
    // chunk clamps short. Pure generate-and-slice over the token array
    // (sequence → explode → slice), one row per chunk, no shuffle before
    // the final sort — the per-document work is embarrassingly parallel
    // and chunk rows carry only (doc_id, idx, text slice).
    "llm_doc_chunking" -> Q(
      (s, d) => T(s, d, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .withColumn("k", explode(expr("sequence(0, size(toks) - 1, 24)")))
        .select(col("doc_id"), (col("k") / 24).cast("long").as("chunk_idx"),
          array_join(expr("slice(toks, k + 1, 32)"), " ").as("chunk_text"),
          least(lit(32), size(col("toks")) - col("k")).cast("long")
            .as("n_tokens"))
        .orderBy(col("doc_id"), col("chunk_idx")),
      "SELECT doc_id, (k // 24)::BIGINT AS chunk_idx, " +
        "array_to_string(list_slice(toks, k + 1, k + 32), ' ') AS chunk_text, " +
        "least(32, len(toks) - k)::BIGINT AS n_tokens FROM (" +
        "SELECT doc_id, string_split(text, ' ') AS toks, " +
        "unnest(generate_series(0, len(string_split(text, ' ')) - 1, 24)) AS k " +
        "FROM documents) t ORDER BY doc_id, chunk_idx"),

    // Cross-document duplicate-SPAN detection (C4's span-dedup shape, vs
    // llm_contamination's fixed benchmark slice): every 8-token span at
    // stride 1, attributed to the corpus-min doc_id that contains it; a
    // doc's dup_spans counts span occurrences already present in an
    // EARLIER doc, and keep = majority of spans are first-seen here
    // (integer comparison — no float ratio crosses the engines). Spans
    // ship as md5 digests so the shuffle carries 32-byte keys, never the
    // span text; the attribution pass is one hash agg + one equi-join
    // back, both keyed on the digest.
    "llm_span_dedup" -> Q(
      (s, d) => {
        // r18 OPTIMIZATION: the per-span slice+concat+md5 HOF → one native
        // SpanMd5s pass (identical strings hashed; TextFeatureSpec parity).
        val spans = T(s, d, "documents")
          .select(col("doc_id"), split(col("text"), " ").as("toks"))
          .select(col("doc_id"), explode(
            graft.functions.TextFeatureExpressions.spanMd5s(s)(col("toks")))
            .as("h"))
        val firstDoc = spans.groupBy(col("h"))
          .agg(min(col("doc_id")).as("first_doc"))
        spans.join(firstDoc, "h")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("total_spans"),
            sum(when(col("first_doc") < col("doc_id"), 1L).otherwise(0L))
              .as("dup_spans"))
          .withColumn("keep", col("dup_spans") * 2 < col("total_spans"))
          .orderBy(col("doc_id"))
      },
      "WITH spans AS (SELECT doc_id, unnest(list_transform(" +
        "generate_series(1, greatest(len(string_split(text, ' ')) - 7, 1)), " +
        "i -> md5(array_to_string(list_slice(string_split(text, ' '), i, i + 7), ' ')))) AS h " +
        "FROM documents), " +
        "fd AS (SELECT h, min(doc_id) AS first_doc FROM spans GROUP BY h) " +
        "SELECT s.doc_id, COUNT(*) AS total_spans, " +
        "SUM(CASE WHEN fd.first_doc < s.doc_id THEN 1 ELSE 0 END)::BIGINT " +
        "AS dup_spans, " +
        "SUM(CASE WHEN fd.first_doc < s.doc_id THEN 1 ELSE 0 END) * 2 < COUNT(*) " +
        "AS keep " +
        "FROM spans s JOIN fd USING (h) GROUP BY s.doc_id ORDER BY s.doc_id"),

    // Content-defined chunking dedup (round-9 addendum) — the FastCDC idea
    // on word streams: a chunk boundary opens wherever the trailing 3-gram's
    // md5 starts with hex '0' (P=1/16 ⇒ ~16-word mean chunks), so chunk
    // edges move WITH the content — insert a word early in a doc and every
    // later chunk of an unmodified run still hashes identically, which is
    // exactly what fixed-stride chunking (llm_doc_chunking) cannot give a
    // dedup pipeline. Shape: the whole boundary→slice→hash derivation is
    // IN-ROW list algebra (the llm_span_dedup discipline — filter/
    // transform/slice over the split array, no per-word explode, no per-doc
    // window shuffle); only 32-byte chunk digests ever shuffle, one hash
    // agg keyed on the digest. The boundary lambda guards i>=3 inside
    // if() — lazily evaluated in BOTH engines, so element_at(toks, 0)
    // is never touched (Spark would throw where DuckDB returns NULL).
    "llm_cdc_chunks" -> Q(
      (s, d) => {
        val hashes = T(s, d, "documents")
          .select(col("doc_id"), split(col("text"), " ").as("toks"))
          .withColumn("bnds", expr(
            "filter(sequence(1, size(toks)), i -> if(i >= 3, " +
              "substr(md5(concat_ws(' ', element_at(toks, i - 2), " +
              "element_at(toks, i - 1), element_at(toks, i))), 1, 1) = '0', " +
              "false))"))
          .withColumn("starts", expr("concat(array(1), bnds)"))
          .withColumn("ends", expr(
            "concat(transform(bnds, b -> b - 1), array(size(toks)))"))
          .select(col("doc_id"), explode(expr(
            "transform(sequence(1, size(starts)), j -> md5(concat_ws(' ', " +
              "slice(toks, element_at(starts, j), " +
              "element_at(ends, j) - element_at(starts, j) + 1))))")).as("h"))
        hashes.groupBy(col("h"))
          .agg(countDistinct(col("doc_id")).as("n_docs"),
            count(lit(1)).as("n_occ"))
          .filter(col("n_docs") >= 2)
          .select(col("h").as("chunk_hash"), col("n_docs"), col("n_occ"))
          .orderBy(col("chunk_hash"))
      },
      "WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks " +
        "FROM documents), " +
        "b AS (SELECT doc_id, toks, list_filter(generate_series(1, len(toks)), " +
        "i -> CASE WHEN i >= 3 THEN substr(md5(toks[i - 2] || ' ' || " +
        "toks[i - 1] || ' ' || toks[i]), 1, 1) = '0' ELSE false END) AS bnds " +
        "FROM t), " +
        "e AS (SELECT doc_id, toks, list_prepend(1, bnds) AS starts, " +
        "list_append(list_transform(bnds, x -> x - 1), len(toks)) AS ends " +
        "FROM b), " +
        "h AS (SELECT doc_id, unnest(list_transform(" +
        "generate_series(1, len(starts)), j -> md5(array_to_string(" +
        "list_slice(toks, starts[j], ends[j]), ' ')))) AS h FROM e) " +
        "SELECT h AS chunk_hash, COUNT(DISTINCT doc_id)::BIGINT AS n_docs, " +
        "COUNT(*)::BIGINT AS n_occ FROM h GROUP BY 1 " +
        "HAVING COUNT(DISTINCT doc_id) >= 2 ORDER BY 1"),

    // Tokenizer vocabulary build: corpus term frequencies, min-count 5
    // gate, contiguous ids by (freq desc, token) rank. The heavy stage is
    // the corpus-wide explode + hash agg (fully parallel); the ranking
    // window runs over the POST-FILTER vocabulary, which is
    // dictionary-sized (bounded by the language, not the corpus — the
    // reason a plain ORDER BY window is safe here and was NOT in
    // evt_rfm_segments / scale_global_ids, where the frame grows with
    // the data).
    "llm_vocab_build" -> Q(
      (s, d) => T(s, d, "documents")
        .select(explode(split(col("text"), " ")).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("freq"))
        .filter(col("freq") >= 5)
        .withColumn("token_id", big(row_number().over(
          Window.orderBy(col("freq").desc, col("token")))) - 1)
        .select(col("token_id"), col("token"), col("freq"))
        .orderBy(col("token_id")),
      "SELECT row_number() OVER (ORDER BY freq DESC, token)::BIGINT - 1 " +
        "AS token_id, token, freq FROM (" +
        "SELECT token, COUNT(*) AS freq FROM (" +
        "SELECT unnest(string_split(text, ' ')) AS token FROM documents) t " +
        "GROUP BY token HAVING COUNT(*) >= 5) v ORDER BY token_id"),

    // Unigram-LM perplexity proxy — the model-based quality score next to
    // the rule-based llm_gopher_quality: a doc whose tokens are corpus-rare
    // carries high average surprisal (gibberish/OCR noise), corpus-common
    // tokens score low. The per-token surprisal -log2 p(w) = log2(T/tf) is
    // QUANTIZED to its integer floor via bit length — length(bin(T div
    // tf)) - 1 — so the whole score is exact integer math plus one final
    // double division: bit-identical cross-engine (the determinism rule
    // that keeps ln() out of every oracled key). Shape at 100 TB: one
    // corpus-wide hash agg builds the unigram table (map-side combinable),
    // which is vocabulary-sized and BROADCAST back onto the token stream —
    // the per-doc agg then needs only the doc_id shuffle it already had.
    "llm_unigram_surprisal" -> Q(
      (s, d) => {
        val words = T(s, d, "documents")
          .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
        val tf = words.groupBy(col("word")).agg(count(lit(1)).as("tf"))
        val total = words.agg(count(lit(1)).as("total"))
        words.join(broadcast(tf), "word").crossJoin(broadcast(total))
          .withColumn("bits", big(length(bin(expr("total div tf"))) - 1))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_tokens"), sum(col("bits")).as("sum_bits"))
          .withColumn("avg_bits",
            col("sum_bits").cast("double") / col("n_tokens"))
          .orderBy(col("doc_id"))
      },
      "WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word " +
        "FROM documents), " +
        "tf AS (SELECT word, COUNT(*) AS tf FROM w GROUP BY 1), " +
        "tot AS (SELECT COUNT(*) AS total FROM w) " +
        "SELECT doc_id, COUNT(*) AS n_tokens, " +
        "SUM(length(bin(total // tf)) - 1)::BIGINT AS sum_bits, " +
        "CAST(SUM(length(bin(total // tf)) - 1) AS DOUBLE) / COUNT(*) " +
        "AS avg_bits FROM w JOIN tf USING (word) CROSS JOIN tot " +
        "GROUP BY doc_id ORDER BY doc_id"),

    // CCNet-style perplexity bucketing — the curation step built ON the
    // surprisal score: per language, docs split into head/middle/tail at
    // the p33/p66 terciles of per-doc average surprisal (head = most
    // fluent, the slice CCNet keeps; tail = candidate discard). Shares
    // llm_unigram_surprisal's exact integer bit-length surprisal; the
    // tercile cuts use the proven percentile ≡ quantile_cont parity over
    // those bit-identical avg_bits doubles, and the cut frame is
    // |langs|-sized and BROADCAST. Per-bucket fluency is reported as
    // exact-int totals (sum_bits / n_tokens — summing the per-doc DOUBLE
    // averages would be partition-order-dependent). Scale: corpus pays
    // the same two hash aggs surprisal already pays + one broadcast
    // join; the percentile agg state is per-lang, never corpus-sized.
    "llm_surprisal_buckets" -> Q(
      (s, d) => {
        val words = T(s, d, "documents")
          .select(col("doc_id"), col("lang"),
            explode(split(col("text"), " ")).as("word"))
        val tf = words.groupBy(col("word")).agg(count(lit(1)).as("tf"))
        val total = words.agg(count(lit(1)).as("total"))
        val perDoc = words.join(broadcast(tf), "word")
          .crossJoin(broadcast(total))
          .withColumn("bits", big(length(bin(expr("total div tf"))) - 1))
          .groupBy(col("doc_id"), col("lang"))
          .agg(count(lit(1)).as("n_tokens"), sum(col("bits")).as("sum_bits"))
          .withColumn("avg_bits",
            col("sum_bits").cast("double") / col("n_tokens"))
        val cuts = perDoc.groupBy(col("lang"))
          .agg(expr("percentile(avg_bits, 0.33)").as("p33"),
            expr("percentile(avg_bits, 0.66)").as("p66"))
        perDoc.join(broadcast(cuts), "lang")
          .withColumn("bucket",
            when(col("avg_bits") <= col("p33"), "head")
              .when(col("avg_bits") <= col("p66"), "middle")
              .otherwise("tail"))
          .groupBy(col("lang"), col("bucket"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("doc_id")).as("id_checksum"),
            (sum(col("sum_bits")).cast("double") /
              sum(col("n_tokens"))).as("bucket_avg_bits"))
          .orderBy(col("lang"), col("bucket"))
      },
      "WITH w AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) " +
        "AS word FROM documents), " +
        "tf AS (SELECT word, COUNT(*) AS tf FROM w GROUP BY 1), " +
        "tot AS (SELECT COUNT(*) AS total FROM w), " +
        "perdoc AS (SELECT doc_id, lang, COUNT(*) AS n_tokens, " +
        "SUM(length(bin(total // tf)) - 1)::BIGINT AS sum_bits, " +
        "CAST(SUM(length(bin(total // tf)) - 1) AS DOUBLE) / COUNT(*) " +
        "AS avg_bits FROM w JOIN tf USING (word) CROSS JOIN tot " +
        "GROUP BY doc_id, lang), " +
        "cuts AS (SELECT lang, quantile_cont(avg_bits, 0.33) AS p33, " +
        "quantile_cont(avg_bits, 0.66) AS p66 FROM perdoc GROUP BY 1) " +
        "SELECT lang, CASE WHEN avg_bits <= p33 THEN 'head' " +
        "WHEN avg_bits <= p66 THEN 'middle' ELSE 'tail' END AS bucket, " +
        "COUNT(*) AS n_docs, SUM(doc_id)::BIGINT AS id_checksum, " +
        "CAST(SUM(sum_bits) AS DOUBLE) / SUM(n_tokens) AS bucket_avg_bits " +
        "FROM perdoc JOIN cuts USING (lang) " +
        "GROUP BY 1, 2 ORDER BY 1, 2"),

    // Bigram-LM surprisal — the CONDITIONAL sibling of
    // llm_unigram_surprisal: per-token cost is -log2 p(w2|w1) with
    // p(w2|w1) = c(w1 w2) / c(w1·), where c(w1·) counts w1 as a CONTEXT
    // (bigrams starting with w1 — the normalization that sums to 1), both
    // exact corpus counts. Same integer bit-length quantization
    // (length(bin(c1 div c12)) − 1) so no ln() enters the oracle. The
    // scale difference vs unigram, stated honestly: the CONTEXT table is
    // vocabulary-sized (broadcast), but the BIGRAM table grows ~O(vocab²)
    // — at 100 TB that is 1e8+ rows, NOT broadcastable, so it joins as a
    // plain shuffle hash join on the bigram key (both sides hash-
    // partition; no window, no driver state). Docs shorter than 2 tokens
    // have no bigrams and drop out in both engines.
    "llm_bigram_surprisal" -> Q(
      (s, d) => {
        val bigr = T(s, d, "documents")
          .select(col("doc_id"), split(col("text"), " ").as("ws"))
          .filter(size(col("ws")) >= 2)
          .select(col("doc_id"), explode(expr(
            "transform(sequence(1, size(ws) - 1), " +
              "i -> struct(ws[i - 1] AS w1, " +
              "concat(ws[i - 1], ' ', ws[i]) AS bg))")).as("p"))
          .select(col("doc_id"), col("p.w1").as("w1"), col("p.bg").as("bg"))
        val c1 = bigr.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
        val c12 = bigr.groupBy(col("bg")).agg(count(lit(1)).as("c12"))
        bigr.join(broadcast(c1), "w1").join(c12, "bg")
          .withColumn("bits", big(length(bin(expr("c1 div c12"))) - 1))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_bigrams"), sum(col("bits")).as("sum_bits"))
          .withColumn("avg_bits",
            col("sum_bits").cast("double") / col("n_bigrams"))
          .orderBy(col("doc_id"))
      },
      "WITH s AS (SELECT doc_id, string_split(text, ' ') AS ws " +
        "FROM documents), " +
        "b AS (SELECT doc_id, " +
        "unnest(list_transform(generate_series(2, len(ws)), i -> ws[i - 1])) " +
        "AS w1, " +
        "unnest(list_transform(generate_series(2, len(ws)), " +
        "i -> ws[i - 1] || ' ' || ws[i])) AS bg FROM s), " +
        "c1 AS (SELECT w1, COUNT(*) AS c1 FROM b GROUP BY 1), " +
        "c12 AS (SELECT bg, COUNT(*) AS c12 FROM b GROUP BY 1) " +
        "SELECT doc_id, COUNT(*) AS n_bigrams, " +
        "SUM(length(bin(c1 // c12)) - 1)::BIGINT AS sum_bits, " +
        "CAST(SUM(length(bin(c1 // c12)) - 1) AS DOUBLE) / COUNT(*) " +
        "AS avg_bits FROM b JOIN c1 USING (w1) JOIN c12 USING (bg) " +
        "GROUP BY doc_id ORDER BY doc_id"),

    // Per-source language-diversity entropy — the curation diagnostic that
    // flags monoculture sources (entropy ~0: one lang dominates) vs mixed
    // crawls, using the SAME floor-log2 bit-length quantization that keeps
    // ln() out of every oracled surprisal key: bits(lang) =
    // floor(log2(tot/n)) and H ≈ Σ n·bits / tot. All moments exact longs;
    // ONE double division at the end. The corpus pays one hash agg on
    // (source, lang); the entropy rollup and its tot-window run over the
    // sources×langs-bounded frame — never the documents.
    "llm_source_entropy" -> Q(
      (s, d) => {
        val sl = T(s, d, "documents")
          .groupBy(col("source"), col("lang")).agg(count(lit(1)).as("n"))
        sl.withColumn("tot", sum(col("n")).over(
            Window.partitionBy(col("source"))))
          .withColumn("bits", big(length(bin(expr("tot div n"))) - 1))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_langs"), max(col("tot")).as("n_docs"),
            sum(col("n") * col("bits")).as("weighted_bits"))
          .withColumn("entropy_bits",
            col("weighted_bits").cast("double") / col("n_docs"))
          .orderBy(col("source"))
      },
      "WITH sl AS (SELECT source, lang, COUNT(*) AS n FROM documents " +
        "GROUP BY 1, 2), " +
        "w AS (SELECT source, lang, n, SUM(n) OVER (PARTITION BY source) " +
        "AS tot FROM sl), " +
        "b AS (SELECT source, n, tot, length(bin(tot // n)) - 1 AS bits " +
        "FROM w) " +
        "SELECT source, COUNT(*) AS n_langs, MAX(tot)::BIGINT AS n_docs, " +
        "SUM(n * bits)::BIGINT AS weighted_bits, " +
        "CAST(SUM(n * bits) AS DOUBLE) / MAX(tot) AS entropy_bits " +
        "FROM b GROUP BY 1 ORDER BY source"),

    // Corpus-wide LINE dedup with REWRITE (round-9 addendum) — the C4
    // transform: every non-first occurrence of a repeated line (8-word
    // chunk here; newline-free fixture) is REMOVED and the document is
    // reassembled from its surviving lines. Differs from llm_span_dedup
    // (which *scores* docs by overlapping-span novelty): this key
    // produces the cleaned corpus itself. Scale shape: "first
    // occurrence" is min(struct(doc_id, line_no)) per line-hash — a
    // map-side-combinable hash agg whose shuffle carries (md5, ids) only
    // (Catalyst prunes the line text off the agg input), immune to the
    // mega-duplicated-line skew a row_number-over-h window would hit;
    // survivors come back as an ids-only equi-join on (doc_id, line_no);
    // the only shuffle that carries text is the per-doc reassembly, which
    // any rewrite must pay and is keyed on doc_id. Cleaned text is
    // emitted as md5 (the fixture-friendly form; the real pipeline writes
    // the string).
    "llm_line_dedup" -> Q(
      (s, d) => {
        val lines = T(s, d, "documents")
          .select(col("doc_id"), split(col("text"), " ").as("toks"))
          .select(col("doc_id"), posexplode(expr(
            "transform(sequence(1, greatest(cast(ceil(size(toks) / 8.0) as int), 1)), " +
              "i -> concat_ws(' ', slice(toks, (i - 1) * 8 + 1, 8)))")))
          .withColumnRenamed("pos", "line_no")
          .withColumnRenamed("col", "line")
        val first = lines
          .select(md5(col("line")).as("h"), col("doc_id"), col("line_no"))
          .groupBy(col("h"))
          .agg(min(struct(col("doc_id"), col("line_no"))).as("f"))
          .select(col("f.doc_id").as("doc_id"), col("f.line_no").as("line_no"))
        val totals = lines.groupBy(col("doc_id"))
          .agg(count(lit(1)).as("total_lines"))
        val clean = lines.join(first, Seq("doc_id", "line_no"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("kept_lines"),
            collect_list(struct(col("line_no"), col("line"))).as("ls"))
          .select(col("doc_id"), col("kept_lines"),
            md5(expr("array_join(transform(array_sort(ls), x -> x.line), ' ')"))
              .as("clean_sig"))
        totals.join(clean, Seq("doc_id"), "left")
          .select(col("doc_id"), col("total_lines"),
            coalesce(col("kept_lines"), lit(0L)).as("kept_lines"),
            coalesce(col("clean_sig"), md5(lit(""))).as("clean_sig"))
          .orderBy(col("doc_id"))
      },
      "WITH l AS (SELECT doc_id, " +
        "unnest(list_transform(generate_series(1, greatest(" +
        "ceil(len(string_split(text, ' ')) / 8.0)::INT, 1)), i -> i - 1)) AS line_no, " +
        "unnest(list_transform(generate_series(1, greatest(" +
        "ceil(len(string_split(text, ' ')) / 8.0)::INT, 1)), " +
        "i -> array_to_string(list_slice(string_split(text, ' '), " +
        "(i - 1) * 8 + 1, (i - 1) * 8 + 8), ' '))) AS line FROM documents), " +
        "r AS (SELECT doc_id, line_no, line, row_number() OVER " +
        "(PARTITION BY md5(line) ORDER BY doc_id, line_no) AS rn FROM l), " +
        "tot AS (SELECT doc_id, COUNT(*) AS total_lines FROM l GROUP BY 1), " +
        "k AS (SELECT doc_id, COUNT(*) AS kept_lines, " +
        "md5(string_agg(line, ' ' ORDER BY line_no)) AS clean_sig " +
        "FROM r WHERE rn = 1 GROUP BY doc_id) " +
        "SELECT t.doc_id, t.total_lines, COALESCE(k.kept_lines, 0)::BIGINT " +
        "AS kept_lines, COALESCE(k.clean_sig, md5('')) AS clean_sig " +
        "FROM tot t LEFT JOIN k USING (doc_id) ORDER BY doc_id"),

    // Code-vs-prose detection (round-10) — the curation filter every
    // code/NL mixed crawl needs before domain mixing: symbol density, digit
    // density, and brace presence vote on whether a doc is code. The
    // fixture corpus is pure prose, so a deterministic subset (doc_id % 7
    // == 0) is first REWRITTEN into code shape (underscored identifiers
    // inside a def/braces wrapper) — the planted ground truth the detector
    // must then recover exactly. All signals are integer counts (length
    // deltas after character strips) and the thresholds compare
    // cross-multiplied (1000 * n_sym vs τ * n_chars), so no ratio ever
    // leaves integer space. One codegen projection pass, no UDF.
    "llm_code_detect" -> Q(
      (s, d) => {
        val mutated = T(s, d, "documents").select(col("doc_id"),
          when(col("doc_id") % 7 === 0,
            concat(lit("def f_"), col("doc_id").cast("string"), lit("(): return {"),
              translate(col("text"), " ", "_"), lit("}")))
            .otherwise(col("text")).as("body"))
        mutated.select(col("doc_id"),
            length(col("body")).cast("long").as("n_chars"),
            (length(col("body")) -
              length(translate(col("body"), "_(){}:", "")))
              .cast("long").as("n_sym"),
            (length(col("body")) -
              length(translate(col("body"), "0123456789", "")))
              .cast("long").as("n_digit"),
            col("body").contains("{").as("has_brace"))
          .withColumn("is_code",
            col("has_brace") && col("n_sym") * 1000L > col("n_chars") * 20L)
          .orderBy(col("doc_id"))
      },
      "SELECT doc_id, n_chars, n_sym, n_digit, has_brace, " +
        "has_brace AND n_sym * 1000 > n_chars * 20 AS is_code FROM (" +
        "SELECT doc_id, length(body)::BIGINT AS n_chars, " +
        "(length(body) - length(replace(replace(replace(replace(replace(" +
        "replace(body, '_', ''), '(', ''), ')', ''), '{', ''), '}', ''), " +
        "':', '')))::BIGINT AS n_sym, " +
        "(length(body) - length(regexp_replace(body, '[0-9]', '', 'g')))" +
        "::BIGINT AS n_digit, contains(body, '{') AS has_brace FROM (" +
        "SELECT doc_id, CASE WHEN doc_id % 7 = 0 THEN " +
        "'def f_' || doc_id || '(): return {' || replace(text, ' ', '_') " +
        "|| '}' ELSE text END AS body FROM documents) m) t ORDER BY doc_id"),

    // Unicode fold normalization (round-10) — the accent-strip + case-fold
    // every multilingual curation pipeline applies before tokenizing or
    // hashing (café/Café/cafe must dedup together). Neither engine ships
    // NFKC offline, so the fold is an EXPLICIT codepoint map through
    // translate() — one identical 44-char accent table on both sides
    // (probed), which also makes the fold auditable rather than
    // locale-dependent. Accent-strip runs BEFORE lower() so lower only
    // ever sees ASCII and engine ICU differences cannot surface.
    // Accented tokens are planted deterministically (doc_id-indexed) as
    // ground truth. One codegen projection.
    "llm_unicode_fold" -> Q(
      (s, d) => {
        val accents = "àáâäçèéêëìíîïñòóôöùúûüÀÁÂÄÇÈÉÊËÌÍÎÏÑÒÓÔÖÙÚÛÜ"
        val plain = "aaaaceeeeiiiinoooouuuuAAAACEEEEIIIINOOOOUUUU"
        val planted = T(s, d, "documents").select(col("doc_id"),
          concat(element_at(
              array(lit("Café"), lit("naïve"), lit("Über"), lit("Señor"),
                lit("Àccent")),
              (pmod(col("doc_id"), lit(5)) + 1).cast("int")),
            lit(" "), col("text")).as("body"))
        planted.select(col("doc_id"),
            length(col("body")).cast("long").as("n_chars_raw"),
            lower(translate(col("body"), accents, plain)).as("folded"))
          .select(col("doc_id"), col("n_chars_raw"),
            length(col("folded")).cast("long").as("n_chars_folded"),
            md5(col("folded")).as("folded_md5"))
          .orderBy(col("doc_id"))
      },
      "SELECT doc_id, length(body)::BIGINT AS n_chars_raw, " +
        "length(folded)::BIGINT AS n_chars_folded, md5(folded) AS folded_md5 " +
        "FROM (SELECT doc_id, body, lower(translate(body, " +
        "'àáâäçèéêëìíîïñòóôöùúûüÀÁÂÄÇÈÉÊËÌÍÎÏÑÒÓÔÖÙÚÛÜ', " +
        "'aaaaceeeeiiiinoooouuuuAAAACEEEEIIIINOOOOUUUU')) AS folded FROM (" +
        "SELECT doc_id, (['Café', 'naïve', 'Über', 'Señor', 'Àccent'])" +
        "[(doc_id % 5) + 1] || ' ' || text AS body FROM documents) p) t " +
        "ORDER BY doc_id"),

    // HTML boilerplate stripping (round-10) — the first transform of every
    // web-crawl curation pipeline: drop markup, decode entities, collapse
    // whitespace. The fixture corpus is plain text, so docs are first
    // deterministically WRAPPED into an HTML shell (nav boilerplate, body
    // tags, &amp;/&lt; entities spliced between words) — ground truth the
    // stripper must invert exactly: the key certifies strip(wrap(text)) ==
    // text plus the boilerplate-free length accounting. Pure
    // regexp_replace/replace codegen chain, identical semantics both
    // engines (probed), one projection pass — at 100 TB this runs at scan
    // speed with zero shuffle.
    "llm_html_strip" -> Q(
      (s, d) => {
        val wrapped = T(s, d, "documents").select(col("doc_id"),
          concat(lit("<html><nav>menu &amp; links</nav><body><p class=\"c\">"),
            regexp_replace(col("text"), " ", "</p> <p>&nbsp;"),
            lit("</p></body></html>")).as("html"))
        wrapped.select(col("doc_id"),
            length(col("html")).cast("long").as("html_len"),
            trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
              regexp_replace(col("html"), "<[^>]*>", " "),
              "&nbsp;", " "), "&amp;", "&"), "&lt;", "<"),
              " +", " ")).as("clean"))
          .select(col("doc_id"), col("html_len"),
            length(col("clean")).cast("long").as("clean_len"),
            md5(col("clean")).as("clean_md5"))
          .orderBy(col("doc_id"))
      },
      "SELECT doc_id, html_len, length(clean)::BIGINT AS clean_len, " +
        "md5(clean) AS clean_md5 FROM (" +
        "SELECT doc_id, length(html)::BIGINT AS html_len, " +
        "trim(regexp_replace(replace(replace(replace(" +
        "regexp_replace(html, '<[^>]*>', ' ', 'g'), " +
        "'&nbsp;', ' '), '&amp;', '&'), '&lt;', '<'), ' +', ' ', 'g')) " +
        "AS clean FROM (" +
        "SELECT doc_id, '<html><nav>menu &amp; links</nav><body><p class=\"c\">' " +
        "|| replace(text, ' ', '</p> <p>&nbsp;') || '</p></body></html>' " +
        "AS html FROM documents) w) t ORDER BY doc_id"),
  )

  /** The shared BPE trainer (llm_bpe_train / llm_bpe_apply): 3 merge
    * rounds over the weighted vocabulary. Returns (initial vocab, final
    * vocab, merge table) — each frame (lang, ws spaced-symbol string,
    * cnt) / (lang, round, pair, n). ONE definition so the two keys cannot
    * drift; see llm_bpe_train's comment for the algorithmic contract. */
  private def bpeTrain(s: org.apache.spark.sql.SparkSession, d: String):
      (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame,
        org.apache.spark.sql.DataFrame) = {
    import graft.operators.PinSyntax._
    // left-to-right merge fold: if the accumulated tail symbol is pa and
    // the next symbol is pb, fuse them; the fused token no longer equals
    // pa, so overlapping candidates skip — exact BPE order.
    val tail = "regexp_extract(acc, '([^ ]+)$', 1)"
    val mergeFold =
      "aggregate(slice(syms, 2, size(syms) - 1), element_at(syms, 1), " +
        s"(acc, x) -> CASE WHEN $tail = pa AND x = pb " +
        s"THEN concat(substring(acc, 1, length(acc) - length($tail)), " +
        "pa, pb) ELSE concat(acc, ' ', x) END)"
    val vocab0 = T(s, d, "documents")
      .select(col("lang"), explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) >= 2)
      .groupBy(col("lang"), col("word"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("lang"),
        array_join(split(col("word"), ""), " ").as("ws"), col("cnt"))
      .pinned
    var vocab = vocab0
    var merges: org.apache.spark.sql.DataFrame = null
    for (r <- 1 to 3) {
      val top = vocab
        .withColumn("syms", split(col("ws"), " "))
        .filter(size(col("syms")) >= 2)
        .select(col("lang"), col("cnt"), explode(expr(
          "transform(sequence(1, size(syms) - 1), i -> " +
            "concat(element_at(syms, i), ' ', element_at(syms, i + 1)))"))
          .as("pair"))
        .groupBy(col("lang"), col("pair"))
        .agg(sum(col("cnt")).as("n"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("lang"))
            .orderBy(col("n").desc, col("pair"))))
        .filter(col("rn") === 1)
        .select(col("lang"), col("pair"), col("n"))
        .pinned
      val tagged = top.select(col("lang"), lit(r.toLong).as("round"),
        col("pair"), col("n"))
      merges = if (merges == null) tagged else merges.unionByName(tagged)
      vocab = vocab
        .join(broadcast(top.select(col("lang"),
          split(col("pair"), " ").getItem(0).as("pa"),
          split(col("pair"), " ").getItem(1).as("pb"))),
          Seq("lang"), "left")
        .withColumn("syms", split(col("ws"), " "))
        .select(col("lang"),
          when(col("pa").isNull, col("ws"))
            .otherwise(expr(mergeFold)).as("ws"), col("cnt"))
        .pinned
    }
    (vocab0, vocab, merges)
  }

  /** The trainer's DuckDB twin as a per-round CTE chain (w0, p1/t1/w1,
    * …, t3[, w3]) — per-OCCURRENCE rows (no vocab weighting: equal by the
    * Σcnt identity). `finalMerge` appends w3 for consumers of the final
    * segmentation (llm_bpe_apply). */
  private def bpeDuckCtes(finalMerge: Boolean): String = {
    val duckTail = "regexp_extract(acc, '([^ ]+)$', 1)"
    def mergeSql(round: Int): String =
      s"w$round AS (SELECT w.lang, CASE WHEN t.pair IS NULL THEN w.ws " +
        "ELSE list_reduce(string_split(w.ws, ' '), (acc, x) -> " +
        s"CASE WHEN $duckTail = string_split(t.pair, ' ')[1] " +
        "AND x = string_split(t.pair, ' ')[2] " +
        s"THEN substr(acc, 1, length(acc) - length($duckTail)) || " +
        "replace(t.pair, ' ', '') " +
        "ELSE acc || ' ' || x END) END AS ws " +
        s"FROM w${round - 1} w LEFT JOIN t$round t USING (lang))"
    def roundSql(round: Int): String =
      s"p$round AS (SELECT lang, (syms[i] || ' ' || syms[i + 1]) AS pair " +
        "FROM (SELECT lang, syms, " +
        "unnest(generate_series(1, len(syms) - 1)) AS i " +
        s"FROM (SELECT lang, string_split(ws, ' ') AS syms FROM w${round - 1}) a) b), " +
        s"t$round AS (SELECT lang, pair, COUNT(*)::BIGINT AS n FROM p$round " +
        "GROUP BY 1, 2 QUALIFY row_number() OVER (PARTITION BY lang " +
        "ORDER BY n DESC, pair) = 1)"
    "WITH w0 AS (SELECT lang, " +
      "array_to_string(string_split(word, ''), ' ') AS ws " +
      "FROM (SELECT lang, unnest(string_split(text, ' ')) AS word " +
      "FROM documents) t WHERE length(word) >= 2), " +
      roundSql(1) + ", " + mergeSql(1) + ", " +
      roundSql(2) + ", " + mergeSql(2) + ", " +
      roundSql(3) + (if (finalMerge) ", " + mergeSql(3) else "")
  }
}
