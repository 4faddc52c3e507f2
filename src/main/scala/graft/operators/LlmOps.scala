package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, T}
import graft.Dsl._

/** SURVEY.md §2.K — LLM-training-data pipeline operators over `documents`
  * and `embeddings` (mandated beyond the reference surface).
  *
  * Scale notes (100 TB design rule): dedup shuffles on content hash / band
  * key only; MinHash banding turns the quadratic near-dup search into an
  * equi-join on band signatures; cosine top-k broadcasts the smaller side of
  * the pair join and keeps the dot product in a tight primitive loop (no
  * row explosion); tf-idf is pure relational algebra (no driver collect).
  */
object LlmOps {

  // Native codegen dot product (graft.functions.DotProductF): sequential
  // double fold — bit-identical to DuckDB list_inner_product over ::DOUBLE[].
  import graft.functions.VectorExpressions.dotF

  /** Shared k-means assignment frame (vec_id, cid, emb, dist) for
    * `llm_kmeans_step` / `llm_cluster_balanced_sample`: k = 8 seed
    * centroids (lowest vec_ids), squared L2 via three in-place float dot
    * folds (x·x + c·c − 2x·c), rounded 4dp so both engines argmin
    * identically with the cid tie-break. Embeddings stay array<float>
    * here — DotProductF reads floats in place (getFloat on a double
    * array would read garbage) and widens inside the fold, exactly what
    * the oracle's ::DOUBLE[] cast feeds list_inner_product. */
  private def kmeansScored(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val dot = dotF(s) _
    val emb = T(s, d, "embeddings")
      .select(col("vec_id"), col("embedding").as("emb"))
    val cents = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("emb").as("cemb"))
    emb.crossJoin(broadcast(cents))
      .withColumn("dist", round(
        dot(col("emb"), col("emb")) + dot(col("cemb"), col("cemb"))
          - lit(2.0) * dot(col("emb"), col("cemb")), 4))
  }

  /** DuckDB twin of [[kmeansScored]] + the argmin: CTEs `e`, `c`, `a`
    * (scored pairs) and `b(vec_id, cid[, emb])` — rn = 1 of the
    * (dist, cid) ordering per vector. */
  private val kmeansCte: String =
    "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings), " +
      "c AS (SELECT vec_id AS cid, emb AS cemb FROM e WHERE vec_id < 8), " +
      "a AS (SELECT e.vec_id, c.cid, e.emb, " +
      "round(list_inner_product(e.emb, e.emb) + " +
      "list_inner_product(c.cemb, c.cemb) - " +
      "2.0 * list_inner_product(e.emb, c.cemb), 4) AS dist " +
      "FROM e CROSS JOIN c), " +
      "b AS (SELECT vec_id, cid, emb FROM (SELECT vec_id, cid, emb, " +
      "row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn " +
      "FROM a) z WHERE rn = 1) "

  val defs: Seq[(String, Q)] = Seq(

    // Exact dedup on content hash: keep the lowest doc_id per sha256(text).
    "llm_exact_dedup" -> Q(
      (s, d) => T(s, d, "documents")
        .withColumn("text_sha", sha2(col("text"), 256))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("text_sha")).orderBy(col("doc_id"))))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("text_sha"))
        .orderBy(col("doc_id")),
      "SELECT doc_id, text_sha FROM (SELECT doc_id, sha256(text) AS text_sha, " +
        "row_number() OVER (PARTITION BY sha256(text) ORDER BY doc_id) AS rn " +
        "FROM documents) t WHERE rn = 1 ORDER BY doc_id"),

    // MinHash + LSH near-dup: 3-word shingles → 8 minhash signatures (seeded
    // xxhash64) → 4 bands of 2 → candidate pairs via band equi-join.
    // Non-oracle-able (DuckDB has no xxhash64, SURVEY §7.4.4); golden-tested
    // in DedupSpec. Implementation shared in DedupOps.minhashPairs.
    "llm_near_dedup_minhash" -> Q(
      (s, d) => DedupOps.minhashPairs(T(s, d, "documents")),
      None),

    // Brute-force k-NN (k=3) by cosine over 64-dim float vectors. Baseline
    // for the LSH/IVF scale path; sim rounded to 4dp and ranked with vec_id
    // tie-break so both engines rank identical values (SURVEY §7.4).
    "llm_cosine_topk" -> Q(
      (s, d) =>
        // embeddings are dropped BEFORE the rank shuffle (VectorSim emits
        // only ids + sim: 24 bytes/row cross the exchange) and
        // InferWindowGroupLimit keeps top-3 per group below it.
        VectorSim.pairs(s, d, col("a_id") =!= col("b_id"))
          .withColumn("rn", big(row_number().over(
            Window.partitionBy(col("a_id"))
              .orderBy(col("sim").desc, col("b_id")))))
          .filter(col("rn") <= 3)
          .select(col("a_id"), col("rn"), col("b_id"), col("sim"))
          .orderBy(col("a_id"), col("rn")),
      "SELECT a_id, rn, b_id, sim FROM (SELECT a_id, b_id, sim, " +
        "row_number() OVER (PARTITION BY a_id ORDER BY sim DESC, b_id)::BIGINT AS rn " +
        "FROM (SELECT a.vec_id AS a_id, b.vec_id AS b_id, " +
        "round(list_inner_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) / " +
        "(sqrt(list_inner_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) * " +
        "sqrt(list_inner_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 4) AS sim " +
        "FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id " +
        "WHERE a.vec_id < 20000 AND b.vec_id < 20000) x) y " +
        "WHERE rn <= 3 ORDER BY a_id, rn"),

    // Language/corpus profile: doc counts, token totals, char stats per lang.
    "llm_text_stats" -> Q(
      (s, d) => T(s, d, "documents")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(big(size(split(col("text"), " ")))).as("total_tokens"),
          (sum(col("n_chars")).cast("double") / count(lit(1))).as("avg_chars"),
          min(col("n_chars")).as("min_chars"),
          max(col("n_chars")).as("max_chars"))
        .orderBy(col("lang")),
      "SELECT lang, COUNT(*) AS n_docs, " +
        "SUM(len(string_split(text, ' ')))::BIGINT AS total_tokens, " +
        "CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars, " +
        "MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars " +
        "FROM documents GROUP BY lang ORDER BY lang"),

    // Top-5 terms per language by tf * N/df. The score is exact integer math
    // plus ONE double division — bit-identical cross-engine (no ln()).
    "llm_tfidf_terms" -> Q(
      (s, d) => {
        val docs = T(s, d, "documents")
        val words = docs.select(col("lang"), col("doc_id"),
          explode(split(col("text"), " ")).as("word"))
        val tf = words.groupBy(col("lang"), col("word"))
          .agg(count(lit(1)).as("tf"))
        val dfreq = words.select(col("doc_id"), col("word")).distinct()
          .groupBy(col("word")).agg(count(lit(1)).as("df"))
        val total = docs.agg(count(lit(1)).as("n"))
        tf.join(dfreq, "word").crossJoin(broadcast(total))
          .withColumn("score", (col("tf") * col("n")).cast("double") / col("df"))
          .withColumn("rn", big(row_number().over(
            Window.partitionBy(col("lang"))
              .orderBy(col("score").desc, col("word")))))
          .filter(col("rn") <= 5)
          .select(col("lang"), col("rn"), col("word"), col("tf"), col("df"),
            col("score"))
          .orderBy(col("lang"), col("rn"))
      },
      "SELECT lang, rn, word, tf, df, score FROM (" +
        "SELECT lang, word, tf, df, score, row_number() OVER " +
        "(PARTITION BY lang ORDER BY score DESC, word)::BIGINT AS rn FROM (" +
        "SELECT t.lang, t.word, t.tf, d.df, " +
        "CAST(t.tf * (SELECT COUNT(*) FROM documents) AS DOUBLE) / d.df AS score " +
        "FROM (SELECT lang, word, COUNT(*) AS tf FROM (SELECT lang, " +
        "unnest(string_split(text, ' ')) AS word FROM documents) w GROUP BY 1, 2) t " +
        "JOIN (SELECT word, COUNT(*) AS df FROM (SELECT DISTINCT doc_id, " +
        "unnest(string_split(text, ' ')) AS word FROM documents) u GROUP BY 1) d " +
        "ON t.word = d.word) x) y WHERE rn <= 5 ORDER BY lang, rn"),

    // Per-label centroid per dimension, computed over QUANTIZED values:
    // floor(x * 1e7) as a long, summed exactly, mean reconstructed as
    // qsum / 1e7 / count. Rationale: a double fold is order-dependent, a
    // sorted collect_list fold buffers O(corpus/|labels|) doubles in one
    // task (OOM-shaped at 1e9 vectors), and decimal casts tie-break
    // differently cross-engine (DuckDB half-even, Spark half-up, float32
    // values ARE exact decimal ties). floor on the bit-identical double
    // product has no tie hazard, long sums are associative (map-side
    // combinable, partition-order independent, O(1) agg state), and the
    // final two divisions are single IEEE ops mirrored in both engines.
    // Quantization error < 1e-7 per element, spec-pinned vs the exact
    // typed-Aggregator twin.
    "llm_embedding_agg" -> Q(
      (s, d) => T(s, d, "embeddings")
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .select(col("label"), big(col("pos") + 1).as("dim"),
          col("x").cast("double").as("xd"))
        .groupBy(col("label"), col("dim"))
        .agg((sum(floor(col("xd") * lit(1e7)).cast("long")).cast("double")
          / lit(1e7) / count(lit(1))).as("centroid"))
        .orderBy(col("label"), col("dim")),
      "SELECT label, dim, SUM(floor(xd * 10000000.0)::BIGINT)::DOUBLE " +
        "/ 10000000.0 / COUNT(*) AS centroid " +
        "FROM (SELECT label, r.range::BIGINT AS dim, " +
        "embedding[r.range]::DOUBLE AS xd FROM embeddings CROSS JOIN range(1, 65) r) t " +
        "GROUP BY label, dim ORDER BY label, dim"),

    // Same centroid through the typed Aggregator UDAF (SURVEY §2.L surface):
    // map-side partial (sums, count) buffers — only 64 doubles/group cross
    // the shuffle. Summation order is partition-dependent (±1 ulp), so no
    // SQL oracle; EmbeddingAggSpec pins it to the oracled twin at 1e-9.
    "llm_embedding_agg_typed" -> Q(
      (s, d) => {
        val mean = udaf(new graft.functions.VectorMeanAgg(64))
        T(s, d, "embeddings")
          .groupBy(col("label"))
          .agg(mean(col("embedding")).as("centroid"))
          .select(col("label"), posexplode(col("centroid")).as(Seq("pos", "c")))
          .select(col("label"), big(col("pos") + 1).as("dim"), col("c").as("centroid"))
          .orderBy(col("label"), col("dim"))
      },
      None),

    // Nearest-centroid classification — the second similarity-search
    // application (llm_knn_classify votes over neighbors; this assigns to
    // class MEANS). Centroids come from the same quantized-sum per-dim
    // means the oracled llm_embedding_agg uses (exact long sums →
    // bit-identical doubles cross-engine, O(1) agg state — no
    // corpus-sized collect_list buffer), assembled into arrays in dim
    // order; each vector then scores cosine against the 10-row broadcast
    // centroid frame with index-order folds (zip_with/aggregate ≡
    // list_inner_product), and argmax breaks ties by label. At scale:
    // the centroid frame is |classes|-sized, the scoring pass is one
    // broadcast join — no shuffle touches the corpus beyond the
    // per-class partial sums.
    "llm_centroid_classify" -> Q(
      (s, d) => {
        val perDim = T(s, d, "embeddings")
          .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
          .select(col("label"), col("pos"), col("x").cast("double").as("xd"))
          .groupBy(col("label"), col("pos"))
          .agg((sum(floor(col("xd") * lit(1e7)).cast("long")).cast("double")
            / lit(1e7) / count(lit(1))).as("c"))
        val cents = perDim
          .groupBy(col("label"))
          .agg(expr("transform(array_sort(collect_list(struct(pos, c))), p -> p.c)")
            .as("cemb"))
          .select(big(col("label")).as("clabel"), col("cemb"))
        val scored = T(s, d, "embeddings")
          .select(col("vec_id"), big(col("label")).as("actual_label"),
            expr("transform(embedding, x -> cast(x as double))").as("emb"))
          .crossJoin(broadcast(cents))
          .withColumn("dots", expr(
            "aggregate(zip_with(emb, cemb, (a, b) -> a * b), 0D, (acc, x) -> acc + x)"))
          .withColumn("na", expr(
            "aggregate(zip_with(emb, emb, (a, b) -> a * b), 0D, (acc, x) -> acc + x)"))
          .withColumn("nc", expr(
            "aggregate(zip_with(cemb, cemb, (a, b) -> a * b), 0D, (acc, x) -> acc + x)"))
          .withColumn("sim", col("dots") / (sqrt(col("na")) * sqrt(col("nc"))))
        scored
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("vec_id")).orderBy(col("sim").desc, col("clabel"))))
          .filter(col("rn") === 1)
          .select(col("vec_id"), col("clabel").as("pred_label"),
            round(col("sim"), 4).as("sim"), col("actual_label"),
            (col("clabel") === col("actual_label")).as("correct"))
          .orderBy(col("vec_id"))
      },
      "WITH perdim AS (SELECT label, dim, " +
        "SUM(floor(xd * 10000000.0)::BIGINT)::DOUBLE / 10000000.0 / COUNT(*) AS c " +
        "FROM (SELECT label, r.range::BIGINT AS dim, " +
        "embedding[r.range]::DOUBLE AS xd FROM embeddings " +
        "CROSS JOIN range(1, 65) r) t GROUP BY label, dim), " +
        "cents AS (SELECT label::BIGINT AS clabel, " +
        "list(c ORDER BY dim) AS cemb FROM perdim GROUP BY 1), " +
        "scored AS (SELECT e.vec_id, e.label::BIGINT AS actual_label, " +
        "c.clabel, list_inner_product(e.embedding::DOUBLE[], c.cemb) / " +
        "(sqrt(list_inner_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) * " +
        "sqrt(list_inner_product(c.cemb, c.cemb))) AS sim " +
        "FROM embeddings e CROSS JOIN cents c) " +
        "SELECT vec_id, clabel AS pred_label, round(sim, 4) AS sim, " +
        "actual_label, clabel = actual_label AS correct FROM (" +
        "SELECT vec_id, clabel, sim, actual_label, row_number() OVER (" +
        "PARTITION BY vec_id ORDER BY sim DESC, clabel) AS rn FROM scored) z " +
        "WHERE rn = 1 ORDER BY vec_id"),

    // Int8-style embedding quantization summary: per-vector min/max range
    // and the sum of floor-quantized codes (floor, not round — a scaled
    // float can land exactly on .5 and the engines break ties
    // differently). One explode + two keyed aggregates; the quantized sum
    // pins every code bit-exactly without shipping 64 codes per row
    // through the comparator.
    "llm_embedding_quantize" -> Q(
      (s, d) => {
        val x = T(s, d, "embeddings")
          .select(col("vec_id"),
            explode(col("embedding").cast("array<double>")).as("v"))
        val mm = x.groupBy(col("vec_id"))
          .agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
        x.join(mm, "vec_id")
          .groupBy(col("vec_id"), col("mn"), col("mx"))
          .agg(sum(when(col("mx") === col("mn"), 0L).otherwise(
            floor((col("v") - col("mn")) * 255.0 / (col("mx") - col("mn")))
              .cast("long"))).as("qsum"),
            count(lit(1)).as("dim"))
          .orderBy(col("vec_id"))
      },
      "WITH x AS (SELECT vec_id, unnest(embedding::DOUBLE[]) AS v FROM embeddings), " +
        "mm AS (SELECT vec_id, min(v) AS mn, max(v) AS mx FROM x GROUP BY 1) " +
        "SELECT x.vec_id, mm.mn, mm.mx, " +
        "SUM(CASE WHEN mm.mx = mm.mn THEN 0 " +
        "ELSE floor((x.v - mm.mn) * 255.0 / (mm.mx - mm.mn)) END)::BIGINT AS qsum, " +
        "COUNT(*)::BIGINT AS dim " +
        "FROM x JOIN mm ON x.vec_id = mm.vec_id " +
        "GROUP BY 1, 2, 3 ORDER BY 1"),

    // Corpus composition report — the input to training-data MIXING
    // decisions (how much of each source×language goes into the next run):
    // per-domain doc and token counts plus each domain's share of all
    // corpus tokens. Counts are exact integers off one hash agg; the
    // share divides by a global-window sum OVER the aggregated frame —
    // the corpus is scanned exactly ONCE (re-aggregating dom's lineage
    // for the total would scan it twice). The single-partition window is
    // provably bounded: the domain frame is (sources × languages) rows,
    // never corpus-sized — the same bounded-window argument as
    // scale_global_ids' 16-row offsets frame.
    "llm_domain_mix" -> Q(
      (s, d) => {
        val dom = T(s, d, "documents")
          .groupBy(col("source"), col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(size(split(col("text"), " ")).cast("long")).as("tokens"))
        dom
          .withColumn("token_share", col("tokens").cast("double") /
            sum(col("tokens")).over(Window.partitionBy()))
          .orderBy(col("source"), col("lang"))
      },
      "WITH t AS (SELECT source, lang, COUNT(*) AS n_docs, " +
        "SUM(len(string_split(text, ' ')))::BIGINT AS tokens " +
        "FROM documents GROUP BY 1, 2) " +
        "SELECT source, lang, n_docs, tokens, " +
        "CAST(tokens AS DOUBLE) / SUM(tokens) OVER () AS token_share " +
        "FROM t ORDER BY source, lang"),

    // Corpus RESAMPLING to a target mix — the step a training-data
    // pipeline runs right after llm_domain_mix measures composition.
    // Target: temperature-smoothed shares (alpha = 0.5, the multilingual
    // pretraining staple — cell quota proportional to sqrt(cell size),
    // upweighting small domains) over a 10%-of-corpus budget. Every
    // quota is EXACT INTEGER math off quantized floor(sqrt(n)*1000)
    // longs (sqrt is correctly-rounded IEEE, the product is one op —
    // bit-identical cross-engine; a floating sum over cells would be
    // order-dependent), so the draw is deterministic everywhere. Docs are
    // drawn per cell by md5 rank (reproducible across engines,
    // partitionings, reruns — the llm_stratified_sample discipline).
    // Scale shape: the cell frame is (sources x languages) rows — its
    // global windows are bounded, never corpus-sized; the corpus sees one
    // keyed window (rank within cell) and one broadcast join.
    "llm_corpus_resample" -> Q(
      (s, d) => {
        val cells = T(s, d, "documents")
          .groupBy(col("source"), col("lang"))
          .agg(count(lit(1)).as("n_cell"))
          .withColumn("sq",
            floor(sqrt(col("n_cell").cast("double")) * lit(1000.0)).cast("long"))
          .withColumn("budget",
            expr("(sum(n_cell) over () + 9) div 10"))
          .withColumn("stot", sum(col("sq")).over(Window.partitionBy()))
          .withColumn("quota", expr("(budget * sq + stot - 1) div stot"))
          .select(col("source"), col("lang"), col("quota"))
        val byCell = Window.partitionBy(col("source"), col("lang"))
          .orderBy(col("h"), col("doc_id"))
        T(s, d, "documents")
          .select(col("doc_id"), col("source"), col("lang"),
            md5(col("doc_id").cast("string")).as("h"))
          .withColumn("rn", row_number().over(byCell))
          .join(broadcast(cells), Seq("source", "lang"))
          .filter(col("rn") <= col("quota"))
          .select(col("doc_id"), col("source"), col("lang"),
            big(col("rn")).as("rn"))
          .orderBy(col("doc_id"))
      },
      "WITH cells AS (SELECT source, lang, COUNT(*) AS n_cell, " +
        "floor(sqrt(COUNT(*)) * 1000.0)::BIGINT AS sq " +
        "FROM documents GROUP BY 1, 2), " +
        "q AS (SELECT source, lang, " +
        "(((SUM(n_cell) OVER () + 9) // 10) * sq + SUM(sq) OVER () - 1) " +
        "// SUM(sq) OVER () AS quota FROM cells), " +
        "r AS (SELECT doc_id, source, lang, row_number() OVER (" +
        "PARTITION BY source, lang ORDER BY md5(doc_id::VARCHAR), doc_id) " +
        "AS rn FROM documents) " +
        "SELECT r.doc_id, r.source, r.lang, r.rn FROM r " +
        "JOIN q USING (source, lang) WHERE r.rn <= q.quota ORDER BY r.doc_id"),

    // One Lloyd iteration of k-means over the embedding corpus — the
    // clustering primitive behind cluster-balanced curation (cluster the
    // corpus, then sample/filter per cluster). k = 8 seed centroids are
    // the vectors with the 8 lowest vec_ids (deterministic, seed-free —
    // k-means++ needs sequential randomness neither engine can mirror).
    // Assignment is squared L2 via THREE index-order dot folds
    // (x·x + c·c − 2x·c ≡ DuckDB list_inner_product), rounded to 4dp
    // with cid tie-break so both engines argmin identically; the argmin
    // itself is min(struct(dist, cid, emb)) — a map-side-combinable hash
    // agg (dist,cid is unique per vector, so the emb field never drives
    // a comparison), NOT a per-vector sort window. New centroids are the
    // proven exact-quantized-long-sum means (llm_embedding_agg
    // discipline): O(1) agg state per (cluster, dim), bit-identical
    // cross-engine. Scale shape: the centroid frame is k rows and
    // BROADCAST — the corpus pays one narrow broadcast join, one
    // partial-agg-collapsed shuffle of (vec_id → best) rows, and the
    // 512-key (cluster, dim) mean agg; nothing quadratic, nothing
    // driver-side, repeatable per iteration.
    "llm_kmeans_step" -> Q(
      (s, d) => {
        val best = kmeansScored(s, d)
          .groupBy(col("vec_id"))
          .agg(min(struct(col("dist"), col("cid"), col("emb"))).as("m"))
          .select(col("m.cid").as("cid"), col("m.emb").as("emb"))
        best
          .select(col("cid"), posexplode(col("emb")).as(Seq("pos", "x")))
          .select(col("cid"), col("pos"), col("x").cast("double").as("xd"))
          .groupBy(col("cid").as("cluster_id"), big(col("pos") + 1).as("dim"))
          .agg(count(lit(1)).as("n_members"),
            (sum(floor(col("xd") * lit(1e7)).cast("long")).cast("double")
              / lit(1e7) / count(lit(1))).as("centroid"))
          .orderBy(col("cluster_id"), col("dim"))
      },
      kmeansCte +
        "SELECT cid AS cluster_id, r.range::BIGINT AS dim, " +
        "COUNT(*) AS n_members, " +
        "SUM(floor(emb[r.range] * 10000000.0)::BIGINT)::DOUBLE " +
        "/ 10000000.0 / COUNT(*) AS centroid " +
        "FROM b CROSS JOIN range(1, 65) r " +
        "GROUP BY 1, 2 ORDER BY 1, 2"),

    // Cluster-BALANCED corpus draw — the curation step the Lloyd
    // iteration exists for: an equal per-cluster quota flattens the
    // cluster-size skew (dominant near-duplicate topics shrink, rare
    // topics survive — the semantic-diversity analogue of
    // llm_corpus_resample's domain temperature smoothing). Budget = 10%
    // of the corpus, quota = ceil(budget / k) — ALL integer math; the
    // draw within each cluster is md5-rank (the llm_stratified_sample
    // discipline: reproducible across engines, partitionings, reruns).
    // Scale shape: assignment is the broadcast k-row join + one
    // map-side-combinable argmin agg; the ranked draw is ONE window
    // keyed by cluster over an ids-only frame (embeddings never reach
    // the rank shuffle); the corpus count broadcasts as a 1-row frame.
    "llm_cluster_balanced_sample" -> Q(
      (s, d) => {
        val assign = kmeansScored(s, d)
          .groupBy(col("vec_id"))
          .agg(min(struct(col("dist"), col("cid"))).as("m"))
          .select(col("vec_id"), col("m.cid").as("cluster_id"))
        val n = assign.agg(count(lit(1)).as("nv"))
        val byCluster = Window.partitionBy(col("cluster_id"))
          .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
        assign
          .withColumn("rn", big(row_number().over(byCluster)))
          .crossJoin(broadcast(n))
          .filter(col("rn") <= expr("((nv + 9) div 10 + 7) div 8"))
          .select(col("vec_id"), col("cluster_id"), col("rn"))
          .orderBy(col("vec_id"))
      },
      // b's emb column goes unused here — DuckDB prunes it.
      kmeansCte +
        ", n AS (SELECT COUNT(*) AS nv FROM e), " +
        "r AS (SELECT vec_id, cid AS cluster_id, row_number() OVER (" +
        "PARTITION BY cid ORDER BY md5(vec_id::VARCHAR), vec_id)::BIGINT " +
        "AS rn FROM b) " +
        "SELECT vec_id, cluster_id, rn FROM r CROSS JOIN n " +
        "WHERE rn <= ((nv + 9) // 10 + 7) // 8 ORDER BY vec_id"),

    // BM25 top-10 retrieval (k1=1.2, b=0.75) for a fixed 3-term query —
    // the keyword-search sibling of llm_cosine_topk (lexical vs semantic
    // retrieval). idf stays LOG-FREE (N/df, the llm_tfidf_terms rational)
    // so ln() never enters an oracled key (§7.4); the BM25-specific part —
    // per-term tf saturation with document-length normalization — is one
    // textually identical double expression in both engines, quantized to
    // floor(score·1e4) longs per (doc, term) BEFORE the per-doc sum (a
    // double sum over the ≤3 matched terms would be addend-order-
    // dependent; the long sum is exact), final score = one division.
    // Shape at 100 TB: the token stream filters to the 3 query terms
    // BEFORE any agg (matched-docs-sized, not corpus-sized); df and the
    // corpus totals are broadcast 1-row/3-row frames; doc lengths are one
    // map-side-combinable hash agg; top-10 is TakeOrderedAndProject (no
    // global sort materialization).
    "llm_bm25_topk" -> Q(
      (s, d) => {
        val words = T(s, d, "documents").select(col("doc_id"),
          explode(split(col("text"), " ")).as("word"))
        val lens = words.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
        val totals = lens.agg(sum(col("dl")).as("tt"), count(lit(1)).as("nd"))
        val qtf = words.filter(col("word").isin("spark", "join", "hash"))
          .groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("tf"))
        val dfreq = qtf.groupBy(col("word")).agg(count(lit(1)).as("df"))
        qtf.join(broadcast(dfreq), "word")
          .join(lens, "doc_id")
          .crossJoin(broadcast(totals))
          .withColumn("sq", expr(
            "CAST(floor((CAST(nd AS DOUBLE) / df) * (tf * 2.2) / " +
              "(tf + 1.2 * (0.25 + 0.75 * (dl * nd) / tt)) * 10000) AS BIGINT)"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_terms"), sum(col("sq")).as("score_q"))
          .withColumn("score", col("score_q").cast("double") / 10000.0)
          .select(col("doc_id"), col("n_terms"), col("score"))
          .orderBy(col("score").desc, col("doc_id"))
          .limit(10)
      },
      "WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word " +
        "FROM documents), " +
        "l AS (SELECT doc_id, COUNT(*) AS dl FROM w GROUP BY 1), " +
        "t AS (SELECT SUM(dl)::BIGINT AS tt, COUNT(*)::BIGINT AS nd FROM l), " +
        "q AS (SELECT doc_id, word, COUNT(*) AS tf FROM w " +
        "WHERE word IN ('spark', 'join', 'hash') GROUP BY 1, 2), " +
        "f AS (SELECT word, COUNT(*) AS df FROM q GROUP BY 1), " +
        "s AS (SELECT q.doc_id, " +
        "floor((CAST(nd AS DOUBLE) / df) * (tf * 2.2) / " +
        "(tf + 1.2 * (0.25 + 0.75 * (dl * nd) / tt)) * 10000)::BIGINT AS sq " +
        "FROM q JOIN f USING (word) JOIN l ON q.doc_id = l.doc_id " +
        "CROSS JOIN t) " +
        "SELECT doc_id, COUNT(*)::BIGINT AS n_terms, " +
        "CAST(SUM(sq) AS DOUBLE) / 10000.0 AS score " +
        "FROM s GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 10"),

    // Trained-model application at scale — a fixed linear quality
    // classifier scored over engineered doc features (the production
    // pattern: weights train offline, score distributed; the sigmoid is
    // monotone so ranking/thresholding uses the LOGIT and keeps exp()
    // out of the oracle, the same ban as ln()). Every feature is exact
    // integer math — mean word length falls out of n_chars/n_tokens
    // (spaces = tokens − 1, no second pass), stopword and distinct
    // counts are HOF list ops — and the logit is one textually identical
    // double chain, floor-quantized. Scan-local per doc; no shuffle at
    // all until the output sort.
    "llm_logit_quality" -> Q(
      (s, d) => T(s, d, "documents")
        .select(col("doc_id"), col("n_chars"), split(col("text"), " ").as("ws"))
        .select(col("doc_id"),
          size(col("ws")).cast("long").as("n_tokens"),
          col("n_chars"),
          expr("size(filter(ws, w -> w IN ('the', 'a')))").cast("long")
            .as("n_stop"),
          size(array_distinct(col("ws"))).cast("long").as("n_uniq"))
        .withColumn("logit", floor(expr(
          "(-1.5 + 0.02 * n_tokens " +
            "- 0.3 * (CAST(n_chars - n_tokens + 1 AS DOUBLE) / n_tokens) " +
            "+ 2.0 * (CAST(n_stop AS DOUBLE) / n_tokens) " +
            "+ 1.2 * (CAST(n_uniq AS DOUBLE) / n_tokens)) * 10000"))
          .cast("long") / 10000.0)
        .orderBy(col("doc_id")),
      "SELECT doc_id, n_tokens, n_chars, n_stop, n_uniq, " +
        "floor((-1.5 + 0.02 * n_tokens " +
        "- 0.3 * (CAST(n_chars - n_tokens + 1 AS DOUBLE) / n_tokens) " +
        "+ 2.0 * (CAST(n_stop AS DOUBLE) / n_tokens) " +
        "+ 1.2 * (CAST(n_uniq AS DOUBLE) / n_tokens)) * 10000)::BIGINT " +
        "/ 10000.0 AS logit FROM (" +
        "SELECT doc_id, n_chars, len(ws)::BIGINT AS n_tokens, " +
        "len(list_filter(ws, w -> w IN ('the', 'a')))::BIGINT AS n_stop, " +
        "len(list_distinct(ws))::BIGINT AS n_uniq FROM (" +
        "SELECT doc_id, n_chars, string_split(text, ' ') AS ws " +
        "FROM documents) t) f ORDER BY doc_id"),

    // Token-weighted corpus mix — llm_domain_mix counts DOCS per domain,
    // but a training mix is budgeted in TOKENS; the two diverge whenever
    // doc length correlates with source. One scan (token counts from
    // split size, no explode), one hash agg on the ~|sources| key, totals
    // broadcast; both shares floor-quantized from exact longs.
    "llm_domain_token_mix" -> Q(
      (s, d) => {
        val per = T(s, d, "documents")
          .select(col("source"),
            size(split(col("text"), " ")).cast("long").as("toks"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("n_tokens"))
        val tot = per.agg(sum(col("n_docs")).as("td"),
          sum(col("n_tokens")).as("tt"))
        per.crossJoin(broadcast(tot))
          .select(col("source"), col("n_docs"), col("n_tokens"),
            (floor(col("n_docs").cast("double") / col("td") * 10000)
              .cast("long") / 10000.0).as("doc_share"),
            (floor(col("n_tokens").cast("double") / col("tt") * 10000)
              .cast("long") / 10000.0).as("token_share"))
          .orderBy(col("source"))
      },
      "WITH per AS (SELECT source, COUNT(*)::BIGINT AS n_docs, " +
        "SUM(len(string_split(text, ' ')))::BIGINT AS n_tokens " +
        "FROM documents GROUP BY 1), " +
        "tot AS (SELECT SUM(n_docs)::BIGINT AS td, " +
        "SUM(n_tokens)::BIGINT AS tt FROM per) " +
        "SELECT source, n_docs, n_tokens, " +
        "floor(CAST(n_docs AS DOUBLE) / td * 10000)::BIGINT / 10000.0 " +
        "AS doc_share, " +
        "floor(CAST(n_tokens AS DOUBLE) / tt * 10000)::BIGINT / 10000.0 " +
        "AS token_share " +
        "FROM per CROSS JOIN tot ORDER BY source"),

    // Output-shard balance audit — hash sharding (doc_id % 16) is the
    // only assignment that needs no global sort or driver state, and this
    // key measures what that convenience costs: per-shard doc/token
    // totals plus each shard's load factor vs the fair share
    // (tokens·nshards/total). One scan, 16-key hash agg, 1-row broadcast
    // total. The greedy bin-packing alternative is inherently sequential
    // — the audit shows hash assignment stays within a few % and is the
    // 100 TB answer.
    "llm_shard_balance" -> Q(
      (s, d) => {
        val per = T(s, d, "documents")
          .select((col("doc_id") % 16).as("shard_id"),
            size(split(col("text"), " ")).cast("long").as("toks"))
          .groupBy(col("shard_id"))
          .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("n_tokens"))
        val tot = per.agg(sum(col("n_tokens")).as("tt"))
        per.crossJoin(broadcast(tot))
          .select(col("shard_id"), col("n_docs"), col("n_tokens"),
            (floor(col("n_tokens").cast("double") * 16 / col("tt") * 10000)
              .cast("long") / 10000.0).as("load_factor"))
          .orderBy(col("shard_id"))
      },
      "WITH per AS (SELECT doc_id % 16 AS shard_id, COUNT(*)::BIGINT " +
        "AS n_docs, SUM(len(string_split(text, ' ')))::BIGINT AS n_tokens " +
        "FROM documents GROUP BY 1), " +
        "tot AS (SELECT SUM(n_tokens)::BIGINT AS tt FROM per) " +
        "SELECT shard_id, n_docs, n_tokens, " +
        "floor(CAST(n_tokens AS DOUBLE) * 16 / tt * 10000)::BIGINT / 10000.0 " +
        "AS load_factor " +
        "FROM per CROSS JOIN tot ORDER BY shard_id"),

    // End-to-end curation pipeline — the composition the single-purpose
    // keys exist FOR, run as one declarative plan so Catalyst sees (and
    // prunes/pushes through) the whole chain: quality gate (length
    // thresholds, scan-local filter) → exact dedup (md5 shuffle, min-doc
    // keep — the llm_exact_dedup discipline) → per-language audit frame
    // (counts at each stage, kept-id checksum, final token total,
    // retention rate). Every stage is exact integer math; the retention
    // divisions are floor-quantized. The near-dup/semantic stages compose
    // the same keep-frame pattern (llm_dedup_keep /
    // llm_semantic_dedup_keep) and stay separate keys so each keeps an
    // independent oracle. Scale: one corpus scan feeds the gate; the only
    // corpus-sized shuffle is the md5 hash agg; lang frames are
    // broadcast-sized.
    "llm_curation_pipeline" -> Q(
      (s, d) => {
        val docs = T(s, d, "documents").select(col("doc_id"), col("lang"),
          col("text"), col("n_chars"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"))
        val raw = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_raw"))
        val gated = docs.filter(col("n_chars") >= 100 && col("n_tokens") >= 20)
        val qual = gated.groupBy(col("lang")).agg(count(lit(1)).as("n_quality"))
        val hashed = gated.withColumn("h", md5(col("text")))
        val keepIds = hashed.groupBy(col("h")).agg(min(col("doc_id")).as("keep_id"))
        val kept = hashed.join(keepIds, "h")
          .filter(col("doc_id") === col("keep_id"))
        kept.groupBy(col("lang"))
          .agg(count(lit(1)).as("n_final"), sum(col("doc_id")).as("id_checksum"),
            sum(col("n_tokens")).as("total_tokens"))
          .join(broadcast(raw), "lang")
          .join(broadcast(qual), "lang")
          .select(col("lang"), col("n_raw"), col("n_quality"), col("n_final"),
            col("total_tokens"), col("id_checksum"),
            (floor(col("n_final").cast("double") / col("n_raw") * 10000)
              .cast("long") / 10000.0).as("retention"))
          .orderBy(col("lang"))
      },
      "WITH docs AS (SELECT doc_id, lang, text, n_chars, " +
        "len(string_split(text, ' '))::BIGINT AS n_tokens FROM documents), " +
        "raw AS (SELECT lang, COUNT(*)::BIGINT AS n_raw FROM docs GROUP BY 1), " +
        "gated AS (SELECT * FROM docs WHERE n_chars >= 100 AND n_tokens >= 20), " +
        "qual AS (SELECT lang, COUNT(*)::BIGINT AS n_quality FROM gated " +
        "GROUP BY 1), " +
        "hashed AS (SELECT doc_id, lang, n_tokens, md5(text) AS h FROM gated), " +
        "keep AS (SELECT h, MIN(doc_id) AS keep_id FROM hashed GROUP BY 1), " +
        "fin AS (SELECT x.lang, COUNT(*)::BIGINT AS n_final, " +
        "SUM(x.doc_id)::BIGINT AS id_checksum, " +
        "SUM(x.n_tokens)::BIGINT AS total_tokens " +
        "FROM hashed x JOIN keep k ON x.h = k.h AND x.doc_id = k.keep_id " +
        "GROUP BY 1) " +
        "SELECT f.lang, r.n_raw, q.n_quality, f.n_final, f.total_tokens, " +
        "f.id_checksum, " +
        "floor(CAST(f.n_final AS DOUBLE) / r.n_raw * 10000)::BIGINT / 10000.0 " +
        "AS retention " +
        "FROM fin f JOIN raw r ON f.lang = r.lang " +
        "JOIN qual q ON f.lang = q.lang ORDER BY f.lang"),

    // DATASET CARD (r13) — the one-row datasheet a training-data release
    // ships (Datasheets for Datasets / model-card practice): corpus
    // volume (docs, chars, whitespace tokens), diversity (distinct
    // langs/sources), exact-duplicate mass (docs minus distinct content
    // digests — docs shuffle as md5 DIGESTS, never text, the
    // llm_exact_dedup discipline), and the char-length envelope. One
    // corpus scan into one global aggregate (multi-count-distinct Expand,
    // the dq_profile shape); every number exact integer.
    "llm_dataset_card" -> Q(
      (s, d) => T(s, d, "documents")
        .select(col("lang"), col("source"),
          length(col("text")).as("nc"),
          size(split(col("text"), " ")).as("nt"),
          md5(col("text").cast("binary")).as("h"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("lang")).as("n_langs"),
          countDistinct(col("source")).as("n_sources"),
          big(sum(col("nc"))).as("total_chars"),
          big(sum(col("nt"))).as("total_tokens"),
          (count(lit(1)) - countDistinct(col("h"))).as("n_exact_dup_docs"),
          big(min(col("nc"))).as("min_chars"),
          big(max(col("nc"))).as("max_chars")),
      "SELECT COUNT(*) AS n_docs, COUNT(DISTINCT lang) AS n_langs, " +
        "COUNT(DISTINCT source) AS n_sources, " +
        "SUM(strlen(text))::BIGINT AS total_chars, " +
        "SUM(len(string_split(text, ' ')))::BIGINT AS total_tokens, " +
        "(COUNT(*) - COUNT(DISTINCT md5(text)))::BIGINT AS n_exact_dup_docs, " +
        "MIN(strlen(text))::BIGINT AS min_chars, " +
        "MAX(strlen(text))::BIGINT AS max_chars FROM documents"),
  )
}
