package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.T
import graft.functions.VectorExpressions.dotF

/** Shared 3-word shingle machinery: one Spark HOF expression and one DuckDB
  * CTE, so tokenization/truncation rules have exactly one definition. */
object Shingles {

  /** Spark: `words` array column → array of 3-word shingles. */
  val sparkExpr: String =
    "transform(sequence(0, size(words) - 3), " +
      "i -> concat_ws(' ', words[i], words[i+1], words[i+2]))"

  /** DuckDB twin over `documents`: CTE `sh(doc_id[, text], s)` via
    * words + lead() windows (== the i/i+1/i+2 shingle). With `dfCap` a
    * further CTE `shc` drops shingles whose document frequency exceeds the
    * cap — the oracle twin of DedupOps.MaxShingleDf (must be a SEPARATE
    * CTE: QUALIFY inside `sh` would window over pre-DISTINCT rows). */
  def duckCte(distinct: Boolean, carryText: Boolean = false,
      dfCap: Option[Int] = None): String = {
    val textCol = if (carryText) ", text" else ""
    val d = if (distinct) "DISTINCT " else ""
    val capped = dfCap.map(c =>
      s", shc AS (SELECT doc_id$textCol, s FROM sh " +
        s"QUALIFY COUNT(*) OVER (PARTITION BY s) <= $c) ").getOrElse(" ")
    s"WITH w AS (SELECT doc_id$textCol, unnest(string_split(text, ' ')) AS word, " +
      "generate_subscripts(string_split(text, ' '), 1) AS pos FROM documents), " +
      s"sh AS (SELECT ${d}doc_id$textCol, word || ' ' || lead(word, 1) OVER dw || ' ' || " +
      "lead(word, 2) OVER dw AS s FROM w " +
      "WINDOW dw AS (PARTITION BY doc_id ORDER BY pos) " +
      "QUALIFY lead(word, 2) OVER dw IS NOT NULL)" + capped
  }
}

/** Chainable handle on [[Scale.pin]] so pin sites read like the
  * `.localCheckpoint()` calls they replace — one conf switch
  * (`spark.graft.pin.mode`) now governs every site. */
object PinSyntax {
  implicit class PinOps(private val df: DataFrame) extends AnyVal {
    def pinned: DataFrame = Scale.pin(df)
    /** Lazy lineage cut (r18): plan truncation now, block materialization
      * inside the first consuming job — see Scale.pin's eager note. */
    def pinnedLazy: DataFrame = Scale.pin(df, eager = false)
  }
}

/** Shared cosine-similarity pair join over the embeddings table: broadcast
  * the corpus side, exact-fold dot product, sim rounded to 4dp (the same
  * rounding the DuckDB oracles apply). */
object VectorSim {
  /** DEMOTED-BASELINE CAP: the two all-pairs keys (`llm_cosine_topk`,
    * `llm_emb_near_dedup`) are labeled correctness baselines for the
    * LSH/IVF scale path, NOT the scale path itself. Their input is capped
    * so a future testdata bump cannot turn n² pairs into the bench tail;
    * the SAME predicate appears in their oracle SQL, so the keys stay
    * oracle-green at any sf. 20k vectors ⇒ ≤4·10⁸ candidate pairs, the
    * most a brute-force demo should ever pay. */
  val BruteForceCap = 20000

  def pairs(s: SparkSession, d: String, cond: Column): DataFrame = {
    val dot = dotF(s) _
    val e = T(s, d, "embeddings")
      .filter(col("vec_id") < BruteForceCap)
      .withColumn("norm", sqrt(dot(col("embedding"), col("embedding"))))
    val a = e.select(col("vec_id").as("a_id"), col("embedding").as("a_emb"),
      col("norm").as("a_norm"))
      // local single-split parquet: spread the streaming side across cores
      .repartition(s.sparkContext.defaultParallelism)
    val b = e.select(col("vec_id").as("b_id"), col("embedding").as("b_emb"),
      col("norm").as("b_norm"))
    a.join(broadcast(b), cond)
      .select(col("a_id"), col("b_id"), round(
        dot(col("a_emb"), col("b_emb")) / (col("a_norm") * col("b_norm")), 4)
        .as("sim"))
  }
}
