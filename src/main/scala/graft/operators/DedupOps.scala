package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, T}
import graft.Dsl._
import graft.functions.VectorExpressions.dotF

/** Near-duplicate detection family beyond MinHash (north star mandate):
  * n-gram Jaccard, SimHash, embedding-cosine near-dup, and the LSH-bucketed
  * ANN scale path.
  *
  * Scale design: every variant turns the quadratic all-pairs problem into
  * an equi-join on a derived key (shared shingle / band / bucket) so the
  * shuffle is keyed and bounded; only candidate pairs pay the exact-score
  * cost. That is the shape that survives 100 TB.
  */
object DedupOps {

  private val shingleExpr = Shingles.sparkExpr
  private val shingleCte = Shingles.duckCte(distinct = true)

  /** Deterministic 64-bit SimHash over a word multiset (stable across JVMs:
    * String.hashCode is specified; byteswap64 mixes it). */
  private val simhash64 = udf((words: Seq[String]) => {
    val acc = new Array[Int](64)
    words.foreach { w =>
      val h = scala.util.hashing.byteswap64(w.hashCode.toLong * 0x9E3779B97F4A7C15L)
      var i = 0
      while (i < 64) { acc(i) += (if (((h >>> i) & 1L) == 1L) 1 else -1); i += 1 }
    }
    var sig = 0L
    var i = 0
    while (i < 64) { if (acc(i) > 0) sig |= (1L << i); i += 1 }
    sig
  })

  /** SimHash signature per (doc_id, text) row — reusable over any corpus. */
  def simhashOf(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    docs.withColumn("words", split(col("text"), " "))
      .select(col("doc_id"), simhash64(col("words")).as("simhash"))

  /** SimHash near-dup pairs: 4×16-bit LSH bands make candidates (two docs
    * within hamming distance 3 of 64 bits must agree on >= 1 band), then the
    * exact hamming filter runs on native bit_count — no UDF in the filter. */
  def simhashPairs(docs: org.apache.spark.sql.DataFrame,
      maxHamming: Int = 3): org.apache.spark.sql.DataFrame = {
    val sigs = simhashOf(docs)
    val banded = sigs.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until 4).map(b =>
        shiftrightunsigned(col("simhash"), 16 * b).bitwiseAND(lit(0xFFFFL))): _*))
        .as(Seq("band", "bkey")))
    val x = banded.select(col("doc_id").as("doc_a"), col("simhash").as("sim_a"),
      col("band"), col("bkey"))
    val y = banded.select(col("doc_id").as("doc_b"), col("simhash").as("sim_b"),
      col("band"), col("bkey"))
    x.join(y, Seq("band", "bkey")).filter(col("doc_a") < col("doc_b"))
      .withColumn("hamming",
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).cast("int"))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming")).distinct()
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** MinHash+LSH candidate pairs over any (doc_id, text) corpus: 3-word
    * shingles → 8 min-signatures → 4 bands of 2 → pairs via band equi-join
    * (the keyed shuffle that replaces all-pairs).
    *
    * Shingles are exploded and hashed ONCE (xxhash64), then the 8 signature
    * functions are cheap affine mixes of that hash inside one codegen'd
    * hash aggregate — a single pass over the shingle stream, which is the
    * shape that scales (and ~8× less hashing than per-signature rehashing). */
  def minhashPairs(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val nSig = 8
    val nBands = 4
    // Rotate-XOR mixes: bijective on Long (so each min is a valid
    // independent minhash ordering) and free of ANSI overflow semantics —
    // wrapping multiplication throws under Spark 4's default ANSI mode.
    val rot = Array(5, 11, 17, 23, 29, 37, 43, 53)
    val mixC = Array(0x9E3779B97F4A7C15L, 0xBF58476D1CE4E5B9L, 0x94D049BB133111EBL,
      0xD6E8FEB86659FD93L, 0xA5A5A5A5A5A5A5A5L, 0xC2B2AE3D27D4EB4FL,
      0x165667B19E3779F9L, 0x27D4EB2F165667C5L)
    val hashed = docs
      .select(col("doc_id"), split(col("text"), " ").as("words"))
      .filter(size(col("words")) >= 3)
      .select(col("doc_id"), explode(expr(shingleExpr)).as("s"))
      .select(col("doc_id"), xxhash64(col("s")).as("h"))
    val sigCols = (0 until nSig).map { k =>
      val rotated = shiftrightunsigned(col("h"), rot(k))
        .bitwiseOR(shiftleft(col("h"), 64 - rot(k)))
      min(rotated.bitwiseXOR(lit(mixC(k)))).as(s"sig$k")
    }
    val signed = hashed.groupBy(col("doc_id")).agg(sigCols.head, sigCols.tail: _*)
    val bandCol = explode(array((0 until nBands).map { b =>
      struct(lit(b).as("band"),
        concat_ws("_", col(s"sig${2 * b}"), col(s"sig${2 * b + 1}")).as("bkey"))
    }: _*)).as("bk")
    val bands = signed.select(col("doc_id"), bandCol)
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.bkey").as("bkey"))
    val x = bands.withColumnRenamed("doc_id", "doc_a")
    val y = bands.withColumnRenamed("doc_id", "doc_b")
    x.join(y, Seq("band", "bkey")).filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b")).distinct()
      .orderBy(col("doc_a"), col("doc_b"))
  }

  val defs: Seq[(String, Q)] = Seq(

    // Exact n-gram Jaccard on candidate pairs that share >= 1 shingle —
    // the candidate equi-join keeps it far from all-pairs. Top-50 by
    // similarity; the score is one double division over exact ints.
    "llm_ngram_jaccard" -> Q(
      (s, d) => {
        val sh = T(s, d, "documents")
          .withColumn("words", split(col("text"), " "))
          .filter(size(col("words")) >= 3)
          .select(col("doc_id"), explode(expr(shingleExpr)).as("s"))
          .distinct()
        val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
        val inter = sh.withColumnRenamed("doc_id", "doc_a")
          .join(sh.withColumnRenamed("doc_id", "doc_b"), "s")
          .filter(col("doc_a") < col("doc_b"))
          .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("inter"))
        inter
          .join(sizes.withColumnRenamed("doc_id", "doc_a")
            .withColumnRenamed("n_sh", "na"), "doc_a")
          .join(sizes.withColumnRenamed("doc_id", "doc_b")
            .withColumnRenamed("n_sh", "nb"), "doc_b")
          .withColumn("jaccard",
            col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
          .select(col("doc_a"), col("doc_b"), col("inter"), col("jaccard"))
          .orderBy(col("jaccard").desc, col("doc_a"), col("doc_b"))
          .limit(50)
      },
      shingleCte +
        "SELECT doc_a, doc_b, inter, jaccard FROM (" +
        "SELECT i.doc_a, i.doc_b, i.inter, " +
        "CAST(i.inter AS DOUBLE) / (sa.n_sh + sb.n_sh - i.inter) AS jaccard " +
        "FROM (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter " +
        "FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2) i " +
        "JOIN (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1) sa ON sa.doc_id = i.doc_a " +
        "JOIN (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1) sb ON sb.doc_id = i.doc_b) t " +
        "ORDER BY jaccard DESC, doc_a, doc_b LIMIT 50"),

    // SimHash signatures + LSH band keys per document. Pair extraction
    // (band join + hamming filter) is exercised in DedupSpec on synthetic
    // near-dups; signatures use JVM hashing, so no SQL oracle.
    "llm_simhash" -> Q(
      (s, d) => T(s, d, "documents")
        .withColumn("words", split(col("text"), " "))
        .withColumn("simhash", simhash64(col("words")))
        .select(col("doc_id"), col("simhash"),
          col("simhash").bitwiseAND(lit(0xFFFFL)).as("band0"),
          shiftrightunsigned(col("simhash"), 16).bitwiseAND(lit(0xFFFFL)).as("band1"),
          shiftrightunsigned(col("simhash"), 32).bitwiseAND(lit(0xFFFFL)).as("band2"),
          shiftrightunsigned(col("simhash"), 48).as("band3"))
        .orderBy(col("doc_id")),
      None),

    // Embedding-cosine near-dup: all pairs above a similarity threshold.
    // Same exact-fold dot product + rounding discipline as llm_cosine_topk.
    "llm_emb_near_dedup" -> Q(
      (s, d) => VectorSim.pairs(s, d, col("a_id") < col("b_id"))
        .filter(col("sim") >= 0.35)
        .orderBy(col("a_id"), col("b_id")),
      "SELECT a_id, b_id, sim FROM (SELECT a.vec_id AS a_id, b.vec_id AS b_id, " +
        "round(list_inner_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) / " +
        "(sqrt(list_inner_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) * " +
        "sqrt(list_inner_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 4) AS sim " +
        "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id) t " +
        "WHERE sim >= 0.35 ORDER BY a_id, b_id"),

    // ANN scale path: multi-table random-hyperplane LSH (8 tables × 6-bit
    // signatures = 64 buckets each). Candidates = pairs sharing any
    // (table, bucket); exact cosine ranks only those. Recall/candidate
    // tradeoff measured in DedupSpec against the brute-force baseline.
    // Hyperplanes are seeded and JVM-generated, hence no SQL oracle.
    "llm_ann_lsh" -> Q(
      (s, d) => {
        val nTables = 8
        val bits = 6
        val planes: Array[Array[Double]] = {
          val rnd = new scala.util.Random(42)
          Array.fill(nTables * bits, 64)(rnd.nextGaussian())
        }
        val sigs = udf((emb: Seq[Float]) => {
          (0 until nTables).map { t =>
            var bucket = 0
            var j = 0
            while (j < bits) {
              var dp = 0.0
              var i = 0
              val p = planes(t * bits + j)
              while (i < p.length && i < emb.length) { dp += emb(i) * p(i); i += 1 }
              if (dp > 0) bucket |= (1 << j)
              j += 1
            }
            bucket
          }
        })
        val e = T(s, d, "embeddings")
        val buckets = e
          .select(col("vec_id"), posexplode(sigs(col("embedding"))).as(Seq("tbl", "bucket")))
        val cand = buckets.withColumnRenamed("vec_id", "a_id")
          .join(buckets.withColumnRenamed("vec_id", "b_id"), Seq("tbl", "bucket"))
          .filter(col("a_id") =!= col("b_id"))
          .select(col("a_id"), col("b_id")).distinct()
        val dot = dotF(s) _
        val withNorm = e.withColumn("norm",
          sqrt(dot(col("embedding"), col("embedding"))))
        val ea = withNorm.select(col("vec_id").as("a_id"),
          col("embedding").as("a_emb"), col("norm").as("a_norm"))
        val eb = withNorm.select(col("vec_id").as("b_id"),
          col("embedding").as("b_emb"), col("norm").as("b_norm"))
        cand.join(broadcast(ea), "a_id").join(broadcast(eb), "b_id")
          .select(col("a_id"), col("b_id"), round(
            dot(col("a_emb"), col("b_emb")) / (col("a_norm") * col("b_norm")), 4)
            .as("sim"))
          .withColumn("rn", big(row_number().over(
            Window.partitionBy(col("a_id")).orderBy(col("sim").desc, col("b_id")))))
          .filter(col("rn") <= 3)
          .select(col("a_id"), col("rn"), col("b_id"), col("sim"))
          .orderBy(col("a_id"), col("rn"))
      },
      None),
  )
}
