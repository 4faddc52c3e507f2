package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.CentroidExpressions.{nearestCentroid, topCentroids}
import graft.functions.VectorExpressions.dotA

/** r19 optimization round: every IVF assignment/probe pass swapped its
  * window/argmax shape (cross-join the corpus against the broadcast
  * codebook, rank per vec_id) for the fused per-row TopCentroids /
  * NearestCentroid expressions over a packed codebook array. Parity pins
  * replay the fused selection against the EXACT window formulation it
  * replaced on randomized float corpora × double/float codebooks —
  * including duplicate-sim ties (cid tie-break) and k > |codebook| — so
  * any drift in the dot fold, the double total order, or the tie rule
  * fails here rather than at the oracle. */
class CentroidSpec extends SparkSpec {

  private def fixture(n: Int, m: Int, dims: Int, seed: Long,
      doubleCents: Boolean) = {
    val rnd = new scala.util.Random(seed)
    // coarse value grid so exact sim TIES occur and exercise the cid rule
    def f(): Float = (rnd.nextInt(7) - 3) / 2.0f
    val corpus = (0 until n).map(i => (i.toLong, Seq.fill(dims)(f())))
    val cents = (0 until m).map(i => (i.toLong, Seq.fill(dims)(f())))
    val e = spark.createDataFrame(corpus).toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
      .withColumn("norm",
        sqrt(dotA(spark)(col("embedding"), col("embedding"))))
    val c0 = spark.createDataFrame(cents).toDF("cid", "cemb")
      .withColumn("cemb", col("cemb").cast(
        if (doubleCents) "array<double>" else "array<float>"))
    val c = c0.withColumn("cnorm",
      sqrt(dotA(spark)(col("cemb"), col("cemb"))))
    (e, c)
  }

  private def windowTopK(e: org.apache.spark.sql.DataFrame,
      c: org.apache.spark.sql.DataFrame, k: Int) = {
    val dot = dotA(spark) _
    e.select(col("vec_id"), col("embedding"), col("norm"))
      .crossJoin(broadcast(c))
      .select(col("vec_id"), col("cid"),
        (dot(col("embedding"), col("cemb")) / (col("norm") * col("cnorm")))
          .as("sim"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("vec_id")).orderBy(col("sim").desc, col("cid"))))
      .filter(col("rn") <= k)
      .select(col("vec_id"), col("rn"), col("cid"))
  }

  private def fusedTopK(e: org.apache.spark.sql.DataFrame,
      c: org.apache.spark.sql.DataFrame, k: Int) = {
    val packed = broadcast(c.agg(collect_list(struct(
      col("cid").cast("long").as("cid"), col("cemb").as("cemb"),
      col("cnorm").as("cnorm"))).as("cents")))
    e.select(col("vec_id"), col("embedding"), col("norm"))
      .crossJoin(packed)
      .select(col("vec_id"), posexplode(topCentroids(spark)(
        col("embedding"), col("norm"), col("cents"), k)).as(Seq("pos", "t")))
      .select(col("vec_id"), (col("pos") + 1).as("rn"), col("t.cid").as("cid"))
  }

  test("TopCentroids == the rank-window selection (double centroids, ties)") {
    val (e, c) = fixture(n = 200, m = 23, dims = 8, seed = 19L,
      doubleCents = true)
    for (k <- Seq(1, 2, 5)) {
      val w = windowTopK(e, c, k).collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getLong(1 + 1))).toSet
      val f = fusedTopK(e, c, k).collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      assert(f == w, s"k=$k fused/window drift")
    }
  }

  test("TopCentroids == the rank-window selection (float centroids)") {
    val (e, c) = fixture(n = 150, m = 9, dims = 6, seed = 20L,
      doubleCents = false)
    val w = windowTopK(e, c, 3).collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val f = fusedTopK(e, c, 3).collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(f == w)
  }

  test("k past the codebook size returns exactly the full ranking") {
    val (e, c) = fixture(n = 40, m = 4, dims = 5, seed = 21L,
      doubleCents = true)
    val w = windowTopK(e, c, 9).collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val f = fusedTopK(e, c, 9).collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(f == w)
    assert(f.size == 40 * 4)
  }

  test("NearestCentroid == rank 1 of the window; null only on empty codebook") {
    val (e, c) = fixture(n = 120, m = 17, dims = 8, seed = 22L,
      doubleCents = true)
    val packed = broadcast(c.agg(collect_list(struct(
      col("cid").cast("long").as("cid"), col("cemb").as("cemb"),
      col("cnorm").as("cnorm"))).as("cents")))
    val f = e.crossJoin(packed)
      .select(col("vec_id"), nearestCentroid(spark)(
        col("embedding"), col("norm"), col("cents")).as("cell"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val w = windowTopK(e, c, 1).collect().map(r =>
      (r.getLong(0), r.getLong(2))).toSet
    assert(f == w)
    val empty = e.limit(3).crossJoin(broadcast(
      c.filter(lit(false)).agg(collect_list(struct(
        col("cid").cast("long").as("cid"), col("cemb").as("cemb"),
        col("cnorm").as("cnorm"))).as("cents"))))
      .select(nearestCentroid(spark)(
        col("embedding"), col("norm"), col("cents")).as("cell"))
      .collect()
    assert(empty.forall(_.isNullAt(0)))
  }
}
