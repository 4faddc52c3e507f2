package graft

import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** GraphOps invariants the oracle hash cannot express on its own:
  * the hot-cell cap actually bounds the pair build, BFS levels are a
  * true min-hop distance, and label propagation converges onto the
  * planted community structure. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  /** Scratch events dir: a planted topology with one HOT cell.
    * Hour 0 / type "click": users 0..39 (40 > MaxCellUsers ⇒ the whole
    * cell must be dropped). Hours 1..4 form a path of small cells:
    * {0,1}, {1,2}, {2,3}, {3,4}; hour 5 plants a separate community
    * {100,101,102} (triangle via one shared cell). */
  private lazy val dir: String = {
    val base = java.nio.file.Files.createTempDirectory("graphspec").toString
    def ev(id: Long, hour: Long, uid: Long, typ: String) =
      (id, new Timestamp(hour * 3600L * 1000L), uid, typ, 1.0, """{"k":1}""")
    val hot = (0L until 40L).map(u => ev(u, 0L, u, "click"))
    val path = Seq((1L, 0L), (1L, 1L), (2L, 1L), (2L, 2L), (3L, 2L),
      (3L, 3L), (4L, 3L), (4L, 4L)).zipWithIndex.map { case ((h, u), i) =>
      ev(100L + i, h, u, "view")
    }
    val tri = Seq(100L, 101L, 102L).zipWithIndex.map { case (u, i) =>
      ev(200L + i, 5L, u, "view")
    }
    (hot ++ path ++ tri)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$base/events.parquet")
    base
  }

  /** Second scratch dir for the STRONG-graph keys: users 200/201/202
    * co-occur in THREE distinct (hour, type) cells ⇒ every pair has
    * weight 3 = MinStrongWeight ⇒ a planted strong triangle; user 203
    * shares only ONE cell with 200 (weight 1, below threshold) — a
    * pendant that must vanish from the strong graph entirely. */
  private lazy val strongDir: String = {
    val base = java.nio.file.Files.createTempDirectory("graphstrong").toString
    def ev(id: Long, hour: Long, uid: Long, typ: String) =
      (id, new Timestamp(hour * 3600L * 1000L), uid, typ, 1.0, """{"k":1}""")
    val tri = for {
      h <- 6L to 8L; u <- Seq(200L, 201L, 202L)
    } yield ev(h * 10 + u, h, u, "view")
    val pend = Seq(ev(300L, 9L, 200L, "view"), ev(301L, 9L, 203L, "view"))
    (tri ++ pend)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$base/events.parquet")
    base
  }

  test("triangle count is exact on a planted strong triangle") {
    val t = SparkEntry.queries("graph_triangle_count")(spark, strongDir)
      .as[(Long, Long, Long, Long)].collect()
      .map { case (u, deg, w, tr) => u -> ((deg, w, tr)) }.toMap
    // Each triangle vertex: symmetric degree 2, wedges C(2,2)=1, exactly
    // one triangle; the weight-1 pendant 203 is not a strong-graph node.
    assert(t == Map(200L -> ((2L, 1L, 1L)), 201L -> ((2L, 1L, 1L)),
      202L -> ((2L, 1L, 1L))), s"unexpected triangle frame: $t")
  }

  test("pagerank: a symmetric equal-degree component is a fixed point") {
    val pr = SparkEntry.queries("graph_pagerank")(spark, dir)
      .as[(Long, Long)].collect().toMap
    // In the planted triangle every node has degree 2 and every inbound
    // sum is 2 × (1e6 div 2) = 1e6, so the damped update returns exactly
    // 150000 + 850000 — the initial rank is a fixed point and all three
    // rounds reproduce it bit-for-bit.
    assert(Seq(100L, 101L, 102L).forall(u => pr(u) == 1000000L),
      s"triangle ranks drifted: $pr")
    // Every rank carries at least the teleport floor.
    assert(pr.values.forall(_ >= 150000L), s"rank below teleport floor: $pr")
  }

  test("hot cell above MaxCellUsers contributes zero edges") {
    val edges = SparkEntry.queries("graph_cooccur_edges")(spark, dir)
      .as[(Long, Long)].collect().toSet
    // The 40-user click cell would alone contribute C(40,2)=780 pairs;
    // with the cap the only edges are the path + the planted triangle.
    val expected = Set((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L),
      (100L, 101L), (100L, 102L), (101L, 102L))
    assert(edges == expected, s"edges != planted topology: $edges")
  }

  test("bfs hops = min-hop distance from the minimum user id, 3 rounds") {
    val rows = SparkEntry.queries("graph_bfs_hops")(spark, dir)
      .as[(Long, Long, Boolean)].collect()
    val hops = rows.map { case (u, h, _) => u -> h }.toMap
    // Seed is user 0; the path graph gives hop k to user k; user 4 is
    // 4 hops away so it must NOT appear within 3 rounds, nor must the
    // disconnected triangle.
    assert(hops == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L),
      s"unexpected bfs frontier: $hops")
    // ... and the in-band flag must say so: a 4th expansion would reach
    // node 4, so the 3-round map is NOT complete here.
    assert(rows.forall(!_._3), "diameter-4 path: complete must be false")
    // The strong fixture's raw graph (triangle + pendant) sits entirely
    // within 2 hops of its min node — there the bound attests complete.
    val done = SparkEntry.queries("graph_bfs_hops")(spark, strongDir)
      .as[(Long, Long, Boolean)].collect()
    assert(done.nonEmpty && done.forall(_._3),
      s"2-hop component: complete must be true: ${done.toSeq}")
  }

  test("label propagation converges the planted triangle to one label") {
    val rows = SparkEntry.queries("graph_label_prop")(spark, dir)
      .as[(Long, Long, Boolean)].collect()
    val lab = rows.map { case (u, l, _) => u -> l }.toMap
    // In the triangle every vote is a tie ⇒ min label 100 wins everywhere.
    assert(lab(100L) == 100L && lab(101L) == 100L && lab(102L) == 100L,
      s"triangle did not converge to min label: $lab")
    // Path nodes only ever see neighbor labels; all labels stay within
    // the node universe (sanity: no label invented by the argmax).
    val users = Set(0L, 1L, 2L, 3L, 4L, 100L, 101L, 102L)
    assert(lab.keySet == users && lab.values.forall(users.contains),
      s"labels escaped the node universe: $lab")
    // The path's two-coloring oscillates under synchronous LPA, so round
    // 3 still changes labels — the in-band flag must say NOT converged.
    assert(rows.forall(!_._3), s"converged flag should be false here: " +
      rows.map(_._3).toSeq.distinct.toString)
  }

  test("cc fixpoint labels true components where the 3-hop flood cannot") {
    val cc = SparkEntry.queries("graph_cc_fixpoint")(spark, dir)
      .as[(Long, Long, Boolean)].collect()
    val comp = cc.map { case (u, c, _) => u -> c }.toMap
    // Path 0-1-2-3-4 has diameter 4: a 3-round hash-min flood mislabels
    // node 4 (its min label travels only 3 hops), the star fixpoint does
    // not — every path node lands on component 0, the triangle on 100.
    assert(comp == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L,
      100L -> 100L, 101L -> 100L, 102L -> 100L),
      s"fixpoint components wrong: $comp")
    assert(cc.forall(_._3), "fixpoint key must attest converged")
    // And the adversarial contrast: the bounded flood DOES get 4 wrong.
    val flood = SparkEntry.queries("graph_hashmin_cc")(spark, dir)
      .as[(Long, Long)].collect().toMap
    assert(flood(4L) == 1L,
      s"expected the 3-round flood to stop one hop short on node 4: $flood")
  }

  test("wcc sizes: the planted topology yields one size-5 and one size-3 component") {
    val hist = SparkEntry.queries("graph_wcc_sizes")(spark, dir)
      .as[(Long, Long)].collect().toMap
    // path 0-1-2-3-4 (5 nodes) + triangle {100,101,102} (3 nodes); the
    // hot cell contributes no edges, so its users are not graph nodes.
    assert(hist == Map(5L -> 1L, 3L -> 1L), s"unexpected histogram: $hist")
  }

  /** Symmetric edge frame + node frame for a planted SQUARED PATH
    * (edges i—i+1 and i—i+2): the classic k=3 peel cascade — each round
    * removes exactly one more layer from each end, so the true core
    * depth is n/2 rounds. */
  private def squaredPath(n: Int) = {
    val und = (0L until n - 1L).map(i => (i, i + 1)) ++
      (0L until n - 2L).map(i => (i, i + 2))
    val e = und.toDF("src", "dst")
    val sym = e.union(e.select($"dst", $"src"))
    (sym, sym.select($"src").distinct())
  }

  test("kcore: a 10-node squared path still peels at round 4+ and empties") {
    val (sym, nodes) = squaredPath(10)
    val r = operators.GraphOps.kcorePeel(sym, nodes)
      .as[(Long, Long, Boolean, Boolean)].collect()
    // A 3-round budget would have reported {3,4,5,6} as a 3-core; the
    // 6-round peel finishes the cascade (empty true core) and attests it.
    assert(r.forall(x => !x._3 && x._2 == 0L),
      s"cascade should peel everyone: ${r.toSeq}")
    assert(r.forall(_._4), "peel reached its fixpoint — stable must be true")
  }

  test("kcore: a 16-node squared path exhausts the budget and says so") {
    val (sym, nodes) = squaredPath(16)
    val r = operators.GraphOps.kcorePeel(sym, nodes)
      .as[(Long, Long, Boolean, Boolean)].collect()
    // Round 6 still peeled (layer {5,10}), so the output is a bounded
    // partial peel — stable=false is the honest in-band answer — with
    // survivors {6,7,8,9} (the layers the budget reached).
    assert(r.forall(!_._4), "budget exhausted — stable must be false")
    val in = r.collect { case (u, _, true, _) => u }.toSet
    assert(in == Set(6L, 7L, 8L, 9L), s"unexpected survivors: $in")
  }
}
