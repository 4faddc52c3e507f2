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
    val hops = SparkEntry.queries("graph_bfs_hops")(spark, dir)
      .as[(Long, Long)].collect().toMap
    // Seed is user 0; the path graph gives hop k to user k; user 4 is
    // 4 hops away so it must NOT appear within 3 rounds, nor must the
    // disconnected triangle.
    assert(hops == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L),
      s"unexpected bfs frontier: $hops")
  }

  test("label propagation converges the planted triangle to one label") {
    val lab = SparkEntry.queries("graph_label_prop")(spark, dir)
      .as[(Long, Long)].collect().toMap
    // In the triangle every vote is a tie ⇒ min label 100 wins everywhere.
    assert(lab(100L) == 100L && lab(101L) == 100L && lab(102L) == 100L,
      s"triangle did not converge to min label: $lab")
    // Path nodes only ever see neighbor labels; all labels stay within
    // the node universe (sanity: no label invented by the argmax).
    val users = Set(0L, 1L, 2L, 3L, 4L, 100L, 101L, 102L)
    assert(lab.keySet == users && lab.values.forall(users.contains),
      s"labels escaped the node universe: $lab")
  }
}
