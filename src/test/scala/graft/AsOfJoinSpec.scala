package graft

import org.apache.spark.sql.functions._
import graft.plans.AsOfJoin

/** Native as-of join (custom LogicalPlan + Strategy + SparkPlan): result
  * parity with the window formulation, physical-plan shape, and
  * null-padding semantics. */
class AsOfJoinSpec extends SparkSpec {

  import spark.implicits._

  private def native() = {
    val e = T(spark, sf001, "events")
    val errors = e.filter($"event_type" === "error")
      .select($"user_id".as("r_user"), $"ts".as("r_ts"),
        $"event_id".as("r_tie"), $"value".as("r_value"))
    AsOfJoin(e, errors, "user_id", "ts", "event_id", "r_user", "r_ts", "r_tie")
  }

  test("native as-of join == window last_value(IGNORE NULLS) formulation") {
    val got = native()
      .select($"event_id", $"user_id", $"event_type",
        $"r_value".as("last_error_value"))
      .orderBy($"event_id").collect().toSeq
    val expected = SparkEntry.queries("join_asof")(spark, sf001)
      .collect().toSeq
    assert(got == expected)
  }

  test("physical plan is the custom exec: one merge pass, no window, no union") {
    val s = native().queryExecution.executedPlan.toString
    // AQE wraps the tree, so match on the exec's nodeName in the string
    assert(s.contains("AsOfJoin"), s"no AsOfJoinExec:\n$s")
    assert(!s.contains("Window"), s"window exec crept in:\n$s")
    assert(!s.contains("Union"), s"union materialization crept in:\n$s")
  }

  test("custom Rule pushes left-side filters through the node into the scan") {
    val filtered = native().filter($"event_type" === "click")
    val s = filtered.queryExecution.executedPlan.toString
    assert(s.contains("EqualTo(event_type,click)"),
      s"filter did not reach the left parquet scan's PushedFilters:\n$s")
    // and pushing preserves semantics
    val expected = SparkEntry.queries("join_asof")(spark, sf001)
      .filter($"event_type" === "click")
      .select($"event_id", $"user_id", $"event_type", $"last_error_value")
      .orderBy($"event_id").collect().toSeq
    val got = filtered
      .select($"event_id", $"user_id", $"event_type",
        $"r_value".as("last_error_value"))
      .orderBy($"event_id").collect().toSeq
    assert(got == expected)
  }

  test("randomized parity with the window formulation (20 generated sets)") {
    (1 to 20).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val n = 200 + rnd.nextInt(300)
      val rows = (0 until n).map { i =>
        (i.toLong, new java.sql.Timestamp(1700000000000L +
          rnd.nextInt(120) * 1000L), // narrow range => frequent ts ties
          rnd.nextInt(8).toLong, rnd.nextInt(3) == 0, rnd.nextDouble() * 100)
      }
      val e = rows.toDF("event_id", "ts", "user_id", "is_err", "value")
      val right = e.filter($"is_err")
        .select($"user_id".as("r_user"), $"ts".as("r_ts"),
          $"event_id".as("r_tie"), $"value".as("r_value"))
      val nativeRes = AsOfJoin(e, right, "user_id", "ts", "event_id",
          "r_user", "r_ts", "r_tie")
        .select($"event_id", $"r_value")
        .orderBy($"event_id").collect().toSeq
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id").orderBy($"ts", $"event_id")
        .rowsBetween(Long.MinValue, 0)
      val windowRes = e
        .withColumn("r_value",
          last(when($"is_err", $"value"), ignoreNulls = true).over(w))
        .select($"event_id", $"r_value")
        .orderBy($"event_id").collect().toSeq
      assert(nativeRes == windowRes, s"seed=$seed")
    }
  }

  test("type validation: non-integral key rejected, integer key widened") {
    val l = Seq((1, 10L, 1L, "a")).toDF("k", "ts", "tie", "payload")
    val r = Seq((1, 5L, 1L, 9.9)).toDF("rk", "rts", "rtie", "rv")
    // IntegerType key/tie: must be widened via cast, not read raw
    val joined = AsOfJoin(l, r, "k", "ts", "tie", "rk", "rts", "rtie")
    assert(joined.collect().head.getAs[Double]("rv") == 9.9)
    // string key: loud rejection, not silent garbage
    val bad = l.withColumn("k", lit("oops"))
    val ex = intercept[IllegalArgumentException](
      AsOfJoin(bad, r, "k", "ts", "tie", "rk", "rts", "rtie"))
    assert(ex.getMessage.contains("must be an integral type"))
  }

  test("runtime null in a join column fails loudly instead of mis-joining") {
    val l = Seq((Some(1L), 10L, 1L), (None, 20L, 2L))
      .toDF("k", "ts", "tie")
    val r = Seq((1L, 5L, 1L)).toDF("rk", "rts", "rtie")
    val ex = intercept[Exception](
      AsOfJoin(l, r, "k", "ts", "tie", "rk", "rts", "rtie").collect())
    assert(ex.getMessage != null)
    def rootMessages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ rootMessages(e.getCause))
    assert(rootMessages(ex).exists(_.contains("requires non-null")),
      s"expected the null-rejection error, got: $ex")
  }

  test("left rows with no eligible right row are null-padded") {
    val e = T(spark, sf001, "events")
    // a right side that can never match: errors shifted 100 years forward
    val future = e.filter($"event_type" === "error")
      .select($"user_id".as("r_user"),
        ($"ts" + expr("INTERVAL 36500 DAYS")).as("r_ts"),
        $"event_id".as("r_tie"), $"value".as("r_value"))
    val joined = AsOfJoin(e, future, "user_id", "ts", "event_id",
      "r_user", "r_ts", "r_tie")
    assert(joined.filter($"r_value".isNotNull).count() == 0)
    assert(joined.count() == e.count())
  }
}
