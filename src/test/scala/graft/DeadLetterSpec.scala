package graft

import org.apache.spark.sql.functions._
import graft.operators.DqOps

/** Pins for the dead-letter routing operator: the split is a PARTITION of
  * the input (no row lost, no row in both outputs) and reasons land on the
  * event types the demo corrupts. */
class DeadLetterSpec extends SparkSpec {

  test("dead-letter split partitions the input") {
    val raw = DqOps.rawLines(spark, sf001)
    val (parsed, quarantine, classified) = DqOps.deadLetter(raw)
    val n = raw.count()
    assert(parsed.count() + quarantine.count() === n)
    assert(classified.count() === n)
    val both = parsed.select("event_id")
      .join(quarantine.select("event_id"), "event_id").count()
    assert(both === 0, "a row routed to BOTH outputs")
  }

  test("reasons land on the corrupted types, ok rows parse fully") {
    val raw = DqOps.rawLines(spark, sf001)
    val (parsed, quarantine, _) = DqOps.deadLetter(raw)
    val types = T(spark, sf001, "events").select("event_id", "event_type")
    val byReason = quarantine.join(types, "event_id")
      .groupBy("reason", "event_type").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(byReason.keySet.map(_._1) === Set("grok_no_match", "corrupt_json"))
    byReason.keys.foreach {
      case ("grok_no_match", t) => assert(t === "signup")
      case ("corrupt_json", t)  => assert(t === "error")
      case other                => fail(s"unexpected routing $other")
    }
    assert(parsed.filter(col("k").isNull).count() === 0,
      "every ok row must carry the extracted k")
  }
}

/** Direction pins for the as-of variants: forward mirrors backward, and
  * nearest picks whichever side is closer with ties to the preceding. */
class AsOfDirectionSpec extends SparkSpec {

  test("forward as-of: error rows carry their own value") {
    val out = SparkEntry.queries("join_asof_forward")(spark, sf001)
    val selfMiss = out.filter(col("event_type") === "error")
      .join(T(spark, sf001, "events").select("event_id", "value"), "event_id")
      .filter(col("next_error_value") =!= col("value")).count()
    assert(selfMiss === 0,
      "frame includes CURRENT ROW, so an error row's next error is itself")
  }

  test("nearest as-of agrees with backward/forward on one-sided rows") {
    val b = SparkEntry.queries("join_asof")(spark, sf001)
      .select(col("event_id"), col("last_error_value"))
    val f = SparkEntry.queries("join_asof_forward")(spark, sf001)
      .select(col("event_id"), col("next_error_value"))
    val n = SparkEntry.queries("join_asof_nearest")(spark, sf001)
      .select(col("event_id"), col("nearest_error_value"))
    val j = b.join(f, "event_id").join(n, "event_id")
    // no preceding error -> nearest must be the forward value; no
    // following error -> nearest must be the backward value
    assert(j.filter(col("last_error_value").isNull &&
      !(col("nearest_error_value") <=> col("next_error_value"))).count() === 0)
    assert(j.filter(col("next_error_value").isNull &&
      !(col("nearest_error_value") <=> col("last_error_value"))).count() === 0)
    // nearest is always one of the two sides (or null when both are)
    assert(j.filter(!(col("nearest_error_value") <=> col("last_error_value")) &&
      !(col("nearest_error_value") <=> col("next_error_value"))).count() === 0)
  }
}
