package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared session base: one SparkSession per suite (SURVEY §5). */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session
  val sf001 = "/root/testdata/sf0.001"
  val sf01 = "/root/testdata/sf0.01"
}

object SparkSpec {
  // One session for the whole forked test JVM — suites share it.
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // Cap plan-description strings (static conf, must be set before the
      // first session): PlanAuditSpec's full-lineage sweep runs iterative
      // keys under pin.mode=persist, where each round's plan nests the
      // previous round's InMemoryRelation — the DAG is linear but the
      // PRINTED tree is multiplicative, and the event-log description a
      // pin's count() action builds OOM'd the fork at the default
      // (unbounded) length. 1M chars is ~20x any real plan here.
      .config("spark.sql.maxPlanStringLength", "1000000")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
