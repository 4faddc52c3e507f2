package graft

import org.apache.spark.sql.functions._
import graft.flow.Flow
import graft.operators.FlowOps

/** Plan-level pins for the flow compiler: a compiled flow is a Catalyst
  * logical plan, so the optimizer must see THROUGH the config — filters
  * reach the parquet scan, the compiled chain equals a hand-written twin
  * on values, and bad configs fail loudly at compile time. */
class FlowSpec extends SparkSpec {

  test("compiled flow result equals the hand-written twin") {
    val compiled = Flow.compile(spark, sf001, FlowOps.starAggSpec).collect()
    val hand = T(spark, sf001, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .join(T(spark, sf001, "orders"),
        col("c_custkey") === col("o_custkey"))
      .join(T(spark, sf001, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast("decimal(18,4)")).cast("double").as("revenue"),
        count(lit(1)).as("n_lineitems"))
      .orderBy(col("o_orderpriority"))
      .collect()
    assert(compiled.toSeq === hand.toSeq)
  }

  test("filter instruction pushes down to the parquet scan") {
    val plan = Flow.compile(spark, sf001, FlowOps.starAggSpec)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("c_mktsegment"),
      s"compiled filter did not reach the scan:\n$plan")
  }

  test("column pruning reaches the scan through the compiled chain") {
    val plan = Flow.compile(spark, sf001, FlowOps.docPipelineSpec)
      .queryExecution.executedPlan.toString
    // Assert against the scan's ReadSchema specifically — the whole-plan
    // string can mention doc_id incidentally (paths, metrics, schema text
    // of other nodes) without the scan actually reading the column.
    val readSchemas = "ReadSchema: [^\\n]*".r.findAllIn(plan).toList
    assert(readSchemas.nonEmpty, s"no ReadSchema line in plan:\n$plan")
    assert(readSchemas.forall(!_.contains("doc_id")),
      s"unreferenced column doc_id not pruned from the scan: $readSchemas")
  }

  test("bad configs fail loudly at compile time") {
    intercept[RuntimeException] {
      Flow.compile(spark, sf001, """{"steps":[{"op":"transmogrify"}]}""")
    }
    intercept[RuntimeException] {
      Flow.compile(spark, sf001,
        """{"steps":[{"op":"filter","where":"1=1"}]}""")
    }
    intercept[RuntimeException] {
      Flow.compile(spark, sf001, """{"steps":[]}""")
    }
  }
}
