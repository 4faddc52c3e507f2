package graft

/** The tripwire itself is load-bearing (round 7 shipped 107 silently-dead
  * keys because nothing probed the loader) — so test it both ways. */
class PreflightSpec extends SparkSpec {

  test("preflight passes on a healthy sf dir") {
    Preflight(spark, sf001)
  }

  test("preflight fails loudly, naming the Spark version, on a broken dir") {
    val e = intercept[IllegalStateException] {
      Preflight(spark, "/nonexistent_sf_dir")
    }
    assert(e.getMessage.contains("PREFLIGHT FAILED"))
    assert(e.getMessage.contains(spark.version),
      "the failure message must name the running Spark version")
  }
}
