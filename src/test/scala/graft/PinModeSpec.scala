package graft

import graft.operators.Scale

/** Pins for the conf-gated pin switch (Scale.pin / spark.graft.pin.mode)
  * and the committed-snapshot compute-once contract (Scale.snapshotOnce).
  * Cluster guidance lives in MIGRATION.md; here each mode must produce
  * the same answers and the snapshot must never recompute on replay. */
class PinModeSpec extends SparkSpec {

  private def withPinMode[A](mode: String)(body: => A): A = {
    spark.conf.set("spark.graft.pin.mode", mode)
    try body finally spark.conf.unset("spark.graft.pin.mode")
  }

  test("a pinned key returns identical rows under every pin mode") {
    // llm_simhash_hamming_join pins the signer frame feeding both
    // self-join sides — the canonical pin site.
    def run() = SparkEntry.queries("llm_simhash_hamming_join")(spark, sf001)
      .collect().toSeq
    val local = run() // default mode
    val persist = withPinMode("persist")(run())
    spark.sparkContext.setCheckpointDir(
      java.nio.file.Files.createTempDirectory("graft_ckpt").toString)
    val reliable = withPinMode("reliable")(run())
    assert(persist == local, "persist mode changed results")
    assert(reliable == local, "reliable mode changed results")
    withPinMode("bogus") {
      intercept[RuntimeException](run())
    }
  }

  test("snapshotOnce computes once; replays and siblings read the commit") {
    val input = java.nio.file.Files.createTempDirectory("snap_in").toString
    var computes = 0
    def call(n: Int) = Scale.snapshotOnce(spark, "spec_probe", 1, input) {
      computes += 1
      spark.range(n).toDF("id")
    }
    assert(call(5).count() == 5 && computes == 1)
    // second call must NOT evaluate the compute thunk — the committed
    // epoch satisfies it (so it returns the OLD 5 rows, not 9)
    assert(call(9).count() == 5 && computes == 1)
    // a version bump invalidates the old snapshot by path
    val v2 = Scale.snapshotOnce(spark, "spec_probe", 2, input) {
      spark.range(9).toDF("id")
    }
    assert(v2.count() == 9)
  }
}
