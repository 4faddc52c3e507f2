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

  test("releasePins empties the block manager; a released key re-runs clean") {
    // r13 verdict #2's regression pin: the Bench/Verify loops release every
    // pinned block after a key completes, so a long session cannot
    // accumulate localCheckpoint storage. Start from a CLEAN registry —
    // earlier tests in the shared session leave pins behind, and the
    // nonEmpty assertion below must attest THIS key's pinning, not
    // leftovers (review r14). A pin-heavy key plants blocks...
    Scale.releasePins(spark)
    val first = SparkEntry.queries("graph_kcore_peel")(spark, sf001).count()
    assert(spark.sparkContext.getPersistentRDDs.nonEmpty,
      "expected the peel to register pinned blocks")
    // ...release drains the registry (unpersist deregisters immediately;
    // block deletion is async by design — non-blocking between keys)...
    Scale.releasePins(spark)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "releasePins must deregister every pinned RDD")
    // ...and the key rebuilds from source afterwards, same answer (pins are
    // per-key scratch — nothing downstream may depend on a released block).
    assert(SparkEntry.queries("graph_kcore_peel")(spark, sf001).count() == first)
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
