package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench-artifact output policy (r13 verdict #5): the default
  * path must never clobber an existing artifact — the r13 judge's ad-hoc
  * 1-key run overwrote the driver's full-run `bench_latest.json` because
  * the old default was a fixed path. Explicit `GRAFT_BENCH_OUT` remains
  * verbatim (the caller owns that path). */
class BenchOutSpec extends AnyFunSuite {

  test("explicit GRAFT_BENCH_OUT is honored verbatim, even if it exists") {
    assert(Bench.resolveOut(Some("custom.json"), "20260815T120000",
      _ => true) === "custom.json")
  }

  test("default is a fresh stamped name (never a fixed or 'latest' path)") {
    assert(Bench.resolveOut(None, "20260815T120000",
      _ => false) === "bench_20260815T120000.json")
  }

  test("default never overwrites: suffixes on collision") {
    val taken = Set("bench_20260815T120000.json",
      "bench_20260815T120000_2.json")
    assert(Bench.resolveOut(None, "20260815T120000", taken) ===
      "bench_20260815T120000_3.json")
  }
}
