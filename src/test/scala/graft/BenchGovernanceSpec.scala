package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench artifact's contention-governance helpers (round 15):
  * the BASELINE.md table parser feeding the end-of-suite retry pass,
  * and the retry trigger itself. These guard the published BENCH
  * artifact against the round-14 failure mode (box-contended medians up
  * to 5.5x their isolated truth governing the next round).
  */
class BenchGovernanceSpec extends AnyFunSuite {

  test("parseBaselineMedians reads entry rows, skips prose tables and headers") {
    // the prose includes multibyte UTF-8 (×, →) on purpose: the bench JVM
    // runs without a UTF-8 default charset and a charset-sensitive reader
    // threw MalformedInputException mid-suite (round-15 run-1 crash) —
    // the parser must decode UTF-8 bytes regardless of file.encoding
    val md =
      """# BASELINE
        |Round-14 medians were up to 5.5× their isolated truth → re-based.
        || Metric | Value | Config | Source (file:line) |
        ||---|---|---|---|
        || Default search limit | 20 rows | `LIMIT` | `query.py:33` |
        |
        || entry | sec (median of 3 runs) | floor |
        ||---|---|---|
        || a01_anndata_obs_filter | 0.21 | 0.19 |
        || q21_join_agg_revenue | 0.56 | 0.52 |
        || x00_calibration | 0.40 | 0.38 |
        |""".stripMargin
    val f = java.io.File.createTempFile("baseline", ".md")
    try {
      java.nio.file.Files.write(f.toPath,
        md.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val parsed = Bench.parseBaselineMedians(f.getPath)
      assert(parsed === Map(
        "a01_anndata_obs_filter" -> 0.21,
        "q21_join_agg_revenue" -> 0.56,
        "x00_calibration" -> 0.40))
    } finally f.delete()
  }

  test("parseBaselineMedians: missing file is empty, not an error") {
    assert(Bench.parseBaselineMedians("/nonexistent/BASELINE.md").isEmpty)
  }

  test("isContended: >2x baseline with the absolute guard") {
    // 2.4x a 0.56s baseline: retry
    assert(Bench.isContended(Some(0.56), 1.35, 1.30))
    // 2.4x a 60ms entry is 84ms of noise — absolute guard suppresses it
    assert(!Bench.isContended(Some(0.06), 0.144, 0.14))
    // within 2x of baseline: no retry even if absolute delta is large
    assert(!Bench.isContended(Some(5.0), 9.0, 8.8))
  }

  test("calibration workload completes under ANSI mode (no sum overflow)") {
    // the original sum(xxhash64) formulation overflowed a long over 64M
    // uniform hashes and ANSI mode turned that into a task failure; the
    // bit_xor reduction must produce a stable nonzero hash
    val h = Bench.calibrationHash(TestSpark.spark)
    assert(h != 0L)
    assert(Bench.calibrationHash(TestSpark.spark) === h) // deterministic
  }

  test("isContended: own-floor disagreement fires without a baseline") {
    // median 3.1x its own min (the r14 d06 signature: 6.36 vs ~1.9 min)
    assert(Bench.isContended(None, 6.36, 2.0))
    // tight median/min agreement: no retry
    assert(!Bench.isContended(None, 1.11, 1.07))
    // small absolute spread on a fast entry: guarded
    assert(!Bench.isContended(None, 0.30, 0.10))
    // failed entry (-1) never retries
    assert(!Bench.isContended(Some(1.0), -1.0, -1.0))
  }
}
