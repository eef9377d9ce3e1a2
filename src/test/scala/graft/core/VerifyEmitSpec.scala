package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** The driver-facing oracle emission contract: every oracle ships
  * self-limiting (CORRECTNESS_r14 lost 16 green rows to the driver's
  * unconfigured DuckDB hitting the sandbox thread cap; the PRAGMA
  * prefix is the engine-side permanent fix). No Spark session needed.
  */
class VerifyEmitSpec extends AnyFunSuite {

  test("selfLimiting prepends the bounded-pool pragmas exactly once") {
    val out = graft.Verify.selfLimiting("SELECT 1")
    assert(out === "PRAGMA threads=8; PRAGMA memory_limit='8GB'; SELECT 1")
    assert(out.indexOf("PRAGMA threads") === out.lastIndexOf("PRAGMA threads"))
  }

  test("no registered oracle carries its own conflicting PRAGMA " +
      "(the emission owns resource limits; a second PRAGMA chain " +
      "would silently override the bound)") {
    val offenders = graft.SparkEntry.oracleSql.filter(_._2.contains("PRAGMA"))
    assert(offenders.isEmpty, s"oracles with inline PRAGMA: ${offenders.keys}")
  }

  test("every registered query has either an oracle or a documented " +
      "rows-only exemption") {
    // the three PERMANENT rows-only queries (COVERAGE.md r15): zlib
    // deflate, data-dependent Jacobi pivots, unigram-EM fixed point
    val exempt = Set("q109_compression_ratio", "q124_pca_project",
      "q173_unigram_fit")
    val missing = graft.SparkEntry.queries.keySet --
      graft.SparkEntry.oracleSql.keySet -- exempt
    assert(missing.isEmpty,
      s"queries with neither oracle nor exemption: $missing")
  }
}
