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

  test("every registered query has either an oracle, a dynamic " +
      "(dir-fitted) oracle, or a documented rows-only exemption") {
    // The rows-only exempt set is EMPTY as of r17: q109 (zlib
    // deflate, the last holdout) joined q124/q173 as a DYNAMIC
    // oracle — its frozen-literal SQL embeds dir-fitted deflate
    // sizes inside Verify.main (TextOps.compressionOracleSql /
    // PcaOps.projectOracleSql / UnigramOps.fitOracleSql), so it
    // cannot appear in the static map; `dynamic` pins that the
    // generators stay wired.
    val exempt = Set.empty[String]
    val dynamic = Set("q124_pca_project", "q173_unigram_fit",
      "q109_compression_ratio")
    val missing = graft.SparkEntry.queries.keySet --
      graft.SparkEntry.oracleSql.keySet -- exempt -- dynamic
    assert(missing.isEmpty,
      s"queries with neither oracle nor exemption: $missing")
    assert((dynamic & graft.SparkEntry.oracleSql.keySet).isEmpty,
      "dynamic oracles must not ALSO have a static entry (Verify " +
        "would emit the static one last and silently shadow the fit)")
  }

  test("projectOracleSql embeds the model as exact literals and " +
      "replays a left-to-right fold") {
    val m = graft.ops.PcaOps.PcaModel(3L,
      Array(0.5, -1.25), Array(2.0, 1.0),
      Array(Array(0.6, 0.8), Array(-0.8, 0.6)))
    val sql = graft.ops.PcaOps.projectOracleSql("embeddings", "vec_id",
      "embedding", m, 2)
    assert(sql.contains("[0.5, -1.25]::DOUBLE[]"), sql)
    assert(sql.contains("[0.6, 0.8]::DOUBLE[]") &&
      sql.contains("[-0.8, 0.6]::DOUBLE[]"))
    assert(sql.contains("list_sum") && sql.contains("generate_series(1, 2)"))
    assert(sql.contains("AS pc_0") && sql.contains("AS pc_1"))
    intercept[IllegalArgumentException] {
      graft.ops.PcaOps.projectOracleSql("e", "id", "v", m, 3)
    }
  }

  test("Bench writes the sealed path ONLY under GRAFT_BENCH_SEAL=1 " +
      "(driver runs can no longer clobber the quiet-box seal)") {
    assert(graft.Bench.outPath(Map.empty) === "bench_out_driver.json")
    assert(graft.Bench.outPath(Map("GRAFT_BENCH_SEAL" -> "1"))
      === "bench_out.json")
    assert(graft.Bench.outPath(Map("GRAFT_BENCH_SEAL" -> "0"))
      === "bench_out_driver.json")
    assert(graft.Bench.outPath(Map("SPARK_GRAFT_BENCH_OUT" -> "/tmp/x.json",
      "GRAFT_BENCH_SEAL" -> "1")) === "/tmp/x.json")
  }

  test("compressionOracleSql embeds independently-deflated sizes, " +
      "recomputes raw bytes from the data, and gates on id match") {
    val spark = SparkSpec.session
    import spark.implicits._
    val docs = Seq((7L, "aaaaaaaaaaaaaaaaaaaaaaaa"), (8L, "xyz"))
      .toDF("doc_id", "text")
    val sql = graft.ops.TextOps.compressionOracleSql(
      "documents", "doc_id", "text", docs)
    // independent fresh-Deflater recompute must equal the kernel path
    val want7 = graft.functions.DeflateLenUtil.len(
      org.apache.spark.unsafe.types.UTF8String.fromString("a" * 24), 6)
    val want8 = graft.functions.DeflateLenUtil.len(
      org.apache.spark.unsafe.types.UTF8String.fromString("xyz"), 6)
    assert(sql.contains(s"(7, $want7)") && sql.contains(s"(8, $want8)"), sql)
    // raw bytes come FROM THE DATA (strlen), never from literals
    assert(sql.contains("CAST(strlen(t.text) AS INTEGER) AS n_bytes"))
    // id-match gate: inner join, so a drifted id fails the row count
    assert(sql.contains("JOIN dz z ON t.doc_id = z.doc_id"))
    // empty-text NULL branch replayed
    assert(sql.contains("CASE WHEN strlen(t.text) > 0"))
    intercept[IllegalArgumentException] {
      graft.ops.TextOps.compressionOracleSql(
        "documents", "doc_id", "text", docs.limit(0))
    }
  }

  test("fitOracleSql gates every embedded row on the data-derived " +
      "micro integer and replays the E-step shape") {
    val trace = graft.ops.UnigramOps.UnigramFitTrace(
      preEntries = Seq("a 0.5", "ab 0.25", "b 0.25"),
      lastMicroSums = Seq("a" -> BigInt(3000000), "ab" -> BigInt(1500000)),
      rows = Seq(("a", 1, -0.693147, 1), ("ab", 2, -1.386294, 2),
        ("b", 1, -27.631021, 3)))
    val sql = graft.ops.UnigramOps.fitOracleSql("documents", "text", trace)
    // frozen model literals (prob text preserved verbatim)
    assert(sql.contains("map(['a', 'ab', 'b'], [0.5, 0.25, 0.25])"), sql)
    // reversed-piece map for the backward pass
    assert(sql.contains("map(['a', 'ba', 'b']"), sql)
    // micro-unit rounding is Java math.round: floor(x*1e6 + 0.5)
    assert(sql.contains("floor(list_sum(list(e ORDER BY i, l)) * 1e6 + 0.5)"))
    // each embedded row carries its expected integer; backstop
    // singles (no m row) gate on 0 via the coalesce
    assert(sql.contains("('a', 3000000, 1, -0.693147, 1)"), sql)
    assert(sql.contains("('b', 0, 1, -27.631021, 3)"), sql)
    assert(sql.contains("coalesce(ms.m, 0) = e.m"), sql)
    intercept[IllegalArgumentException] {
      graft.ops.UnigramOps.fitOracleSql("d", "t",
        graft.ops.UnigramOps.UnigramFitTrace(Seq.empty, Seq.empty, Seq.empty))
    }
  }
}
