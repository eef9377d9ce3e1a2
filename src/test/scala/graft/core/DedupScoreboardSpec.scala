package graft.core

import graft.ops.{DedupOps, TextOps}
import org.apache.spark.sql.functions._

/** Dedup-detection scoreboard (q111) and the rule-based quality
  * filter (q112 operator surface).
  */
class DedupScoreboardSpec extends SparkSpec {
  import spark.implicits._

  lazy val docs01 = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")

  test("dedupRecallReport: consistent counts and pinned floors (sf0.01)") {
    val rep = DedupOps.dedupRecallReport(spark, docs01, "doc_id", "text")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5),
          r.getDouble(6)))).toMap
    assert(rep.keySet == Set("minhash_lsh", "simhash"))
    rep.foreach { case (m, (nTrue, nDet, nHit, p, r)) =>
      assert(nHit <= nTrue && nHit <= nDet, s"$m: $nHit vs $nTrue/$nDet")
      assert(math.abs(p - nHit.toDouble / math.max(nDet, 1)) < 1e-3, m)
      assert(math.abs(r - nHit.toDouble / math.max(nTrue, 1)) < 1e-3, m)
    }
    // floors: deterministic inputs + xxhash family, so these only move
    // if the detection paths regress (measured 1.0/1.0 and 0.88/0.60)
    assert(rep("minhash_lsh")._4 >= 0.9 && rep("minhash_lsh")._5 >= 0.9,
      rep.toString)
    assert(rep("simhash")._4 >= 0.7 && rep("simhash")._5 >= 0.45,
      rep.toString)
    // the corpus has real near-dup structure — an empty truth set
    // would make every recall vacuous
    assert(rep("minhash_lsh")._1 > 10, "truth pair set unexpectedly small")
  }

  test("dedupRecallReport sampled path: valid estimate on the sampled frame") {
    val full = DedupOps.dedupRecallReport(spark, docs01, "doc_id", "text")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val rep = DedupOps.dedupRecallReport(spark, docs01, "doc_id", "text",
        sampleFraction = 0.5)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(2), r.getDouble(5), r.getDouble(6)))).toMap
    rep.foreach { case (m, (nTrue, p, r)) =>
      assert(nTrue <= full(m), s"$m: sampled truth exceeds full truth")
      assert(p.isNaN || (p >= 0.0 && p <= 1.0), m)
      assert(r.isNaN || (r >= 0.0 && r <= 1.0), m)
    }
  }

  test("dedupRecallReport: empty truth yields NULL recall, not 0") {
    // all-distinct corpus: no pair passes any threshold
    val uniq = (1 to 40)
      .map(i => (i.toLong, s"totally unique document number $i with marker " +
        (1 to 10).map(j => s"tok${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    val rep = DedupOps.dedupRecallReport(spark, uniq, "doc_id", "text")
      .collect()
    assert(rep.forall(r => r.getLong(2) == 0))
    rep.foreach { r => assert(r.isNullAt(6), "recall should be NULL") }
  }

  test("qualityRules: hand-built documents trip exactly the expected rules") {
    val clean = "the quick brown fox jumps over a lazy dog and then runs " +
      "off to the deep green woods of the north to rest for a while"
    val cases = Seq(
      (1L, clean),
      (2L, "tiny doc"),                                   // r_len
      (3L, clean + "\n" + "- bullet line\n" * 24),        // r_bullet
      (4L, clean + " lorem ipsum {"),                     // r_clean
      (5L, clean + "\nread more...\nsee details…\nmore..."), // r_ellipsis
      (6L, clean + " #" * 40),                            // r_symbol (+alpha)
      (7L, clean + " 4242" * 99),                         // r_alpha
      (8L, clean + " pneumonoultramicroscopicsilicovolcanoconiosis" * 99))
    val out = TextOps.qualityRules(cases.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    def b(id: Long, colName: String): Boolean = {
      val r = out(id); r.getBoolean(r.fieldIndex(colName))
    }
    assert(b(1, "passes"), "clean doc must pass every rule")
    assert(!b(2, "r_len") && !b(2, "passes"))
    assert(!b(3, "r_bullet") && b(3, "r_len"))
    assert(!b(4, "r_clean") && b(4, "r_symbol"))
    assert(!b(5, "r_ellipsis"))
    assert(!b(6, "r_symbol"))
    assert(!b(7, "r_alpha") && b(7, "r_clean"))
    assert(!b(8, "r_word_len"), "long-word spam must fail mean word length")
    assert(cases.map(_._1).forall(out.contains), "one row per doc")
  }

  test("qualityRules: zero-shuffle plan and sane corpus split") {
    val rules = TextOps.qualityRules(docs01, "doc_id", "text")
    val shuffles = rules.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(shuffles.isEmpty, "rule battery must stay a pure projection")
    val n = rules.count()
    val nPass = rules.filter(col("passes")).count()
    assert(n == docs01.count())
    // the raw synthetic corpus is clean except for stopword-poor docs
    assert(nPass > n / 2, s"unexpected mass failure: $nPass/$n")
  }
}
