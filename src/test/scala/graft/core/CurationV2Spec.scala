package graft.core

import org.apache.spark.sql.functions._
import graft.ops.{CurationPipeline, TextOps}

class CurationV2Spec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")

  test("funnel V2 stages are cumulative and non-trivial") {
    val r = CurationPipeline.funnelV2(docs, "doc_id", "text").head()
    val Seq(total, lang, qual, sub, dedup) =
      (0 until 5).map(r.getLong)
    assert(total == docs.count())
    assert(total >= lang && lang >= qual && qual >= sub && sub >= dedup)
    assert(lang > 0, "language stage extinguished the corpus")
    assert(dedup >= 0)
  }

  test("slack thresholds collapse quality/substr stages onto the lang stage") {
    val r = CurationPipeline.funnelV2(docs, "doc_id", "text",
      minQuality = 0.0, maxSubstrTokens = Long.MaxValue).head()
    assert(r.getLong(1) == r.getLong(2) && r.getLong(2) == r.getLong(3))
  }

  test("a planted exact duplicate is caught by the dedup stage") {
    val slack = (d: org.apache.spark.sql.DataFrame) =>
      CurationPipeline.funnelV2(d, "doc_id", "text",
        minQuality = 0.0, maxSubstrTokens = Long.MaxValue).head()
    val base = slack(docs)
    // duplicate one document that passes the lang stage, under a new id
    val passing = docs.limit(50).withColumn("_sc",
        call_function("graft_lang_scores", coalesce(col("text"), lit(""))))
      .filter(element_at(typedLit(graft.ops.LangNgram.langs),
        array_position(col("_sc"), array_max(col("_sc"))).cast("int")) === "en")
      .drop("_sc").limit(1)
    val clone = passing.withColumn("doc_id", col("doc_id") + 1000000L)
    val r = slack(docs.unionByName(clone))
    assert(r.getLong(0) == base.getLong(0) + 1)
    assert(r.getLong(3) == base.getLong(3) + 1, "clone passes the slack stages")
    assert(r.getLong(4) == base.getLong(4),
      "distinct fingerprints must not grow on an exact duplicate")
  }

  test("decision manifest: first-failure precedence, first-wins dedup, keep flag") {
    val good = "the quick brown fox and the lazy dog keep running to the " +
      "woods of the far north for a while longer"
    val df = Seq(
      (1L, good),                                     // keep (dup rank 1)
      (2L, "tiny doc"),                               // rules (too short)
      // blocklist phrases AND too short -> rules wins (first failure)
      (3L, "click here buy now subscribe"),
      // blocklist hits on a rules-passing doc -> blocklist
      (4L, good + " click here and click here to buy now"),
      (5L, good),                                     // duplicate of 1
      (6L, good)).toDF("id", "text")                  // duplicate of 1
    val got = graft.ops.CurationPipeline.decisionManifest(df, "id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getString(3), r.getInt(4)))).toMap
    assert(got(1L) === (("keep", 1)))
    assert(got(2L) === (("rules", 0)))
    assert(got(3L) === (("rules", 0)), "earlier stage wins over blocklist")
    assert(got(4L) === (("blocklist", 0)))
    assert(got(5L) === (("duplicate", 0)) && got(6L) === (("duplicate", 0)))
  }
}
