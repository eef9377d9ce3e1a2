package graft.core

import graft.ops.TextOps
import org.apache.spark.sql.functions._

/** RAKE phrase keywords ([[TextOps.rakeKeywords]]): hand-computed
  * degree/frequency scores, duplicate-instance counting, the
  * maxWords cut, and empty/punctuation-only degeneracy.
  */
class RakeSpec extends SparkSpec {
  import spark.implicits._

  test("hand case: deg/freq micro scores and phrase ranking") {
    // cleaned: "| quick brown fox jumps| | lazy dog | | fox"
    // phrases (maxWords=3): "lazy dog", "fox" — the 4-word run drops
    val df = Seq((1L, "the quick brown fox jumps. a lazy dog and the fox"))
      .toDF("doc_id", "text")
    val got = TextOps.rakeKeywords(df, "doc_id", "text", k = 5)
      .select("rank", "phrase", "n_inst", "score_micro")
      .as[(Int, String, Long, Long)].collect().toSeq.sortBy(_._1)
    // lazy: freq 1, deg 2 -> 2e6; dog: 2e6; fox: freq 1, deg 1 -> 1e6
    assert(got == Seq((1, "lazy dog", 1L, 4000000L),
      (2, "fox", 1L, 1000000L)))
  }

  test("duplicate phrase instances accumulate freq and deg") {
    val df = Seq((7L, "good data, good data")).toDF("doc_id", "text")
    val got = TextOps.rakeKeywords(df, "doc_id", "text")
      .select("rank", "phrase", "n_inst", "score_micro")
      .as[(Int, String, Long, Long)].collect().toSeq
    // good: freq 2, deg 4 -> 2e6; data: 2e6; phrase = 4e6, n_inst = 2
    assert(got == Seq((1, "good data", 2L, 4000000L)))
  }

  test("stopword-only / punctuation-only / empty docs emit nothing") {
    val df = Seq((1L, "the and of to"), (2L, "... !!! ,,,"), (3L, ""))
      .toDF("doc_id", "text")
    assert(TextOps.rakeKeywords(df, "doc_id", "text").count() == 0)
  }

  test("distinctiveTerms: planted markers rank first per domain; " +
      "prior shrinks a rare exclusive below a frequent skewed term") {
    val docs = (
      (1 to 20).map(i => (s"a$i", "A", "common words here zebra zebra")) ++
      (1 to 20).map(i => (s"b$i", "B", "common words here yak yak")) ++
      Seq(("ax", "A", "unicorn")) // rare A-exclusive
    ).toDF("id", "domain", "text")
    val got = TextOps.distinctiveTerms(docs, "domain", "text", k = 3)
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getString(2), r.getDouble(5)))).toMap
    assert(got(("A", 1))._1 == "zebra" && got(("A", 1))._2 > 0)
    assert(got(("B", 1))._1 == "yak" && got(("B", 1))._2 > 0)
    // the 40x-repeated marker beats the once-seen exclusive
    val aTop = (1 to 3).map(r => got(("A", r)))
    val zebraZ = aTop.find(_._1 == "zebra").get._2
    val uniZ = aTop.find(_._1 == "unicorn").map(_._2)
    assert(uniZ.forall(_ < zebraZ),
      s"prior must shrink the rare exclusive: $aTop")
  }

  test("topicSegments: a planted two-topic document cuts exactly at " +
      "the vocabulary switch") {
    // blocks of 4: [x x x x][x x x x][y y y y][y y y y]
    val df = Seq((1L, ("x " * 8 + "y " * 8).trim)).toDF("doc_id", "text")
    val got = TextOps.topicSegments(df, "doc_id", "text",
        blockTokens = 4, windowBlocks = 1, horizon = 2,
        depthThresholdMicro = 500000L)
      .select("gap", "sim_micro", "depth_micro", "is_boundary")
      .as[(Long, Long, Long, Int)].collect().toSeq.sortBy(_._1)
    assert(got == Seq(
      (1L, 1000000L, 0L, 0),         // x-blocks either side: cos 1
      (2L, 0L, 2000000L, 1),         // the topic switch: cos 0, deep
      (3L, 1000000L, 0L, 0)))
  }

  test("k caps per-document output; ties break phrase-asc") {
    val df = Seq((1L, "alpha. beta. gamma. delta")).toDF("doc_id", "text")
    val got = TextOps.rakeKeywords(df, "doc_id", "text", k = 2)
      .select("rank", "phrase").as[(Int, String)].collect().toSeq
    // four singleton phrases, all score 1e6 -> alphabetical cut
    assert(got == Seq((1, "alpha"), (2, "beta")))
  }
}
