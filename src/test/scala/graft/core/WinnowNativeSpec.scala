package graft.core

import graft.ops.WinnowOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The native `graft_winnow` kernel must be BIT-IDENTICAL to the
  * composed HOF pipeline it replaced — same fingerprint sets, same
  * first-occurrence argmin positions — across repeats (hash ties),
  * short docs, multi-byte codepoints, and the real corpus. */
class WinnowNativeSpec extends SparkSpec {
  import spark.implicits._

  private def fpSet(df: DataFrame): Set[(Long, Long, String)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet

  private def posSet(df: DataFrame): Set[(Long, String, Long)] =
    df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

  private def check(docs: DataFrame, k: Int = 12, w: Int = 6): Unit = {
    assert(fpSet(WinnowOps.fingerprints(docs, "doc_id", "text", k, w)) ==
      fpSet(WinnowOps.fingerprintsComposed(docs, "doc_id", "text", k, w)))
    assert(posSet(WinnowOps.fingerprintsPos(docs, "doc_id", "text", k, w)) ==
      posSet(WinnowOps.fingerprintsPosComposed(docs, "doc_id", "text", k, w)))
  }

  test("native == composed on crafted edge cases") {
    val docs = Seq(
      (1L, "short"),                                  // < k chars
      (2L, "exactly12chr"),                           // one gram
      (3L, "a bit above the single window threshold"),
      (4L, "zzzz zzzz zzzz zzzz zzzz zzzz zzzz"),     // heavy repeats -> hash ties
      (5L, "abcabcabcabcabcabcabcabcabcabc"),         // periodic ties
      (6L, ""),                                       // empty
      (7L, "The Quick Brown Fox Jumps Over The Lazy Dog And Keeps Running Onward"),
      (8L, "ünïcödé çharacters and ümläuts mixed with ascii text for good measure"),
      (9L, "emoji 😀😁😂 inside a long enough document body to fingerprint")
    ).toDF("doc_id", "text")
    check(docs)
    check(docs, k = 3, w = 2)
    check(docs, k = 5, w = 12) // window larger than most docs' gram count
  }

  test("native == composed on the documents corpus") {
    check(graft.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text")))
  }

  test("fingerprint values are the md5-prefix contract (oracle stability)") {
    // one known gram: doc of exactly k chars -> fp = first 16 hex of md5
    val docs = Seq((1L, "exactly12chr")).toDF("doc_id", "text")
    val fp = WinnowOps.fingerprints(docs, "doc_id", "text").collect()(0).getString(2)
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest("exactly12chr".getBytes("UTF-8"))
    val exp = md.take(8).map("%02x".format(_)).mkString
    assert(fp == exp)
  }
}
