package graft.core

import graft.ops.WinnowOps
import org.scalacheck.{Gen, Prop}
import org.scalacheck.rng.Seed

/** Randomized differential for the native winnowing kernel: for
  * arbitrary text (including repeats, unicode, surrogate-pair
  * codepoints and whitespace runs) and arbitrary (k, w), the native
  * `graft_winnow` selection must equal the composed HOF form on both
  * the fingerprint sets and the min positions. Deterministic seed —
  * a failure is reproducible, not flaky.
  */
class WinnowPropertySpec extends SparkSpec {
  import spark.implicits._

  private val charGen: Gen[String] = Gen.frequency(
    10 -> Gen.alphaLowerChar.map(_.toString),
    3 -> Gen.const(" "),
    2 -> Gen.oneOf("ü", "ß", "é", "汉", "字"),
    1 -> Gen.const("😀"), // supplementary-plane codepoint
    1 -> Gen.const("\t"),
    2 -> Gen.oneOf("aaa", "abcabc", "zzzz")) // force repeats / hash ties

  private val textGen: Gen[String] =
    Gen.chooseNum(0, 60).flatMap(n => Gen.listOfN(n, charGen).map(_.mkString))

  test("native == composed across randomized text and (k, w)") {
    val cases = Gen.listOfN(60, for {
      t <- textGen
      k <- Gen.chooseNum(1, 14)
      w <- Gen.chooseNum(1, 10)
    } yield (t, k, w))
      .apply(Gen.Parameters.default, Seed(42L))
      .getOrElse(sys.error("gen failed"))

    // group by (k, w) so each parameter pair is ONE Spark job over all
    // its texts (60 per-row jobs would dominate the suite's runtime)
    cases.groupBy { case (_, k, w) => (k, w) }.foreach {
      case ((k, w), texts) =>
        val docs = texts.zipWithIndex
          .map { case ((t, _, _), i) => (i.toLong, t) }.toDF("doc_id", "text")
        val nat = WinnowOps.fingerprintsPos(docs, "doc_id", "text", k, w)
          .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
        val cmp = WinnowOps.fingerprintsPosComposed(docs, "doc_id", "text", k, w)
          .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
        assert(nat == cmp, s"mismatch at k=$k w=$w over ${texts.size} texts")
    }
  }
}
