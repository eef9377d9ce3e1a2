package graft.core

import graft.functions.JaroWinklerUtil
import graft.ops.FuzzyOps
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Pins the native Jaro-Winkler kernel to DuckDB-measured reference
  * values (byte semantics, floored half-transpositions, 0.7-gated
  * 4-capped prefix boost) and hand-checks the linkage ops.
  */
class LinkageSpec extends SparkSpec {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    JaroWinklerUtil.jw(UTF8String.fromString(a), UTF8String.fromString(b))

  test("jaro-winkler: DuckDB-measured reference values") {
    val cases = Seq(
      ("", "", 0.0), ("a", "", 0.0), ("", "a", 0.0),
      ("a", "a", 1.0), ("ab", "ba", 0.0), ("a", "b", 0.0),
      ("DWAYNE", "DUANE", 0.8400000000000001),
      ("MARTHA", "MARHTA", 0.9611111111111111),
      ("DIXON", "DICKSONX", 0.8133333333333332),
      ("CRATE", "TRACE", 0.7333333333333334),
      ("abcvwxyz", "cabvwxyz", 0.9583333333333334),
      ("éé", "ée", 0.7777777777777778),          // byte semantics
      ("aaaaaab", "aaaaaba", 0.9714285714285714), // prefix cap 4
      ("ab", "abzzzzzz", 0.8),                    // boost applies
      ("abqqqqqq", "abzzzzzz", 0.5),              // gated at 0.7
      ("hot rd", "cold rod", 0.6388888888888888)) // floored t
    cases.foreach { case (a, b, exp) =>
      assert(jw(a, b) == exp, s"jw($a, $b)")
    }
  }

  test("jw best match: identical name wins with score 1") {
    // key 8 corrupts 'blue bolt' (len 9, 8 % 9 = 8) -> 'blue bol'
    val df = Seq((8L, "blue bolt"), (1L, "blue rod"), (2L, "red bolt"))
      .toDF("k", "name")
    val r = FuzzyOps.jwBestMatch(df, "k", "name",
      col("k") === 8L).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[String]("l_name") == "blue bol")
    assert(row.getAs[String]("best_name") == "blue bolt")
    assert(row.getAs[Double]("best_jw") > 0.95)
  }

  test("fellegi-sunter: all-agree pattern dominated by matches") {
    val df = (0L until 100L).map(k =>
      (k, (k % 4).toInt, s"Brand#${k % 10}", s"TYPE${k % 3}",
        s"name is ${k}")).toDF("k", "blk", "brand", "tpe", "name")
    val out = FuzzyOps.fellegiSunter(df, "k", "blk", "brand", "tpe",
      "name").collect()
    val all = out.map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) ->
      (r.getAs[Long]("n_match"), r.getAs[Long]("n_unmatch"),
        Option(r.get(7)).map(_.asInstanceOf[Double]))).toMap
    // total matches = 100 (one true pair per record)
    assert(out.map(_.getAs[Long]("n_match")).sum == 100L)
    // the (1,1,1) full-agreement pattern must carry a POSITIVE weight
    // and the (0,0,0) pattern a negative one (if both sides observed)
    all.get((1, 1, 1)).foreach { case (m, _, w) =>
      assert(m > 0 && w.forall(_ > 0)) }
    all.get((0, 0, 0)).foreach { case (m, u, w) =>
      assert(u > 0 && (m == 0 || w.exists(_ < 0))) }
  }
}
