package graft.core

import graft.ops.{BloomOps, ProfileOps}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Randomized invariants for the r16 additions: the bloom-split anti
  * join must equal the plain `left_anti` on ANY corpus/reference/fpp
  * (nulls, duplicates, empty sides included), and categorical
  * t-closeness must stay a valid total-variation distance under any
  * class layout with any null mix. Deterministic seeds — failures
  * reproduce.
  */
class BloomPropertySpec extends SparkSpec {
  import spark.implicits._

  test("bloomAntiJoin == plain left_anti on arbitrary corpora " +
      "(nulls, dups, fpp sweep, empty ref)") {
    val keyGen = Gen.oneOf(
      Gen.const(Option.empty[String]),
      Gen.chooseNum(0, 25).map(i => Some(s"k$i")))
    val caseGen = for {
      n <- Gen.chooseNum(0, 60)
      ks <- Gen.listOfN(n, keyGen)
      rn <- Gen.chooseNum(0, 12)
      rs <- Gen.listOfN(rn, Gen.chooseNum(0, 25).map(i => s"k$i"))
      fpp <- Gen.oneOf(0.01, 0.2, 0.5)
    } yield (ks, rs, fpp)
    val cases = Gen.listOfN(8, caseGen)
      .apply(Gen.Parameters.default, Seed(20260816L)).get
    for (((ks, rs, fpp), ci) <- cases.zipWithIndex) {
      val corpus = ks.zipWithIndex
        .map { case (k, i) => (i.toLong, k.orNull) }.toDF("id", "t")
      val ref = rs.toDF("rt")
      val got = BloomOps.bloomAntiJoin(corpus, ref, "t", "rt", fpp = fpp)
        .select("id").as[Long].collect().sorted.toSeq
      val plain = corpus.join(ref, col("t") === col("rt"), "left_anti")
        .select("id").as[Long].collect().sorted.toSeq
      assert(got === plain, s"case $ci (fpp=$fpp, |c|=${ks.size}, |r|=${rs.size})")
    }
  }

  test("tClosenessCategorical: tvd always in [0,1]; a global-mirror " +
      "class sits at 0; null mix never inflates") {
    val rowGen = for {
      g <- Gen.oneOf("a", "b", "c")
      v <- Gen.oneOf(Some("en"), Some("fr"), Some("de"), None)
    } yield (g, v)
    val caseGen = for {
      n <- Gen.chooseNum(4, 80)
      rows <- Gen.listOfN(n, rowGen)
    } yield rows
    val cases = Gen.listOfN(8, caseGen)
      .apply(Gen.Parameters.default, Seed(20260817L)).get
    for ((rows, ci) <- cases.zipWithIndex) {
      if (rows.exists(_._2.isDefined)) {
        val df = rows.map { case (g, v) => (g, v.orNull) }.toDF("g", "lang")
        val got = ProfileOps.tClosenessCategorical(
            df, Seq("g" -> col("g")), col("lang"), t = 0.3)
          .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
        got.foreach { case (g, tvd) =>
          assert(tvd >= 0.0 && tvd <= 1.0, s"case $ci class $g: tvd=$tvd")
        }
        // appending a class that mirrors the non-null global exactly
        // must land at 0 (the r15 advisory's failure mode: with the
        // null mass miscounted, the mirror class scored 0.5)
        val nonNull = rows.flatMap { case (_, v) => v }
        val mirror = (rows ++ nonNull.map(v => ("mirror", Some(v))))
          .map { case (g, v) => (g, v.orNull) }.toDF("g", "lang")
        val m = ProfileOps.tClosenessCategorical(
            mirror, Seq("g" -> col("g")), col("lang"), t = 0.3)
          .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
        assert(m("mirror") === 0.0, s"case $ci: mirror class tvd=${m("mirror")}")
      }
    }
  }
}
