package graft.core

import graft.ops.{IvfIndexOps, TextOps}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Randomized invariants for the incremental index and the Luhn
  * checksum. Deterministic seeds — failures reproduce.
  */
class IvfPropertySpec extends SparkSpec {
  import spark.implicits._

  test("cellStats: arbitrary batch partitions merge to the identical store") {
    val vecGen = Gen.listOfN(4, Gen.chooseNum(-1000, 1000).map(_ / 100.0))
    val corpusGen = for {
      n <- Gen.chooseNum(6, 40)
      vs <- Gen.listOfN(n, vecGen)
      splits <- Gen.listOfN(n, Gen.chooseNum(0, 2)) // 3-way batch split
    } yield (vs, splits)
    val params = Gen.listOfN(6, corpusGen)
      .apply(Gen.Parameters.default, Seed(20260814L)).get
    val centers = Seq(Seq(0.0, 0.0, 0.0, 0.0), Seq(5.0, 5.0, 5.0, 5.0),
      Seq(-5.0, 0.0, 5.0, 0.0))
    for (((vs, splits), ci) <- params.zipWithIndex) {
      val emb = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("vec_id", "embedding")
      val asg = IvfIndexOps.assign(spark, emb, "vec_id", "embedding", centers)
        .localCheckpoint()
      val split = splits.zipWithIndex
      val parts = (0 to 2).map { b =>
        val ids = split.filter(_._1 == b).map(_._2.toLong).toSet
        IvfIndexOps.cellStatsFromAssigned(
          asg.where(col("id").isin(ids.toSeq: _*)))
      }
      val merged = parts.reduce(IvfIndexOps.mergeStats)
        .collect().map(r => (r.getInt(0), r.getInt(1)) ->
          ((r.getDecimal(2).toPlainString, r.getLong(3)))).toMap
      val scratch = IvfIndexOps.cellStatsFromAssigned(asg)
        .collect().map(r => (r.getInt(0), r.getInt(1)) ->
          ((r.getDecimal(2).toPlainString, r.getLong(3)))).toMap
      assert(merged == scratch, s"case $ci: 3-way merge != scratch")
    }
  }

  test("luhnOk agrees with a pure-Scala reference on random digit strings") {
    def luhnRef(s: String): Boolean = {
      val digits = s.reverse.map(_ - '0')
      val total = digits.zipWithIndex.map { case (d, i) =>
        if (i % 2 == 1) { val x = d * 2; if (x > 9) x - 9 else x } else d
      }.sum
      total % 10 == 0
    }
    val numGen = for {
      n <- Gen.chooseNum(13, 16)
      ds <- Gen.listOfN(n, Gen.chooseNum(0, 9))
    } yield ds.mkString
    val nums = Gen.listOfN(300, numGen)
      .apply(Gen.Parameters.default, Seed(4242L)).get
    val got = nums.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "num")
      .select(col("id"), TextOps.luhnOk(col("num")).as("ok"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    nums.zipWithIndex.foreach { case (s, i) =>
      assert(got(i.toLong) == luhnRef(s), s"disagrees on $s")
    }
    // at least some of each class in the sample (sanity of the gen)
    assert(got.values.exists(identity) && got.values.exists(!_))
  }
}
