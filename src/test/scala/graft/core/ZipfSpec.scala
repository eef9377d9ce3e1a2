package graft.core

import graft.ops.ProfileOps

/** zipfFit invariants: a crafted 1/r corpus fits slope ≈ −1 with high
  * r², and the fit is partition-invariant.
  */
class ZipfSpec extends SparkSpec {
  import spark.implicits._

  // Token t_r appears floor(600/r) times, r = 1..40 — an exact Zipf
  // frequency profile laid out shuffled across docs.
  private lazy val corpus = {
    val words = (1 to 40).flatMap(r => Seq.fill(600 / r)(f"t$r%02d"))
    val rnd = new scala.util.Random(7)
    val shuffled = rnd.shuffle(words)
    shuffled.grouped(25).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
      .toSeq.toDF("id", "text")
  }

  test("planted 1/r corpus: slope near -1, strong r2") {
    val r = ProfileOps.zipfFit(corpus, "text").collect().head
    assert(r.getLong(0) === 40 && r.getLong(1) === (1 to 40).map(600 / _).sum)
    val slope = r.getDouble(2)
    assert(slope > -1.1 && slope < -0.9, s"slope $slope")
    assert(r.getDouble(4) > 0.97, s"r2 ${r.getDouble(4)}")
  }

  test("heapsFit recovers a planted V = 2 * N^0.5 growth law") {
    // group g has N = (g*10)^2 tokens over a vocab of exactly 2*g*10
    // distinct words -> ln V = ln 2 + 0.5 ln N exactly.
    val rows = (1 to 8).flatMap { g =>
      val vocab = 2 * g * 10
      val n = (g * 10) * (g * 10)
      val words = (0 until n).map(i => s"g${g}w${i % vocab}")
      words.grouped(500).zipWithIndex.map { case (ws, i) =>
        (s"src$g", ws.mkString(" ")) }
    }
    val df = rows.toDF("source", "text")
    val r = graft.ops.ProfileOps.heapsFit(df, "text", "source").collect().head
    assert(r.getLong(0) === 8)
    assert(math.abs(r.getDouble(1) - 0.5) < 1e-6, s"beta ${r.getDouble(1)}")
    assert(math.abs(r.getDouble(2) - 2.0) < 1e-5, s"k ${r.getDouble(2)}")
    assert(r.getDouble(3) > 0.99999, s"r2 ${r.getDouble(3)}")
  }

  test("tokenDistJsd: identical groups 0, disjoint groups ln 2, similarity ordering") {
    val df = Seq(
      ("s1", "a a b b c"), ("s1", "a b c"),
      ("s2", "a a b b c"), ("s2", "a b c"),      // identical dist to s1
      ("s3", "x y z x y z x y"),                 // disjoint vocabulary
      ("s4", "a a a a b c")                      // same vocab, skewed
    ).toDF("source", "text")
    val got = graft.ops.ProfileOps.tokenDistJsd(df, "text", "source")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got.size === 6)
    assert(got(("s1", "s2")) === ((3L, 0.0)), "identical distributions")
    val lnTwo = java.math.BigDecimal.valueOf(math.log(2.0))
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
    assert(got(("s1", "s3"))._1 === 0L && got(("s1", "s3"))._2 === lnTwo,
      s"disjoint vocab: ${got(("s1", "s3"))}")
    // skewed-same-vocab pair sits strictly between the endpoints
    val mid = got(("s1", "s4"))._2
    assert(mid > 0.0 && mid < lnTwo, s"s1-s4 jsd $mid")
  }

  test("lengthLogNormal flags a planted length outlier") {
    val normal = (1 to 200).map(i => (i.toLong,
      Seq.fill(40 + i % 8)("w").mkString(" ")))
    val monster = Seq((999L, Seq.fill(40000)("w").mkString(" ")))
    val df = (normal ++ monster).toDF("id", "text")
    val r = graft.ops.ProfileOps.lengthLogNormal(df, "text").collect().head
    assert(r.getLong(0) === 201)
    assert(r.getLong(3) === 1L, s"monster doc must be the one 3-sigma outlier: $r")
    // remove the monster: zero outliers, sigma collapses
    val r2 = graft.ops.ProfileOps
      .lengthLogNormal(normal.toDF("id", "text"), "text").collect().head
    assert(r2.getLong(3) === 0L && r2.getDouble(2) < r.getDouble(2))
  }

  test("fit is partition-invariant") {
    val a = ProfileOps.zipfFit(corpus.repartition(1), "text").collect().head
    val b = ProfileOps.zipfFit(corpus.repartition(13), "text").collect().head
    assert(a === b)
  }
}
