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

  test("fit is partition-invariant") {
    val a = ProfileOps.zipfFit(corpus.repartition(1), "text").collect().head
    val b = ProfileOps.zipfFit(corpus.repartition(13), "text").collect().head
    assert(a === b)
  }
}
