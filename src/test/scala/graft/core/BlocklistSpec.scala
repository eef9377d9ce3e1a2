package graft.core

import graft.functions.AcAutomaton
import graft.ops.BlocklistOps

/** Aho–Corasick invariants: brute-force differential (all positions,
  * overlapping patterns, shared prefixes/suffixes), and the tag()
  * end-to-end contract.
  */
class BlocklistSpec extends SparkSpec {
  import spark.implicits._

  private def brute(text: String, patterns: Array[String]): Array[Long] =
    patterns.map { p =>
      var c = 0L; var i = text.indexOf(p)
      while (i >= 0) { c += 1; i = text.indexOf(p, i + 1) }
      c
    }

  test("automaton matches brute force on the classic overlapping set") {
    val pats = Array("he", "she", "his", "hers")
    val ac = new AcAutomaton(pats)
    Seq("ushers", "she sells seashells", "hishers", "hhehehers", "").foreach { t =>
      assert(ac.countAll(t).toSeq === brute(t, pats).toSeq, s"text '$t'")
    }
  }

  test("automaton matches brute force on random fragment soup") {
    val pats = Array("click here", "buy now", "lorem ipsum", "here", "ck h")
    val ac = new AcAutomaton(pats)
    val rnd = new scala.util.Random(42)
    val frags = Array("click", " here", "buy", " now", "lorem", " ipsum",
      "x", " ", "click here", "buy now buy now")
    (1 to 300).foreach { _ =>
      val t = (1 to rnd.nextInt(12)).map(_ => frags(rnd.nextInt(frags.length))).mkString
      assert(ac.countAll(t).toSeq === brute(t, pats).toSeq, s"text '$t'")
    }
  }

  test("self-overlapping patterns count every start position") {
    val ac = new AcAutomaton(Array("aa"))
    assert(ac.countAll("aaaa").toSeq === Seq(3L)) // brute(indexOf+1) agrees
  }

  test("tag: case-insensitive counts, distinct phrases, block flag, null-safe") {
    val df = Seq(
      (1L, "CLICK HERE and click here to Buy Now"),
      (2L, "nothing to see"),
      (3L, "subscribe"),
      (4L, null.asInstanceOf[String])).toDF("id", "text")
    val got = BlocklistOps.tag(df, "id", "text", minHits = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2), r.getInt(3)))).toMap
    assert(got(1L) === ((3L, 2, 1)))   // 2x click here + 1x buy now, blocked
    assert(got(2L) === ((0L, 0, 0)))
    assert(got(3L) === ((1L, 1, 0)))
    assert(got(4L) === ((0L, 0, 0)), "null text scores as empty")
  }
}
