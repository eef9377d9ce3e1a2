package graft.core

import graft.ops.UnigramOps
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer invariants: E-step mass conservation, Viterbi
  * optimality on hand models, greedy longest-match semantics, and the
  * distributed fit's bit-equality with the in-memory reference under
  * repartitioning.
  */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private def model(ps: (String, Double)*) =
    new UnigramOps.UnigramModel(ps.toMap, UnigramOps.MaxPieceLen)

  test("expectedCounts conserves character mass: sum e_p * len(p) = len(word)") {
    val m = model("a" -> 0.3, "b" -> 0.2, "ab" -> 0.3, "ba" -> 0.1, "aba" -> 0.1)
    for (w <- Seq("ab", "aba", "abab", "bbbb", "a")) {
      val ec = UnigramOps.expectedCounts(w, m)
      val mass = ec.map { case (p, e) => p.length * e }.sum
      assert(math.abs(mass - w.length) < 1e-9, s"word $w mass $mass")
    }
  }

  test("expectedCounts: unambiguous word puts count 1 on its only parse") {
    val m = model("x" -> 0.5, "yz" -> 0.5)
    val ec = UnigramOps.expectedCounts("xyz", m).toMap
    assert(math.abs(ec("x") - 1.0) < 1e-12)
    assert(math.abs(ec("yz") - 1.0) < 1e-12)
    // The UNK single-char floor keeps x|y|z reachable but with
    // vanishing mass — its counts must be numerically dead.
    assert(ec.getOrElse("y", 0.0) < 1e-50 && ec.getOrElse("z", 0.0) < 1e-50)
  }

  test("viterbiWord picks the max-likelihood parse, longer piece on ties") {
    // "abc": parses a|b|c (0.2^3=8e-3) vs ab|c (0.3*0.2=0.06) vs a|bc
    // (0.2*0.1=0.02) — ab|c wins.
    val m = model("a" -> 0.2, "b" -> 0.2, "c" -> 0.2, "ab" -> 0.3, "bc" -> 0.1)
    assert(UnigramOps.viterbiWord("abc", m) === List("ab", "c"))
    // Exact tie between x|y and xy (0.25 = 0.5*0.5): longer piece wins.
    val t = model("x" -> 0.5, "y" -> 0.5, "xy" -> 0.25)
    assert(UnigramOps.viterbiWord("xy", t) === List("xy"))
  }

  test("viterbiWord covers unknown single chars via the UNK floor") {
    val m = model("ab" -> 1.0)
    assert(UnigramOps.viterbiWord("aqb", m) === List("a", "q", "b"))
  }

  test("viterbi encode pieces reassemble to the lowercased tokens") {
    val m = model("a" -> 0.4, "b" -> 0.3, "ab" -> 0.3)
    val got = UnigramOps.viterbiEncode("AB ab\tBA", m, null)
    assert(got.mkString("") === "ababba")
  }

  test("greedyWord: longest match first, single-char fallback") {
    val v = Set("abc", "ab", "c", "q")
    assert(UnigramOps.greedyWord("abcab", v, 3) === List("abc", "ab"))
    assert(UnigramOps.greedyWord("zabq", v, 3) === List("z", "ab", "q"))
  }

  test("fitUnigram matches the in-memory reference bit-for-bit, any partitioning") {
    val docs = Seq(
      "the cat sat on the mat", "the bat and the cat", "mat cat bat sat",
      "on and on and on", "the the the cat").toDF("text")
    val wordFreq = docs.as[String].collect()
      .flatMap(_.toLowerCase.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) => (w, ws.length.toLong) }.toSeq
    val ref = UnigramOps.fitOnDict(wordFreq, vocabSize = 30, seedCap = 50,
      maxLen = 4, iters = 3, minCount = 2)
    def run(parts: Int) = UnigramOps.fitUnigram(docs.repartition(parts), "text",
        vocabSize = 30, seedCap = 50, maxLen = 4, iters = 3, minCount = 2)
      .orderBy("rank")
      .collect().map(r => (r.getString(0), r.getDouble(2)))
    val one = run(1)
    val many = run(7)
    assert(one.toSeq === many.toSeq, "partition-dependent fit")
    val refSorted = ref.sortBy { case (p, lp) => (-lp, p) }
    assert(one.toSeq === refSorted.toSeq, "distributed fit != reference")
  }

  test("fitUnigram vocab: singles always kept, vocabSize respected, probs normalize") {
    val docs = Seq.fill(20)("aaa bbb ab ba abab").toDF("text")
    val fit = UnigramOps.fitUnigram(docs, "text",
      vocabSize = 5, seedCap = 20, maxLen = 3, iters = 2, minCount = 1)
    val rows = fit.collect().map(r => (r.getString(0), r.getDouble(2)))
    val pieces = rows.map(_._1).toSet
    assert(pieces.contains("a") && pieces.contains("b"))
    assert(rows.length <= 5)
    val mass = rows.map { case (_, lp) => math.exp(lp) }.sum
    assert(math.abs(mass - 1.0) < 1e-4, s"prob mass $mass")
  }

  test("unigramEncode expression = scalar viterbi; greedy expression = scalar greedy") {
    graft.functions.GraftFunctions.register(spark)
    val docs = Seq("the cat sat", "batch stream window", "zq filter table")
      .toDF("text")
    val fit = UnigramOps.fitUnigram(docs, "text", vocabSize = 40,
      seedCap = 100, maxLen = 4, iters = 2, minCount = 1)
    val entries = UnigramOps.entriesFromFit(fit)
    val m = UnigramOps.modelFromEntries(entries, maxLen = 4)
    val gotV = docs.select(col("text"),
        UnigramOps.unigramEncode(col("text"), entries).as("p"))
      .collect().map(r => (r.getString(0), r.getSeq[String](1)))
    for ((t, p) <- gotV)
      assert(p === UnigramOps.viterbiEncode(t, m, null), s"viterbi for '$t'")
    val vocab = UnigramOps.DefaultVocab
    val gotG = docs.select(col("text"),
        UnigramOps.greedyEncodeCol(col("text"), vocab).as("p"))
      .collect().map(r => (r.getString(0), r.getSeq[String](1)))
    val maxLen = vocab.map(_.length).max
    for ((t, p) <- gotG)
      assert(p === UnigramOps.greedyEncode(t, vocab.toSet, maxLen, null),
        s"greedy for '$t'")
  }

  test("greedy pieces reassemble; viterbi never out-tokenizes greedy on the model vocab") {
    graft.functions.GraftFunctions.register(spark)
    val docs = Seq("window stream merge filter customer order the",
      "spark table column vector batch").toDF("text")
    val got = docs.select(
        UnigramOps.greedyEncodeCol(col("text"), UnigramOps.DefaultVocab).as("p"),
        col("text"))
      .collect()
    for (r <- got) {
      val pieces = r.getSeq[String](0)
      val expect = r.getString(1).toLowerCase.split("\\s+").filter(_.nonEmpty).mkString("")
      assert(pieces.mkString("") === expect)
    }
  }
}
