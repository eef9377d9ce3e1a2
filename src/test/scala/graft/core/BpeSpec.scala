package graft.core

import graft.ops.BpeOps
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  // An independently-written reference encoder (index-scan style, vs
  // the op's list-pattern-match style): for each rank in order, merge
  // the leftmost adjacent occurrence until none remains.
  private def refEncodeWord(w: String,
      merges: Seq[(String, String)]): Vector[String] = {
    var s = w.map(_.toString).toVector
    for ((a, b) <- merges) {
      var i = 0
      while (i < s.length - 1) {
        if (s(i) == a && s(i + 1) == b) {
          s = (s.take(i) :+ (a + b)) ++ s.drop(i + 2)
          // the merged symbol can begin a NEW (a,b) only at i-1 or i
          i = math.max(i - 1, 0)
        } else i += 1
      }
    }
    s
  }

  private def refEncode(t: String, merges: Seq[(String, String)]): Seq[String] =
    t.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty)
      .flatMap(refEncodeWord(_, merges))

  test("hand example: merges apply in rank order, leftmost-first") {
    val merges = Seq(("a", "b"), ("ab", "c"), ("c", "d"))
    // abcd: (a,b)->ab,c,d; (ab,c)->abc,d; (c,d) no c left -> abc,d
    assert(BpeOps.encode("abcd", merges) == Seq("abc", "d"))
    // overlap greed: aab with (a,b): leftmost pair is (a,b) at pos 2
    assert(BpeOps.encode("aab", Seq(("a", "b"))) == Seq("a", "ab"))
    // re-examination in place: rule (a,ab) after (a,b) on aab
    assert(BpeOps.encode("aab", Seq(("a", "b"), ("a", "ab"))) == Seq("aab"))
    // merges never cross word boundaries; input is lowercased
    assert(BpeOps.encode("A b", Seq(("a", "b"))) == Seq("a", "b"))
  }

  test("encode differential: random texts match the independent reference") {
    val rnd = new scala.util.Random(41)
    val alpha = "abcde"
    def word() = (0 until 1 + rnd.nextInt(8))
      .map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    for (trial <- 1 to 5) {
      val merges = scala.collection.mutable.ListBuffer.empty[(String, String)]
      // random merge table over symbols reachable from earlier merges
      var symbols = alpha.map(_.toString).toVector
      for (_ <- 0 until 12) {
        val a = symbols(rnd.nextInt(symbols.length))
        val b = symbols(rnd.nextInt(symbols.length))
        merges += ((a, b)); symbols :+= (a + b)
      }
      val texts = (1 to 40).map(_ =>
        (0 until 1 + rnd.nextInt(6)).map(_ => word()).mkString(" "))
      texts.foreach { t =>
        val got = BpeOps.encode(t, merges.toList)
        val want = refEncode(t, merges.toList)
        assert(got == want, s"trial $trial text '$t': $got vs $want")
        // lossless: tokens reassemble the pre-tokenized text
        assert(got.mkString == t.toLowerCase.split("\\s+").filter(_.nonEmpty).mkString)
      }
    }
  }

  test("training picks the most frequent pair, ties lexicographic, stops when dry") {
    // "ab" x3, "cd" x3: pair counts tie at 3 -> (a,b) < (c,d) wins first
    val merges = BpeOps.trainOnDict(Seq(("ab", 3L), ("cd", 3L)), numMerges = 10)
    assert(merges == Seq(("a", "b"), ("c", "d")), merges.toString)
    // singleton pairs (count 1) never become merges
    assert(BpeOps.trainOnDict(Seq(("xy", 1L)), numMerges = 5).isEmpty)
    // frequency weighting: "aa" x5 beats "bb" x2
    val m2 = BpeOps.trainOnDict(Seq(("aa", 5L), ("bb", 2L)), 1)
    assert(m2 == Seq(("a", "a")))
  }

  test("training differential: random dicts match an independent reference") {
    def refTrain(dict: Seq[(String, Long)], n: Int): Seq[(String, String)] = {
      var words = dict.map { case (w, c) => (w.map(_.toString).toVector, c) }
      val out = scala.collection.mutable.ListBuffer.empty[(String, String)]
      while (out.size < n) {
        val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        for ((s, c) <- words; i <- 0 until s.length - 1)
          counts((s(i), s(i + 1))) = counts.getOrElse((s(i), s(i + 1)), 0L) + c
        val cands = counts.toSeq.sortBy { case ((a, b), c) => (-c, a, b) }
        if (cands.isEmpty || cands.head._2 < 2) return out.toList
        val (a, b) = cands.head._1
        out += ((a, b))
        words = words.map { case (s, c) => (refEncodeWord(s.mkString, out.toList), c) }
      }
      out.toList
    }
    val rnd = new scala.util.Random(91)
    for (trial <- 1 to 4) {
      val dict = (1 to 50).map { _ =>
        val w = (0 until 2 + rnd.nextInt(6)).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
        (w, 1L + rnd.nextInt(20))
      }.groupBy(_._1).map { case (w, g) => (w, g.map(_._2).sum) }.toSeq.sorted
      val got = BpeOps.trainOnDict(dict, 10)
      val want = refTrain(dict, 10)
      assert(got == want, s"trial $trial: $got vs $want")
    }
  }

  test("DefaultMerges is exactly trainBpe on the sf0.01 corpus (frozen provenance)") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val trained = BpeOps.trainBpe(docs, "text", numMerges = 32)
    assert(trained == BpeOps.DefaultMerges, trained.toString)
  }

  test("native expression output equals the driver-side encode; nulls pass through") {
    val rnd = new scala.util.Random(7)
    val texts = (1 to 60).map { i =>
      if (i % 13 == 0) null
      else (0 until rnd.nextInt(8)).map(_ =>
        Seq("customer", "batch", "join", "row", "hash", "zzz", "a")(rnd.nextInt(7)))
        .mkString(" ")
    }
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    graft.functions.GraftFunctions.register(spark)
    val out = df.select(col("id"), BpeOps.bpeEncode(col("text")).as("toks"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[String](1).toList)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val want = if (t == null) null else BpeOps.encode(t, BpeOps.DefaultMerges).toList
      assert(out(i.toLong) == want, s"row $i")
    }
    // compression sanity: the trained model beats character count
    val chars = texts.filter(_ != null).map(_.replaceAll("\\s", "").length).sum
    val toks = out.values.filter(_ != null).map(_.size).sum
    assert(toks < chars, s"$toks tokens vs $chars chars")
  }
}
