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

  test("pq encoder == sweep encoder on adversarial merge tables") {
    import graft.ops.BpeOps.{BpeModel, encodeWord, encodeWordPq}
    // the divergence case from the scaladoc: a later rule's product
    // equals an earlier rule's operand — naive min-rank-first gives
    // "abc", the rank-sequential contract gives [ab, c]
    val adv = Seq(("ab", "c"), ("a", "b"))
    assert(encodeWordPq("abc", new BpeModel(adv)) == encodeWord("abc", adv))
    assert(encodeWordPq("abc", new BpeModel(adv)) == List("ab", "c"))
    // duplicate pair at two ranks: first occurrence wins, later is inert
    val dup = Seq(("a", "b"), ("ab", "c"), ("a", "b"))
    assert(encodeWordPq("ababc", new BpeModel(dup)) == encodeWord("ababc", dup))
    // fully random tables over a tiny alphabet — arbitrary products,
    // repeats, self-merges; sweep is ground truth
    val rnd = new scala.util.Random(17)
    val alpha = "ab"
    def sym() = (0 until 1 + rnd.nextInt(3))
      .map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    for (trial <- 1 to 200) {
      val merges = (0 until rnd.nextInt(8)).map(_ => (sym(), sym()))
      val model = new BpeModel(merges)
      for (_ <- 1 to 10) {
        val w = (0 until 1 + rnd.nextInt(10))
          .map(_ => alpha(rnd.nextInt(alpha.length))).mkString
        val got = encodeWordPq(w, model)
        val want = encodeWord(w, merges)
        assert(got == want, s"trial $trial word '$w' merges $merges: $got vs $want")
      }
    }
    // and on realistic trained tables with longer words
    val trained = graft.ops.BpeOps.DefaultMerges
    val model = new BpeModel(trained)
    val words = Seq("customer", "filibuster", "rowhashbatchscan", "a", "",
      "columncolumncolumn", "joinjoin", "zzzz")
    words.foreach { w =>
      assert(encodeWordPq(w, model) == encodeWord(w, trained), w)
    }
  }

  test("word cache is LRU: the head survives overflow, eldest is evicted") {
    val cache = graft.ops.BpeOps.newWordCache(capacity = 3)
    cache.put("hot", List("hot")); cache.put("b", List("b"))
    cache.put("c", List("c"))
    cache.get("hot")                  // touch: hot becomes most-recent
    cache.put("d", List("d"))         // overflow: evicts LRU "b", not "hot"
    assert(cache.containsKey("hot") && cache.containsKey("d"))
    assert(!cache.containsKey("b"))
    assert(cache.size() == 3)
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

  test("DefaultMerges is exactly trainBpe-to-saturation on the sf0.01 corpus (frozen provenance)") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    // requesting far more merges than the corpus supports must go dry
    // exactly at the frozen table: 89 merges, every vocab word one symbol
    val trained = BpeOps.trainBpe(docs, "text", numMerges = 1000)
    assert(trained == BpeOps.DefaultMerges, trained.toString)
    assert(trained.size == 89, s"saturation point moved: ${trained.size}")
  }

  test("tokenIds: lexicographic dense ids, order-preserving digest, empty docs kept") {
    import org.apache.spark.sql.functions.col
    val docs = Seq((1L, "b a b"), (2L, "a c"), (3L, null), (4L, "b"))
      .toDF("doc_id", "text")
    // single-char words survive any merge table: vocab = {a, b, c} ->
    // ids 1, 2, 3 in lex order
    val out = BpeOps.tokenIds(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    def m(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out(1L) == ((3L, m("2,1,2")))) // order preserved, not sorted
    assert(out(2L) == ((2L, m("1,3"))))
    assert(out(3L) == ((0L, m(""))))     // null text still emits a row
    assert(out(4L) == ((1L, m("2"))))
  }

  test("semantic survivors: one highest-quality doc per embedding cluster") {
    import org.apache.spark.sql.functions._
    import graft.ops.{GraphOps, SimilarityOps}
    // two exact clusters (identical vectors) + a singleton
    val emb = Seq(
      (1L, Array.fill(8)(1.0f)), (2L, Array.fill(8)(1.0f)),
      (3L, Array(1f, -1f, 1f, -1f, 1f, -1f, 1f, -1f)),
      (4L, Array(1f, -1f, 1f, -1f, 1f, -1f, 1f, -1f)),
      (5L, Array(0.2f, 0.9f, -0.4f, 0.1f, 0.5f, -0.8f, 0.3f, 0.6f)))
      .toDF("id", "vec")
    val docs = Seq((1L, 0.9), (2L, 0.2), (3L, 0.1), (4L, 0.8), (5L, 0.5))
      .toDF("doc_id", "quality")
    val pairs = SimilarityOps.embeddingNearDupPairs(emb, "id", "vec",
      minCosine = 0.99, nbits = 2)
    val out = GraphOps.nearDupSurvivors(docs, "doc_id", "quality", pairs,
        "a_id", "b_id")
      .select("doc_id").as[Long].collect().toSet
    // cluster {1,2} -> 1 (q 0.9); {3,4} -> 4 (q 0.8); 5 untouched
    assert(out == Set(1L, 4L, 5L), out.toString)
  }

  test("malformed graft_bpe_encode calls fail at analysis time on the driver") {
    graft.functions.GraftFunctions.register(spark)
    val df = Seq((1L, "abc")).toDF("id", "text")
    // each bad call must die in analysis (checkInputDataTypes), not
    // launch a job and fail per-task ×4 retries in the executor
    val noSep = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(call_function("graft_bpe_encode", col("text"),
        array(lit("noseparator"))))
    }
    assert(noSep.getMessage.contains("not 'left right'"), noSep.getMessage)
    val nonFoldable = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(call_function("graft_bpe_encode", col("text"),
        array(col("text"))))
    }
    assert(nonFoldable.getMessage.contains("foldable"), nonFoldable.getMessage)
    val wrongType = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(call_function("graft_bpe_encode", col("text"), lit(3)))
    }
    assert(wrongType.getMessage.contains("array<string>"), wrongType.getMessage)
  }

  test("NULL merges fails analysis cleanly; tiny maxVocab fails before collecting the world") {
    graft.functions.GraftFunctions.register(spark)
    val df = Seq((1L, "abc")).toDF("id", "text")
    val nullMerges = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(call_function("graft_bpe_encode", col("text"),
        lit(null).cast("array<string>")))
    }
    assert(nullMerges.getMessage.contains("must not be NULL"), nullMerges.getMessage)
    val docs = Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val blown = intercept[IllegalArgumentException] {
      BpeOps.tokenIds(docs, "doc_id", "text", maxVocab = 2).collect()
    }
    assert(blown.getMessage.contains("maxVocab"), blown.getMessage)
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
