package graft.core

import graft.ops.{DsirOps, SelectionOps, SimilarityOps, TextOps, WinnowOps}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

/** DSIR importance weights, winnowing fingerprints, curriculum
  * phases, token-budget selection, centroid outliers. */
class SelectionSpec extends SparkSpec {
  import spark.implicits._

  // ---- DSIR -------------------------------------------------------

  /** Independent reimplementation of the bucket hash (JDK MessageDigest,
    * not Spark md5) so the expected weights are derived outside the
    * engine under test. */
  private def bucketOf(tok: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(tok.getBytes("UTF-8"))
    d.take(2).map("%02x".format(_)).mkString.substring(0, 3)
  }

  test("dsir: hand-computed log weights, empty-doc null") {
    val docs = Seq(
      (1L, "alpha alpha alpha"),
      (2L, "alpha beta"),
      (3L, "beta beta beta beta"),
      (4L, "")).toDF("doc_id", "text")
    val out = DsirOps.importanceWeights(docs, "doc_id", "text", col("doc_id") === 1)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap

    // Expected model: raw alpha=4 beta=5 (Nr=9), target alpha=3 (Nt=3)
    val B = DsirOps.Buckets
    val bAlpha = bucketOf("alpha"); val bBeta = bucketOf("beta")
    assert(bAlpha != bBeta) // fixed strings; 1/4096 collision would void the arithmetic below
    def rMicro(tgt: Long, raw: Long): Long =
      math.round((math.log((tgt + 1).toDouble / (3 + B)) -
        math.log((raw + 1).toDouble / (9 + B))) * 1e6)
    val rA = rMicro(3, 4); val rB = rMicro(0, 5)
    def w(micro: Long): Double =
      BigDecimal(micro.toDouble / 1e6).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(1L) == ((3L, Some(w(3 * rA)))))
    assert(out(2L) == ((2L, Some(w(rA + rB)))))
    assert(out(3L) == ((4L, Some(w(4 * rB)))))
    assert(out(4L) == ((0L, None)))
    // target-like text scores above raw-like text
    assert(out(1L)._2.get > out(3L)._2.get)
  }

  // ---- Winnowing --------------------------------------------------

  test("winnow: fingerprint counts, short docs, shared-substring guarantee") {
    val k = 12; val w = 6
    val docs = Seq(
      (1L, "tiny"),                          // < k normalized chars: no fingerprints
      (2L, "exactly12chr"),                  // == k: one gram, one fingerprint
      (3L, "The quick brown fox jumps over the lazy dog near the river bank today"),
      (4L, "A COMPLETELY different start but quick brown fox jumps over the lazy dog too"),
      (5L, "unrelated content with zero overlap whatsoever in this string")
    ).toDF("doc_id", "text")
    val fp = WinnowOps.fingerprints(docs, "doc_id", "text", k, w)
    val byDoc = fp.groupBy("id").agg(count(lit(1)).as("n"), first("n_fp").as("nf"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(!byDoc.contains(1L))
    assert(byDoc(2L) == ((1L, 1L)))
    // n_fp equals the distinct-fingerprint row count for every doc
    byDoc.values.foreach { case (rows, nf) => assert(rows == nf) }

    // docs 3 and 4 share "quickbrownfoxjumpsoverthelazydog" (>= k+w-1
    // chars after whitespace strip) -> winnowing MUST give a shared
    // fingerprint; doc 5 shares nothing
    val pairs = WinnowOps.dupPairs(docs, "doc_id", "text", k, w,
      maxDf = 64, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((3L, 4L)))
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L))
  }

  test("winnow: identical docs share every fingerprint; df guard drops boilerplate") {
    val docs = Seq(
      (1L, "shared body of text that is long enough to fingerprint reliably"),
      (2L, "shared body of text that is long enough to fingerprint reliably"),
      (3L, "shared body of text that is long enough to fingerprint reliably")
    ).toDF("doc_id", "text")
    val nf = WinnowOps.fingerprints(docs, "doc_id", "text")
      .groupBy("id").count().collect().map(_.getLong(1)).toSet
    assert(nf.size == 1) // identical fingerprint cardinality
    val shared = WinnowOps.dupPairs(docs, "doc_id", "text", minShared = 1)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(shared.keySet == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    // every fingerprint shared in full
    assert(shared.values.toSet.size == 1)
    // maxDf=2 drops fingerprints present in all 3 docs -> no pairs survive
    assert(WinnowOps.dupPairs(docs, "doc_id", "text", maxDf = 2, minShared = 1)
      .count() == 0)
  }

  test("dupPairSpans: localization offsets track the shared-suffix shift") {
    // normalized prefixes of length 8 and 12, then an identical run:
    // every matched fingerprint sits at posB = posA + 4, so the span
    // endpoints shift by exactly the prefix-length difference
    val shared = "the shared passage sits here and is long enough to fingerprint well"
    val docs = Seq(
      (1L, "abcdefgh " + shared),
      (2L, "uvwxyzuvwxyz " + shared)).toDF("doc_id", "text")
    val r = WinnowOps.dupPairSpans(docs, "doc_id", "text", minShared = 1)
      .collect()
    assert(r.length == 1)
    val row = r(0)
    assert((row.getLong(0), row.getLong(1)) == ((1L, 2L)))
    assert(row.getLong(2) >= 1)                       // n_shared
    assert(row.getLong(4) - row.getLong(3)            // a_hi - a_lo
      == row.getLong(6) - row.getLong(5))             //  == b_hi - b_lo
    assert(row.getLong(5) - row.getLong(3) == 4L)     // b_lo - a_lo = 12 - 8
    // identical docs: spans coincide and every fingerprint matches
    val same = Seq((1L, shared), (2L, shared)).toDF("doc_id", "text")
    val s = WinnowOps.dupPairSpans(same, "doc_id", "text", minShared = 1)
      .collect()(0)
    assert(s.getLong(3) == s.getLong(5) && s.getLong(4) == s.getLong(6))
    val nFp = WinnowOps.fingerprints(same, "doc_id", "text")
      .where(col("id") === 1L).count()
    assert(s.getLong(2) == nFp)
  }

  test("verifiedPairs: exact Jaccard confirms true dups, rejects phrase-only overlap") {
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val phrase = "gamma delta epsilon zeta" // >= k+w-1 normalized chars
    val c = phrase + " totally different remainder content that shares nothing else at all here"
    val docs = Seq((1L, a), (2L, a), (3L, c)).toDF("doc_id", "text")
    val out = WinnowOps.verifiedPairs(docs, "doc_id", "text",
        minShared = 1, minJaccard = 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3))).toMap
    assert(out.keySet == Set((1L, 2L)))
    assert(out((1L, 2L)) == 1.0)
    // the phrase overlap IS a winnow candidate, just not a verified dup
    val cand = WinnowOps.dupPairs(docs, "doc_id", "text", minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cand.contains((1L, 3L)))
  }

  // ---- Curriculum -------------------------------------------------

  private val tokWeights =
    TextOps.QualityWeights(bias = 0.0, perToken = 0.1, punctRatio = 0.0,
      stopRatio = 0.0, avgTokenLen = 0.0, dup2gramFrac = 0.0)

  test("curriculum: quartile phases follow quality order, balanced on distinct scores") {
    val docs = (1L to 8L).map(i => (i, Seq.fill(i.toInt)("w").mkString(" ")))
      .toDF("doc_id", "text")
    val out = SelectionOps.curriculumPhases(docs, "doc_id", "text", tokWeights)
      .orderBy("quality").collect()
    assert(out.map(_.getInt(2)).toSeq == Seq(1, 1, 2, 2, 3, 3, 4, 4))
    // schedule key is the md5 coordinate — deterministic per id
    out.foreach { r =>
      val id = r.getLong(0)
      val exp = java.security.MessageDigest.getInstance("MD5")
        .digest(s"sched:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 16)
      assert(r.getString(3) == exp)
    }
  }

  // ---- Token budget -----------------------------------------------

  test("tokenBudgetSelect: greedy within budget, oversize first doc, per-group") {
    val docs = Seq(
      // group a: 4 docs x 3 tokens, increasing quality with doc_id
      (1L, "a", "w w w"), (2L, "a", "w w w w"), (3L, "a", "w w w w w"),
      (4L, "a", "w w w w w w"),
      // group b: single doc over budget
      (5L, "b", Seq.fill(20)("w").mkString(" "))).toDF("doc_id", "src", "text")
    val out = SelectionOps.tokenBudgetSelect(docs, "doc_id", "text", "src",
        budget = 11L, tokWeights)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap
    // group a: picks doc4 (6 toks) then doc3 (5 toks) = 11 <= 11; doc2 would exceed
    val a = out("a")
    assert(a._1 == 4L && a._2 == 2L && a._3 == 11L)
    // cutoff = quality of the last doc admitted (doc3: 5 tokens)
    val q3 = BigDecimal(1.0 / (1.0 + math.exp(-0.5)))
      .setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(a._4.contains(q3))
    // group b: first doc alone exceeds the budget -> nothing kept
    assert(out("b") == ((1L, 0L, 0L, None)))
  }

  test("leakage-safe split: dup clusters never straddle a split boundary") {
    // two exact-dup clusters + singletons — assemble the same
    // composition as q160 on a toy corpus
    val dup1 = "a shared document body long enough to winnow and verify reliably"
    val dup2 = "another distinct duplicated body that also exceeds the gram threshold"
    val docs = Seq(
      (1L, dup1), (2L, dup1), (3L, dup1),
      (10L, dup2), (11L, dup2),
      (20L, "a unique singleton document with its own content entirely"),
      (21L, "a different singleton that matches nothing else at all")
    ).toDF("doc_id", "text")
    val comps = graft.ops.GraphOps.connectedComponents(
      WinnowOps.verifiedPairs(docs, "doc_id", "text",
        minShared = 1, minJaccard = 0.5)
        .select(col("id_a"), col("id_b")),
      "id_a", "id_b")
    val out = docs.select(col("doc_id"))
      .join(comps.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("comp"), col("doc_id")).as("component"))
      .withColumn("split", graft.ops.SampleOps.assignSplit(
        col("component"), Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
        salt = "split1"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    // one component, one split side per cluster
    assert(Set(1L, 2L, 3L).map(out(_)).size == 1)
    assert(Set(10L, 11L).map(out(_)).size == 1)
    assert(out(1L)._1 != out(10L)._1)
    // singletons keep their id as component — identical to the plain
    // q69 per-doc split for non-dup docs
    assert(out(20L)._1 == 20L && out(21L)._1 == 21L)
  }

  test("distinctN: hand-computed diversity, single-token group") {
    val docs = Seq(
      (1L, "a", "x y x y"), (2L, "a", "x z"),
      (3L, "b", "solo")).toDF("doc_id", "src", "text")
    val out = TextOps.distinctN(docs, "src", "text")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap
    // group a: unigrams x y x y x z -> 6 total, 3 distinct
    // bigrams: "x y","y x","x y" + "x z" -> 4 total, 3 distinct
    assert(out("a")._1 == 6L && out("a")._2 == 0.5)
    assert(out("a")._3 == 4L && out("a")._4.contains(0.75))
    // group b: one token, no bigrams -> distinct_2 null
    assert(out("b") == ((1L, 1.0, 0L, None)))
  }

  test("sftTokenRows: prompt/completion masks, truncation, empty doc") {
    import graft.ops.PackOps
    val docs = Seq(
      (1L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"),
      (2L, "")).toDF("doc_id", "text")
    val out = PackOps.sftTokenRows(docs, "doc_id", "text",
        promptTokens = 3, maxLen = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
    assert(out.forall(_._1 == 1L)) // empty doc emits nothing
    assert(out.sortBy(_._2).toSeq == Seq(
      (1L, 0, "t0", 0), (1L, 1, "t1", 0), (1L, 2, "t2", 0),
      (1L, 3, "t3", 1), (1L, 4, "t4", 1)))
  }

  test("tokenOffsets: two-level prefix sum is contiguous and gap-free") {
    import graft.ops.PackOps
    val docs = Seq(
      (1L, "a", "w w w"), (2L, "a", "w w w w"),
      (3L, "b", "w w w w w"), (4L, "b", "w")).toDF("doc_id", "src", "text")
    val out = PackOps.tokenOffsets(docs, "doc_id", "text", "src")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out(1L) == (("a", 3L, 0L)))
    assert(out(2L) == (("a", 4L, 3L)))
    assert(out(3L) == (("b", 5L, 7L)))   // base of b = total of a
    assert(out(4L) == (("b", 1L, 12L)))
    // global invariant: sorted by offset, each doc starts where the
    // previous one ends
    val sorted = out.values.toSeq.sortBy(_._3)
    sorted.sliding(2).foreach {
      case Seq((_, n, off), (_, _, off2)) => assert(off + n == off2)
      case _ =>
    }
  }

  test("null text is handled without crashing across the new operators") {
    val docs = Seq((1L, "some real text content here"), (2L, null))
      .toDF("doc_id", "text")
    // winnow: null normalizes to no fingerprints
    assert(WinnowOps.fingerprints(docs, "doc_id", "text")
      .where(col("id") === 2L).count() == 0)
    // dsir: null doc scores as token-less (0, null)
    val w = DsirOps.importanceWeights(docs, "doc_id", "text",
      col("doc_id") === 1).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(w(2L) == 0L)
    // sft assembly and offsets: null emits nothing / counts zero
    assert(graft.ops.PackOps.sftTokenRows(docs, "doc_id", "text")
      .where(col("id") === 2L).count() == 0)
    val off = graft.ops.PackOps.tokenOffsets(docs, "doc_id", "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(off(2L) == 0L)
    // distinct-n: the null doc contributes no tokens
    val dn = TextOps.distinctN(docs.withColumn("g", lit("x")), "g", "text")
      .collect()(0)
    assert(dn.getLong(1) == 5L)
  }

  test("boilerplateMiner: planted footer dominates its group's top fingerprints") {
    val footer = " subscribe to the shared footer that repeats on every page here"
    def hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // md5 bodies: fully distinct AND fixed-length, so the footer sits
    // at the same offset in every doc (aligned windows -> interior
    // footer fingerprints selected identically, df exactly 6)
    val docs = (1L to 8L).map { i =>
      val body = hex(s"body$i")
      (i, "siteA", if (i <= 6) body + footer else body)
    }.toDF("doc_id", "src", "text")
    val out = WinnowOps.boilerplateMiner(docs, "doc_id", "text", "src",
        topK = 3, minDf = 4)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(4)))
    assert(out.nonEmpty && out.forall(_._1 == "siteA"))
    // the rank-1 fingerprint is the footer's: shared by exactly the
    // 6 footer docs, absent from the rest
    val top = out.find(_._4 == 1).get
    assert(top._3 == 6L)
    val fps = WinnowOps.fingerprints(docs, "doc_id", "text")
      .where(col("fp") === top._2).select("id")
      .collect().map(_.getLong(0)).toSet
    assert(fps == (1L to 6L).toSet)
  }

  test("refOverlap: copied candidate fully known, fresh candidate fully novel") {
    val refDoc = "the reference corpus already contains this exact passage verbatim today"
    val ref = Seq((100L, refDoc), (101L, "other reference content that is long enough"))
      .toDF("doc_id", "text")
    val cand = Seq(
      (1L, refDoc),                                       // verbatim re-crawl
      (2L, "completely fresh new content never seen before anywhere at all"),
      (3L, "x")).toDF("doc_id", "text")                   // too short
    val out = WinnowOps.refOverlap(cand, ref, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(out(1L)._1 > 0 && out(1L)._3.contains(1.0))    // every fp known
    assert(out(2L)._2 == 0L && out(2L)._3.contains(0.0))  // nothing known
    assert(out(3L) == ((0L, 0L, None)))
  }

  test("thresholdSweep: counts are monotone non-increasing in the threshold") {
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val docs = Seq((1L, a), (2L, a),
      (3L, a + " with a divergent tail appended to lower the jaccard score")
    ).toDF("doc_id", "text")
    val r = WinnowOps.thresholdSweep(docs, "doc_id", "text",
      minShared = 1).collect()(0)
    val counts = (1 to 4).map(r.getLong)
    assert(r.getLong(0) == 3L)               // all 3 pairs are candidates
    assert(counts == counts.sorted.reverse)  // monotone
    assert(counts.head == 3L)                // all pairs >= 0.3 here
    assert(counts.last == 1L)                // only the exact dup >= 0.9
  }

  // ---- Centroid outliers ------------------------------------------

  test("centroidOutliers: planted outlier ranks first, exact distance, per-label topK") {
    val rows = Seq(
      (1L, Array(0.0f, 0.0f), 0), (2L, Array(0.2f, 0.0f), 0),
      (3L, Array(-0.2f, 0.0f), 0), (4L, Array(4.0f, 4.0f), 0),
      (5L, Array(1.0f, 1.0f), 1), (6L, Array(1.0f, 1.2f), 1))
    val emb = rows.toDF("vec_id", "embedding", "label")
    val out = SimilarityOps.centroidOutliers(emb, "vec_id", "embedding", "label", topK = 2)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    // label 0 centroid = (1.0, 1.0); v4 distance = sqrt(9+9)
    val top0 = out.filter(_._1 == 0)
    assert(top0.map(_._4).sorted.toSeq == Seq(1, 2))
    val first = top0.find(_._4 == 1).get
    assert(first._2 == 4L)
    val expDist = BigDecimal(math.sqrt(9.0 + 9.0))
      .setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(first._3 == expDist)
    // label 1: only 2 members, both reported, rn bounded by topK
    assert(out.count(_._1 == 1) == 2)
    assert(out.forall(_._4 <= 2))
  }
}
