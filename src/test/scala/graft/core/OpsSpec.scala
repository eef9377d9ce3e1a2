package graft.core

import graft.core.format.CsvIO
import graft.core.model.CoringFormats._
import graft.core.ops.SectionSummaryOps
import graft.ops.DedupOps
import org.apache.spark.sql.functions._

class OpsSpec extends SparkSpec {
  import spark.implicits._

  test("A1: per-core range excludes CC sections, rounds to 3dp") {
    val ss = CsvIO.load(spark, s"$RefData/GLAD9_SectionSummary.csv", SectionSummaryFormat)
    val r = SectionSummaryOps.coreRanges(ss)
      .filter(col("Site") === "1" && col("Hole") === "A" && col("Core") === "1")
      .head()
    // core 1A-1: sections 1,2,9 span 0.1 .. 2.863
    assert(r.getDouble(3) == 0.1 && r.getDouble(4) == 2.863)
    // synthetic: a CC section must not extend its core's range
    val synth = Seq(
      ("1", "A", "1", "1", 0.0, 1.5), ("1", "A", "1", "2", 1.5, 3.0),
      ("1", "A", "1", "CC", 3.0, 3.4))
      .toDF("Site", "Hole", "Core", "Section", "TopDepth", "BottomDepth")
    val rng = SectionSummaryOps.coreRanges(synth).head()
    assert(rng.getDouble(3) == 0.0 && rng.getDouble(4) == 3.0)
  }

  test("O4: gap-column consolidation") {
    val df = Seq(
      ("s1", Some(0.0), Some(0.5), Some(94.5), Some(96.0)),
      ("s2", None: Option[Double], None: Option[Double], None: Option[Double], None: Option[Double]),
      ("s3", Some(1.0), Some(2.0), None: Option[Double], None: Option[Double]))
      .toDF("Section", "Gap 1 T", "Gap 1 B", "Gap 2 T", "Gap 2 B")
    val out = SectionSummaryOps.consolidateGapColumns(df, 2)
      .orderBy("Section").select("Gaps").collect().map(_.getString(0))
    assert(out(0) == "0.0-0.5 94.5-96.0")
    assert(out(1) == "")
    assert(out(2) == "1.0-2.0")
  }

  test("splice diagnostics surface the reference's warnings as a dataset") {
    import graft.core.splice.SpliceDiagnostics
    val ss = CsvIO.load(spark, s"$RefData/GLAD9_SectionSummary.csv",
      SectionSummaryFormat, withSeq = true)
    val sp = CsvIO.load(spark, s"$RefData/GLAD9_Site1_SparseSplice.csv",
      SparseSpliceFormat, withSeq = true)
    val diags = SpliceDiagnostics.inputDiagnostics(spark, sp, ss).collect()
    // the reference's own run warns on 1B-19-3 (offset 115cm > 0.14m)
    assert(diags.exists(r => r.getString(1) == "OFFSET_BEYOND_CURATED_LENGTH" &&
      r.getString(2).contains("1B-19")), diags.mkString("\n"))
    assert(!diags.exists(_.getString(1).startsWith("MISSING_")), diags.mkString("\n"))
    // doctored: a sparse row pointing at a nonexistent section
    val bad = sp.limit(1).withColumn("TopSection", org.apache.spark.sql.functions.lit("99"))
    val missing = SpliceDiagnostics.inputDiagnostics(spark, bad, ss).collect()
    assert(missing.exists(_.getString(1) == "MISSING_TOP_SECTION"), missing.mkString("\n"))
  }

  test("approx_count_distinct within its stated error bound of the exact count") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val both = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("exact"),
        approx_count_distinct(col("l_partkey"), 0.02).as("approx"))
      .collect()
    both.foreach { r =>
      val (exact, approx) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      assert(math.abs(approx - exact) / exact <= 0.06,
        s"${r.getString(0)}: approx $approx vs exact $exact")
    }
  }

  test("approx_percentile lands within its rank-accuracy bound of the exact median") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val n = li.count()
    val approx = li.agg(expr("approx_percentile(l_extendedprice, 0.5D, 100)"))
      .head().getDouble(0)
    // the sketch guarantees rank error <= n/accuracy; verify the rank
    // of the returned value, not its magnitude
    val rank = li.filter(col("l_extendedprice") <= approx).count()
    assert(math.abs(rank - n / 2.0) <= n / 100.0 + 1,
      s"approx median $approx has rank $rank of $n")
  }

  test("salted join equals plain join; hot-key detection finds the skew") {
    import graft.ops.SkewOps
    // one hot key (0) with 5000 rows, long tail of singletons
    val big = ((1 to 5000).map(i => (0L, i)) ++ (1 to 500).map(i => (i.toLong, i)))
      .toDF("k", "payload")
    val dim = (0L to 500L).map(k => (k, s"dim_$k")).toDF("k", "label")
    val plain = big.join(dim, Seq("k")).orderBy("k", "payload").collect()
    val salted = SkewOps.saltedJoin(big, dim, "k", buckets = 8)
      .orderBy("k", "payload").collect()
    assert(salted.length == plain.length)
    assert(salted.map(_.toSeq).toSeq == plain.map(_.toSeq).toSeq)
    val hot = SkewOps.hotKeys(big, "k", threshold = 1000).collect()
    assert(hot.map(_.getLong(0)).toSeq == Seq(0L))
    val hc = SkewOps.hotColdJoin(big, dim, "k", Seq(0L)).orderBy("k", "payload").collect()
    assert(hc.map(_.toSeq).toSeq == plain.map(_.toSeq).toSeq)
  }

  test("graft_minhash_sig is bit-identical to k separate min(xxhash64(i, s)) aggregates") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight nine ten"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta")).toDF("doc_id", "text")
    // repartition forces cross-partition partial buffers through the
    // aggregate's serialize/merge path
    val sh = DedupOps.wordShingles(docs, "doc_id", "text", 2).repartition(8)
    val k = 8
    val native = DedupOps.minHash(sh, k)
    val composed = sh.groupBy("id").agg(
      min(xxhash64(lit(0), col("shingle"))).as("mh_0"),
      (1 until k).map(i => min(xxhash64(lit(i), col("shingle"))).as(s"mh_$i")): _*)
    assert(native.exceptAll(composed).isEmpty && composed.exceptAll(native).isEmpty)
  }

  test("graft_simhash is bit-identical to the composed 64-column bit-sum fold") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six seven"),
      (3L, "mixed content alpha two zeta nine")).toDF("doc_id", "text")
    val native = DedupOps.simHash(docs.repartition(8), "doc_id", "text")
    // the pre-round-4 composed form, kept as the executable spec
    val tok = explode(filter(split(lower(col("text")), "\\s+"), _ =!= "")).as("tok")
    val bitSums = (0 until 64).map { b =>
      sum(shiftright(col("h"), b).bitwiseAND(lit(1L)) * 2 - 1).as(s"s_$b")
    }
    val folded = (0 until 64)
      .map(b => when(col(s"s_$b") > 0, shiftleft(lit(1L), b)).otherwise(lit(0L)))
      .reduce(_.bitwiseOR(_))
    val composed = docs.select(col("doc_id").as("id"), tok)
      .select(col("id"), xxhash64(col("tok")).as("h"))
      .groupBy("id").agg(bitSums.head, bitSums.tail: _*)
      .select(col("id"), folded.as("simhash"))
    assert(native.exceptAll(composed).isEmpty && composed.exceptAll(native).isEmpty)
  }

  test("dedup cross-method invariant: exact duplicates are caught by every path") {
    val text = "the quick brown fox jumps over the lazy dog again and again today"
    val other = "completely different content about geology and sediment cores here now"
    val docs = Seq((1L, text), (2L, text), (3L, other)).toDF("doc_id", "text")

    // exact: one group of two copies
    val groups = DedupOps.exactDupGroups(docs, "doc_id", "text")
      .filter(col("n_copies") > 1).collect()
    assert(groups.length == 1 && groups.head.getAs[Long]("n_copies") == 2)

    // jaccard: the duplicate pair at exactly 1.0, no cross pair at 1.0
    val sh = DedupOps.wordShingles(docs, "doc_id", "text", 3)
    val jac = DedupOps.ngramJaccardPairs(sh, minJaccard = 0.99,
      sizesProvided = true).collect()
    assert(jac.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))

    // minhash+LSH: identical signatures bucket together with est 1.0
    val mh = DedupOps.minHashLshPairs(docs, "doc_id", "text", minEstJaccard = 0.99)
      .collect()
    assert(mh.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))

    // simhash: identical codes, hamming 0; the unrelated doc differs
    val simhashes = DedupOps.simHash(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(simhashes(1L) == simhashes(2L))
    assert(simhashes(1L) != simhashes(3L))
  }

  test("token stats and repetition metrics match hand counts") {
    import graft.ops.TextOps
    val docs = Seq(
      (1L, "a a a b"),          // 4 tokens, 2 distinct, top=3
      (2L, "x y z"),            // all distinct
      (3L, "go go go go"),      // 4 tokens, 1 distinct
      (4L, "solo"))             // 1 token — no 2-grams
      .toDF("doc_id", "text")
    val ts = TextOps.tokenStats(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(ts(1L).getLong(1) == 4 && ts(1L).getLong(2) == 2 && ts(1L).getLong(3) == 3)
    assert(ts(1L).getDouble(4) == 0.75 && ts(1L).getDouble(5) == 0.5)
    assert(ts(2L).getDouble(5) == 0.0)
    assert(ts(3L).getDouble(4) == 1.0 && ts(3L).getDouble(5) == 0.75)

    val rm = TextOps.repetitionMetrics(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    // doc 1 2-grams: [a a, a a, a b] -> 1 dup of 3; chars 3+3+3 dup 3/9
    assert(rm(1L).getDouble(1) == 0.33333)
    assert(rm(1L).getDouble(2) == 0.33333)
    // doc 3 2-grams: [go go]x3 -> dup 2/3; 3-grams [go go go]x2 -> 1/2
    assert(rm(3L).getDouble(1) == 0.66667 && rm(3L).getDouble(3) == 0.5)
    // doc 4: no grams at all -> all zeros, no division error
    assert(rm(4L).getDouble(1) == 0.0 && rm(4L).getDouble(3) == 0.0)
  }

  test("contamination overlap counts benchmark grams; benchmark side broadcasts") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps"),  // shares "the quick brown", "quick brown fox"
      (2L, "totally unrelated words here"))
      .toDF("doc_id", "text")
    val bench = Seq((100L, "the quick brown fox"))
      .toDF("doc_id", "text")
    val out = DedupOps.contaminationOverlap(corpus, bench, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) -> r).toMap
    // doc 1 has 3 distinct 3-grams, 2 of them in the benchmark set
    assert(out(1L).getLong(1) == 3 && out(1L).getLong(2) == 2)
    assert(out(1L).getDouble(3) == 0.66667)
    assert(!out.contains(2L)) // zero-overlap docs don't appear
    val plan = DedupOps.contaminationOverlap(corpus, bench, "doc_id", "text", 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoop"),
      s"benchmark gram set must broadcast:\n$plan")
  }

  test("PII scrub redacts every detected pattern and only those") {
    import graft.ops.TextOps
    val df = Seq(
      (1L, "mail a.b+c@ex-ample.co.uk then 192.168.1.10 or 555-123-4567 end"),
      (2L, "clean text, version 1.2 build 3.4.5, ext 12345"),
      (3L, "two mails x@y.io z@w.ai"))
      .toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
      TextOps.emailCount(col("text")).as("e"),
      TextOps.ipv4Count(col("text")).as("i"),
      TextOps.phoneCount(col("text")).as("p"),
      TextOps.redactPii(col("text")).as("r"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getInt(1) == 1 && out(1L).getInt(2) == 1 && out(1L).getInt(3) == 1)
    assert(out(1L).getString(4) == "mail <PII> then <PII> or <PII> end")
    // version strings and short numbers are NOT eaten
    assert(out(2L).getInt(1) == 0 && out(2L).getInt(2) == 0 && out(2L).getInt(3) == 0)
    assert(out(2L).getString(4) == "clean text, version 1.2 build 3.4.5, ext 12345")
    assert(out(3L).getInt(1) == 2 && out(3L).getString(4) == "two mails <PII> <PII>")
  }

  test("curation funnel: each stage drops exactly the crafted offenders") {
    import graft.ops.CurationPipeline
    val uniq = (1 to 40).map(i => s"tok$i").mkString(" ")
    val cont = (1 to 30).map(i => s"cont$i").mkString(" ")
    val corpus = Seq(
      (1L, s"the $uniq"),        // passes everything
      (2L, Seq.fill(50)("x").mkString(" ")), // no en markers (also repetitive)
      (3L, "the quick brown fox jumps over the lazy dog"), // too short
      (4L, s"the $cont"),        // contaminated vs the benchmark
      (5L, s"the  $uniq"))       // doc 1 duplicate modulo whitespace
      .toDF("doc_id", "text")
    val bench = Seq((100L, cont)).toDF("doc_id", "text")
    val f = CurationPipeline.funnel(corpus, bench, "doc_id", "text").head()
    assert(f.getLong(0) == 5, "n_total")
    assert(f.getLong(1) == 4, "n_len: doc 3 dropped")
    assert(f.getLong(2) == 3, "n_lang: doc 2 dropped")
    assert(f.getLong(3) == 3, "n_rep: nothing new dropped")
    assert(f.getLong(4) == 2, "n_clean: doc 4 dropped")
    assert(f.getLong(5) == 1, "n_dedup: docs 1/5 share a fingerprint")
    val kept = CurationPipeline.curate(corpus, bench, "doc_id", "text").collect()
    assert(kept.length == 1 && kept.head.getLong(0) == 1L,
      s"curate keeps doc 1: ${kept.mkString(",")}")
  }

  test("keepBest keeps the top scorer per key, lowest id on ties") {
    val docs = Seq(
      (1L, "k1", 10L), (2L, "k1", 30L), (3L, "k1", 30L),
      (4L, "k2", 5L))
      .toDF("doc_id", "fp", "score")
    val out = DedupOps.keepBest(docs, "doc_id", col("fp"), col("score"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("k1").getLong(1) == 2L)   // ties 2,3 at 30 -> lowest id
    assert(out("k1").getLong(2) == 30L && out("k1").getLong(3) == 3L)
    assert(out("k2").getLong(1) == 4L && out("k2").getLong(3) == 1L)
  }

  test("keepBest never elects a NULL-scored document over a scored one") {
    // Bare ascending struct ordering sorts nulls FIRST — a null score
    // would beat every real one. The coalesce(−score, +Inf) fix makes
    // unscored docs lose; an all-null cluster still resolves (lowest id).
    val docs = Seq(
      (1L, "k1", Some(2L)), (2L, "k1", None), (3L, "k1", Some(7L)),
      (4L, "k2", None), (5L, "k2", None))
      .toDF("doc_id", "fp", "score")
    val out = DedupOps.keepBest(docs, "doc_id", col("fp"), col("score"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("k1").getLong(1) == 3L, "scored doc beats null-scored")
    assert(out("k2").getLong(1) == 4L, "all-null cluster keeps lowest id")
  }

  test("jaccard safe path ignores an unrelated n_sh column and derives sizes") {
    // A caller-supplied frame with a bogus n_sh column must NOT be
    // trusted as wordShingles output: denominators are derived from
    // the distinct (id, shingle) rows unless sizesProvided = true.
    val sh = Seq(
      (1L, "a a a", 999L), (1L, "b b b", 999L),
      (2L, "a a a", 999L), (2L, "b b b", 999L), (2L, "b b b", 999L))
      .toDF("id", "shingle", "n_sh")
    val out = DedupOps.ngramJaccardPairs(sh, 0.1).collect()
    assert(out.length == 1)
    val r = out.head
    // |A|=2, |B|=2 (duplicate row deduped), |A∩B|=2 -> jaccard 1.0
    assert(r.getAs[Long]("n_a") == 2L && r.getAs[Long]("n_b") == 2L)
    assert(r.getAs[Double]("jaccard") == 1.0)
  }

  test("zValue rejects bit widths that would wrap 64-bit shifts") {
    import graft.ops.LayoutOps
    intercept[IllegalArgumentException] { LayoutOps.zValue(col("x"), 0, 1, col("y"), 0, 1, bits = 32) }
    intercept[IllegalArgumentException] { LayoutOps.zValue(col("x"), 0, 1, col("y"), 0, 1, bits = 0) }
  }

  test("connectedComponents closes chains, honors duplicates/reversed edges") {
    import graft.ops.GraphOps
    // Two components: a 5-node CHAIN (diameter 4 — forces multiple
    // propagation rounds) and a pair; duplicate + reversed edges must
    // not change the result. Nodes appear only via edges.
    val edges = Seq(
      (2L, 1L), (2L, 3L), (3L, 4L), (5L, 4L), (5L, 4L), (4L, 3L),
      (10L, 11L))
      .toDF("src", "dst")
    val cc = GraphOps.connectedComponents(edges, "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("connectedComponents maxIter caps rounds but still labels every node") {
    import graft.ops.GraphOps
    val chain = (1L until 8L).map(i => (i, i + 1)).toDF("src", "dst")
    // maxIter caps the DISTRIBUTED loop; force it (the driver fast
    // path always merges fully and ignores the cap)
    val capped = GraphOps.connectedComponents(chain, "src", "dst",
        maxIter = 1, driverMaxEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(capped.keySet == (1L to 8L).toSet)
    // init gives min(self, neighbors); one loop round propagates one
    // more hop (8 -> 7 at init, hears 7's label 6) — not yet all 1
    assert(capped(8L) == 6L && capped(1L) == 1L)
    val full = GraphOps.connectedComponents(chain, "src", "dst")
      .collect().map(r => r.getLong(1)).toSet
    assert(full == Set(1L))
  }

  test("nearDupSurvivors keeps the best per cluster and all untouched docs") {
    import graft.ops.GraphOps
    val docs = Seq(
      (1L, "a", 10L), (2L, "b", 30L), (3L, "c", 20L), // cluster 1-2-3
      (7L, "d", 5L),                                   // untouched
      (8L, "e", 4L), (9L, "f", 4L))                    // cluster 8-9, tie
      .toDF("doc_id", "text", "n_chars")
    val pairs = Seq((1L, 2L), (2L, 3L), (8L, 9L)).toDF("a_id", "b_id")
    val out = GraphOps.nearDupSurvivors(docs, "doc_id", "n_chars",
      pairs, "a_id", "b_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out == Set(2L, 7L, 8L)) // 2: top score; 7: no edges; 8: tie->low id
  }

  test("weightedPriority: deterministic, nested, weight-biased, guards zero weights") {
    import graft.ops.SampleOps
    import org.apache.spark.sql.functions.{col, when}
    // weights 1 vs 100: heavy rows must dominate the selection
    val df = spark.range(0, 2000).toDF("id")
      .withColumn("w", when(col("id") < 1000, 100.0).otherwise(1.0))
    val top = SampleOps.weightedPriority(df, "id", "w", 200, "t1")
      .collect().map(_.getLong(0)).toSet
    assert(top.size == 200)
    val heavy = top.count(_ < 1000)
    assert(heavy > 180, s"expected heavy-weight dominance, got $heavy/200")
    // partition invariance
    val again = SampleOps.weightedPriority(df.repartition(11), "id", "w", 200, "t1")
      .collect().map(_.getLong(0)).toSet
    assert(again == top)
    // nesting: larger n strictly extends (keys never move)
    val wider = SampleOps.weightedPriority(df, "id", "w", 300, "t1")
      .collect().map(_.getLong(0)).toSet
    assert(top.subsetOf(wider))
    // zero/null weights can never be selected
    val z = df.withColumn("w", when(col("id") === 5, 0.0).otherwise(col("w")))
    assert(!SampleOps.weightedPriority(z, "id", "w", 2000, "t1")
      .collect().map(_.getLong(0)).contains(5L))
  }

  test("deterministic sampling: partition-invariant, rate-accurate, salt-independent") {
    import graft.ops.SampleOps
    val ids = spark.range(0, 20000).toDF("id")
    val a = SampleOps.deterministicSample(ids, "id", 0.3, "s1")
      .collect().map(_.getLong(0)).toSet
    // same rows regardless of physical layout
    val b = SampleOps.deterministicSample(ids.repartition(7), "id", 0.3, "s1")
      .collect().map(_.getLong(0)).toSet
    assert(a == b)
    // empirical rate ~ Binomial(20000, 0.3): ±5σ ≈ ±0.016
    assert(math.abs(a.size / 20000.0 - 0.3) < 0.017, s"rate ${a.size / 20000.0}")
    // different salt = independent draw, overlap ~ 0.09 of corpus
    val c = SampleOps.deterministicSample(ids, "id", 0.3, "s2")
      .collect().map(_.getLong(0)).toSet
    val overlap = (a & c).size / 20000.0
    assert(math.abs(overlap - 0.09) < 0.02, s"overlap $overlap")
    // nesting: a smaller fraction under the SAME salt is a subset
    val nested = SampleOps.deterministicSample(ids, "id", 0.1, "s1")
      .collect().map(_.getLong(0)).toSet
    assert(nested.subsetOf(a))
    // degenerate fractions
    assert(SampleOps.deterministicSample(ids, "id", 1.0, "s1").count() == 20000)
    assert(SampleOps.deterministicSample(ids, "id", 0.0, "s1").count() == 0)
  }

  test("split assignment is exhaustive, exclusive, and rate-accurate") {
    import graft.ops.SampleOps
    val ids = spark.range(0, 20000).toDF("id")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val assigned = ids.withColumn("split",
      SampleOps.assignSplit(col("id"), splits, "sp"))
    val counts = assigned.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 20000) // every row exactly one label
    assert(math.abs(counts("train") / 20000.0 - 0.8) < 0.02)
    assert(math.abs(counts("val") / 20000.0 - 0.1) < 0.015)
    assert(math.abs(counts("test") / 20000.0 - 0.1) < 0.015)
    // mixture: per-stratum rates follow their own fractions
    val strat = ids.withColumn("src",
      concat(lit("src"), (col("id") % 2).cast("string")))
    val kept = strat.filter(SampleOps.mixturePredicate(col("id"), col("src"),
        Map("src0" -> 0.5), default = 0.1, salt = "m"))
      .groupBy("src").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(kept("src0") / 10000.0 - 0.5) < 0.03)
    assert(math.abs(kept("src1") / 10000.0 - 0.1) < 0.02)
  }

  test("null keys: assignSplit yields NULL, samplers drop — never a silent label") {
    import graft.ops.SampleOps
    val df = Seq(Some(1L), Some(2L), None).toDF("id")
    val splits = Seq("train" -> 0.5, "test" -> 0.5)
    val out = df.withColumn("split",
        SampleOps.assignSplit(col("id"), splits, "sp"))
      .collect().map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0))) ->
        Option(r.getString(1))).toMap
    assert(out(None).isEmpty, "null key must get a NULL split, not 'test'")
    assert(out(Some(1L)).nonEmpty && out(Some(2L)).nonEmpty)
    // filter-based samplers: NULL coordinate -> predicate NULL ->
    // dropped, at ANY fraction (even keep-everything)
    assert(SampleOps.deterministicSample(df, "id", 1.0, "s").count() == 2)
  }

  test("line dedup removes corpus-frequent lines, keeps order, survives full removal") {
    import graft.ops.TextOps
    val docs = Seq(
      (1L, "keep one\nBOILER\nkeep two"),
      (2L, "BOILER\nunique here"),
      (3L, "BOILER"), // every line banned -> empty survivor
      (4L, "solo line"))
      .toDF("doc_id", "text")
    val out = TextOps.lineDedup(docs, "doc_id", "text", minDupCount = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((3, 2L, "keep one\nkeep two"))) // order kept
    assert(out(2L) == ((2, 1L, "unique here")))
    assert(out(3L) == ((1, 0L, ""))) // doc not dropped
    assert(out(4L) == ((1, 1L, "solo line")))
  }

  test("bm25 matches the closed-form score on a hand corpus") {
    import graft.ops.TextOps
    val docs = Seq(
      (1L, "spark join spark"), (2L, "join fast"), (3L, "slow code"))
      .toDF("doc_id", "text")
    val out = TextOps.bm25(docs, "doc_id", "text", Seq("spark", "join"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // independent arithmetic path: plain Scala doubles, same formula
    val n = 3.0; val avgdl = (3 + 2 + 2) / 3.0
    def idf(df: Double) = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    def w(tf: Double, df: Double, dl: Double) =
      idf(df) * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
    def r5(x: Double) = BigDecimal(x).setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(1L) == r5(w(2, 1, 3) + w(1, 2, 3)))
    assert(out(2L) == r5(w(1, 2, 2)))
    assert(!out.contains(3L)) // no query term, no score
    assert(out(1L) > out(2L)) // tf + rarity dominate
  }

  test("tfidf weights match the closed-form values; minDf prunes rare terms") {
    import graft.ops.TextOps
    val docs = Seq(
      (1L, "spark join spark"), (2L, "join fast"), (3L, "slow code join"))
      .toDF("doc_id", "text")
    val out = TextOps.tfidfWeights(docs, "doc_id", "text", minDf = 2)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(4)).toMap
    // only "join" appears in >= 2 docs; smoothed idf = ln((N+1)/(df+1))+1
    val idfJoin = math.log(4.0 / 4.0) + 1.0
    assert(out.keySet == Set((1L, "join"), (2L, "join"), (3L, "join")), out.toString)
    assert(out((1L, "join")) == 1.0 * idfJoin)
    // with minDf=1 every term scores and tf multiplies
    val all = TextOps.tfidfWeights(docs, "doc_id", "text", minDf = 1)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(4)).toMap
    val idfSpark = math.log(4.0 / 2.0) + 1.0
    assert(all((1L, "spark")) == 2.0 * idfSpark, all.toString)
    assert(all.size == 7, all.toString) // 2+2+3 distinct (doc, term) pairs
  }

  test("stratified take: exact n per stratum, deterministic, nested") {
    import graft.ops.SampleOps
    val df = spark.range(0, 3000).toDF("id")
      .withColumn("src", concat(lit("s"), (col("id") % 3).cast("string")))
    val take5 = SampleOps.stratifiedTake(df, "id", "src", 5, "st")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(take5.length == 15)
    assert(take5.groupBy(_._2).view.mapValues(_.length).toMap ==
      Map("s0" -> 5, "s1" -> 5, "s2" -> 5))
    // physical layout does not change the chosen rows
    val relaid = SampleOps.stratifiedTake(df.repartition(7), "id", "src", 5, "st")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(take5.toSet == relaid.toSet)
    // smaller n under the same salt is a prefix (subset) of larger n
    val take3 = SampleOps.stratifiedTake(df, "id", "src", 3, "st")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(take3.toSet.subsetOf(take5.toSet))
  }

  test("token chunking covers every token with the stated overlap") {
    import graft.ops.PackOps
    val docs = Seq(
      (1L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"), // 10 tokens
      (2L, "a b"))                            // shorter than one chunk
      .toDF("doc_id", "text")
    val out = PackOps.chunkTokens(docs, "doc_id", "text", chunkSize = 4, overlap = 1)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> ((r.getInt(2), r.getString(3))))
      .toMap
    assert(out((1L, 0)) == ((4, "t1 t2 t3 t4")))
    assert(out((1L, 1)) == ((4, "t4 t5 t6 t7"))) // one-token overlap
    assert(out((1L, 2)) == ((4, "t7 t8 t9 t10"))) // truncates at doc end
    assert(out((2L, 0)) == ((2, "a b"))) // short doc -> single chunk
    assert(out.size == 4)
  }

  test("sequence packing: per-bucket prefix sums and straddle spans") {
    import graft.ops.PackOps
    val docs = Seq(
      (1L, 100L, 0L), (2L, 200L, 0L), (3L, 30L, 0L), (4L, 50L, 0L),
      (5L, 10L, 1L)) // second bucket starts its own stream
      .toDF("doc_id", "n_tok", "b")
    val out = PackOps.packSequences(docs, "doc_id", col("n_tok"), col("b"), 128)
      .collect()
      .map(r => r.getLong(1) -> ((r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    assert(out(1L) == ((0L, 0L, 0L, 1L)))
    assert(out(2L) == ((100L, 0L, 2L, 3L))) // straddles two cuts
    assert(out(3L) == ((300L, 2L, 2L, 1L)))
    assert(out(4L) == ((330L, 2L, 2L, 1L)))
    assert(out(5L) == ((0L, 0L, 0L, 1L))) // bucket independence
  }

  test("bloom-pruned semi join is exact, actually prunes, and takes string keys") {
    import graft.ops.BloomOps
    val large = spark.range(0, 2000).toDF("k")
      .withColumn("v", concat(lit("v"), col("k")))
      .union(spark.range(1).select(lit(null).cast("long").as("k"),
        lit("vnull").as("v")))
    val small = spark.range(0, 2000, 7).toDF("k") // every 7th key matches
    val expected = large.join(small, Seq("k"), "left_semi")
      .collect().map(_.getLong(0)).toSet
    val out = BloomOps.bloomPrunedSemiJoin(large, small, "k", "k")
      .collect().map(_.getLong(0)).toSet
    assert(out == expected && out.size == 286)
    // the bloom ALONE (before the exact join) kills almost all
    // non-matching rows: matches + ~1% fp, never a false negative
    val bf = BloomOps.buildBloom(small, "k")
    val bos = new java.io.ByteArrayOutputStream(); bf.writeTo(bos)
    graft.functions.GraftFunctions.register(spark)
    val prunedCnt = large.filter(
      call_function("graft_bloom_contains", lit(bos.toByteArray), col("k"))).count()
    assert(prunedCnt >= 286 && prunedCnt <= 286 + 60, s"pruned to $prunedCnt")
    // string keys use the same putString/mightContainString pair
    val ls = large.withColumn("ks", concat(lit("s"), col("k")))
    val ss = small.select(concat(lit("s"), col("k")).as("ks"))
    val sOut = BloomOps.bloomPrunedSemiJoin(ls, ss, "ks", "ks")
      .select("ks").collect().map(_.getString(0)).toSet
    assert(sOut == expected.map("s" + _))
    // mismatched key families would be all-false-negative: refuse
    intercept[IllegalArgumentException] {
      BloomOps.bloomPrunedSemiJoin(ls, small, "ks", "k")
    }
  }

  test("misra-gries heavy hitters: exact under capacity, bounded error above") {
    import graft.ops.TextOps
    // exact regime: capacity >= distinct tokens
    val docs = Seq((1L, "a b a c"), (2L, "a b b d")).toDF("doc_id", "text")
    val exact = TextOps.approxTopTokens(docs, "text", capacity = 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact == Map("a" -> 3L, "b" -> 3L, "c" -> 1L, "d" -> 1L))
    // approximate regime: 500 distinct tokens vs capacity 16, with
    // repartition forcing partial buffers and merges
    val n = 20000L
    val stream = spark.range(0, n).select(
      when(col("id") % 10 < 3, lit("hot"))
        .otherwise(concat(lit("t"), (col("id") % 499).cast("string"))).as("text"))
      .repartition(8)
    val out = TextOps.approxTopTokens(stream, "text", capacity = 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val hotTrue = 6000L // ids with id%10 in {0,1,2}
    assert(out.size <= 16)
    assert(out.contains("hot"), s"heavy hitter evicted: $out") // > n/(cap+1)
    assert(out("hot") <= hotTrue, "MG must never overcount")
    assert(out("hot") >= hotTrue - n / 17, s"undercount beyond n/(cap+1): ${out("hot")}")
  }

  test("jsonl ingest parses good lines, quarantines corrupt ones, reads gzip") {
    import graft.ops.IngestOps
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl")
    val lines = Seq(
      """{"doc_id": 1, "text": "hello world"}""",
      """not json at all {{{""",
      """{"doc_id": 2, "text": "second doc"}""",
      """{"doc_id": 3, "text": "unterminated""")
    java.nio.file.Files.write(dir.resolve("part1.jsonl"),
      String.join("\n", lines: _*).getBytes("UTF-8"))
    // gzip part: Spark decompresses by extension
    val gz = new java.util.zip.GZIPOutputStream(
      java.nio.file.Files.newOutputStream(dir.resolve("part2.jsonl.gz")))
    gz.write("""{"doc_id": 4, "text": "from gzip"}""".getBytes("UTF-8"))
    gz.close()
    val batch = IngestOps.readJsonl(spark, dir.toString, schema)
    val ids = batch.good.collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 2L, 4L))
    assert(batch.good.columns.toSeq == Seq("doc_id", "text")) // corrupt col not leaked
    val rawBad = batch.quarantine.collect().map(_.getString(0))
    assert(rawBad.length == 2 && rawBad.exists(_.contains("not json")))
    batch.release()
  }

  test("store-backed dedup admits each content hash exactly once across batches") {
    val store = java.nio.file.Files.createTempDirectory("graft_sigstore")
      .resolve("sigs").toString
    val b1 = Seq((1L, "alpha"), (2L, "beta"), (3L, "alpha")).toDF("doc_id", "text")
    val a1 = DedupOps.dedupAgainstStore(b1, "doc_id", "text", store)
      .select("doc_id").as[Long].collect().toSet
    assert(a1 == Set(1L, 2L)) // in-batch dup: 3 loses to 1
    val b2 = Seq((10L, "beta"), (11L, "gamma"), (12L, "beta")).toDF("doc_id", "text")
    val a2 = DedupOps.dedupAgainstStore(b2, "doc_id", "text", store)
      .select("doc_id").as[Long].collect().toSet
    assert(a2 == Set(11L)) // beta was admitted by batch 1
    // idempotency: replaying an admitted batch admits nothing new
    assert(DedupOps.dedupAgainstStore(b2, "doc_id", "text", store).count() == 0L)
    // null text has no signature: every such row passes through, and
    // none of them poisons the store
    val b3 = Seq((20L, Option("delta")), (21L, None), (22L, None))
      .toDF("doc_id", "text")
    val a3 = DedupOps.dedupAgainstStore(b3, "doc_id", "text", store)
      .select("doc_id").as[Long].collect().toSet
    assert(a3 == Set(20L, 21L, 22L))
    val a4 = DedupOps.dedupAgainstStore(b3, "doc_id", "text", store)
      .select("doc_id").as[Long].collect().toSet
    assert(a4 == Set(21L, 22L)) // delta now seen; null rows pass again
    // a corrupt store fails loudly instead of silently re-admitting
    val bad = java.nio.file.Files.createTempDirectory("graft_badstore")
    java.nio.file.Files.write(bad.resolve("junk.parquet"), "not parquet".getBytes)
    intercept[Exception] {
      DedupOps.dedupAgainstStore(b3, "doc_id", "text", bad.toString).count()
    }
  }

  test("staged store dedup: a batch is only admitted once commit() runs") {
    // the recovery contract: if the caller crashes before commit(),
    // re-running the batch returns the SAME admitted rows (no loss);
    // after commit(), a re-run admits nothing
    val store = java.nio.file.Files.createTempDirectory("graft_sigstage")
      .resolve("sigs").toString
    val b = Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
    val s1 = DedupOps.dedupAgainstStoreStaged(b, "doc_id", "text", store)
    assert(s1.admitted.select("doc_id").as[Long].collect().toSet == Set(1L, 2L))
    // no commit — a retry sees an unchanged store and re-admits everything
    val s2 = DedupOps.dedupAgainstStoreStaged(b, "doc_id", "text", store)
    assert(s2.admitted.select("doc_id").as[Long].collect().toSet == Set(1L, 2L))
    s2.commit()
    val s3 = DedupOps.dedupAgainstStoreStaged(b, "doc_id", "text", store)
    assert(s3.admitted.count() == 0L)
  }

  test("schema conform: missing cols null out, extras drop, casts apply, batches union") {
    import graft.ops.IngestOps
    import org.apache.spark.sql.types._
    val target = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType)))
    val v1 = Seq((1, "a doc")).toDF("doc_id", "text") // int id, no lang
    val v2 = Seq((2L, "ein doc", "de", 0.9)).toDF("doc_id", "text", "lang", "boost")
    val u = IngestOps.conform(v1, target).unionByName(IngestOps.conform(v2, target))
    assert(u.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      target.fields.map(f => (f.name, f.dataType)).toSeq)
    val rows = u.orderBy("doc_id").collect()
    assert(rows(0).getLong(0) == 1L && rows(0).isNullAt(2))
    assert(rows(1).getString(2) == "de")
  }

  test("line dedup at volume: global boilerplate stripped from 50k docs") {
    import graft.ops.TextOps
    // 50k docs, 10 unique lines each + the same 3 boilerplate lines
    val docs = spark.range(0, 50000).select(col("id").as("doc_id"),
      concat_ws("\n",
        lit("NAV HEADER"),
        concat(lit("u"), col("id"), lit("-a")), concat(lit("u"), col("id"), lit("-b")),
        lit("COOKIE BANNER"),
        concat(lit("u"), col("id"), lit("-c")), concat(lit("u"), col("id"), lit("-d")),
        concat(lit("u"), col("id"), lit("-e")), concat(lit("u"), col("id"), lit("-f")),
        concat(lit("u"), col("id"), lit("-g")), concat(lit("u"), col("id"), lit("-h")),
        concat(lit("u"), col("id"), lit("-i")), concat(lit("u"), col("id"), lit("-j")),
        lit("FOOTER © EXAMPLE")).as("text"))
    val out = TextOps.lineDedup(docs, "doc_id", "text", minDupCount = 2)
    val agg = out.agg(count(lit(1)), sum("n_lines"), sum("n_kept")).head()
    assert(agg.getLong(0) == 50000L)
    assert(agg.getLong(1) == 50000L * 13)   // 13 lines in
    assert(agg.getLong(2) == 50000L * 10)   // 3 boilerplate lines stripped each
  }

  test("line dedup differential: random corpora match a pure-Scala reference") {
    import graft.ops.TextOps
    val rnd = new scala.util.Random(23)
    for (trial <- 1 to 3) {
      val nDocs = 30 + rnd.nextInt(40)
      val vocabLines = (1 to 12).map(i => s"line$i") // small pool -> real dups
      val corpus = (1 to nDocs).map { id =>
        val lines = (0 to rnd.nextInt(6)).map(_ =>
          if (rnd.nextBoolean()) vocabLines(rnd.nextInt(vocabLines.size))
          else s"unique-$id-${rnd.nextInt(1000)}")
        (id.toLong, lines.mkString("\n"))
      }
      // reference: count lines globally, rebuild keeping count<2 lines
      val counts = corpus.flatMap(_._2.split("\n", -1)).groupBy(identity)
        .map { case (l, g) => l -> g.size }
      val expected = corpus.map { case (id, text) =>
        val all = text.split("\n", -1).toSeq
        val kept = all.filter(counts(_) < 2)
        id -> ((all.size, kept.size.toLong, kept.mkString("\n")))
      }.toMap
      val out = TextOps.lineDedup(corpus.toDF("doc_id", "text"), "doc_id", "text", 2)
        .collect().map(r => r.getLong(0) ->
          ((r.getInt(1), r.getLong(2), r.getString(3)))).toMap
      assert(out == expected, s"trial $trial diverged")
    }
  }

  test("bm25 differential: random corpora match a pure-Scala reference") {
    import graft.ops.TextOps
    val rnd = new scala.util.Random(31)
    val vocab = Vector("spark", "join", "scan", "agg", "sort", "merge", "row")
    for (trial <- 1 to 3) {
      val nDocs = 20 + rnd.nextInt(20)
      val corpus = (1 to nDocs).map { id =>
        id.toLong -> (0 to (3 + rnd.nextInt(20)))
          .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      val terms = Seq("spark", "merge")
      // pure-Scala reference of the exact formula
      val docToks = corpus.map { case (id, t) => id -> t.split("\\s+").toSeq }
      val n = docToks.size.toDouble
      val avgdl = docToks.map(_._2.size).sum.toDouble / n
      val df = terms.map(t => t -> docToks.count(_._2.contains(t)).toDouble).toMap
      def idf(t: String) = math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5))
      val expected = docToks.flatMap { case (id, toks) =>
        val score = terms.map { t =>
          val tf = toks.count(_ == t).toDouble
          if (tf == 0) 0.0
          else idf(t) * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * toks.size / avgdl))
        }.sum
        if (score == 0.0) None
        else Some(id -> BigDecimal(score).setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }.toMap
      val out = TextOps.bm25(corpus.toDF("doc_id", "text"), "doc_id", "text", terms)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(out.keySet == expected.keySet, s"trial $trial doc sets diverged")
      out.foreach { case (id, q) =>
        assert(math.abs(q - expected(id)) <= 1e-5, s"trial $trial doc $id: $q vs ${expected(id)}")
      }
    }
  }

  test("sequence packing differential: random buckets match a pure-Scala reference") {
    import graft.ops.PackOps
    val rnd = new scala.util.Random(37)
    val rows = (1 to 80).map(i =>
      (i.toLong, (rnd.nextInt(300)).toLong, (i % 5).toLong))
    val ctx = 64
    val expected = rows.groupBy(_._3).flatMap { case (b, docs) =>
      var cum = 0L
      docs.sortBy(_._1).map { case (id, nt, _) =>
        val start = cum; cum += nt
        val first = start / ctx
        val last = (start + math.max(nt, 1L) - 1) / ctx
        id -> ((b, start, first, last, last - first + 1))
      }
    }
    val out = PackOps.packSequences(rows.toDF("doc_id", "n_tok", "b"),
        "doc_id", col("n_tok"), col("b"), ctx)
      .collect().map(r => r.getLong(1) ->
        ((r.getLong(0), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(out == expected)
  }

  test("sequence packing q75 edge fixtures: negative ids, null text, vertical tab") {
    // Exercises the full q75 expression stack (engine-neutral whitespace
    // class, null-text coalesce, sign-preserving % bucketing) against a
    // pure-Scala reference with the exact semantics the DuckDB oracle
    // computes — the r6 driver-corpus hash mismatch came from edges like
    // these that the plain differential test (pre-counted tokens) skips.
    import graft.ops.PackOps
    val ctx = 16
    val docs: Seq[(Long, String)] = Seq(
      (-17L, "neg id two tokens"),
      (-9L, null),
      (-1L, "a\u000bb c"), // \x0B stays inside a token run under [^ \t\n\f\r]+
      (0L, ""),
      (3L, "  leading  and trailing  "),
      (7L, "one two three four five six seven eight nine ten"),
      (15L, "x\ty\nz\rw\fv"),
      (23L, null))
    val ws = Set(' ', '\t', '\n', '\f', '\r')
    def nTok(t: String): Long =
      if (t == null) 0L
      else t.foldLeft((0L, false)) { case ((n, in), c) =>
        if (ws(c)) (n, false) else (if (in) n else n + 1, true)
      }._1
    val expected = docs.map { case (id, t) => (id, nTok(t), id % 8) }
      .groupBy(_._3).flatMap { case (b, ds) =>
        var cum = 0L
        ds.sortBy(_._1).map { case (id, nt, _) =>
          val start = cum; cum += nt
          val first = start / ctx
          val last = (start + math.max(nt, 1L) - 1) / ctx
          id -> ((b, nt, start, first, last, last - first + 1))
        }
      }
    val out = PackOps.packSequences(docs.toDF("doc_id", "text"), "doc_id",
        coalesce(regexp_count(col("text"), lit("[^ \\t\\n\\f\\r]+")), lit(0)),
        col("doc_id") % lit(8), ctx)
      .collect().map(r => r.getLong(1) ->
        ((r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6)))).toMap
    assert(out == expected)
  }

  test("LSH bucket caps bound degenerate corpora instead of going O(n²)") {
    import graft.ops.{DedupOps, SimilarityOps}
    // 60 identical docs: every minhash band collides into ONE bucket
    // (1770 pairs uncapped). maxBucketSize must zero it out.
    val dupDocs = (1L to 60L).map(i =>
      (i, "identical boilerplate text repeated verbatim across the corpus"))
      .toDF("doc_id", "text")
    val uncapped = DedupOps.minHashLshPairs(dupDocs, "doc_id", "text")
    assert(uncapped.count() == 60L * 59 / 2)
    val capped = DedupOps.minHashLshPairs(dupDocs, "doc_id", "text",
      maxBucketSize = 32)
    assert(capped.count() == 0, "over-capacity band bucket must be dropped")

    // 40 identical vectors: one LSH bucket; the cap must drop it before
    // the pair generator, and benign-sized corpora must be unaffected.
    val dupVecs = (1L to 40L).map(i => (i, Array.fill(8)(0.5f)))
      .toDF("id", "vec")
    val vu = SimilarityOps.embeddingNearDupPairs(dupVecs, "id", "vec",
      minCosine = 0.9, nbits = 4)
    assert(vu.count() == 40L * 39 / 2)
    val vc = SimilarityOps.embeddingNearDupPairs(dupVecs, "id", "vec",
      minCosine = 0.9, nbits = 4, maxBucketSize = 16)
    assert(vc.count() == 0, "over-capacity embedding bucket must be dropped")
    // stats probe sees the single hot bucket
    val stats = SimilarityOps.lshBucketStats(dupVecs, "id", "vec", 4).collect()
    assert(stats.length == 1 && stats.head.getLong(1) == 40L)
  }

  test("paragraph dedup: custom separator splits/reassembles, idempotent") {
    import graft.ops.TextOps
    val docs = Seq(
      (1L, "keep A\n\nBOILER PARA\n\nkeep B"),
      (2L, "BOILER PARA\n\nonly here"),
      (3L, "single paragraph with\nan internal newline"))
      .toDF("doc_id", "text")
    val out = TextOps.lineDedup(docs, "doc_id", "text", 2, sep = "\n\n")
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((3, 2L, "keep A\n\nkeep B")))
    assert(out(2L) == ((2, 1L, "only here")))
    // internal single newlines are NOT paragraph boundaries
    assert(out(3L) == ((1, 1L, "single paragraph with\nan internal newline")))
    // idempotence: cleaning the cleaned corpus changes nothing
    val cleaned = TextOps.lineDedup(docs, "doc_id", "text", 2, "\n\n")
      .select(col("id").as("doc_id"), col("cleaned").as("text"))
    val again = TextOps.lineDedup(cleaned, "doc_id", "text", 2, "\n\n")
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(again == out.view.mapValues(_._3).toMap)
  }

  test("simHashPairs is exact for hamming<=maxHamming vs the brute-force join") {
    import graft.ops.DedupOps
    val rnd = new scala.util.Random(53)
    val vocab = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa")
    // near-dup structure: pairs of docs sharing most tokens
    val docs = (1L to 60L).map { i =>
      val base = (0 until 12).map(_ => vocab((rnd.nextInt(vocab.size)))).toVector
      val text = if (i % 2 == 0) base.updated(0, vocab(rnd.nextInt(vocab.size)))
        else base
      (i, text.mkString(" "))
    }.toDF("doc_id", "text")
    val sh = DedupOps.simHash(docs, "doc_id", "text")
    val a = sh.select(col("id").as("a_id"), col("simhash").as("ha"))
    val b = sh.select(col("id").as("b_id"), col("simhash").as("hb"))
    val brute = a.join(b, col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        DedupOps.hamming(col("ha"), col("hb")).as("hamming"))
      .filter(col("hamming") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val banded = DedupOps.simHashPairs(docs, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(banded == brute, s"banded ${banded.size} vs brute ${brute.size}")
    // degenerate corpus: identical docs collapse to one bucket; cap bounds it
    val dup = (1L to 40L).map((_, "same text everywhere always")).toDF("doc_id", "text")
    assert(DedupOps.simHashPairs(dup, "doc_id", "text", 3, 4, maxBucketSize = 16)
      .count() == 0)
  }

  test("snapshotDiff: added/removed/changed/unchanged, null text is content not absence") {
    import graft.ops.SnapshotOps
    val cur = Seq((1L, "same"), (2L, "new text"), (4L, "brand new"),
      (5L, null), (6L, null))
      .toDF("doc_id", "text")
    val prev = Seq((1L, "same"), (2L, "old text"), (3L, "gone"),
      (5L, null), (6L, "was text"))
      .toDF("doc_id", "text")
    val out = SnapshotOps.snapshotDiff(cur, prev, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "added", 5L -> "unchanged", 6L -> "changed"), out.toString)
    // the pushed-down filter drops unchanged rows before materializing
    val delta = SnapshotOps.snapshotDiff(cur, prev, "doc_id", "text",
        col("status") =!= "unchanged")
      .collect().map(_.getLong(0)).toSet
    assert(delta == Set(2L, 3L, 4L, 6L))
  }

  test("scd2Merge: change/delete/insert/unchanged classes; idempotent on re-merge") {
    import spark.implicits._
    val hist = Seq(
      (1L, "a", 0L, Some(5L)),   // already-closed version: verbatim
      (1L, "b", 5L, None),       // open, will CHANGE at ts=10
      (2L, "x", 0L, None),       // open, unchanged
      (3L, "y", 0L, None)        // open, DELETED at ts=10
    ).toDF("k", "v", "valid_from", "valid_to")
    val snap = Seq((1L, "c"), (2L, "x"), (4L, "z")).toDF("k", "v")
    val out = graft.ops.SnapshotOps.scd2Merge(hist, snap, "k", Seq("v"), 10L)
    val rows = out.collect().map(r => (r.getLong(0), r.getString(1),
      r.getLong(2), if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet
    assert(rows === Set(
      (1L, "a", 0L, Some(5L)),   // closed history untouched
      (1L, "b", 5L, Some(10L)),  // change closes the old version
      (1L, "c", 10L, None),      // ...and opens the new one
      (2L, "x", 0L, None),       // unchanged survives as-is
      (3L, "y", 0L, Some(10L)),  // delete closes
      (4L, "z", 10L, None)))     // brand-new key opens
    // idempotence: re-merging the SAME snapshot at a later ts only
    // touches nothing (all open rows match the snapshot)
    val again = graft.ops.SnapshotOps.scd2Merge(out, snap, "k", Seq("v"), 20L)
    assert(again.collect().map(r => (r.getLong(0), r.getString(1),
      r.getLong(2), if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet
      === rows)
  }

  test("scd2Merge property: random snapshot sequences keep history invariants") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    for (trial <- 1 to 3) {
      val keys = (1L to 8L)
      // random initial history: open rows for a key subset
      var hist = keys.filter(_ => rnd.nextBoolean())
        .map(k => (k, s"v${rnd.nextInt(3)}", 0L, None: Option[Long]))
        .toDF("k", "v", "valid_from", "valid_to")
      var lastSnap: Map[Long, String] = Map.empty
      for (step <- 1 to 4) {
        val snap = keys.filter(_ => rnd.nextDouble() < 0.7)
          .map(k => (k, s"v${rnd.nextInt(3)}"))
        lastSnap = snap.toMap
        hist = graft.ops.SnapshotOps.scd2Merge(hist,
          snap.toDF("k", "v"), "k", Seq("v"), step * 10L)
      }
      val rows = hist.collect().map(r => (r.getLong(0), r.getString(1),
        r.getLong(2), if (r.isNullAt(3)) None else Some(r.getLong(3))))
      val byKey = rows.groupBy(_._1)
      for ((k, vs) <- byKey) {
        val open = vs.filter(_._4.isEmpty)
        // exactly one open version iff the key is in the last snapshot
        if (lastSnap.contains(k)) {
          assert(open.length == 1, s"trial $trial key $k open=$open")
          assert(open.head._2 == lastSnap(k), s"trial $trial key $k value")
        } else assert(open.isEmpty, s"trial $trial key $k should be closed")
        // versions are non-overlapping and chronologically ordered
        val sorted = vs.sortBy(_._3)
        sorted.sliding(2).foreach {
          case Array((_, _, _, Some(toA)), (_, _, fromB, _)) =>
            assert(toA <= fromB, s"trial $trial key $k overlap")
          case Array((_, _, _, None), _) =>
            fail(s"trial $trial key $k: open version not last")
          case _ => ()
        }
        // consecutive versions always differ in the attribute (a
        // same-value re-merge must never split a version)
        sorted.sliding(2).foreach {
          case Array(a, b) => assert(a._2 != b._2 || a._4.get < b._3,
            s"trial $trial key $k spurious split: $a -> $b")
          case _ => ()
        }
      }
    }
  }

  test("perplexity differential: random corpora match a pure-Scala bigram LM") {
    import graft.ops.TextOps
    val rnd = new scala.util.Random(67)
    for (trial <- 1 to 3) {
      val vocab = (1 to 6).map(i => s"w$i")
      val corpus = (1L to 40L).map { id =>
        val n = rnd.nextInt(8) // includes 0- and 1-token docs
        (id, (0 until n).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      // reference model: add-one bigram LM over the same corpus
      val docsT = corpus.map { case (id, t) =>
        (id, t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq)
      }
      val bgs = docsT.flatMap { case (_, t) => t.zip(t.drop(1)) }
      val cAB = bgs.groupBy(identity).view.mapValues(_.size).toMap
      val cA = bgs.groupBy(_._1).view.mapValues(_.size).toMap
      val v = docsT.flatMap(_._2).distinct.size
      val expected = docsT.map { case (id, t) =>
        val nlls = t.zip(t.drop(1)).map { ab =>
          -math.log((cAB(ab) + 1).toDouble / (cA(ab._1) + v))
        }
        id -> (if (nlls.isEmpty) None
               else Some(BigDecimal(nlls.sum / nlls.size)
                 .setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble))
      }.toMap
      val out = TextOps.perplexityScore(corpus.toDF("doc_id", "text"),
          "doc_id", "text")
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
      expected.foreach { case (id, want) =>
        (out(id), want) match {
          case (Some(g), Some(w)) =>
            assert(math.abs(g - w) <= 2e-5, s"trial $trial doc $id: $g vs $w")
          case (g, w) => assert(g == w, s"trial $trial doc $id: $g vs $w")
        }
      }
    }
  }

  test("normalizeText: NFC composition, lowercase, whitespace collapse") {
    import graft.ops.TextOps
    graft.functions.GraftFunctions.register(spark)
    // "e" + combining acute (U+0301) must compose to precomposed é
    val decomposed = "Cafe\u0301  du\tMonde\n"
    val out = Seq((1L, decomposed), (2L, "  already  clean "), (3L, null))
      .toDF("id", "text")
      .select(col("id"), TextOps.normalizeText(col("text")))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(out(1L) == "caf\u00e9 du monde", out(1L))
    assert(out(2L) == "already clean")
    assert(out(3L) == null)
    // idempotent
    val again = Seq((1L, out(1L))).toDF("id", "text")
      .select(TextOps.normalizeText(col("text"))).head().getString(0)
    assert(again == out(1L))
  }

  test("quality score: bounded, and repetition/missing-stopwords cost") {
    import graft.ops.TextOps
    val prose = "the cat sat on a mat, and the dog slept of course."
    val docs = Seq(
      (1L, prose),
      (2L, Seq.fill(6)("buy now").mkString(" ")), // repetitive, no stopwords
      (3L, prose))
      .toDF("doc_id", "text")
    val out = TextOps.qualityScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out.values.forall(q => q > 0.0 && q < 1.0))
    assert(out(1L) > out(2L), s"spam should score lower: $out")
    assert(out(1L) == out(3L)) // deterministic
  }

  test("profile handles a literal dotted column name") {
    import graft.ops.ProfileOps
    val dotted = Seq((Some(1L), "x"), (None, "y")).toDF("a.b", "s")
    val p = ProfileOps.profile(dotted, Seq("a.b")).collect()
    assert(p.length == 1 && p(0).getString(0) == "a.b")
    assert(p(0).getLong(1) == 1L && p(0).getLong(2) == 1L)
  }

  test("Checkpoints.release actually unpersists a localCheckpoint's RDD") {
    import graft.ops.Checkpoints
    val ck = spark.range(0, 100).toDF("i").localCheckpoint()
    val ids = ck.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.id
    }
    assert(ids.nonEmpty &&
      ids.forall(spark.sparkContext.getPersistentRDDs.contains),
      "checkpoint RDD not persisted")
    Checkpoints.release(ck)
    assert(ids.forall(id => !spark.sparkContext.getPersistentRDDs.contains(id)),
      "release did not unpersist the checkpointed RDD")
  }

  test("chunk coverage property: random sizes reassemble the document exactly") {
    import graft.ops.PackOps
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 6) {
      val n = 1 + rnd.nextInt(200)
      val cs = 2 + rnd.nextInt(40)
      val ov = rnd.nextInt(cs - 1)
      val stride = cs - ov
      val toks = (0 until n).map(i => s"t$i")
      val df = Seq((1L, toks.mkString(" "))).toDF("doc_id", "text")
      val chunks = PackOps.chunkTokens(df, "doc_id", "text", cs, ov)
        .orderBy("chunk_idx").collect()
        .map(r => (r.getInt(1), r.getString(3).split(" ").toSeq))
      // chunk i starts at i*stride and has chunkSize tokens (last truncates)
      chunks.foreach { case (i, c) =>
        assert(c == toks.slice(i * stride, math.min(i * stride + cs, n)),
          s"n=$n cs=$cs ov=$ov chunk=$i")
      }
      // full coverage: the chunks' union is every token
      assert(chunks.flatMap(_._2).toSet == toks.toSet, s"n=$n cs=$cs ov=$ov")
      // no chunk beyond the document, none missing before its end
      assert(chunks.length == math.max(1, (n - ov + stride - 1) / stride))
    }
  }

  test("misra-gries membership property on random skewed streams") {
    import graft.ops.TextOps
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 4) {
      val n = 4000
      val hotShare = 0.15 + rnd.nextDouble() * 0.2 // 15-35%
      val cap = 8 + rnd.nextInt(12)
      val tail = 50 + rnd.nextInt(300)
      val hotN = (n * hotShare).toLong
      val stream = spark.range(0, n).select(
        when(col("id") < hotN, lit("HOT"))
          .otherwise(concat(lit("t"), pmod(col("id") * 2654435761L, lit(tail))
            .cast("string"))).as("text"))
        .repartition(1 + trial)
      val out = TextOps.approxTopTokens(stream, "text", cap)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // the hot token exceeds n/(cap+1), so it must be present with
      // an estimate in [true - n/(cap+1), true]
      assert(out.contains("hot"), s"trial $trial cap=$cap: $out")
      assert(out("hot") <= hotN && out("hot") >= hotN - n / (cap + 1),
        s"trial $trial cap=$cap est=${out("hot")} true=$hotN")
      assert(out.size <= cap)
    }
  }

  test("profile counts nulls and exact distincts in one pass") {
    import graft.ops.ProfileOps
    val df = Seq(
      (Some(1L), Some("a")), (Some(1L), None), (None, Some("b")),
      (Some(2L), Some("a")))
      .toDF("k", "s")
    val p = ProfileOps.profile(df, Seq("k", "s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(p("k") == (1L, 2L)) // one null, distinct {1,2}
    assert(p("s") == (1L, 2L)) // one null, distinct {a,b}
    // single-scan shape: exactly one Expand, no union of scans
    val plan = ProfileOps.profile(df, Seq("k", "s")).queryExecution.executedPlan.toString
    assert(plan.contains("Expand") && !plan.contains("Union"))
  }

  test("graft_ordered_pairs emits exactly the composed expansion's pairs") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val lists = Seq(
      Seq(1L, 2L, 3L, 4L), Seq(7L), Seq.empty[Long], Seq(5L, 6L),
      (1L to 30L))
    val df = lists.toDF("ids")
    val native = df
      .select(call_function("graft_ordered_pairs", col("ids")).as(Seq("a", "b")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val composed = df
      .select(explode(flatten(transform(col("ids"), (x, i) =>
        transform(slice(col("ids"), i + 2, size(col("ids"))),
          y => struct(x.as("a"), y.as("b")))))).as("p"))
      .select(col("p.a"), col("p.b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(native.sameElements(composed),
      s"native ${native.length} vs composed ${composed.length}")
    assert(native.length == 6 + 0 + 0 + 1 + 30 * 29 / 2)
    // struct elements pass through by field
    val s = Seq(Seq((1L, "x"), (2L, "y"), (3L, "z"))).toDF("ids")
      .select(call_function("graft_ordered_pairs", col("ids")).as(Seq("a", "b")))
      .select(col("a._1"), col("b._2"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(s.toSet == Set((1L, "y"), (1L, "z"), (2L, "z")))
    // SQL surface + null propagation
    assert(spark.sql("SELECT graft_ordered_pairs(array(1, 2, 3))").count() == 3)
    assert(spark.sql(
      "SELECT graft_ordered_pairs(CAST(NULL AS ARRAY<INT>))").count() == 0)
  }

  private def refSubstrSpans(docs: Seq[(Long, String)], k: Int)
      : Set[(Long, Long, Long)] = {
    val toks = docs.map { case (id, t) =>
      id -> t.toLowerCase.split("[ \t\n\f\r]+").filter(_.nonEmpty).toVector
    }
    val counts = scala.collection.mutable.Map.empty[String, Int]
    for ((_, ws) <- toks; i <- 0 to ws.length - k) {
      val g = ws.slice(i, i + k).mkString(" ")
      counts(g) = counts.getOrElse(g, 0) + 1
    }
    toks.flatMap { case (id, ws) =>
      val flagged = (0 to ws.length - k)
        .filter(i => counts(ws.slice(i, i + k).mkString(" ")) >= 2)
      // merge consecutive flagged gram starts into maximal spans
      flagged.foldLeft(List.empty[(Int, Int)]) {
        case ((s, e) :: rest, p) if p == e + 1 => (s, p) :: rest
        case (acc, p) => (p, p) :: acc
      }.map { case (s, e) => (id, s.toLong, (e - s + k).toLong) }
    }.toSet
  }

  test("substrDupSpans: hand spans — maximal merge, within-doc repeats, short docs") {
    val docs = Seq(
      // docs 1 & 2 share the verbatim 6-token span "w x y z p q"
      (1L, "a1 b1 w x y z p q c1 d1"),
      (2L, "e2 w x y z p q f2"),
      // doc 3 repeats a 4-token span WITHIN itself
      (3L, "r s t u k3 m3 r s t u"),
      // doc 4: unique content, no repeats anywhere
      (4L, "one4 two4 three4 four4 five4 six4"),
      // doc 5: shorter than k, yields nothing even though its text
      // appears inside doc 6
      (5L, "w x y"),
      (6L, "zz6 w x y qq6"))
    val got = DedupOps.substrDupSpans(docs.toDF("doc_id", "text"),
        "doc_id", "text", k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // shared 6-token span = 3 consecutive flagged 4-gram starts merged
    val want = Set((1L, 2L, 6L), (2L, 1L, 6L),
      (3L, 0L, 4L), (3L, 6L, 4L))
    assert(got == want, s"$got vs $want")
    assert(got == refSubstrSpans(docs, 4))
  }

  test("substrDupSpans differential: random corpora match the brute-force reference") {
    val rnd = new scala.util.Random(73)
    val alpha = Vector("aa", "bb", "cc", "dd") // tiny vocab forces collisions
    for (trial <- 1 to 4) {
      val docs = (1L to 30L).map { id =>
        (id, (0 until 4 + rnd.nextInt(20))
          .map(_ => alpha(rnd.nextInt(alpha.length))).mkString(" "))
      }
      val k = 3 + (trial % 2)
      val got = DedupOps.substrDupSpans(docs.toDF("doc_id", "text"),
          "doc_id", "text", k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == refSubstrSpans(docs, k), s"trial $trial k=$k")
    }
  }

  test("substrDupSpans volume: corpus-wide boilerplate never materializes a bucket") {
    // 20k docs all sharing one 7-token boilerplate block: the hottest
    // 4-gram has 20k occurrences. The count aggregation and semi join
    // never build a member list, so this completes in bounded memory
    // (the collect_list analogue would be one 20k-member row).
    val docs = spark.range(20000).selectExpr("id AS doc_id",
      "concat('u', id, ' v', id, ' boiler plate block common to all docs', ' w', id) AS text")
    val spans = DedupOps.substrDupSpans(docs, "doc_id", "text", k = 4)
    // every doc carries exactly one maximal span: the 7-token block
    // ("boiler"..."docs") at position 2 — unique id-bearing neighbor
    // tokens cut it there
    val agg = spans.groupBy().agg(count(lit(1)), min("span_start"),
      max("span_start"), min("span_tokens"), max("span_tokens")).head()
    assert(agg.getLong(0) == 20000L, agg.toString)
    assert(agg.getLong(1) == 2L && agg.getLong(2) == 2L, agg.toString)
    assert(agg.getLong(3) == 7L && agg.getLong(4) == 7L, agg.toString)
  }

  test("substrDupSpans: ONE tokenize scan feeds both branches (checkpointed positions)") {
    // the r8 shape fed the frequency groupBy and the semi-join probe
    // from two separate corpus scans — at 100 TB the tokenize+digest
    // pass (the dominant cost) ran twice. Default path: the position
    // frame is checkpointed, so the SQL plan holds ZERO parquet scans
    // (the one real scan lives in the checkpointed RDD's lineage);
    // the recompute variant shows the two scans it pays, and both
    // produce identical spans.
    def scanCount(df: org.apache.spark.sql.DataFrame): Int = {
      df.write.format("noop").mode("overwrite").save()
      graft.ops.PlanProbe.allNodes(df.queryExecution.executedPlan)
        .count(_.isInstanceOf[org.apache.spark.sql.execution.FileSourceScanExec])
    }
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val cached = DedupOps.substrDupSpans(docs, "doc_id", "text", k = 4)
    val rescan = DedupOps.substrDupSpans(docs, "doc_id", "text", k = 4,
      persistPositions = false)
    assert(scanCount(cached) == 0, "checkpointed path must not rescan parquet")
    assert(scanCount(rescan) == 2, "recompute path pays the two scans")
    val a = cached.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = rescan.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a == b && a.nonEmpty)
    graft.ops.Checkpoints.release(cached)
  }

  test("removeSpans: hand cut — spans excised, case kept, survivors single-spaced") {
    val docs = Seq(
      (1L, "Keep1 A B C D tail1"),
      (2L, "head2 a b c d Keep2"),
      (3L, "only unique content here")).toDF("doc_id", "text")
    val spans = DedupOps.substrDupSpans(docs, "doc_id", "text", k = 4)
    val got = DedupOps.removeSpans(docs, "doc_id", "text", spans)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    // docs 1/2 share "a b c d" (case-insensitively); original case
    // survives outside the cut
    assert(got(1L) == ((4L, "Keep1 tail1")), got.toString)
    assert(got(2L) == ((4L, "head2 Keep2")), got.toString)
    assert(got(3L) == ((0L, "only unique content here")), got.toString)
  }

  test("removeSpans: detect→cut iterates to a span-free corpus (sf0.001)") {
    // One pass is NOT a fixed point by nature: cutting a span joins
    // its neighbors, and the seam can form a fresh >=k repeat (Lee et
    // al. note the same for ExactSubstr; the fixture's ~30-word vocab
    // makes seams collide often — 709 → 47 → 6 → 0 spans). Pin the
    // contract that matters: every flagged occurrence is gone after
    // its own cut, and repeated application converges, here in <= 4
    // passes.
    var docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    assert(DedupOps.substrDupSpans(docs, "doc_id", "text", k = 4).count() > 0,
      "fixture must exercise the cut")
    var remaining = -1L
    for (_ <- 1 to 4 if remaining != 0) {
      val spans = DedupOps.substrDupSpans(docs, "doc_id", "text", k = 4)
      remaining = spans.count()
      if (remaining > 0)
        docs = DedupOps.removeSpans(docs, "doc_id", "text", spans)
          .select(col("id").as("doc_id"), col("text_clean").as("text"))
          .localCheckpoint()
    }
    assert(remaining == 0, s"still $remaining spans after 4 cut passes")
    assert(DedupOps.substrDupSpans(docs, "doc_id", "text", k = 4).count() == 0)
  }

  test("ngram Jaccard skew guard caps hot shingles, keeps exact denominators") {
    // 40 docs all sharing one stopword-heavy phrase + a unique tail;
    // two true near-duplicates sharing rare shingles.
    val hot = "the quick brown fox jumps over the lazy dog again and again"
    val docs = (0 until 40).map(i => (i.toLong, s"$hot unique tail $i $i")) ++
      Seq((100L, "rare alpha beta gamma delta epsilon zeta"),
        (101L, "rare alpha beta gamma delta epsilon eta"))
    val sh = DedupOps.wordShingles(docs.toDF("doc_id", "text"), "doc_id", "text", 3)
    // uncapped: the hot phrase makes every pair of the 40 docs a candidate
    val uncapped = DedupOps.ngramJaccardPairs(sh, 0.01)
    // capped at df<=5: hot shingles dropped pre-join; only the rare pair meets
    val capped = DedupOps.ngramJaccardPairs(sh, 0.01, maxDocFrequency = 5)
    assert(uncapped.count() > 700) // ~40*39/2 pairs through the hot shingles
    val pairs = capped.select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((100L, 101L)), pairs.mkString(","))
    // denominator exactness: capped jaccard uses FULL shingle-set sizes
    val j = capped.select("n_a", "n_b").head()
    assert(j.getLong(0) == 5 && j.getLong(1) == 5)
  }

  test("cdcChunkStats volume: 30k docs sharing one hot chunk — counts only, no pair blowup") {
    import spark.implicits._
    // every doc embeds the same boilerplate passage (one hot chunk fp
    // shared by ALL docs) plus a unique tail: the shared-set path must
    // stay a count aggregation — unlike pair generators there is no
    // O(f²) expansion to cap, so 30k-way sharing is just a big count
    val boiler = (1 to 40).map(i => s"boiler$i").mkString(" ")
    val docs = spark.range(30000).select(col("id").as("doc_id"),
      concat(lit(boiler + " unique tail "), col("id").cast("string")).as("text"))
    val t0 = System.nanoTime()
    val stats = graft.ops.DedupOps.cdcChunkStats(docs, "doc_id", "text")
    val agg = stats.agg(count(lit(1)), sum(when(col("n_shared") > 0, 1).otherwise(0)),
      min("n_chunks")).collect().head
    val secs = (System.nanoTime() - t0) / 1e9
    assert(agg.getLong(0) == 30000L)
    // the boilerplate chunk(s) are shared in (nearly) every doc
    assert(agg.getLong(1) > 29000L, s"shared docs: ${agg.getLong(1)}")
    assert(secs < 120, s"took ${secs}s")
  }

  test("benchmarkSpans + removeSpans: surgical decontamination cuts the leak, keeps the doc") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val leak = "what is the capital of france"
    val corpus = Seq(
      (1L, s"Intro words here $leak and the rest of the document continues"),
      (2L, "totally unrelated content with no benchmark overlap at all"),
      (3L, s"$leak")).toDF("doc_id", "text") // fully-leaked doc → emptied
    val bench = Seq((100L, s"Q: $leak A: paris")).toDF("doc_id", "text")
    val spans = graft.ops.DedupOps.benchmarkSpans(corpus, bench, "doc_id", "text", 3)
    val byId = spans.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(byId(1L) == ((3L, 6L)), byId.toString) // tokens 3..8 = the 6-token leak
    assert(!byId.contains(2L))
    assert(byId(3L) == ((0L, 6L)))
    val cleaned = graft.ops.DedupOps.removeSpans(corpus, "doc_id", "text", spans)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toList.sortBy(_._1)
    assert(cleaned(0) == ((1L, 6L,
      "Intro words here and the rest of the document continues")))
    assert(cleaned(1) == ((2L, 0L,
      "totally unrelated content with no benchmark overlap at all")))
    assert(cleaned(2) == ((3L, 6L, "")))
    // decontaminated output carries no remaining benchmark span
    val again = graft.ops.DedupOps.benchmarkSpans(
      cleaned.map(c => (c._1, c._3)).toDF("doc_id", "text"), bench,
      "doc_id", "text", 3)
    assert(again.count() == 0, "cleaned corpus must have no benchmark spans")
  }

  test("compressionSignal: boilerplate < prose < noise; empty null; deterministic") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    val docs = Seq(
      (1L, Seq.fill(100)("the same phrase over and over").mkString(" ")),
      (2L, "The quarterly report shows steady growth across most regions, " +
        "though supply constraints continue to weigh on margins and the " +
        "outlook remains uncertain into the next fiscal year for now."),
      (3L, Seq.fill(200)(rnd.nextPrintableChar()).mkString),
      (4L, "")).toDF("doc_id", "text")
    val got = graft.ops.TextOps.compressionSignal(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) Double.NaN else r.getDouble(3))).toMap
    assert(got(1L) < got(2L), s"boilerplate ${got(1L)} !< prose ${got(2L)}")
    assert(got(2L) < got(3L), s"prose ${got(2L)} !< noise ${got(3L)}")
    assert(got(1L) < 0.2 && got(3L) > 0.7, got.toString)
    assert(got(4L).isNaN, "empty text must yield NULL ratio")
    val again = graft.ops.TextOps.compressionSignal(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) Double.NaN else r.getDouble(3))).toMap
    assert(got.keySet == again.keySet && got.keySet.forall(k =>
      got(k).equals(again(k))), "signal must be deterministic")
  }

  test("htmlExtract: blocks dropped, entities decoded once, malformed markup degrades safely") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val cases = Seq(
      // script/style/comments vanish wholesale, incl. '<' inside them
      (1L, "<p>keep</p><script>if (1<2) drop();</script><style>a{b}</style><!-- no -->tail",
        "keep tail"),
      // &amp;lt; must decode to the LITERAL '&lt;', never twice to '<'
      (2L, "x &amp;lt; y &amp; z &lt;3", "x &lt; y & z <3"),
      // unclosed tag swallows to the next '>', bare '<' survives
      (3L, "a <b unclosed attr='v'> c < d", "a c < d"),
      // nbsp and quotes
      (4L, "one&nbsp;two &quot;three&quot; &#39;four&#39;", "one two \"three\" 'four'"),
      (5L, "", ""))
    val got = cases.toDF("id", "html", "want")
      .select(col("id"), graft.ops.TextOps.htmlExtract(col("html")).as("got"), col("want"))
      .collect()
    got.foreach(r => assert(r.getString(1) == r.getString(2),
      s"case ${r.getLong(0)}: got '${r.getString(1)}' want '${r.getString(2)}'"))
  }

  test("lineBoilerplate: per-group template lines drop, minority and " +
      "small-group lines survive, trim-keyed, order and blanks preserved") {
    import spark.implicits._
    val docs = Seq(
      // group a, 5 docs: NAV in all 5 (one with stray spaces — the
      // trimmed key must still unify it), promo in only 2 (40% < 50%,
      // and under minDocs=3 anyway)
      (1L, "a", "NAV\nu1\n\npromo"),
      (2L, "a", "NAV\nu2\npromo"),
      (3L, "a", "NAV\nu3"),
      (4L, "a", "NAV\nu4"),
      (5L, "a", " NAV  \nu5"),
      // group b, 2 docs sharing NAV: group too small to vote
      // (minDocs=3), nothing drops
      (6L, "b", "NAV\nu6"),
      (7L, "b", "NAV\nu7")).toDF("doc_id", "source", "text")
    val got = graft.ops.TextOps
      .lineBoilerplate(docs, "doc_id", "text", "source",
        maxShare = 0.5, minDocs = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2))))
      .toMap
    assert(got(1L) === ((1L, "u1\n\npromo")), got(1L)) // blank line survives in place
    assert(got(2L) === ((1L, "u2\npromo")))
    assert(got(3L) === ((1L, "u3")))
    assert(got(5L) === ((1L, "u5"))) // ' NAV  ' dropped via trimmed key
    assert(got(6L) === ((0L, "NAV\nu6"))) // small group: kept
    assert(got(7L) === ((0L, "NAV\nu7")))
    // partition invariance (the census and rebuild are keyed aggs)
    val re = graft.ops.TextOps
      .lineBoilerplate(docs.repartition(5), "doc_id", "text", "source",
        maxShare = 0.5, minDocs = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2))))
      .toMap
    assert(re === got)
  }

  test("quantizeInt8: codes bounded, zero vector safe, reconstruction within half-step") {
    import spark.implicits._
    val emb = Seq(
      (1L, Seq(0.5f, -1.0f, 0.25f)),
      (2L, Seq(0.0f, 0.0f)),
      (3L, Seq(3.0f))).toDF("vec_id", "embedding")
    val rows = graft.ops.SimilarityOps.quantizeInt8(emb, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4), r.getDouble(5)))).toMap
    // max|x| maps to ±127 exactly; codes never exceed the band
    assert(rows(1L) == ((3, -127, 64, -31L, 127.0)), rows(1L).toString)
    assert(rows(2L) == ((2, 0, 0, 0L, 1.0)), rows(2L).toString)
    assert(rows(3L) == ((1, 127, 127, 127L, 127.0 / 3.0)), rows(3L).toString)
  }

  test("cdcChunkStats: shift tolerance, chunk reassembly, short-text and guard cases") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    import org.apache.spark.sql.functions.{call_function, col, lit, concat_ws}
    val rnd = new scala.util.Random(13)
    // long enough that the ~1/61 cut rate concentrates (~40 chunks)
    val body = Seq.fill(2400)(('a' + rnd.nextInt(26)).toChar).mkString
    // the SAME 400-char body at three different offsets
    val docs = Seq(
      (1L, body),
      (2L, "PREFIX-" + body),
      (3L, "A MUCH LONGER PREFIX THAT SHIFTS EVERYTHING " + body + " SUFFIX"),
      (4L, "short"),
      (5L, "")).toDF("doc_id", "text")
    val chunked = docs.select(col("doc_id"),
      call_function("graft_cdc_chunks", col("text"), lit(8), lit(61)).as("cs"))
    // chunks reassemble to the original text exactly
    chunked.select(col("doc_id"), concat_ws("", col("cs")).as("re"))
      .join(docs, "doc_id").collect().foreach { r =>
        assert(r.getString(1) == r.getString(2), s"reassembly doc ${r.getLong(0)}")
      }
    // shift tolerance: after the offset junk, the shared body aligns
    // to mostly-identical chunks — fixed-size blocking would share ~0
    val sets = chunked.as[(Long, Seq[String])].collect().map { case (id, cs) => id -> cs.toSet }.toMap
    val common12 = (sets(1L) intersect sets(2L)).size
    val common13 = (sets(1L) intersect sets(3L)).size
    assert(common12.toDouble / sets(1L).size > 0.5, s"1∩2 = $common12 of ${sets(1L).size}")
    assert(common13.toDouble / sets(1L).size > 0.5, s"1∩3 = $common13 of ${sets(1L).size}")
    // short and empty text: one chunk, the text itself
    assert(sets(4L) == Set("short") && sets(5L) == Set(""))
    // the stats roll up: doc 4/5 unique, 1-3 heavily shared
    val stats = DedupOps.cdcChunkStats(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3))).toMap
    assert(stats(4L) == ((1L, 0L)) && stats(5L) == ((1L, 0L)))
    assert(stats(1L)._2 >= stats(1L)._1 / 2, s"doc 1 shared: ${stats(1L)}")
    // guards fail fast
    intercept[IllegalArgumentException] {
      DedupOps.cdcChunkStats(docs, "doc_id", "text", window = 9)
    }
    intercept[IllegalArgumentException] {
      DedupOps.cdcChunkStats(docs, "doc_id", "text", divisor = 1)
    }
  }
}
