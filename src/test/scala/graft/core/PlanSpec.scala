package graft.core

import graft.SparkEntry
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Physical-plan shape assertions: the 100-TB design properties the
  * scaladoc claims (filter/column pushdown into scans, broadcast
  * dimension joins, map-side partial aggregation, whole-stage codegen,
  * no cartesian products where an equi-join is intended) must be
  * visible in the plans Catalyst actually produces — not just stated.
  */
class PlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): SparkPlan =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan

  private def formatted(name: String): String = {
    val df: DataFrame = SparkEntry.queries(name)(spark, sf)
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  }

  test("q02: filter and projection reach the parquet scan") {
    val s = formatted("q02_filter_project")
    assert(s.contains("PushedFilters:") &&
      (s.contains("GreaterThanOrEqual(l_quantity") || s.contains("IsNotNull(l_quantity")), s)
    // pruned read schema: only the referenced columns, not all 16
    val readSchema = s.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_tax"), readSchema)
  }

  test("q68: hash sampling is a pruned scan + one codegen filter, no shuffle") {
    val s = formatted("q68_mixture_sample")
    val readSchema = s.linesIterator.filter(_.contains("ReadSchema")).mkString
    // only (doc_id, source) read — not text/lang/n_chars
    assert(readSchema.contains("doc_id") && !readSchema.contains("text"), readSchema)
    assert(!s.contains("Exchange"), "sampling must not shuffle")
    // thresholds folded to string literals, no runtime BigDecimal math
    assert(s.contains("substring(md5("), s)
  }

  test("q04: all three dimension joins broadcast; fact side never shuffles before agg") {
    val s = formatted("q04_nation_revenue")
    assert("BroadcastHashJoin".r.findAllIn(s).size >= 3, s)
    assert(!s.contains("SortMergeJoin"), "dimension join degraded to sort-merge")
  }

  test("q01: aggregation is two-phase (map-side partial)") {
    val s = formatted("q01_pricing_summary")
    assert(s.contains("HashAggregate"), s)
    assert("partial".r.findAllIn(s.toLowerCase).nonEmpty, s)
  }

  test("q36 knn: the only join is the intentional broadcast nested loop (tiny query side)") {
    val s = formatted("q36_knn_brute")
    assert(s.contains("BroadcastNestedLoopJoin"), s)
  }

  test("q40 minhash: candidate generation is an equi-join, not a cartesian") {
    val s = formatted("q40_minhash_lsh")
    assert(!s.contains("CartesianProduct"), s)
  }

  test("per-row curation layers are shuffle-free: url normalize, NFC, BPE encode") {
    for (q <- Seq("q81_url_normalize", "q87_text_normalize", "q80_bpe_encode")) {
      val s = formatted(q)
      assert(!s.contains("Exchange"), s"$q must not shuffle:\n$s")
    }
    // q80/q87 read only (doc_id, text) — lang/source/n_chars pruned
    for (q <- Seq("q80_bpe_encode", "q87_text_normalize")) {
      val rs = formatted(q).linesIterator.filter(_.contains("ReadSchema")).mkString
      assert(rs.contains("text") && !rs.contains("n_chars"), s"$q: $rs")
    }
  }

  test("q86 simhash pairs: bucketed generation, no cartesian, no join machinery") {
    val s = formatted("q86_simhash_pairs")
    assert(!s.contains("CartesianProduct") && !s.contains("SortMergeJoin"), s)
  }

  test("q90 perplexity: model tables broadcast; the exploded corpus never sort-merges") {
    val s = formatted("q90_perplexity")
    assert("BroadcastHashJoin".r.findAllIn(s).size >= 2, s)
    assert(!s.contains("SortMergeJoin"), s)
  }

  test("native minhash/simhash aggregates plan as ObjectHashAggregate, not per-group sorts") {
    import graft.ops.{DedupOps, TextOps}
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    for (df <- Seq(
        DedupOps.minHash(DedupOps.wordShingles(docs, "doc_id", "text", 3), 8),
        DedupOps.simHash(docs, "doc_id", "text"),
        TextOps.approxTopTokens(docs, "text", 16))) {
      val s = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(s.contains("ObjectHashAggregate"), s)
      assert(!s.contains("SortAggregate"), s)
    }
  }

  test("export without presentation sort: no total-order exchange") {
    import graft.core.export.MeasurementExport
    val (frame, _) = MeasurementExport.buildExport(spark,
      s"$RefData/GLAD9_Site1_Affine.csv", s"$RefData/GLAD9_Site1_SITfromSparse.csv",
      s"$RefData/GLAD9_Site1_XRF.csv",
      depthColumn = "Sediment Depth, scaled (MBS / CSF-B)",
      sortForPresentation = false)
    val s = frame.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!s.toLowerCase.contains("rangepartitioning"), s)
    // the measurement scan side still never shuffles: only broadcast
    // exchanges may appear
    assert(!s.contains("SortMergeJoin") && !s.contains("CartesianProduct"), s)
  }

  test("splice resolve: depth lookups are broadcast hash joins") {
    import graft.core.format.CsvIO
    import graft.core.model.CoringFormats._
    import graft.core.splice.SpliceBuilder
    val ss = CsvIO.load(spark, s"$RefData/GLAD9_SectionSummary.csv",
      SectionSummaryFormat, withSeq = true)
    val sp = CsvIO.load(spark, s"$RefData/GLAD9_Site1_SparseSplice.csv",
      SparseSpliceFormat, withSeq = true)
    val resolved = SpliceBuilder.resolve(spark, sp, ss)
    val s = resolved.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert("BroadcastHashJoin".r.findAllIn(s).size >= 3, s)
    assert(!s.contains("SortMergeJoin") && !s.contains("CartesianProduct"), s)
  }

  test("bucketed co-located join plans with zero exchanges") {
    import graft.ops.BucketOps
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val lineitem = spark.read.parquet(s"$sf/lineitem.parquet")
      .withColumnRenamed("l_orderkey", "o_orderkey")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    BucketOps.writeBucketed(orders, "b_orders", "o_orderkey", 4)
    BucketOps.writeBucketed(lineitem, "b_lineitem", "o_orderkey", 4)
    // disable auto-broadcast: at this tiny SF the planner would
    // broadcast (and skip bucketed reading) — the technique under test
    // is the shuffle-free fact-to-fact sort-merge path
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = BucketOps.bucketedJoin(spark, "b_orders", "b_lineitem", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"), plan)
      assert(plan.contains("SortMergeJoin"), plan)
      assert(joined.count() > 0)
      // contrast: the same join on unbucketed reads DOES shuffle
      val unbucketed = orders.join(lineitem, Seq("o_orderkey"))
      assert(unbucketed.queryExecution.executedPlan.toString
        .contains("Exchange hashpartitioning"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("whole-stage codegen spans cover the scan pipelines") {
    // formatted mode marks codegen'd operators with `[codegen id : N]`
    val s = formatted("q31_quality_metrics")
    assert(s.contains("[codegen id :"), s)
  }

  private def planString(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("repetition metrics are shuffle-free; token stats shuffle exactly twice") {
    val rep = planString("q59_repetition")
    assert(!rep.contains("Exchange"), rep)
    val ts = planString("q58_token_stats")
    assert("Exchange hashpartitioning".r.findAllIn(ts).size == 2, ts)
    // both aggregations combine map-side before their exchange
    assert("HashAggregate".r.findAllIn(ts).size >= 4, ts)
  }

  test("jaccard pipeline: two aggregation exchanges, no joins") {
    val s = planString("q39_ngram_jaccard")
    assert("Exchange hashpartitioning".r.findAllIn(s).size == 2, s)
    assert(!s.contains("Join"), s)
  }

  test("chunking is shuffle-free; packing shuffles once on the bucket window") {
    val ch = planString("q74_chunk_tokens")
    assert(!ch.contains("Exchange"), ch)
    val pk = planString("q75_pack_sequences")
    assert("Exchange hashpartitioning".r.findAllIn(pk).size == 1, pk)
    // the window carries counts, not text
    assert(!pk.contains("CartesianProduct"), pk)
  }

  test("bm25: stats and term frequencies broadcast; the corpus never sort-merges") {
    val s = planString("q72_bm25")
    assert(s.contains("BroadcastNestedLoopJoin"), s) // 1-row corpus stats
    assert(s.contains("BroadcastHashJoin"), s)       // per-term df
    assert(!s.contains("SortMergeJoin"), s)
  }

  test("line dedup: no cartesian, bounded exchanges, md5-keyed banned-set agg") {
    val s = planString("q71_line_dedup")
    assert(!s.contains("CartesianProduct"), s)
    // line-key agg + reassembly + docs join side; anti join may add two
    assert("Exchange hashpartitioning".r.findAllIn(s).size <= 5, s)
  }

  test("q76: the bloom probe filters the fact scan before the semi join") {
    val s = planString("q76_bloom_semijoin")
    assert(s.contains("graft_bloom_contains"), s)
    assert(s.contains("LeftSemi"), s)
    // the probe filter must sit BELOW the join (prune before shuffle)
    val filterIdx = s.indexOf("graft_bloom_contains")
    val joinIdx = s.indexOf("LeftSemi")
    assert(joinIdx < filterIdx, "bloom filter should be under the join in the plan tree")
  }

  test("q73 stratifiedTake: the rank<=n filter becomes a map-side " +
      "WindowGroupLimit BEFORE the exchange (the r15 k-min inventory " +
      "finding — pinned so an optimizer/config change cannot " +
      "silently restore the full per-stratum shuffle)") {
    val s = formatted("q73_stratified_take")
    val firstWgl = s.indexOf("WindowGroupLimit")
    val lastWgl = s.lastIndexOf("WindowGroupLimit")
    assert(firstWgl >= 0 && lastWgl > firstWgl,
      s"expected partial+final WindowGroupLimit, plan:\n$s")
    // the PARTIAL group limit must sit below the exchange: in the
    // formatted tree the exchange line appears between the two
    val ex = s.indexOf("Exchange")
    assert(ex > firstWgl && ex < lastWgl,
      s"partial WindowGroupLimit must be under the Exchange, plan:\n$s")
  }

  test("q377: the bloom SPLIT holds — one anti join on the probable " +
      "branch only, clean branch join-free") {
    val s = planString("q377_bloom_dedup")
    // exactly one join in the whole plan (the verifying anti join);
    // the bloom-negative branch must reach the union as scan+filter
    assert(s.contains("LeftAnti"), s)
    val joins = "Join".r.findAllIn(s).size
    assert(joins <= 2, // "LeftAnti" node prints Join once (+BHJ variant)
      s"bloom-split anti join should have exactly one join, plan:\n$s")
    // both branches probe the bloom (positively and negated)
    assert("graft_bloom_contains".r.findAllIn(s).size >= 2, s)
  }

  test("q379 (Q12): orders broadcasts onto the filtered fact scan; " +
      "priority matrix aggregates map-side first") {
    val s = formatted("q379_shipmode_priority")
    assert(s.contains("BroadcastHashJoin"), s)
    assert(!s.contains("SortMergeJoin"), "orders join degraded to sort-merge")
    assert("partial_sum".r.findAllIn(s).nonEmpty, s)
    // derived-column predicates stay on the pruned 3-column scan
    val readSchema = s.linesIterator.filter(_.contains("ReadSchema"))
      .filter(_.contains("l_orderkey")).mkString
    assert(!readSchema.contains("l_extendedprice") &&
      !readSchema.contains("l_partkey"), readSchema)
  }

  test("q380 (Q16): part dim and the NOT-IN exclusion both broadcast; " +
      "the fact never sort-merges") {
    val s = formatted("q380_parts_supplier_cnt")
    assert("BroadcastHashJoin".r.findAllIn(s).size >= 2, s)
    assert(s.contains("LeftAnti"), s)
    assert(!s.contains("SortMergeJoin"), s)
    // part predicates pushed to the dim scan
    assert(s.contains("Not(EqualTo(p_brand,Brand#45))"), s)
  }

  test("q382 margin-mining candidate path: bucket equi-join, " +
      "no cartesian (pinned on the pre-checkpoint pair frame)") {
    import org.apache.spark.sql.functions.col
    val emb = graft.Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val pairs = graft.ops.SimilarityOps.lshCandidatePairs(
      emb.where(col("label") % 2 === 0), emb.where(col("label") % 2 === 1),
      "vec_id", "embedding", nbits = 4, probes = 2,
      bucketExpr = graft.ops.SimilarityOps.lshBucketMd5(_, _, d = 64))
    val s = pairs.queryExecution.executedPlan.toString
    assert(!s.contains("CartesianProduct") &&
      !s.contains("BroadcastNestedLoopJoin"),
      "candidate path must not degenerate to all-pairs:\n" + s)
    assert(s.contains("bucket"), s)
  }

  test("q385 journeys: top-n is a map-side TakeOrderedAndProject; " +
      "session windows share one user exchange") {
    val s = plan("q385_frequent_journeys").toString
    assert(s.contains("TakeOrderedAndProject(limit=20"), s)
    assert("Exchange".r.findAllIn(s).size <= 2,
      "expected only the user-partition and path-count exchanges:\n" + s)
  }

  test("zero-shuffle claims hold at runtime: measured shuffle bytes are zero") {
    import graft.ops.PlanProbe
    // q88: the vocab pass shuffles (vocab-bounded, during query
    // construction); the returned corpus→ids mapping pass must not —
    // the collected-vocab map literal replaced the token-level
    // groupBy/collect_list re-assembly
    for (name <- Seq("q59_repetition", "q68_mixture_sample", "q74_chunk_tokens",
        "q88_token_ids")) {
      val b = PlanProbe.shuffleBytesWritten(SparkEntry.queries(name)(spark, sf))
      assert(b == 0L, s"$name wrote $b shuffle bytes")
    }
    // sanity: the probe is live — a shuffling query measures non-zero
    val shuffling = PlanProbe.shuffleBytesWritten(
      SparkEntry.queries("q71_line_dedup")(spark, sf))
    assert(shuffling > 0L, "probe failed to observe a real shuffle")
  }

  test("q105 ivf-pq: every join broadcasts the tiny side; no cartesian, no sort-merge") {
    val s = formatted("q105_knn_ivfpq")
    // codes ⋈ queries (on cell), vectors ⋈ shortlist, ⋈ query vectors:
    // all three carry a corpus-side stream against a broadcast side
    assert(s.contains("BroadcastHashJoin"), s)
    assert(!s.contains("CartesianProduct"), s)
    assert(!s.contains("SortMergeJoin"), s)
  }

  test("q106 cdc: chunk text never shuffles — only fingerprints move") {
    val s = formatted("q106_cdc_chunks")
    assert(!s.contains("CartesianProduct"), s)
    // every exchange key is the 32-hex fp or the doc id — if the raw
    // chunk string appeared in an exchange's output, chunk text would
    // be shuffling
    val exchanges = s.linesIterator.filter(_.contains("Exchange")).toList
    assert(exchanges.nonEmpty, s)
    assert(!s.contains("hashpartitioning(chunk"), s)
  }

  test("curation signals: corpus-side work is scans + one id join; benchmark grams broadcast") {
    val s = formatted("q63_curation_funnel")
    assert(s.contains("BroadcastHashJoin"), s)
    assert(!s.contains("CartesianProduct"), s)
  }

  test("q126 KN scoring: all model joins broadcast; the corpus bigram probe never sort-merges") {
    val s = formatted("q126_kn_ppl")
    assert("BroadcastHashJoin".r.findAllIn(s).size >= 3, s)
    assert(s.contains("BroadcastNestedLoopJoin"), "scalar table rides a broadcast cross join: " + s)
    assert(!s.contains("SortMergeJoin"), "model join degraded to sort-merge: " + s)
    assert(!s.contains("CartesianProduct"), s)
  }

  test("q136 trigram KN: all five model tables broadcast, no sort-merge, no cartesian") {
    val s = formatted("q136_kn3_ppl")
    assert("BroadcastHashJoin".r.findAllIn(s).size >= 5, s)
    assert(!s.contains("SortMergeJoin"), "model join degraded to sort-merge: " + s)
    assert(!s.contains("CartesianProduct"), s)
  }

  test("q127 blocklist: the automaton tag is a zero-shuffle pruned scan") {
    val s = formatted("q127_blocklist")
    assert(!s.contains("Exchange"), "phrase tagging must not shuffle: " + s)
    val readSchema = s.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!readSchema.contains("lang") && !readSchema.contains("source"),
      "only (doc_id, text) should be read: " + readSchema)
  }

  test("q130 fertility: zero-shuffle encoder scan into one map-side-combined agg") {
    val s = formatted("q130_bpe_fertility")
    // exactly the lang-keyed aggregation exchange — nothing else moves
    assert(s.contains("hashpartitioning(lang"), s)
    assert("\\+- Exchange".r.findAllIn(s).size === 1,
      "unexpected extra shuffle: " + s)
    val readSchema = s.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!readSchema.contains("doc_id"), "doc_id not needed: " + readSchema)
  }

  test("q131 hard negatives: label filter rides the broadcast join, no cartesian") {
    val s = formatted("q131_hard_negatives")
    assert(s.contains("BroadcastNestedLoopJoin"), s)
    assert(!s.contains("CartesianProduct"), s)
    assert(!s.contains("SortMergeJoin"), s)
  }

  test("q146 dsir: the ratio model joins broadcast; the corpus never sort-merges to it") {
    val s = formatted("q146_dsir_weights")
    assert(s.contains("BroadcastHashJoin"), s)
    // the token->ratio join specifically must not be a sort-merge
    // (the id-keyed left join back to docs may plan either way)
    assert(!s.contains("CartesianProduct"), s)
  }

  test("q152 random projection: pure narrow map — zero exchanges, pruned scan") {
    // SimilaritySpec caches the embeddings parquet; Spark's cache
    // manager would substitute the full-column InMemoryRelation here
    // and hide the pruned scan this test asserts (suites run
    // sequentially in the forked JVM, so clearing is deterministic)
    spark.catalog.clearCache()
    val s = formatted("q152_random_projection")
    assert(!s.contains("Exchange"), "projection must not shuffle:\n" + s)
    val readSchema = s.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!readSchema.contains("label"), readSchema) // only (vec_id, embedding)
  }

  test("q151 centroid confusion: centroid table broadcasts, no cartesian fallback") {
    val s = formatted("q151_centroid_confusion")
    assert(s.contains("BroadcastNestedLoopJoin") || s.contains("BroadcastHashJoin"), s)
    assert(!s.contains("CartesianProduct"), s)
  }

  test("dsir frozen-model scoring is shuffle-free (the streaming-twin contract)") {
    val docs = graft.Tables(spark, sf, "documents")
    val model = Map("abc" -> 10L, "fff" -> -5L)
    val p = graft.ops.DsirOps.scoreWithModel(docs, "doc_id", "text", model)
      .queryExecution.executedPlan
    assert(!p.toString.contains("Exchange"), p.toString)
  }

  test("q147 winnow pairs: equi-join on fingerprints, never a cartesian") {
    val s = formatted("q147_winnow_pairs")
    assert(!s.contains("CartesianProduct"), s)
    assert(!s.contains("BroadcastNestedLoopJoin"), s)
  }

  test("q169 rrf: lexical run joins shingles via broadcast hash, no cartesian") {
    val s = formatted("q169_rrf_fusion")
    assert(s.contains("BroadcastHashJoin"), s)
    assert(!s.contains("CartesianProduct"), s)
  }

  test("q171 bradley-terry: comparison agg is two-phase (map-side partial)") {
    // The corpus-scale comparison stream must collapse map-side before
    // the items^2 shuffle — a plain final-only agg would ship every
    // comparison row.
    val docs = graft.Tables(spark, sf, "documents")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("source"))
    val comps = docs.selectExpr("source as w",
      "concat('x', source) as l")
    // probe the aggregation shape the op builds (collect happens after)
    val agg = comps.filter("w <> l").groupBy("w", "l")
      .count().queryExecution.executedPlan.toString
    assert(agg.contains("HashAggregate"), agg)
    assert(agg.split("HashAggregate").length >= 3, s"no partial agg:\n$agg")
  }

  test("q174/q175 tokenizer encodes are zero-shuffle scans") {
    for (q <- Seq("q174_unigram_encode", "q175_wordpiece_tokens")) {
      val p = plan(q).toString
      assert(!p.contains("Exchange"), s"$q shuffled:\n$p")
    }
  }

  test("q190 temporal join: equi-key broadcast join with interval post-filter, no range-join cartesian") {
    val s = formatted("q190_temporal_join")
    assert(s.contains("BroadcastHashJoin"), s)
    assert(!s.contains("CartesianProduct") && !s.contains("BroadcastNestedLoopJoin"), s)
  }

  test("q172 k-anonymity: one two-phase aggregation, no joins") {
    val s = plan("q172_k_anonymity").toString
    assert(!s.contains("Join"), s)
    assert(s.split("Exchange").length == 2, s) // exactly one exchange node
  }

  test("q194 fuzzy join: SymSpell candidates are an equi-join, never a cartesian") {
    val s = formatted("q194_fuzzy_join")
    assert(!s.contains("CartesianProduct") &&
      !s.contains("BroadcastNestedLoopJoin"), s)
    assert(s.contains("Join"), s) // and it IS a join (on the variant sig)
  }

  test("q195 pmi: vocab/df/N sides broadcast; per-doc pair join is equi, no cartesian") {
    val s = formatted("q195_pmi_cooccur")
    assert(!s.contains("CartesianProduct"), s)
    assert("BroadcastHashJoin".r.findAllIn(s).size >= 3, s)
    // the one BNLJ node allowed is the 1-row N crossJoin (formatted
    // output names each node twice: tree + detail section)
    assert("BroadcastNestedLoopJoin".r.findAllIn(s).size <= 2, s)
  }

  test("q192 ohlc: single two-phase aggregation, no window, no sort") {
    val s = plan("q192_ohlc_bars").toString
    assert(!s.contains("Window") && !s.contains("Join"), s)
    assert(s.split("Exchange").length == 2, s) // one exchange (partial agg)
  }

  test("q198 zorder report: pure aggregations, no window/sort/join machinery") {
    val s = plan("q198_zorder_skipping").toString
    assert(!s.contains("Window") && !s.contains("Join"), s)
    assert(s.contains("HashAggregate"), s)
  }

  test("q215 decontam: benchmark side broadcasts; no sort-merge on the corpus") {
    val s = formatted("q215_embedding_decontam")
    assert(s.contains("BroadcastNestedLoopJoin") || s.contains("BroadcastHashJoin"), s)
    assert(!s.contains("SortMergeJoin"), s)
  }

  test("q216 cdc apply: one key-partitioned window, no joins") {
    val s = plan("q216_cdc_apply").toString
    assert(s.contains("Window"), s)
    assert(!s.contains("Join"), s)
  }

  test("q225/q229: corpus stage is aggregation-only; rank windows run on the vocab frame") {
    for (q <- Seq("q225_token_gini", "q229_next_token_acc")) {
      val s = plan(q).toString
      assert(!s.contains("CartesianProduct"), s)
      assert(s.contains("HashAggregate"), s)
    }
  }

  test("q200 rtbf: membership joins stay hash joins; scans prune to key columns") {
    val s = formatted("q200_rtbf_audit")
    assert(!s.contains("CartesianProduct") &&
      !s.contains("BroadcastNestedLoopJoin"), s)
    val readSchemas = s.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!readSchemas.contains("o_comment") && !readSchemas.contains("l_comment"),
      readSchemas)
  }

  test("q239/q242 incremental index: zero-shuffle assignment, no cartesian, only the equality-compare join sort-merges") {
    for (q <- Seq("q239_ivf_incremental", "q242_pq_incremental")) {
      val s = plan(q).toString
      assert(!s.contains("CartesianProduct"), s"$q has a cartesian")
      // SMJ may appear ONLY for the incr-vs-scratch comparison join of
      // the two probe-assignment frames (equal-sized by construction —
      // the right plan); everything model-sized must broadcast
      val smj = "SortMergeJoin".r.findAllIn(s).size
      assert(smj <= 1, s"$q: $smj sort-merge joins — a model join degraded")
    }
    // the coarse assignment is a pure expression argmin — q239 must
    // carry NO window operator at all (the old form repartitioned the
    // corpus by id just to rank k candidate rows)
    assert(!plan("q239_ivf_incremental").toString.contains("Window"),
      "q239 assignment reintroduced a window shuffle")
    // q242's per-subspace code argmin is ALSO a pure expression now
    // (packed-key array_min over the codebook literal): no window, no
    // codebook join of any kind in the probe-assignment subtrees
    assert(!plan("q242_pq_incremental").toString.contains("Window"),
      "q242 code assignment reintroduced a window shuffle")
  }

  test("q241 audio spectral: narrow decode scan — payload dim broadcasts, no wide shuffle of payloads") {
    val s = formatted("q241_audio_spectral")
    // the 61-key payload dim joins by broadcast; the decode itself is
    // a mapPartitions over the joined frame (no Exchange after it)
    assert(s.contains("BroadcastHashJoin"), s)
    assert(!s.contains("SortMergeJoin"), s)
  }

  test("q240 span lang: scoring is scan-side; only (doc, lang) counts shuffle") {
    val s = formatted("q240_span_lang")
    // no join machinery at all — profiles are JVM-static
    assert(!s.contains("Join"), s)
    val readSchema = s.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!readSchema.contains("n_chars") && !readSchema.contains("source"),
      readSchema)
  }

  test("q265 q17-shape: per-part aggregate and brand dim both broadcast") {
    val s = formatted("q265_small_qty_revenue")
    assert("BroadcastHashJoin".r.findAllIn(s).size >= 2, s)
    assert(!s.contains("SortMergeJoin"), "decorrelated join degraded")
  }

  test("q262 silhouette: seeds broadcast; the corpus never self-joins") {
    val s = formatted("q262_silhouette")
    assert(s.contains("BroadcastNestedLoopJoin") ||
      s.contains("BroadcastHashJoin"), s)
    assert(!s.contains("CartesianProduct") && !s.contains("SortMergeJoin"), s)
  }

  test("q256 chi2 drift: grid joins broadcast, no corpus sort-merge") {
    val s = formatted("q256_chi2_drift")
    assert(!s.contains("SortMergeJoin") && !s.contains("CartesianProduct"), s)
  }

  test("q260 quantile norm: grid-position table broadcasts back to the corpus") {
    val s = formatted("q260_quantile_norm")
    assert(s.contains("BroadcastHashJoin"), s)
    assert(!s.contains("SortMergeJoin"), s)
  }

  test("q267 itemsets: basket self-join is an equi-join, not a cartesian") {
    val s = formatted("q267_brand_itemsets")
    assert(!s.contains("CartesianProduct"), s)
    // marginals/basket-count sides broadcast
    assert("BroadcastHashJoin".r.findAllIn(s).size >= 2, s)
  }

  test("q277 trimmed mean / q266 weighted pctl: value-grid windows, corpus aggregates once") {
    for (q <- Seq("q277_trimmed_mean", "q266_weighted_pctl")) {
      val s = formatted(q)
      assert(!s.contains("SortMergeJoin") && !s.contains("CartesianProduct"),
        s"$q degraded: $s")
    }
  }

  test("q295 cka: ONE corpus aggregation via the native gram buffer, no n*d^2 Generate") {
    val s = formatted("q295_cka_quant")
    // the d^2 reshape explodes ONE aggregated row; the corpus side
    // must reach graft_gram_agg without any Generate before the agg
    assert(s.contains("graft_gram_agg"), s)
    assert(!s.contains("CartesianProduct") && !s.contains("SortMergeJoin"), s)
  }

  test("q296 rewrite: levenshtein runs on the name-pair frame, which broadcasts to parts") {
    val s = formatted("q296_name_match")
    assert(s.contains("BroadcastHashJoin"), s)
    assert(!s.contains("CartesianProduct"), s)
  }

  test("q311 jw linkage: length-band join never degrades to a cartesian of parts") {
    val s = formatted("q311_jw_linkage")
    assert(s.contains("graft_jaro_winkler"), s)
    assert(!s.contains("CartesianProduct"), s)
  }

  test("q320 hhi / q326 eb: dimension joins broadcast, no corpus sort-merge") {
    for (q <- Seq("q320_hhi", "q326_eb_shrink")) {
      val s = formatted(q)
      assert(s.contains("BroadcastHashJoin"), s"$q: $s")
      assert(!s.contains("SortMergeJoin"), s"$q degraded: $s")
    }
  }

  test("q310 cms: sketch and probes are hash aggregations, no wide join of events") {
    val s = formatted("q310_cms_heavy")
    assert(!s.contains("CartesianProduct"), s)
    // the probe join runs on the (r, c) counter table, not raw events
    assert(s.contains("HashAggregate"), s)
  }

  test("q335 temporal labels: one pass — single user aggregation, no self-join") {
    val s = formatted("q335_temporal_labels")
    assert(!s.contains("Join"), s"label builder must not join: $s")
  }

  test("q348 Q2-shape: ONE lineitem scan (window-min decorrelation, no " +
      "per-outer rescan); dims broadcast") {
    val s = formatted("q348_min_cost_supplier")
    assert("lineitem\\.parquet".r.findAllIn(s).size <= 1,
      s"correlated-min decorrelation must not rescan the fact table:\n$s")
    assert(s.contains("BroadcastHashJoin"), s)
    assert(!s.contains("CartesianProduct"), s)
  }

  test("q349 Q4-shape: EXISTS decorrelates to one LEFT SEMI join, one scan " +
      "of each input") {
    val s = formatted("q349_waiting_orders")
    assert(s.contains("LeftSemi"), s"EXISTS must become a semi join:\n$s")
    assert("lineitem\\.parquet".r.findAllIn(s).size <= 1, s)
    assert("orders\\.parquet".r.findAllIn(s).size <= 1, s)
  }

  test("q350 Q20-shape: nested-IN-with-agg is one fact aggregation + semi " +
      "join, ONE lineitem scan") {
    val s = formatted("q350_majority_suppliers")
    assert(s.contains("LeftSemi"), s"IN must become a semi join:\n$s")
    assert("lineitem\\.parquet".r.findAllIn(s).size <= 1,
      s"correlated per-part total must reuse the aggregated frame:\n$s")
  }

  test("q353 Q15-shape / q354 Q11-shape: agg view materialized once — final " +
      "plan has ZERO fact rescans for the scalar max/total branch") {
    for (q <- Seq("q353_top_supplier", "q354_important_parts")) {
      val s = formatted(q)
      assert(!s.contains("lineitem.parquet"),
        s"$q: both scalar-subquery branches must read the checkpointed " +
          s"agg view, not re-scan the fact table:\n$s")
    }
  }

  test("q355 Q22-shape: NOT EXISTS is a LEFT ANTI join; the priority " +
      "predicate pushes into the orders scan") {
    val s = formatted("q355_lost_customers")
    assert(s.contains("LeftAnti"), s"NOT EXISTS must become anti join:\n$s")
    assert(s.contains("EqualTo(o_orderpriority,1-URGENT)") ||
      s.contains("o_orderpriority), (o_orderpriority = 1-URGENT") ||
      s.contains("1-URGENT"), s"priority filter must reach the scan:\n$s")
    assert("orders\\.parquet".r.findAllIn(s).size <= 1, s)
  }

  test("q356 triplet mining: anchors broadcast onto one corpus scan; " +
      "argmin/argmax is one aggregation, no rank-window shuffle") {
    val s = formatted("q356_triplet_mining")
    assert(s.contains("BroadcastHashJoin") ||
      s.contains("BroadcastNestedLoopJoin"),
      s"anchor side must broadcast:\n$s")
    assert(!s.contains("CartesianProduct"), s)
    assert("embeddings\\.parquet".r.findAllIn(s).size <= 2,
      s"corpus + anchors only:\n$s")
  }

  test("q352 winnow store serve: plan reads the persisted pair store, NEVER " +
      "the raw document corpus") {
    val s = formatted("q352_winnow_store")
    assert(s.contains("graft_winnow_store"),
      s"serve path must scan the persisted store:\n$s")
    assert(!s.contains("documents.parquet"),
      s"serve path must not rescan raw text:\n$s")
  }

  test("q365 LSH band store serve: plan reads the persisted band store, " +
      "NEVER the raw document corpus") {
    val s = formatted("q365_lsh_store")
    assert(s.contains("graft_q365"),
      s"serve path must scan the persisted store:\n$s")
    assert(!s.contains("documents.parquet"),
      s"serve path must not rescan raw text:\n$s")
  }

  test("q366 SimHash band store serve: plan reads the persisted band store, " +
      "NEVER the raw document corpus") {
    val s = formatted("q366_simhash_store")
    assert(s.contains("graft_q366"),
      s"serve path must scan the persisted store:\n$s")
    assert(!s.contains("documents.parquet"),
      s"serve path must not rescan raw text:\n$s")
  }

  test("q367 local supplier volume (Q5): dims broadcast, date filter reaches " +
      "the orders scan, one lineitem scan") {
    val s = formatted("q367_local_supplier_volume")
    assert(s.contains("BroadcastHashJoin"), s"dims must broadcast:\n$s")
    assert(!s.contains("CartesianProduct"), s)
    assert(s.contains("o_orderdate"), s)
    assert("PushedFilters:.*o_orderdate".r.findFirstIn(s).isDefined ||
      s.contains("GreaterThanOrEqual(o_orderdate"),
      s"order-date filter must push to the scan:\n$s")
    assert("lineitem\\.parquet".r.findAllIn(s).size <= 1,
      s"one fact scan only:\n$s")
  }

  test("q375 KMV sketch: per-batch scans only (two parity batches), " +
      "no cartesian, rank window keyed by the group") {
    val s = formatted("q375_kmv_distinct")
    assert("documents\\.parquet".r.findAllIn(s).size <= 2,
      s"one scan per batch sketch, no extra corpus passes:\n$s")
    assert(!s.contains("CartesianProduct"), s)
    // k-min is the bounded MAP-SIDE-COMBINED aggregate, not a rank
    // window: no group-wide sort exchange may exist (the window form
    // shuffled every distinct coordinate; the agg ships <= k per
    // group per partition)
    assert(s.contains("graft_kmin_distinct"),
      s"k-min must be the bounded aggregate:\n$s")
    assert(!s.contains("row_number"),
      s"the rank-window k-min shape must be gone:\n$s")
  }

  test("q374 disjunctive brand/quantity predicate (Q19): ONE lineitem scan, " +
      "part side broadcast") {
    val s = formatted("q374_brand_quantity_revenue")
    assert(s.contains("BroadcastHashJoin"), s"part side must broadcast:\n$s")
    assert("lineitem\\.parquet".r.findAllIn(s).size <= 1,
      s"the OR-of-conjunctions must not union multiple passes:\n$s")
  }

  test("AQE splits a skewed sort-merge join at runtime — the no-salt " +
      "complement to SkewOps the 100 TB story leans on") {
    // SkewOps documents manual salting for KNOWN hot keys; for
    // unknown skew the design leans on AQE's runtime skew-join
    // split. This probe proves the repo's join shapes actually get
    // it: an 80%-hot-key equi-join under forced-low thresholds must
    // execute as SortMergeJoin(skew=true) — i.e. the straggler
    // partition was split, no salting required.
    import spark.implicits._
    val keep = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k)).toMap
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
    spark.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      val big = spark.range(100000)
        .select(org.apache.spark.sql.functions.when($"id" < 80000, 0L)
          .otherwise($"id").as("k"), $"id".as("v"))
      val dim = spark.range(200).select($"id".as("k"), ($"id" * 2).as("w"))
      val joined = big.join(dim, "k")
      // only the hot key matches the dim (non-hot keys are >= 80000):
      // exactly the worst case — ALL matching work in one partition.
      // collect() (not count(), which builds a SEPARATE aggregate
      // plan) so THIS queryExecution's adaptive plan is the one that
      // finalizes and can be inspected below.
      val n = joined.collect().length
      assert(n === 80000, s"join correctness under skew split: $n")
      val s = joined.queryExecution.executedPlan.toString
      assert(s.contains("SortMergeJoin"), s"must exercise SMJ, got:\n$s")
      assert(s.contains("skew=true"),
        s"AQE must mark the hot partition's join skewed:\n$s")
    } finally keep.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
