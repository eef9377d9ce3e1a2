package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registration of graft's native expressions.
  *
  * Two entry points:
  *  - `GraftExtensions` for `spark.sql.extensions=graft.functions.GraftExtensions`
  *    (SQL users get `graft_cosine(a, b)` in every session);
  *  - `GraftFunctions.register(spark)` for programmatic sessions
  *    (used by Verify/Bench), plus typed `Column` wrappers.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.descriptors.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftFunctions {

  val descriptors: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_cosine",
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"graft_cosine requires exactly 2 arguments, got ${children.size}")
        CosineSimilarity(children.head, children(1))
      }),
    ("graft_gram_agg",
      new ExpressionInfo(classOf[GramAgg].getName, "graft_gram_agg"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"graft_gram_agg requires exactly 2 arguments, got ${children.size}")
        GramAgg(children.head, children(1))
      }),
    ("graft_jaro_winkler",
      new ExpressionInfo(classOf[JaroWinkler].getName, "graft_jaro_winkler"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"graft_jaro_winkler requires exactly 2 arguments, got ${children.size}")
        JaroWinkler(children.head, children(1))
      }),
    ("graft_offset_depth",
      new ExpressionInfo(classOf[OffsetDepth].getName, "graft_offset_depth"),
      (children: Seq[Expression]) => {
        require(children.size == 6,
          s"graft_offset_depth requires exactly 6 arguments, got ${children.size}")
        OffsetDepth(children(0), children(1), children(2), children(3),
          children(4), children(5))
      }),
    ("graft_nearest_cells",
      new ExpressionInfo(classOf[NearestCells].getName, "graft_nearest_cells"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"graft_nearest_cells requires exactly 2 arguments, got ${children.size}")
        NearestCells(children.head, children(1))
      }),
    ("graft_minhash_sig",
      new ExpressionInfo(classOf[MinHashSig].getName, "graft_minhash_sig"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"graft_minhash_sig requires exactly 2 arguments, got ${children.size}")
        MinHashSig(children.head, children(1))
      }),
    ("graft_micro_plane_bits",
      new ExpressionInfo(classOf[MicroPlaneBits].getName,
        "graft_micro_plane_bits"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"graft_micro_plane_bits requires exactly 2 arguments, got ${children.size}")
        MicroPlaneBits(children.head, children(1))
      }),
    ("graft_md5_longs",
      new ExpressionInfo(classOf[Md5Longs].getName, "graft_md5_longs"),
      (children: Seq[Expression]) => {
        require(children.size == 1,
          s"graft_md5_longs requires exactly 1 argument, got ${children.size}")
        Md5Longs(children.head)
      }),
    ("graft_kmin_distinct",
      new ExpressionInfo(classOf[KMinDistinct].getName, "graft_kmin_distinct"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"graft_kmin_distinct requires exactly 2 arguments, got ${children.size}")
        KMinDistinct(children.head, children(1))
      }),
    ("graft_simhash",
      new ExpressionInfo(classOf[SimHashAgg].getName, "graft_simhash"),
      (children: Seq[Expression]) => {
        require(children.size == 1,
          s"graft_simhash requires exactly 1 argument, got ${children.size}")
        SimHashAgg(children.head)
      }),
    ("graft_lsh_bits",
      new ExpressionInfo(classOf[LshBits].getName, "graft_lsh_bits"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"graft_lsh_bits requires exactly 2 arguments, got ${children.size}")
        LshBits(children.head, children(1))
      }),
    ("graft_topk_freq",
      new ExpressionInfo(classOf[TopKFreq].getName, "graft_topk_freq"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"graft_topk_freq requires exactly 2 arguments, got ${children.size}")
        TopKFreq(children.head, children(1))
      }),
    ("graft_bloom_contains",
      new ExpressionInfo(classOf[BloomContains].getName, "graft_bloom_contains"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"graft_bloom_contains requires exactly 2 arguments, got ${children.size}")
        BloomContains(children.head, children(1))
      }),
    ("graft_bloom_contains_ref",
      new ExpressionInfo(classOf[BloomContainsRef].getName, "graft_bloom_contains_ref"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"graft_bloom_contains_ref requires exactly 2 arguments, got ${children.size}")
        // the token literal resolves to the driver-registered
        // broadcast at analysis (the DropProbe pattern); the handle
        // then serializes into the expression, keeping the filter
        // payload out of the plan
        val token = children.head.eval() match {
          case s: org.apache.spark.unsafe.types.UTF8String => s.toString
          case s: String => s
          case other => sys.error(s"graft_bloom_contains_ref: non-string token $other")
        }
        BloomContainsRef(children.head, children(1))(BloomBroadcasts.get(token))
      }),
    ("graft_ordered_pairs",
      new ExpressionInfo(classOf[OrderedPairs].getName, "graft_ordered_pairs"),
      (children: Seq[Expression]) => {
        require(children.size == 1,
          s"graft_ordered_pairs requires exactly 1 argument, got ${children.size}")
        OrderedPairs(children.head)
      }),
    ("graft_bpe_encode",
      new ExpressionInfo(classOf[BpeEncode].getName, "graft_bpe_encode"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"graft_bpe_encode requires exactly 2 arguments, got ${children.size}")
        BpeEncode(children.head, children(1))
      }),
    ("graft_bounded_collect",
      new ExpressionInfo(classOf[BoundedCollect].getName, "graft_bounded_collect"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"graft_bounded_collect requires exactly 2 arguments, got ${children.size}")
        BoundedCollect(children.head, children(1))
      }),
    ("graft_drop_probe",
      new ExpressionInfo(classOf[DropProbe].getName, "graft_drop_probe"),
      (children: Seq[Expression]) => {
        require(children.size == 3,
          s"graft_drop_probe requires exactly 3 arguments, got ${children.size}")
        // the name literal resolves to driver-registered accumulators,
        // which then serialize into the expression like any metric
        val name = children.head.eval() match {
          case s: org.apache.spark.unsafe.types.UTF8String => s.toString
          case s: String => s
          case other => sys.error(s"graft_drop_probe: non-string name $other")
        }
        val (t, d, h) = graft.ops.DropGuard.accumulators(name)
        DropProbe(children(1), children(2), t, d, h)
      }),
    ("graft_pq_encode",
      new ExpressionInfo(classOf[PqEncode].getName, "graft_pq_encode"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"graft_pq_encode requires exactly 2 arguments, got ${children.size}")
        PqEncode(children.head, children(1))
      }),
    ("graft_pq_adc_table",
      new ExpressionInfo(classOf[PqAdcTable].getName, "graft_pq_adc_table"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"graft_pq_adc_table requires exactly 2 arguments, got ${children.size}")
        PqAdcTable(children.head, children(1))
      }),
    ("graft_deflate_len",
      new ExpressionInfo(classOf[DeflateLen].getName, "graft_deflate_len"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"graft_deflate_len requires exactly 2 arguments, got ${children.size}")
        DeflateLen(children.head, children(1))
      }),
    ("graft_minhash_row",
      new ExpressionInfo(classOf[MinHashRow].getName, "graft_minhash_row"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"graft_minhash_row requires exactly 2 arguments, got ${children.size}")
        MinHashRow(children.head, children(1))
      }),
    ("graft_cdc_chunks",
      new ExpressionInfo(classOf[CdcChunks].getName, "graft_cdc_chunks"),
      (children: Seq[Expression]) => {
        require(children.size == 3,
          s"graft_cdc_chunks requires exactly 3 arguments, got ${children.size}")
        CdcChunks(children(0), children(1), children(2))
      }),
    ("graft_winnow",
      new ExpressionInfo(classOf[WinnowFp].getName, "graft_winnow"),
      (children: Seq[Expression]) => {
        require(children.size == 3,
          s"graft_winnow requires exactly 3 arguments, got ${children.size}")
        WinnowFp(children(0), children(1), children(2))
      }),
    ("graft_nfc",
      new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc"),
      (children: Seq[Expression]) => {
        require(children.size == 1,
          s"graft_nfc requires exactly 1 argument, got ${children.size}")
        NfcNormalize(children.head)
      }),
    ("graft_fix_mojibake",
      new ExpressionInfo(classOf[FixMojibake].getName, "graft_fix_mojibake"),
      (children: Seq[Expression]) => {
        require(children.size == 1,
          s"graft_fix_mojibake requires exactly 1 argument, got ${children.size}")
        FixMojibake(children.head)
      }),
    ("graft_fix_mojibake_spans",
      new ExpressionInfo(classOf[FixMojibakeSpans].getName,
        "graft_fix_mojibake_spans"),
      (children: Seq[Expression]) => {
        require(children.size == 1,
          s"graft_fix_mojibake_spans requires exactly 1 argument, " +
            s"got ${children.size}")
        FixMojibakeSpans(children.head)
      }),
    ("graft_lang_scores",
      new ExpressionInfo(classOf[LangNgramScores].getName, "graft_lang_scores"),
      (children: Seq[Expression]) => {
        require(children.size == 1,
          s"graft_lang_scores requires exactly 1 argument, got ${children.size}")
        LangNgramScores(children.head)
      }),
    ("graft_lang_model_scores",
      new ExpressionInfo(classOf[LangModelScores].getName, "graft_lang_model_scores"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"graft_lang_model_scores requires exactly 2 arguments, got ${children.size}")
        // key literal → driver-registered model (DropProbe pattern)
        val key = children.head.eval() match {
          case s: org.apache.spark.unsafe.types.UTF8String => s.toString
          case s: String => s
          case other => sys.error(s"graft_lang_model_scores: non-string key $other")
        }
        LangModelScores(children(1), graft.ops.LangProfiles.modelFor(key))
      }),
    ("graft_unigram_expect",
      new ExpressionInfo(classOf[UnigramExpect].getName, "graft_unigram_expect"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"graft_unigram_expect requires exactly 2 arguments, got ${children.size}")
        UnigramExpect(children.head, children(1))
      }),
    ("graft_unigram_encode",
      new ExpressionInfo(classOf[UnigramEncode].getName, "graft_unigram_encode"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"graft_unigram_encode requires exactly 2 arguments, got ${children.size}")
        UnigramEncode(children.head, children(1))
      }),
    ("graft_greedy_pieces",
      new ExpressionInfo(classOf[GreedyPieces].getName, "graft_greedy_pieces"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"graft_greedy_pieces requires exactly 2 arguments, got ${children.size}")
        GreedyPieces(children.head, children(1))
      }),
    ("graft_blocklist_counts",
      new ExpressionInfo(classOf[BlocklistCounts].getName,
        "graft_blocklist_counts"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"graft_blocklist_counts requires exactly 2 arguments, " +
            s"got ${children.size}")
        // NUL-joined phrase-list literal (NUL cannot appear in a
        // phrase) — the phrases ride the expression tree itself, no
        // driver-side registry to keep alive.
        val phrases = children.head.eval() match {
          case s: org.apache.spark.unsafe.types.UTF8String =>
            s.toString.split('\u0000').toSeq
          case other => sys.error(s"graft_blocklist_counts: non-string phrase list $other")
        }
        BlocklistCounts(children(1), phrases)
      }))

  /** Register into an existing session's function registry. Idempotent. */
  def register(spark: SparkSession): Unit = {
    val reg: FunctionRegistry = spark.sessionState.functionRegistry
    descriptors.foreach { case (name, info, builder) =>
      reg.registerFunction(FunctionIdentifier(name), info, builder)
    }
  }

  /** Typed wrapper: native cosine over array<double> columns. Resolves
    * through the session's function registry (register(spark) first).
    */
  def cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("graft_cosine", a, b)
}
