package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** End-to-end corpus-curation composition: the length / language /
  * repetition / contamination / dedup stages every large-scale
  * training-data pipeline chains, composed from the individual
  * operators in TextOps and DedupOps.
  *
  * Physical shape (the part that matters at 100 TB):
  *  - every per-document signal (token count, language markers,
  *    duplicate-2-gram fraction, fingerprint) is computed in ONE scan
  *    of the corpus — pure row expressions, no shuffle;
  *  - the only joins are (a) the benchmark-gram semi-join inside
  *    `DedupOps.contaminationOverlap`, whose benchmark side broadcasts,
  *    and (b) joining those per-doc contamination rows back by doc id;
  *  - the funnel summary is one aggregation of boolean flags — the
  *    cumulative stage counts come from sums over ONE pass instead of
  *    re-filtering (and re-scanning) per stage.
  */
object CurationPipeline {

  /** Stage thresholds. Defaults are tuned for the synthetic
    * `documents` table: see q63's oracle for the exact mirror.
    */
  case class Thresholds(
      minTokens: Long = 25,
      maxTokens: Long = 95,
      maxDup2gramFrac: Double = 0.1,
      maxContamination: Double = 0.05)

  /** Per-document curation signals + cumulative stage-pass flags.
    * One corpus scan + the contamination join. Flags are cumulative
    * (a stage only passes if all earlier stages passed) so both the
    * funnel and the final filter read them directly.
    */
  def signals(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String,
      t: Thresholds = Thresholds()): DataFrame = {
    val w = col("_w")
    val g2 = col("_g2")
    val grams2 = when(size(w) >= 2,
      transform(sequence(lit(1), size(w) - 1),
        i => concat_ws(" ", element_at(w, i), element_at(w, i + 1)))
    ).otherwise(array())
    // explode(array(..)) Generate barrier — see DedupOps.wordShingles:
    // a plain Project would inline the tokenizer into the gram lambda.
    val base = corpus
      .select(col(idCol).as("id"), col(textCol).as("_t"),
        split(lower(col(textCol)), TextOps.Ws).as("_w"))
      .select(col("id"), col("_t"), explode(array(grams2)).as("_g2"))
      .select(col("id"),
        regexp_count(col("_t"), lit(TextOps.NonWs)).as("n_tokens"),
        TextOps.langScore(col("_t"), "en").as("s_en"),
        when(size(g2) > 0,
          lit(1.0) - size(array_distinct(g2)).cast("double") / size(g2))
          .otherwise(0.0).as("dup_2gram_frac"),
        TextOps.fingerprint(col("_t")).as("fp"))
    val contamination = DedupOps
      .contaminationOverlap(corpus, benchmark, idCol, textCol, 3)
      .select(col("id"), col("contamination"))
    val passLen = col("n_tokens").between(t.minTokens, t.maxTokens)
    base.join(contamination, Seq("id"), "left")
      .withColumn("contamination", coalesce(col("contamination"), lit(0.0)))
      .withColumn("pass_len", passLen)
      .withColumn("pass_lang", passLen && col("s_en") > 0)
      .withColumn("pass_rep",
        col("pass_lang") && col("dup_2gram_frac") <= t.maxDup2gramFrac)
      .withColumn("pass_clean",
        col("pass_rep") && col("contamination") < t.maxContamination)
  }

  /** Curated corpus: documents passing every stage, one survivor per
    * fingerprint (longest text, ties → lowest id).
    */
  def curate(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String,
      t: Thresholds = Thresholds()): DataFrame = {
    val s = signals(corpus, benchmark, idCol, textCol, t)
      .filter(col("pass_clean"))
    DedupOps.keepBest(s, "id", col("fp"), col("n_tokens"))
      .select(col("keep_id").as("id"), col("dedup_key").as("fp"))
  }

  /** One-row cumulative funnel: how many documents survive each stage.
    * The dedup stage is `count(distinct fingerprint)` over the final
    * survivors — no second pass.
    */
  def funnel(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String,
      t: Thresholds = Thresholds()): DataFrame =
    signals(corpus, benchmark, idCol, textCol, t).agg(
      count(lit(1)).as("n_total"),
      sum(col("pass_len").cast("long")).as("n_len"),
      sum(col("pass_lang").cast("long")).as("n_lang"),
      sum(col("pass_rep").cast("long")).as("n_rep"),
      sum(col("pass_clean").cast("long")).as("n_clean"),
      count_distinct(when(col("pass_clean"), col("fp"))).as("n_dedup"))

  /** Curation funnel V2 — the same cumulative-funnel shape built from
    * the TRAINED/MODEL-BASED stages instead of fixed heuristics:
    *
    *  1. language: char-trigram profile prediction == `targetLang`
    *     ([[LangNgram]], native expression — replaces marker regexes);
    *  2. quality: IRLS-trained logistic scorer ≥ `minQuality`
    *     ([[TextOps.TrainedQualityWeights]] — replaces hand thresholds);
    *  3. substring exposure: total tokens inside verbatim ≥4-token
    *     spans repeated ANYWHERE in the corpus ≤ `maxSubstrTokens`
    *     ([[DedupOps.substrDupSpans]] — boilerplate/template pressure);
    *  4. dedup: distinct whitespace-insensitive fingerprints among
    *     survivors.
    *
    * Physical shape: stages 1, 2 and the fingerprint are pure
    * projections (two corpus scans joined back by id — the quality
    * scorer needs its own Generate barrier); stage 3 is the
    * posting-list span pass whose shuffles are keyed by k-gram digest
    * and id. Everything aggregates to ONE row. Argmax here uses
    * array_position(scores, array_max(scores)) — first occurrence, so
    * ties resolve to the earlier language exactly like q96's CASE.
    */
  def funnelV2(corpus: DataFrame, idCol: String, textCol: String,
      targetLang: String = "en", minQuality: Double = 0.44,
      maxSubstrTokens: Long = 24): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    def langPredOf(t: Column): Column = {
      val sc = call_function("graft_lang_scores", coalesce(t, lit("")))
      element_at(typedLit(LangNgram.langs),
        array_position(sc, array_max(sc)).cast("int"))
    }
    // the lang-score + fingerprint pass is per-row compute over the
    // raw corpus — floor it off a single-split scan like the other
    // text entry points (guide §2.5)
    val base = SkewOps.parallelismFloor(
        corpus.select(col(idCol).as("id"), col(textCol).as("_t")))
      .select(col("id"),
        langPredOf(col("_t")).as("lang_pred"),
        TextOps.fingerprint(col("_t")).as("fp"))
    val qual = TextOps.qualityScore(corpus, idCol, textCol,
      TextOps.TrainedQualityWeights)
    val spans = DedupOps.substrDupSpans(corpus, idCol, textCol, k = 4)
      .groupBy("id").agg(sum("span_tokens").as("substr_tokens"))
    // three independent signal subtrees: overlap their jobs
    // (guide §2.6) instead of running them back to back inside one
    // serial AQE chain
    val Seq(baseC, qualC, spansC) =
      Checkpoints.concurrently(Seq(base, qual, spans))
    baseC
      .join(qualC, Seq("id"))
      .join(spansC, Seq("id"), "left")
      .withColumn("substr_tokens", coalesce(col("substr_tokens"), lit(0L)))
      .withColumn("p_lang", col("lang_pred") === targetLang)
      .withColumn("p_quality", col("p_lang") && col("quality") >= minQuality)
      .withColumn("p_substr",
        col("p_quality") && col("substr_tokens") <= maxSubstrTokens)
      .agg(
        count(lit(1)).as("n_total"),
        sum(col("p_lang").cast("long")).as("n_lang"),
        sum(col("p_quality").cast("long")).as("n_quality"),
        sum(col("p_substr").cast("long")).as("n_substr"),
        count_distinct(when(col("p_substr"), col("fp"))).as("n_dedup"))
  }

  /** Per-document curation DECISION MANIFEST — the audit artifact a
    * funnel (q63/q100) deliberately aggregates away: for every doc,
    * did it survive, and if not, which stage dropped it first. At
    * 100 TB "why was this document removed" must be answerable
    * without rerunning the pipeline; this IS the provenance record a
    * release ships next to the corpus.
    *
    * Stages (first failure wins): `rules` (three representative
    * battery rules — length band, symbol-spam ratio, stopword floor;
    * the full battery stays q112), `blocklist` (Aho–Corasick hits ≥
    * minHits), `duplicate` (exact text dup among docs that PASSED the
    * earlier stages — first doc_id keeps, q63's first-wins
    * semantics), else `keep`. Plan: zero-shuffle signals + one narrow
    * (id, fp) window shuffle for the survivor dedup rank — text never
    * moves.
    */
  def decisionManifest(df: DataFrame, idCol: String, textCol: String,
      phrases: Seq[String] = BlocklistOps.DefaultPhrases,
      minHits: Int = 3): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val t = col("t")
    val nWords = size(TextOps.tokens(t))
    val nSym = regexp_count(t, lit("#")) + regexp_count(t, lit("\\.\\.\\.")) +
      regexp_count(t, lit("…"))
    val symbolRatio = round(nSym.cast("double") / greatest(nWords, lit(1)), 5)
    val hits = aggregate(call_function("graft_blocklist_counts",
      lit(phrases.mkString("\u0000")), lower(t)), lit(0L), (a, x) => a + x)
    val sig = df.select(col(idCol).as("id"),
        coalesce(col(textCol), lit("")).as("t"))
      .select(col("id"), col("t"), nWords.cast("long").as("n_words"),
        symbolRatio.as("symbol_ratio"),
        TextOps.stopwordCount(t).cast("long").as("n_stop"),
        hits.as("n_hits"))
      .withColumn("pass_rules",
        col("n_words") >= 10 && col("n_words") <= 100000 &&
          col("symbol_ratio") <= 0.1 && col("n_stop") >= 2)
      .withColumn("pass_block", col("pass_rules") && col("n_hits") < minHits)
    val ranked = sig.where(col("pass_block"))
      .select(col("id"), md5(col("t").cast("binary")).as("fp"))
      .withColumn("dup_rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("fp").orderBy("id")))
    sig.join(ranked.select(col("id"), col("dup_rank")), Seq("id"), "left")
      .select(col("id"), col("n_words"), col("n_hits"),
        when(!col("pass_rules"), lit("rules"))
          .when(col("n_hits") >= minHits, lit("blocklist"))
          .when(col("dup_rank") > 1, lit("duplicate"))
          .otherwise(lit("keep")).as("reason"))
      .withColumn("keep", (col("reason") === "keep").cast("int"))
  }
}
