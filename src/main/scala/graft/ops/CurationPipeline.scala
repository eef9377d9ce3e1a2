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
    val sc = call_function("graft_lang_scores",
      coalesce(col(textCol), lit("")))
    val langPred = element_at(typedLit(LangNgram.langs),
      array_position(sc, array_max(sc)).cast("int"))
    val base = corpus.select(col(idCol).as("id"),
      langPred.as("lang_pred"),
      TextOps.fingerprint(col(textCol)).as("fp"))
    val qual = TextOps.qualityScore(corpus, idCol, textCol,
      TextOps.TrainedQualityWeights)
    val spans = DedupOps.substrDupSpans(corpus, idCol, textCol, k = 4)
      .groupBy("id").agg(sum("span_tokens").as("substr_tokens"))
    base
      .join(qual, Seq("id"))
      .join(spans, Seq("id"), "left")
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
}
