package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines.
  *
  * All operators are pure column expressions (whole-stage-codegen
  * friendly, no UDFs) so they stay inside one codegen span per scan and
  * scale linearly with partition count — no shuffles except the final
  * aggregations callers add.
  */
object TextOps {

  /** Number of non-whitespace token runs. */
  def tokenCount(text: Column): Column =
    regexp_count(text, lit("\\S+")).as("n_tokens")

  /** Count of punctuation characters (fixed ASCII class). */
  def punctCount(text: Column): Column =
    regexp_count(text, lit("[.,;:!?]"))

  /** Count of common-English stopword tokens. */
  def stopwordCount(text: Column): Column =
    regexp_count(lower(text), lit("\\b(the|a|of|to|and)\\b"))

  /** Character count excluding all whitespace. */
  def charNoWs(text: Column): Column =
    length(regexp_replace(text, "\\s", ""))

  /** Whitespace-normalized md5 fingerprint (document identity modulo
    * formatting). Deterministic — usable as an exact-dedup key.
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(text), "\\s+", "").cast("binary"))

  /** Heuristic marker-word scores per language. */
  val langMarkers: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|and|of)\\b",
    "de" -> "\\b(der|die|und)\\b",
    "fr" -> "\\b(le|la|et)\\b",
    "es" -> "\\b(el|los|y)\\b")

  def langScore(text: Column, lang: String): Column = {
    val re = langMarkers.toMap.apply(lang)
    regexp_count(lower(text), lit(re))
  }

  /** Argmax over the marker scores, ties resolved in langMarkers order. */
  def langPredict(text: Column): Column = {
    val scores = langMarkers.map { case (l, _) => l -> langScore(text, l) }
    // s_en >= all later => en; else s_de >= all later => de; ...
    scores.zipWithIndex.foldRight(lit(scores.last._1)) {
      case (((lang, score), i), rest) =>
        val laters = scores.drop(i + 1).map(_._2)
        if (laters.isEmpty) rest
        else when(laters.map(score >= _).reduce(_ && _), lit(lang)).otherwise(rest)
    }
  }

  /** Per-document quality metrics (ratios rounded for cross-engine
    * determinism — integer counts divide exactly in ieee754 but the
    * rounding keeps the oracle contract explicit).
    */
  def qualityMetrics(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val toks = regexp_count(t, lit("\\S+"))
    df.select(
      col(idCol),
      toks.as("n_tokens"),
      punctCount(t).as("n_punct"),
      stopwordCount(t).as("n_stop"),
      round(punctCount(t).cast("double") / greatest(length(t), lit(1)), 5).as("punct_ratio"),
      round(stopwordCount(t).cast("double") / greatest(toks, lit(1)), 5).as("stop_ratio"),
      round(charNoWs(t).cast("double") / greatest(toks, lit(1)), 4).as("avg_token_len"))
  }
}
