package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Span-level (code-switching) language identification.
  *
  * Doc-level lang-ID ([[LangNgram]], q96) gives a mixed-language
  * document — common in web crawls (quoted sources, bilingual
  * boilerplate, forum replies) — exactly one label, which both
  * mislabels the minority spans AND pollutes per-language corpora
  * with foreign passages. This operator runs the SAME frozen trigram
  * profiles over sentence spans (the engine-portable terminator
  * split TextOps.sentences / q211 chunking already use) and emits
  * per-span labels plus a per-document mixture summary.
  *
  * Determinism: span extraction is the portable `([.!?])[ \t\n\f\r]+`
  * split (explicit whitespace class — Java/RE2 portable), scoring is
  * the integer-weight profile sum (associative), the per-span argmax
  * ties break by [[LangNgram.langs]] order, and the per-doc majority
  * ties break by (count desc, langs order asc) — every stage replays
  * in DuckDB, so q240 is a full triple-green oracle row.
  *
  * Scale shape: one corpus scan → explode to spans (output rows ≈
  * sentences, strictly bounded by corpus size) → native per-span
  * score projection (zero joins, profile is JVM-static) → one
  * groupBy(doc, lang) + one doc-keyed window. No shuffle carries
  * text: spans collapse to (doc_id, lang_pred) counts immediately.
  */
object LangSpanOps {

  /** Sentence spans: (doc_id, span_idx 0-based over NON-EMPTY spans,
    * span). Terminator+whitespace becomes terminator+, split on
    * the marker, empties dropped BEFORE indexing (the oracle filters
    * the list the same way).
    */
  def sentenceSpans(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val arr = filter(
      split(regexp_replace(coalesce(col(textCol), lit("")),
        "([.!?])[ \\t\\n\\f\\r]+", "$1"), ""),
      s => length(s) > 0)
    docs.select(col(idCol).as("doc_id"), posexplode(arr).as(Seq("span_idx", "span")))
  }

  /** Per-span language labels: (doc_id, span_idx, span_lang). */
  def spanPredict(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val langs = LangNgram.langs
    val scored = sentenceSpans(docs, idCol, textCol)
      .select(col("doc_id"), col("span_idx"),
        call_function("graft_lang_scores", col("span")).as("_sc"))
      .select(col("doc_id") +: col("span_idx") +:
        langs.zipWithIndex.map { case (l, i) =>
          element_at(col("_sc"), i + 1).as(s"s_$l")
        }: _*)
    // argmax with earlier-language tie-break (the q96 fold)
    val pred = langs.zipWithIndex.foldRight(lit(langs.last)) {
      case ((l, i), rest) =>
        val laters = langs.drop(i + 1).map(o => col(s"s_$l") >= col(s"s_$o"))
        if (laters.isEmpty) rest
        else when(laters.reduce(_ && _), lit(l)).otherwise(rest)
    }
    scored.select(col("doc_id"), col("span_idx"), pred.as("span_lang"))
  }

  /** Per-document code-switching mixture: span count, distinct span
    * languages, the majority span language (count desc, profile order
    * asc on ties), its share, and the mixed flag. Documents with no
    * spans (empty text) emit no row — same as the span frame.
    *
    * @return (doc_id, n_spans, n_langs, lang_major, major_frac, mixed)
    */
  def docMixture(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val langs = LangNgram.langs
    val langOrd: Column = langs.zipWithIndex.foldRight(lit(langs.size)) {
      case ((l, i), rest) => when(col("span_lang") === l, lit(i)).otherwise(rest)
    }
    val g = spanPredict(docs, idCol, textCol)
      .groupBy(col("doc_id"), col("span_lang"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("doc_id")
    val r = g.select(col("doc_id"), col("span_lang"), col("n"),
        row_number().over(w.orderBy(col("n").desc, langOrd.asc)).as("rn"),
        sum("n").over(w).as("n_spans"),
        count(lit(1)).over(w).as("n_langs"))
    r.where(col("rn") === 1)
      .select(col("doc_id"), col("n_spans"), col("n_langs"),
        col("span_lang").as("lang_major"),
        round(col("n").cast("double") / col("n_spans"), 6).as("major_frac"),
        (col("n_langs") > 1).cast("int").as("mixed"))
  }
}
