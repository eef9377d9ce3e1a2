package graft.core

import graft.ops.{LangNgram, LangSpanOps}
import org.apache.spark.sql.functions._

/** Closed-form hand cases for span-level (code-switching) language-ID
  * (q240): span extraction boundaries, per-span labels on seed-pure
  * text, and the mixture summary's majority/tie semantics.
  */
class LangSpanSpec extends SparkSpec {
  import spark.implicits._

  // Unambiguous seed-substring sentences: each is verbatim from the
  // frozen UDHR seed of its language, so the profile argmax is that
  // language by construction.
  private val En = "Everyone has the right to life liberty and security of person."
  private val De = "Jeder hat das Recht auf Leben Freiheit und Sicherheit der Person."
  private val Fr = "Nul ne sera tenu en esclavage."

  test("sentenceSpans: terminator+whitespace splits, empties dropped, idx 0-based") {
    val docs = Seq(
      (1L, s"$En $De"),
      (2L, "No terminator here"),
      (3L, ""),
      (4L, s"$En\n\t$De")
    ).toDF("doc_id", "text")
    val got = LangSpanOps.sentenceSpans(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    assert(got.filter(_._1 == 1L).sortBy(_._2).map(_._3).toSeq ==
      Seq(En, De))
    assert(got.filter(_._1 == 2L).map(_._3).toSeq == Seq("No terminator here"))
    assert(!got.exists(_._1 == 3L), "empty text must yield no spans")
    // any [ \t\n\f\r]+ run after the terminator splits
    assert(got.filter(_._1 == 4L).sortBy(_._2).map(_._3).toSeq ==
      Seq(En, De))
  }

  test("spanPredict labels seed-pure spans with their language") {
    val docs = Seq((1L, s"$En $De $Fr")).toDF("doc_id", "text")
    val got = LangSpanOps.spanPredict(docs, "doc_id", "text")
      .orderBy("span_idx").collect().map(_.getString(2)).toSeq
    assert(got == Seq("en", "de", "fr"))
  }

  test("non-ASCII spans ride the unigram family: zh span labeled zh") {
    val Zh = "人人生而自由在尊严和权利上一律平等."
    val docs = Seq((1L, s"$En $Zh")).toDF("doc_id", "text")
    val got = LangSpanOps.spanPredict(docs, "doc_id", "text")
      .orderBy("span_idx").collect().map(_.getString(2)).toSeq
    assert(got == Seq("en", "zh"), s"got $got")
    val mix = LangSpanOps.docMixture(docs, "doc_id", "text").collect()(0)
    assert(mix.getLong(2) == 2L && mix.getInt(5) == 1)
  }

  test("docMixture: majority by count, tie by profile order, exact fractions") {
    val docs = Seq(
      (1L, s"$En $En $De"),      // en majority 2/3
      (2L, s"$De $En"),          // 1-1 tie -> en (earlier in langs order)
      (3L, En)                   // pure
    ).toDF("doc_id", "text")
    val got = LangSpanOps.docMixture(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getDouble(4),
          r.getInt(5)))).toMap
    assert(got(1L) == ((3L, 2L, "en", 0.666667, 1)))
    assert(got(2L) == ((2L, 2L, "en", 0.5, 1)))
    assert(got(3L) == ((1L, 1L, "en", 1.0, 0)))
    assert(LangNgram.langs.indexOf("en") < LangNgram.langs.indexOf("de"),
      "tie-break premise: en precedes de in profile order")
  }
}
