package graft.core

import graft.ops.{LmOps, PlanProbe}
import org.apache.spark.sql.functions._

/** Volume stress for the KN LM path: a 30k-doc synthetic corpus with a
  * known vocabulary — the model stays vocab²-bounded however large the
  * corpus, the score side's shuffle moves per-doc aggregates (never
  * text), and planted outliers still rank.
  */
class LmScaleSpec extends SparkSpec {
  import spark.implicits._

  test("30k-doc corpus: bounded model, bounded score shuffle, outliers rank") {
    val vocab = (0 until 50).map(i => s"w$i")
    // deterministic pseudo-text: doc i draws 30 tokens from a fixed
    // congruential walk; 1% of docs are OOV gibberish
    val docs = spark.range(30000).select(col("id"),
      when(col("id") % 100 === 0, lit("zzq1 zzq2 zzq3 zzq4 zzq5"))
        .otherwise(concat_ws(" ", (0 until 30).map(k =>
          element_at(typedlit(vocab),
            ((col("id") * 31 + lit(k * k * 17 + k)) % 50 + 1).cast("int"))): _*))
        .as("text"))
    val t0 = System.nanoTime()
    val m = LmOps.model(docs.where(col("id") % 100 =!= 0), "id", "text")
    val nTypes = m.count()
    // bigram types bounded by vocab², nowhere near corpus size
    assert(nTypes <= 50L * 50L, s"model has $nTypes types")
    val scored = LmOps.score(docs, docs.where(col("id") % 100 =!= 0), "id", "text")
    val bytes = PlanProbe.shuffleBytesWritten(scored)
    val dt = (System.nanoTime() - t0) / 1e9
    // per-doc aggregate shuffle: ~30k rows of (id, counts, nll) — a
    // few MB ceiling guards against the corpus-text-shuffle regression
    assert(bytes < 32L * 1024 * 1024, s"score shuffled $bytes bytes")
    val rows = scored.select(col("id"), col("n_unseen"), col("kn_logppl"))
      .collect()
    assert(rows.length === 30000)
    val (oov, in) = rows.partition(_.getLong(0) % 100 == 0)
    // every OOV doc scores worse than every in-vocab doc
    val worstIn = in.map(_.getDouble(2)).max
    assert(oov.forall(_.getDouble(2) > worstIn),
      s"OOV min ${oov.map(_.getDouble(2)).min} vs in-vocab max $worstIn")
    assert(oov.forall(_.getLong(1) === 4L), "all 4 gibberish bigrams unseen")
    assert(dt < 120.0, s"KN volume pass took ${dt}s")
    info(f"30k docs: $nTypes bigram types, ${bytes / 1024.0 / 1024.0}%.2f MB shuffled, $dt%.1f s")
  }
}
