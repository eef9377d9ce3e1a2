package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
  * SIGMOD 2003 — the MOSS algorithm): slide a window of `w`
  * consecutive char-`k`-gram hashes over the whitespace-stripped text
  * and keep each window's MINIMUM hash. The selected set is a
  * position-robust fingerprint — any shared substring of length
  * ≥ k + w − 1 chars is GUARANTEED to contribute at least one common
  * fingerprint, while storage is ~2/(w+1) of the full k-gram set.
  * The copy-detection complement to MinHash: MinHash estimates
  * whole-document similarity; winnowing localizes shared passages.
  *
  * Hashes are 16-hex-char md5 prefixes compared LEXICOGRAPHICALLY —
  * lowercase hex order equals numeric order (the [[SampleOps]]
  * coordinate trick), so the DuckDB oracle replays the selection
  * byte-for-byte with no integer conversion.
  *
  * Scale shape: fingerprint extraction is a pure narrow per-row map
  * (arrays + higher-order functions, whole-stage codegen, no UDF);
  * the pair stage is the standard bucket join with a document-
  * frequency guard — fingerprints shared by more than `maxDf` docs
  * (site boilerplate) are dropped BEFORE the self-join, bounding any
  * bucket's pair fan-out at maxDf², exactly like the hot-bucket caps
  * on the MinHash/SimHash paths.
  */
object WinnowOps {

  /** Per-document winnowing fingerprint sets.
    *
    * @return (id, n_fp, fp) — one row per distinct fingerprint; docs
    *         shorter than `k` normalized chars yield no rows
    */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 12, w: Int = 6): DataFrame = {
    // Normalize ONCE per row; the explode(array(..)) Generate barrier
    // keeps the regexp_replace out of the per-gram lambda (the same
    // O(len²) projection-collapse trap documented in
    // DedupOps.wordShingles).
    val s = col("_s")
    docs.select(col(idCol).as("id"),
        lower(regexp_replace(col(textCol), "\\s+", "")).as("_s"))
      .select(col("id"), explode(array(gramHashes(s, k))).as("_h"))
      .select(col("id"), explode(array(windowMins(col("_h"), w))).as("_f"))
      .select(col("id"), size(col("_f")).cast("long").as("n_fp"),
        explode(col("_f")).as("fp"))
  }

  /** Hash array: md5-prefix of each char k-gram of `s`. */
  private def gramHashes(s: Column, k: Int): Column =
    when(length(s) >= k,
      transform(sequence(lit(1), length(s) - (k - 1)),
        i => substring(md5(substring(s, i, lit(k)).cast("binary")), 1, 16)))
      .otherwise(array().cast("array<string>"))

  /** Distinct window-min selection over the hash array. Fewer hashes
    * than one window → a single global-min fingerprint (the standard
    * short-document convention). */
  private def windowMins(h: Column, w: Int): Column =
    when(size(h) >= 1,
      array_distinct(transform(
        sequence(lit(1), greatest(size(h) - (w - 1), lit(1))),
        i => array_min(slice(h, i, lit(w))))))
      .otherwise(array().cast("array<string>"))

  /** Document pairs sharing ≥ `minShared` fingerprints, after the
    * `maxDf` boilerplate guard. Returns (id_a, id_b, n_shared). */
  def dupPairs(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 12, w: Int = 6, maxDf: Int = 64, minShared: Int = 2): DataFrame = {
    val fp = fingerprints(docs, idCol, textCol, k, w).select("id", "fp")
    val ok = fp.groupBy("fp").agg(count(lit(1)).as("_df"))
      .where(col("_df") <= maxDf).select("fp")
    val guarded = fp.join(ok, Seq("fp"))
    guarded.as("a").join(guarded.as("b"),
        col("a.fp") === col("b.fp") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }

  /** DuckDB replay of [[dupPairs]] over `textExpr` of `table`. */
  def dupPairsOracleSql(table: String, idCol: String, textExpr: String,
      k: Int = 12, w: Int = 6, maxDf: Int = 64, minShared: Int = 2): String =
    s"""WITH t AS (SELECT $idCol AS id,
       |  lower(regexp_replace($textExpr, '\\s+', '', 'g')) AS s FROM $table),
       |g AS (SELECT id, CASE WHEN length(s) >= $k
       |  THEN list_transform(generate_series(1, length(s) - ${k - 1}),
       |    i -> substr(md5(substr(s, i, $k)), 1, 16))
       |  ELSE [] END AS h FROM t),
       |f AS (SELECT id, list_distinct(CASE
       |   WHEN len(h) = 0 THEN []
       |   WHEN len(h) <= $w THEN [list_min(h)]
       |   ELSE list_transform(generate_series(1, len(h) - ${w - 1}),
       |     i -> list_min(h[i:i+${w - 1}])) END) AS fps FROM g),
       |e AS (SELECT id, unnest(fps) AS fp FROM f),
       |ok AS (SELECT fp FROM e GROUP BY fp HAVING count(*) <= $maxDf),
       |ge AS (SELECT e.id, e.fp FROM e JOIN ok USING (fp))
       |SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_shared
       |FROM ge a JOIN ge b ON a.fp = b.fp AND a.id < b.id
       |GROUP BY 1, 2 HAVING count(*) >= $minShared""".stripMargin
}
