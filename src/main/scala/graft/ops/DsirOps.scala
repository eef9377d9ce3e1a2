package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling (DSIR, Xie et al. 2023,
  * arXiv:2302.03169): score every raw document by how much more likely
  * its hashed bag-of-words is under a target-domain unigram model than
  * under the raw-corpus model. The per-doc log importance weight
  *
  *   log w(d) = Σ_tokens [ ln p_target(bucket) − ln p_raw(bucket) ]
  *
  * is the standard selection signal for "make my crawl look like
  * Wikipedia/books" mixture shaping; resample ∝ w to shift the corpus.
  *
  * Spark-first shape (one corpus scan + one broadcast join):
  *   1. ONE pass over all tokens computes BOTH bucket histograms —
  *      each token row carries an `in_target` flag, so raw and target
  *      counts come out of the same `groupBy(bucket)` (no second scan).
  *   2. The ratio table is ≤ `Buckets` rows (4096) — broadcast.
  *   3. The scoring pass re-tokenizes, joins the broadcast ratio and
  *      sums per doc. Log-ratios are pre-rounded to integer MICRONATS,
  *      so the per-doc sum is a plain long sum: exact, associative and
  *      partition-order-independent (same fixed-point discipline as
  *      [[ProfileOps.corrMatrixFixedPoint]]) — bit-reproducible at any
  *      parallelism, and the DuckDB oracle replays it verbatim.
  *
  * Buckets are the first 3 hex chars of md5(token) (4096 buckets, the
  * paper's hashed-feature trick at SQL-replayable size): no vocabulary
  * is ever collected, so the model side stays O(Buckets) regardless of
  * corpus size — the 100 TB shape is scan + 4 KB broadcast.
  *
  * Add-one smoothing on both numerators keeps target-zero buckets
  * finite; raw zero-count buckets cannot occur for scored tokens (every
  * scored doc is part of the raw histogram by construction).
  */
object DsirOps {

  /** Hashed-feature bucket count (16^3). */
  val Buckets = 4096

  private def bucket(tok: Column): Column = substring(md5(tok.cast("binary")), 1, 3)

  /** Per-document DSIR log importance weights.
    *
    * @param docs       raw corpus (each row one document)
    * @param targetPred boolean Column over `docs` marking the
    *                   target-domain sample (evaluated in the same
    *                   scan — the target need not be materialized)
    * @return (id, n_tokens, log_w) — log_w in nats rounded to 6dp,
    *         null for token-less docs
    */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
      targetPred: Column): DataFrame = {
    val toks = docs
      .select(col(idCol).as("id"), targetPred.as("in_target"),
        explode(TextOps.tokens(col(textCol))).as("tok"))
      .select(col("id"), col("in_target"), bucket(col("tok")).as("b"))

    // Single scan → both histograms; totals via a tiny driver-side
    // collect over the ≤4096-row model table (control-table precedent:
    // BPE vocab / IVF centroids).
    val hist = toks.groupBy("b").agg(
      count(lit(1)).as("raw_c"),
      sum(col("in_target").cast("long")).as("tgt_c"))
    val ratio = logRatioMicro(hist)

    val per = toks
      .join(broadcast(ratio), Seq("b"))
      .groupBy("id")
      .agg(count(lit(1)).as("_n"), sum(col("r_micro")).as("_w_micro"))
    docs.select(col(idCol).as("id")).join(per, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("_n"), lit(0L)).as("n_tokens"),
        round(col("_w_micro").cast("double") / 1e6, 6).as("log_w"))
  }

  /** Fit the frozen DSIR model: bucket → micronat log-ratio map
    * (≤ `Buckets` entries, driver-held — the BPE frozen-vocab
    * contract). Feed to [[scoreWithModel]] for stateless scoring of
    * new data, batch or streaming. */
  def fitRatioModel(docs: DataFrame, textCol: String,
      targetPred: Column): Map[String, Long] = {
    val toks = docs
      .select(targetPred.as("in_target"),
        explode(TextOps.tokens(col(textCol))).as("tok"))
      .select(col("in_target"), bucket(col("tok")).as("b"))
    val hist = toks.groupBy("b").agg(
      count(lit(1)).as("raw_c"),
      sum(col("in_target").cast("long")).as("tgt_c"))
    logRatioMicro(hist).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  /** Score documents against a FROZEN ratio model: one pure narrow
    * map — per-row token fold over a literal bucket→micronat map, no
    * explode, no shuffle, no state. Streaming-safe (the twin the
    * batch fit feeds) and the right shape for scoring a 100 TB crawl
    * against a model trained once: zero exchanges, whole-stage
    * codegen end to end.
    *
    * Exactness: the same micronat long sums as [[importanceWeights]]
    * — scores are bit-identical to the batch path for any document
    * whose buckets all appear in the model (guaranteed when the
    * scored corpus was part of the fit; unseen buckets contribute 0,
    * the model's "no evidence" prior).
    */
  def scoreWithModel(docs: DataFrame, idCol: String, textCol: String,
      model: Map[String, Long]): DataFrame = {
    val m = typedlit(model)
    docs
      .select(col(idCol).as("id"), TextOps.tokens(col(textCol)).as("_w"))
      .select(col("id"), explode(array(col("_w"))).as("_w")) // barrier (see wordShingles)
      .select(col("id"),
        size(col("_w")).cast("long").as("n_tokens"),
        transform(col("_w"),
          t => coalesce(element_at(m, substring(md5(t.cast("binary")), 1, 3)),
            lit(0L))).as("_r"))
      .select(col("id"), col("n_tokens"),
        when(col("n_tokens") > 0,
          round(aggregate(col("_r"), lit(0L), _ + _).cast("double") / 1e6, 6))
          .as("log_w"))
  }

  /** (b, r_micro): per-bucket log-ratio in integer micronats.
    * round((ln((tgt+1)/(Nt+B)) − ln((raw+1)/(Nr+B))) · 1e6) — computed
    * with Spark expressions so the DuckDB oracle can replay the exact
    * same formula; both engines round the same double to the same long.
    */
  private def logRatioMicro(hist: DataFrame): DataFrame = {
    val tot = hist.agg(
      sum(col("raw_c")).as("nr"), sum(col("tgt_c")).as("nt")).collect()(0)
    val nr = tot.getLong(0); val nt = tot.getLong(1)
    hist.select(col("b"),
      round((log((col("tgt_c") + 1).cast("double") / lit(nt + Buckets).cast("double")) -
        log((col("raw_c") + 1).cast("double") / lit(nr + Buckets).cast("double"))) * 1e6, 0)
        .cast("long").as("r_micro"))
  }

  /** DuckDB replay of [[importanceWeights]] with
    * `targetPredSql` over table `docs`. */
  def oracleSql(table: String, idCol: String, textCol: String,
      targetPredSql: String): String =
    s"""WITH tk AS (SELECT $idCol AS id, ($targetPredSql) AS in_target,
       |  substr(md5(unnest(list_filter(
       |    string_split_regex(lower($textCol), '[ \\t\\n\\f\\r]+'),
       |    x -> x <> ''))), 1, 3) AS b
       | FROM $table),
       |hist AS (SELECT b, count(*) AS raw_c,
       |    sum(CASE WHEN in_target THEN 1 ELSE 0 END) AS tgt_c
       |  FROM tk GROUP BY b),
       |tot AS (SELECT sum(raw_c) AS nr, sum(tgt_c) AS nt FROM hist),
       |ratio AS (SELECT b, CAST(round(
       |    (ln((tgt_c + 1) * 1.0::DOUBLE / (nt + ${Buckets})::DOUBLE)
       |     - ln((raw_c + 1) * 1.0::DOUBLE / (nr + ${Buckets})::DOUBLE)) * 1e6, 0)
       |   AS BIGINT) AS r_micro
       |  FROM hist, tot),
       |per AS (SELECT tk.id, count(*) AS n, sum(r.r_micro) AS w_micro
       |  FROM tk JOIN ratio r USING (b) GROUP BY tk.id)
       |SELECT d.$idCol AS id,
       |  CAST(coalesce(per.n, 0) AS BIGINT) AS n_tokens,
       |  round(CAST(per.w_micro AS DOUBLE) / 1e6, 6) AS log_w
       |FROM $table d LEFT JOIN per ON d.$idCol = per.id""".stripMargin
}
