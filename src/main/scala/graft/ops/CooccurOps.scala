package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Word co-occurrence / pointwise mutual information over a corpus —
  * the collocation miner behind phrase vocabularies, compound-token
  * candidates, and topic drift probes.
  *
  * Scale shape: the corpus is scanned ONCE into distinct (doc, word)
  * rows; the global document-frequency table is model-sized (unique
  * words), and the PAIR stage only ever touches the top-`vocabSize`
  * words — per document at most vocabSize tokens survive, so the
  * self-join emits <= vocabSize²/2 pairs per doc and the pair
  * aggregation is bounded by vocabSize² groups total regardless of
  * corpus size. The vocab table broadcasts (150 rows); nothing
  * quadratic in the corpus exists anywhere.
  */
object CooccurOps {

  /** Distinct (doc_id, w) for lowercase [a-z]+ words of length >= 2. */
  private def tokens(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(split(lower(col(textCol)), "[^a-z]+")).as("w"))
      .filter(length(col("w")) >= 2)
      .distinct()

  /** PMI pairs over the top-`vocabSize` words (df-desc, word-asc
    * tie-break): all vocab word pairs co-occurring in >= `minCo`
    * docs, with pmi = ln(co·N / (df1·df2)) at 6dp.
    */
  def pmiPairs(docs: DataFrame, idCol: String, textCol: String,
      vocabSize: Int = 150, minCo: Long = 30L): DataFrame = {
    val tok = tokens(docs, idCol, textCol)
    val dfreq = tok.groupBy("w").agg(count(lit(1)).as("df"))
    val vocab = dfreq.orderBy(col("df").desc, col("w").asc).limit(vocabSize)
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val tv = tok.join(broadcast(vocab.select("w")), "w")
    val pairs = tv.as("a").join(tv.as("b"),
        col("a.doc_id") === col("b.doc_id") && col("a.w") < col("b.w"))
      .groupBy(col("a.w").as("w1"), col("b.w").as("w2"))
      .agg(count(lit(1)).as("co_df"))
      .filter(col("co_df") >= minCo)
    pairs
      .join(broadcast(vocab.select(col("w").as("w1"), col("df").as("df1"))), "w1")
      .join(broadcast(vocab.select(col("w").as("w2"), col("df").as("df2"))), "w2")
      .crossJoin(broadcast(nDocs))
      .select(col("w1"), col("w2"), col("co_df"),
        round(log((col("co_df") * col("n_docs")).cast("double")
          / (col("df1") * col("df2")).cast("double")), 6).as("pmi"))
  }

  /** DuckDB twin of [[pmiPairs]] (ln(), not DuckDB's log10 `log`). */
  def pmiOracleSql(table: String, idCol: String, textCol: String,
      vocabSize: Int = 150, minCo: Long = 30L): String =
    s"""WITH docs0 AS (SELECT $idCol AS doc_id, lower($textCol) AS t
       |  FROM $table),
       |tok0 AS (SELECT doc_id,
       |  unnest(string_split_regex(t, '[^a-z]+')) AS w FROM docs0),
       |tok AS (SELECT DISTINCT doc_id, w FROM tok0 WHERE length(w) >= 2),
       |dfreq AS (SELECT w, count(*) AS df FROM tok GROUP BY w),
       |vocab AS (SELECT w, df FROM dfreq ORDER BY df DESC, w LIMIT $vocabSize),
       |n AS (SELECT count(*) AS n_docs FROM $table),
       |tv AS (SELECT t.doc_id, t.w FROM tok t JOIN vocab v USING (w)),
       |pairs AS (
       |  SELECT a.w AS w1, b.w AS w2, count(*) AS co_df
       |  FROM tv a JOIN tv b ON a.doc_id = b.doc_id AND a.w < b.w
       |  GROUP BY 1, 2)
       |SELECT w1, w2, CAST(co_df AS BIGINT) AS co_df,
       |  round(ln(CAST(co_df * n_docs AS DOUBLE)
       |        / CAST(v1.df * v2.df AS DOUBLE)), 6) AS pmi
       |FROM pairs
       |JOIN vocab v1 ON pairs.w1 = v1.w
       |JOIN vocab v2 ON pairs.w2 = v2.w
       |CROSS JOIN n
       |WHERE co_df >= $minCo""".stripMargin
}
