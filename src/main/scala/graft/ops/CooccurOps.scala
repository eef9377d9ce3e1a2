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

  /** Skip-gram (center, context) pair counts within a ±`window` token
    * neighborhood — the word2vec/GloVe training-pair extraction.
    * Forward pairs only (context strictly after center); symmetric
    * counts are exactly the forward table plus its transpose, so
    * nothing is lost and every unordered pair is counted once.
    *
    * Scale shape: tokens join tokens on (doc, position-range) — a
    * doc-keyed EQUI-join whose fan-out is `window` per token (linear
    * in the corpus, never quadratic); the pair aggregation is
    * vocab²-bounded and minCount prunes the tail. Positions come from
    * posexplode AFTER empty-token filtering, so both engines number
    * the same token stream.
    *
    * @return (center, context, n_pairs) with n_pairs >= minCount
    */
  def skipgramCounts(docs: DataFrame, idCol: String, textCol: String,
      window: Int, minCount: Long): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    val toks = docs.select(col(idCol).as("doc_id"),
        posexplode(filter(split(lower(col(textCol)), "[ \t\n\f\r]+"),
          x => x =!= lit(""))))
      .toDF("doc_id", "pos", "w")
    val a = toks.select(col("doc_id"), col("pos").as("pa"),
      col("w").as("center"))
    val b = toks.select(col("doc_id"), col("pos").as("pb"),
      col("w").as("context"))
    a.join(b, Seq("doc_id"))
      .where(col("pb") - col("pa") >= 1 &&
        col("pb") - col("pa") <= window)
      .groupBy("center", "context").agg(count(lit(1)).as("n_pairs"))
      .where(col("n_pairs") >= minCount)
  }

  /** DuckDB twin of [[skipgramCounts]]. */
  def skipgramOracleSql(table: String, idCol: String, textCol: String,
      window: Int, minCount: Long): String =
    s"""WITH t AS (SELECT $idCol AS doc_id,
       |    list_filter(string_split_regex(lower($textCol),
       |      '[ \\t\\n\\f\\r]+'), x -> x <> '') AS l
       |  FROM $table),
       |u AS (SELECT doc_id,
       |    unnest(list_zip(l, generate_series(1, len(l)))) AS z
       |  FROM t),
       |tok AS (SELECT doc_id, z[1] AS w, CAST(z[2] AS BIGINT) AS pos
       |  FROM u),
       |p AS (SELECT a.w AS center, b.w AS context,
       |    CAST(count(*) AS BIGINT) AS n_pairs
       |  FROM tok a JOIN tok b ON a.doc_id = b.doc_id
       |    AND b.pos - a.pos BETWEEN 1 AND $window
       |  GROUP BY 1, 2)
       |SELECT center, context, n_pairs FROM p
       |WHERE n_pairs >= $minCount""".stripMargin

  /** Frequent item PAIRS with lift (market-basket association mining,
    * the 2-itemset core of Apriori/FP-growth): distinct (basket,
    * item) rows self-join WITHIN a basket (`a.item < b.item` counts
    * each pair once), pair supports filter at `minSupport`, and
    * lift = n_ab·N / (n_a·n_b) says whether the pair co-occurs more
    * than independence predicts. Lift is a rational of exact counts,
    * so it rounds by half-up integer division, never round()-on-double.
    *
    * Scale shape: the self-join is basket-keyed (one hash exchange;
    * fan-out bounded by max basket size², the retail-data invariant),
    * item-marginal and basket-count frames are item-grid-sized and
    * broadcast. Nothing corpus-quadratic.
    *
    * @return (item_a, item_b, n_ab, n_a, n_b, n_baskets, lift)
    */
  def basketPairs(rows: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long): DataFrame = {
    val bi = rows.select(col(basketCol).as("bk"), col(itemCol).as("it"))
      .distinct()
    val nBaskets = bi.agg(countDistinct("bk").as("n_baskets"))
    val supp = bi.groupBy("it").agg(count(lit(1)).as("n_item"))
    bi.as("a").join(bi.as("b"),
        col("a.bk") === col("b.bk") && col("a.it") < col("b.it"))
      .groupBy(col("a.it").as("item_a"), col("b.it").as("item_b"))
      .agg(count(lit(1)).as("n_ab"))
      .where(col("n_ab") >= minSupport)
      .join(broadcast(supp.select(col("it").as("item_a"),
        col("n_item").as("n_a"))), "item_a")
      .join(broadcast(supp.select(col("it").as("item_b"),
        col("n_item").as("n_b"))), "item_b")
      .crossJoin(broadcast(nBaskets))
      .select(col("item_a"), col("item_b"), col("n_ab"), col("n_a"),
        col("n_b"), col("n_baskets"),
        (expr("(2000000 * n_ab * n_baskets + n_a * n_b)" +
          " div (2 * n_a * n_b)").cast("double") / 1e6).as("lift"))
  }

  /** DuckDB twin of [[basketPairs]]; `srcSql` yields (bk, it) rows. */
  def basketPairsOracleSql(srcSql: String, minSupport: Long): String =
    s"""WITH bi AS (SELECT DISTINCT bk, it FROM ($srcSql) src),
       |nb AS (SELECT CAST(count(DISTINCT bk) AS BIGINT) AS n_baskets
       |  FROM bi),
       |supp AS (SELECT it, CAST(count(*) AS BIGINT) AS n_item
       |  FROM bi GROUP BY it),
       |pairs AS (SELECT a.it AS item_a, b.it AS item_b,
       |    CAST(count(*) AS BIGINT) AS n_ab
       |  FROM bi a JOIN bi b ON a.bk = b.bk AND a.it < b.it
       |  GROUP BY 1, 2)
       |SELECT item_a, item_b, n_ab, sa.n_item AS n_a, sb.n_item AS n_b,
       |  n_baskets,
       |  CAST((2000000 * n_ab * n_baskets + sa.n_item * sb.n_item)
       |    // (2 * sa.n_item * sb.n_item) AS DOUBLE) / 1e6 AS lift
       |FROM pairs
       |JOIN supp sa ON pairs.item_a = sa.it
       |JOIN supp sb ON pairs.item_b = sb.it
       |CROSS JOIN nb
       |WHERE n_ab >= $minSupport""".stripMargin
}
