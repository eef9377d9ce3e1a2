package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed interpolated Kneser–Ney bigram language model — the
  * CCNet-style corpus filter (Wenzek et al., "CCNet: Extracting High
  * Quality Monolingual Datasets", 2020): train a small LM on a trusted
  * reference slice, score every candidate document by perplexity, and
  * let the pipeline keep what "reads like" the reference. Unlike q90's
  * add-one bigram probe, this is the real KN estimator — absolute
  * discounting plus the continuation-probability backoff that makes it
  * the standard n-gram smoother.
  *
  * Everything is relational, so the full estimator has an exact DuckDB
  * oracle ([[knOracleWith]] emits the shared CTE prefix):
  *
  *  - One reference-corpus scan builds the bigram count table `cab`
  *    (vocabulary²-bounded — persisted via the one-slot session cache,
  *    the q90 idiom, so the FOUR model aggregations that derive from
  *    it — head totals, head fan-out, tail fan-in, type count — reuse
  *    one computation instead of re-scanning the corpus).
  *  - Model tables broadcast (vocab-bounded); the probe side is the
  *    exploded TARGET corpus, which never shuffles — at 100 TB the
  *    only wide operation is the map-side-combined model aggregation
  *    over the (much smaller) reference slice.
  *  - Estimator, with D the absolute discount, c(a·)=Σ_b c(ab),
  *    N1+(a·)=|{b: c(ab)>0}|, N1+(·b)=|{a: c(ab)>0}|, B=|{(a,b)}|,
  *    Vc=|{b}| (tail vocabulary):
  *      Pc(b)   = (N1+(·b) + 1) / (B + Vc + 1)    [+1-smoothed
  *                continuation so unseen tails keep mass]
  *      P(b|a)  = (c(ab) − D)/c(a·) + D·N1+(a·)/c(a·) · Pc(b)   [head seen;
  *                c(ab)≥1 ⇒ the max(·,0) clamp is vacuous but kept]
  *      P(b|a)  = Pc(b)                            [head unseen]
  *    Every operand is an exact integer count; the double-precision
  *    evaluation order is FIXED and mirrored verbatim in the oracle.
  *  - Per-document score: logppl = round(avg(−ln P), 5) over the
  *    doc's bigrams (q90's rounding discipline), plus how many of its
  *    bigrams the model had never seen. Docs with <2 tokens score
  *    NULL via the explode_outer sentinel (q90 idiom).
  */
object LmOps {

  /** One outstanding reference-model count table per session (see
    * TextOps.perplexityCabSlot for the release rationale).
    */
  private val cabSlot =
    new java.util.concurrent.ConcurrentHashMap[
      org.apache.spark.sql.SparkSession, DataFrame]()

  private def bigramsOf(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    // parallelism floor before tokenize (the wordShingles guard):
    // no-op unless the input is under-split
    val base = SkewOps.parallelismFloor(
        df.select(col(idCol).as("id"), col(textCol).as("_t")))
      .select(col("id"), TextOps.tokens(col("_t")).as("t"))
    base.select(col("id"),
      explode_outer(when(size(col("t")) >= 2,
        transform(sequence(lit(0), size(col("t")) - 2),
          i => struct(element_at(col("t"), i + 1).as("a"),
            element_at(col("t"), i + 2).as("b"))))).as("bg"))
      .select(col("id"), col("bg.a").as("a"), col("bg.b").as("b"))
  }

  /** The persisted (a, b, c_ab) reference count table. */
  private def refCounts(ref: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val plan = bigramsOf(ref, idCol, textCol)
      .filter(col("a").isNotNull)
      .groupBy("a", "b").agg(count(lit(1)).as("c_ab"))
    cabSlot.synchronized {
      cabSlot.keySet.removeIf(s => s.sparkContext.isStopped)
      val prev = cabSlot.get(ref.sparkSession)
      if (prev != null && prev.queryExecution.analyzed.canonicalized ==
          plan.queryExecution.analyzed.canonicalized) prev
      else {
        val c = plan.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        Option(cabSlot.put(ref.sparkSession, c))
          .foreach(_.unpersist(blocking = false))
        c
      }
    }
  }

  /** Raw reference bigram counts `(a, b, c_ab)` — the model's ADDITIVE
    * sufficient statistic: counts from disjoint corpus batches merge
    * by summation ([[mergeCounts]]), so an incremental pipeline
    * maintains yesterday's count table and folds in today's batch
    * without ever rescanning history — every KN quantity (head
    * totals, fan-outs, type counts) re-derives from the merged table.
    */
  def counts(ref: DataFrame, idCol: String, textCol: String): DataFrame =
    refCounts(ref, idCol, textCol)

  /** Fold another batch's counts into an existing table: one
    * vocab²-bounded union + re-aggregation, map-side combined.
    */
  def mergeCounts(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("a", "b").agg(sum("c_ab").as("c_ab"))

  /** The trained model as a dataset: one row per reference bigram type
    * with its counts and the final interpolated-KN probability
    * (rounded 6dp). `heads`/`conts` stay internal to [[score]]; this
    * is the inspectable/persistable artifact.
    */
  def model(ref: DataFrame, idCol: String, textCol: String,
      discount: Double = 0.75): DataFrame =
    modelFromCounts(refCounts(ref, idCol, textCol), discount)

  /** Model from a prebuilt (possibly incrementally merged) count
    * table — the batch path [[model]] and the incremental path
    * [[counts]]→[[mergeCounts]]→here produce bit-identical models
    * over the same effective corpus (LmSpec pins it).
    */
  def modelFromCounts(cab: DataFrame, discount: Double = 0.75): DataFrame = {
    require(discount > 0.0 && discount < 1.0,
      s"KN discount must be in (0,1), got $discount")
    val heads = cab.groupBy("a")
      .agg(sum("c_ab").as("c_a"), count(lit(1)).as("n1p_fwd"))
    val conts = cab.groupBy("b").agg(count(lit(1)).as("n1p_back"))
    // bt/vc derive from the tiny per-tail aggregate instead of a
    // SECOND full pass over the count table with a countDistinct
    // expand: bt = sum of per-b type counts = |cab|, vc = |conts| —
    // exact integers either way, one fewer corpus-scale aggregation
    // per model build
    val scalars = conts.agg(
      coalesce(sum("n1p_back"), lit(0L)).as("bt"),
      count(lit(1)).as("vc"))
    val d = lit(discount)
    cab
      .join(broadcast(heads), Seq("a"))
      .join(broadcast(conts), Seq("b"))
      .crossJoin(broadcast(scalars))
      .select(col("a"), col("b"), col("c_ab"),
        round(
          greatest(col("c_ab").cast("double") - d, lit(0.0)) / col("c_a")
            + d * col("n1p_fwd") / col("c_a")
              * ((col("n1p_back") + 1).cast("double") / (col("bt") + col("vc") + 1)),
          6).as("p_kn"))
  }

  /** Score `target` under the model trained on `ref`: per document the
    * bigram count, how many bigrams were unseen pairs, and the KN
    * log-perplexity (avg −ln P, 5dp; NULL for <2-token docs).
    */
  def score(target: DataFrame, ref: DataFrame, idCol: String,
      textCol: String, discount: Double = 0.75): DataFrame = {
    require(discount > 0.0 && discount < 1.0,
      s"KN discount must be in (0,1), got $discount")
    val cab = refCounts(ref, idCol, textCol)
    val heads = cab.groupBy("a")
      .agg(sum("c_ab").as("c_a"), count(lit(1)).as("n1p_fwd"))
    val conts = cab.groupBy("b").agg(count(lit(1)).as("n1p_back"))
    // bt/vc derive from the tiny per-tail aggregate instead of a
    // SECOND full pass over the count table with a countDistinct
    // expand: bt = sum of per-b type counts = |cab|, vc = |conts| —
    // exact integers either way, one fewer corpus-scale aggregation
    // per model build
    // coalesce: on an empty count table (no >=2-token reference doc)
    // sum() is NULL where the old countDistinct was 0 — keep the
    // 0-denominator (not NULL) behavior for the degenerate model
    val scalars = conts.agg(
      coalesce(sum("n1p_back"), lit(0L)).as("bt"),
      count(lit(1)).as("vc"))
    val d = lit(discount)
    // LEFT joins: unseen pairs/heads/tails coalesce into the backoff
    // terms; the null-bigram sentinel row (short docs) keeps NULL nll.
    val pc = (coalesce(col("n1p_back"), lit(0L)) + 1).cast("double") /
      (col("bt") + col("vc") + 1)
    val p = when(col("a").isNull, lit(null).cast("double"))
      .when(col("c_a").isNull, pc)
      .otherwise(
        greatest(coalesce(col("c_ab"), lit(0L)).cast("double") - d, lit(0.0)) / col("c_a")
          + d * col("n1p_fwd") / col("c_a") * pc)
    bigramsOf(target, idCol, textCol)
      .join(broadcast(cab), Seq("a", "b"), "left")
      .join(broadcast(heads), Seq("a"), "left")
      .join(broadcast(conts), Seq("b"), "left")
      .crossJoin(broadcast(scalars))
      .select(col("id"), col("a"),
        col("c_ab").isNull.and(col("a").isNotNull).cast("int").as("unseen"),
        (-log(p)).as("nll"))
      .groupBy("id").agg(
        count(col("a")).as("n_bigrams"),
        coalesce(sum("unseen"), lit(0L)).as("n_unseen"),
        round(avg("nll"), 5).as("kn_logppl"))
  }

  /** Trigram interpolated KN (Chen & Goodman 1999): the highest order
    * discounts raw token counts; the bigram level discounts
    * CONTINUATION (type) counts, as the estimator prescribes; the
    * unigram level is the +1-smoothed continuation distribution (the
    * same OOV floor as the bigram model). All quantities derive from
    * ONE trigram count table (one reference scan):
    *
    *   P3(c|ab) = (c(abc) − D)/c(ab·) + D·N1+(ab·)/c(ab·) · P2(c|b)
    *   P2(c|b)  = (N1+(·bc) − D)/N1+(·b·) + D·N1+(b·)/N1+(·b·) · P1(c)
    *   P1(c)    = (N1+(··c) + 1)/(B2 + V + 1)
    *
    * with N1+(·bc) = |{a : c(abc)>0}|, N1+(·b·) = Σ_c N1+(·bc),
    * N1+(b·) = |{c : N1+(·bc)>0}|, N1+(··c) = |{b : N1+(·bc)>0}|,
    * B2 = |{(b,c)}|, V = |{c}|. Every input is an exact integer
    * count; double evaluation order fixed and mirrored in
    * [[kn3OracleWith]]. The model table (one row per seen trigram
    * type) is vocab³-bounded and broadcasts; like the bigram model it
    * derives from a one-slot-cached count table.
    */
  private val tcabSlot =
    new java.util.concurrent.ConcurrentHashMap[
      org.apache.spark.sql.SparkSession, DataFrame]()

  private def trigramsOf(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    // parallelism floor before tokenize (the wordShingles guard)
    val base = SkewOps.parallelismFloor(
        df.select(col(idCol).as("id"), col(textCol).as("_t")))
      .select(col("id"), TextOps.tokens(col("_t")).as("t"))
    base.select(col("id"),
      explode_outer(when(size(col("t")) >= 3,
        transform(sequence(lit(0), size(col("t")) - 3),
          i => struct(element_at(col("t"), i + 1).as("a"),
            element_at(col("t"), i + 2).as("b"),
            element_at(col("t"), i + 3).as("c"))))).as("tg"))
      .select(col("id"), col("tg.a").as("a"), col("tg.b").as("b"),
        col("tg.c").as("c"))
  }

  private def refTriCounts(ref: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val plan = trigramsOf(ref, idCol, textCol)
      .filter(col("a").isNotNull)
      .groupBy("a", "b", "c").agg(count(lit(1)).as("c_abc"))
    tcabSlot.synchronized {
      tcabSlot.keySet.removeIf(s => s.sparkContext.isStopped)
      val prev = tcabSlot.get(ref.sparkSession)
      if (prev != null && prev.queryExecution.analyzed.canonicalized ==
          plan.queryExecution.analyzed.canonicalized) prev
      else {
        val c = plan.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        Option(tcabSlot.put(ref.sparkSession, c))
          .foreach(_.unpersist(blocking = false))
        c
      }
    }
  }

  /** The trigram model as a dataset: one row per seen trigram type
    * with its count and the fully-interpolated probability (6dp).
    */
  def model3(ref: DataFrame, idCol: String, textCol: String,
      discount: Double = 0.75): DataFrame = {
    require(discount > 0.0 && discount < 1.0,
      s"KN discount must be in (0,1), got $discount")
    val ct = refTriCounts(ref, idCol, textCol)
    val ctx = ct.groupBy("a", "b")
      .agg(sum("c_abc").as("c_ab"), count(lit(1)).as("n1p_ab"))
    val tbc = ct.groupBy("b", "c").agg(count(lit(1)).as("nbc"))
    val mid = tbc.groupBy("b")
      .agg(sum("nbc").as("n_b_dot"), count(lit(1)).as("n1p_b"))
    val uni = tbc.groupBy("c").agg(count(lit(1)).as("n_dot_c"))
    // b2/v from the tiny unigram aggregate (b2 = sum of per-c type
    // counts = |tbc|, v = |uni|) — drops the extra tbc pass + its
    // countDistinct expand
    val scalars = uni.agg(
      coalesce(sum("n_dot_c"), lit(0L)).as("b2"),
      count(lit(1)).as("v"))
    val d = lit(discount)
    val p1 = (col("n_dot_c") + 1).cast("double") / (col("b2") + col("v") + 1)
    val p2 = greatest(col("nbc").cast("double") - d, lit(0.0)) / col("n_b_dot") +
      d * col("n1p_b") / col("n_b_dot") * p1
    val p3 = greatest(col("c_abc").cast("double") - d, lit(0.0)) / col("c_ab") +
      d * col("n1p_ab") / col("c_ab") * p2
    ct
      .join(broadcast(ctx), Seq("a", "b"))
      .join(broadcast(tbc), Seq("b", "c"))
      .join(broadcast(mid), Seq("b"))
      .join(broadcast(uni), Seq("c"))
      .crossJoin(broadcast(scalars))
      .select(col("a"), col("b"), col("c"), col("c_abc"),
        round(p3, 6).as("p_kn3"))
  }

  /** Score `target` docs under the trigram model: per document the
    * trigram count, unseen-trigram count, and avg −ln P with the full
    * backoff chain (unseen context ab → P2; unseen middle b → P1).
    * <3-token docs score NULL (explode_outer sentinel).
    */
  def score3(target: DataFrame, ref: DataFrame, idCol: String,
      textCol: String, discount: Double = 0.75): DataFrame = {
    require(discount > 0.0 && discount < 1.0,
      s"KN discount must be in (0,1), got $discount")
    val ct = refTriCounts(ref, idCol, textCol)
    val ctx = ct.groupBy("a", "b")
      .agg(sum("c_abc").as("c_ab"), count(lit(1)).as("n1p_ab"))
    val tbc = ct.groupBy("b", "c").agg(count(lit(1)).as("nbc"))
    val mid = tbc.groupBy("b")
      .agg(sum("nbc").as("n_b_dot"), count(lit(1)).as("n1p_b"))
    val uni = tbc.groupBy("c").agg(count(lit(1)).as("n_dot_c"))
    // b2/v from the tiny unigram aggregate (b2 = sum of per-c type
    // counts = |tbc|, v = |uni|) — drops the extra tbc pass + its
    // countDistinct expand
    // coalesce: empty count table keeps the old 0 (not NULL) scalar
    val scalars = uni.agg(
      coalesce(sum("n_dot_c"), lit(0L)).as("b2"),
      count(lit(1)).as("v"))
    val d = lit(discount)
    val p1 = (coalesce(col("n_dot_c"), lit(0L)) + 1).cast("double") /
      (col("b2") + col("v") + 1)
    val p2 = greatest(coalesce(col("nbc"), lit(0L)).cast("double") - d, lit(0.0)) /
      col("n_b_dot") + d * col("n1p_b") / col("n_b_dot") * p1
    val p = when(col("a").isNull, lit(null).cast("double"))
      .when(col("c_ab").isNull, when(col("n_b_dot").isNull, p1).otherwise(p2))
      .otherwise(
        greatest(coalesce(col("c_abc"), lit(0L)).cast("double") - d, lit(0.0)) /
          col("c_ab") + d * col("n1p_ab") / col("c_ab") *
          when(col("n_b_dot").isNull, p1).otherwise(p2))
    trigramsOf(target, idCol, textCol)
      .join(broadcast(ct), Seq("a", "b", "c"), "left")
      .join(broadcast(ctx), Seq("a", "b"), "left")
      .join(broadcast(tbc), Seq("b", "c"), "left")
      .join(broadcast(mid), Seq("b"), "left")
      .join(broadcast(uni), Seq("c"), "left")
      .crossJoin(broadcast(scalars))
      .select(col("id"), col("a"),
        col("c_abc").isNull.and(col("a").isNotNull).cast("int").as("unseen"),
        (-log(p)).as("nll"))
      .groupBy("id").agg(
        count(col("a")).as("n_trigrams"),
        coalesce(sum("unseen"), lit(0L)).as("n_unseen"),
        round(avg("nll"), 5).as("kn3_logppl"))
  }

  /** Shared DuckDB CTE prefix for the trigram estimator (q135/q136). */
  def kn3OracleWith(refWhere: String): String =
    s"""WITH tk AS (SELECT doc_id AS id,
       |  list_filter(string_split_regex(lower(text), '[ \\t\\n\\f\\r]+'), x -> x <> '') AS t
       | FROM documents),
       |rpos AS (SELECT id, unnest(generate_series(1, len(t) - 2)) AS i, t
       |         FROM tk JOIN documents d ON d.doc_id = tk.id
       |         WHERE ($refWhere) AND len(t) >= 3),
       |ct AS (SELECT t[i] AS a, t[i+1] AS b, t[i+2] AS c, count(*) AS c_abc
       |       FROM rpos GROUP BY 1, 2, 3),
       |ctx AS (SELECT a, b, sum(c_abc) AS c_ab, count(*) AS n1p_ab
       |        FROM ct GROUP BY a, b),
       |tbc AS (SELECT b, c, count(*) AS nbc FROM ct GROUP BY b, c),
       |mid AS (SELECT b, sum(nbc) AS n_b_dot, count(*) AS n1p_b
       |        FROM tbc GROUP BY b),
       |uni AS (SELECT c, count(*) AS n_dot_c FROM tbc GROUP BY c),
       |scalars AS (SELECT count(*) AS b2, count(DISTINCT c) AS v FROM tbc)""".stripMargin

  /** Shared DuckDB CTE prefix replaying the model estimator over
    * `refWhere`-filtered documents — appended to by the q125/q126
    * oracles so the two cannot drift.
    */
  def knOracleWith(refWhere: String): String =
    s"""WITH tk AS (SELECT doc_id AS id,
       |  list_filter(string_split_regex(lower(text), '[ \\t\\n\\f\\r]+'), x -> x <> '') AS t
       | FROM documents),
       |rpos AS (SELECT id, unnest(generate_series(1, len(t) - 1)) AS i, t
       |         FROM tk JOIN documents d ON d.doc_id = tk.id
       |         WHERE ($refWhere) AND len(t) >= 2),
       |cab AS (SELECT t[i] AS a, t[i+1] AS b, count(*) AS c_ab
       |        FROM rpos GROUP BY 1, 2),
       |heads AS (SELECT a, sum(c_ab) AS c_a, count(*) AS n1p_fwd FROM cab GROUP BY a),
       |conts AS (SELECT b, count(*) AS n1p_back FROM cab GROUP BY b),
       |scalars AS (SELECT count(*) AS bt, count(DISTINCT b) AS vc FROM cab)""".stripMargin

  /** Simple Good–Turing (Gale & Sampson 1995) over unigram count-of-
    * counts: on a REAL count grid N_{r+1} is mostly zero, so raw
    * Turing estimates collapse — SGT first spreads each N_r over its
    * neighbor gap (Z_r = 2N_r/(t−q), q/t the neighboring observed
    * counts, q=0 at the head and t=2r−q at the tail), fits
    * ln Z = a + b·ln r by least squares, and smooths
    * r* = (r+1)·S(r+1)/S(r) = (r+1)·((r+1)/r)^b — the intercept
    * cancels, only the slope b survives. The unseen-mass headline
    * (how much probability rare/unseen words deserve) behind any
    * vocabulary-coverage gate. Whitespace tokens, q58's class.
    *
    * Exactness: r, N_r, and the Z_r rational are exact integers
    * (Z rounds by half-up integer division); the OLS moments fold in
    * r-sorted order (the mutualInformation discipline) so the only
    * doubles are ln/exp on identical inputs. Scale shape: corpus →
    * word counts (one exchange) → count-of-counts — every later stage
    * lives on the tiny count grid (window + fold over ≤|distinct r|
    * rows).
    *
    * @return per observed r: (r, n_r, z_r, slope, r_star)
    */
  def simpleGoodTuring(docs: DataFrame, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val words = docs.select(explode(split(lower(col(textCol)),
        "[ \t\n\f\r]+")).as("w"))
      .where(col("w") =!= "")
    val coc = words.groupBy("w").agg(count(lit(1)).as("r"))
      .groupBy("r").agg(count(lit(1)).as("n_r"))
    val w = Window.orderBy("r")
    val z = coc
      .withColumn("q", coalesce(lag("r", 1).over(w), lit(0L)))
      .withColumn("t", coalesce(lead("r", 1).over(w),
        lit(2) * col("r") - coalesce(lag("r", 1).over(w), lit(0L))))
      .withColumn("zr",
        expr("(2000000 * 2 * n_r + (t - q)) div (2 * (t - q))")
          .cast("double") / 1e6)
      .withColumn("x", log(col("r").cast("double")))
      .withColumn("y", log((lit(2) * col("n_r")).cast("double"))
        - log((col("t") - col("q")).cast("double")))
    val fit = z
      .select(struct(col("r"), col("x"), col("y")).as("s"))
      .agg(count(lit(1)).as("np"),
        array_sort(collect_list(col("s"))).as("l"))
      .select(col("np"),
        aggregate(col("l"), lit(0.0),
          (a, s) => a + s.getField("x")).as("sx"),
        aggregate(col("l"), lit(0.0),
          (a, s) => a + s.getField("y")).as("sy"),
        aggregate(col("l"), lit(0.0),
          (a, s) => a + s.getField("x") * s.getField("x")).as("sxx"),
        aggregate(col("l"), lit(0.0),
          (a, s) => a + s.getField("x") * s.getField("y")).as("sxy"))
      .select(when(
          col("np") * col("sxx") - col("sx") * col("sx") === 0,
          lit(null).cast("double"))
        .otherwise((col("np") * col("sxy") - col("sx") * col("sy"))
          / (col("np") * col("sxx") - col("sx") * col("sx")))
        .as("b"))
    z.crossJoin(broadcast(fit))
      .select(col("r"), col("n_r"), col("zr").as("z_r"),
        round(col("b"), 6).as("slope"),
        round((col("r") + 1).cast("double") *
          exp(col("b") * (log((col("r") + 1).cast("double"))
            - log(col("r").cast("double")))), 6).as("r_star"))
  }

  /** DuckDB replay of [[simpleGoodTuring]]. */
  def simpleGoodTuringOracleSql(table: String, textCol: String): String =
    s"""WITH w AS (SELECT unnest(list_filter(string_split_regex(
       |    lower($textCol), '[ \\t\\n\\f\\r]+'), x -> x <> '')) AS w
       |  FROM $table),
       |wc AS (SELECT w, CAST(count(*) AS BIGINT) AS r FROM w GROUP BY w),
       |coc AS (SELECT r, CAST(count(*) AS BIGINT) AS n_r
       |  FROM wc GROUP BY r),
       |z AS (SELECT r, n_r,
       |    coalesce(lag(r) OVER (ORDER BY r), 0) AS q,
       |    coalesce(lead(r) OVER (ORDER BY r),
       |      2 * r - coalesce(lag(r) OVER (ORDER BY r), 0)) AS t
       |  FROM coc),
       |zz AS (SELECT r, n_r,
       |    CAST((2000000 * 2 * n_r + (t - q)) // (2 * (t - q))
       |      AS DOUBLE) / 1e6 AS z_r,
       |    ln(CAST(r AS DOUBLE)) AS x,
       |    ln(CAST(2 * n_r AS DOUBLE)) - ln(CAST(t - q AS DOUBLE)) AS y
       |  FROM z),
       |fit AS (SELECT count(*) AS np,
       |    list_sum(list(x ORDER BY r)) AS sx,
       |    list_sum(list(y ORDER BY r)) AS sy,
       |    list_sum(list(x * x ORDER BY r)) AS sxx,
       |    list_sum(list(x * y ORDER BY r)) AS sxy
       |  FROM zz),
       |b AS (SELECT CASE WHEN np * sxx - sx * sx = 0 THEN NULL
       |    ELSE (np * sxy - sx * sy) / (np * sxx - sx * sx) END AS b
       |  FROM fit)
       |SELECT r, n_r, z_r, round(b, 6) AS slope,
       |  round((r + 1) * exp(b * (ln(CAST(r + 1 AS DOUBLE))
       |    - ln(CAST(r AS DOUBLE)))), 6) AS r_star
       |FROM zz CROSS JOIN b""".stripMargin
}
