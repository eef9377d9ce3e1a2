package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count–min sketch (Cormode & Muthukrishnan 2005) over an integer
  * key column, with an exact-truth audit: the heavy-hitter counting
  * structure a 100 TB pipeline keeps when the key cardinality is too
  * large for an exact count table (per-IP rates, per-token counts).
  *
  * The sketch here is built with REPLAYABLE hashes — d rows of
  * ((a_i·x + b_i) mod p) mod w with fixed odd multipliers and the
  * Mersenne prime p = 2³¹−1 — so a DuckDB oracle reproduces every
  * counter and estimate bit-for-bit (the xxhash-based ops can't be
  * oracled; this one can, and the estimate-vs-exact audit is the
  * point of the query).
  *
  * Scale shape: the sketch is ONE hash aggregation over an exploded
  * (row, column) frame — d·|rows| tiny tuples, map-side combined to
  * at most d·w counters; it is MERGEABLE by construction (counters
  * add), which is what makes it a streaming/shard-parallel
  * structure. The audit joins the top-k exact keys (two-stage top-k,
  * no global sort) against their d counters.
  */
object SketchOps {

  private val P = 2147483647L // 2^31 - 1
  private val As = Seq(1299709L, 15485863L, 32452843L)
  private val Bs = Seq(104729L, 224737L, 350377L)

  /** The d×w counter table: (r, c, cnt). Exact longs; counters for
    * untouched cells are simply absent (zero).
    */
  def cmsSketch(df: DataFrame, keyCol: String, w: Int): DataFrame = {
    require(w >= 16, s"width must be >= 16, got $w")
    val rows = As.zip(Bs).zipWithIndex.map { case ((a, b), r) =>
      struct(lit(r).as("r"),
        pmod(pmod(col(keyCol) * a + b, lit(P)), lit(w.toLong)).as("c"))
    }
    df.select(explode(array(rows: _*)).as("h"))
      .groupBy(col("h.r").as("r"), col("h.c").as("c"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Estimate-vs-exact audit for the `k` heaviest keys: the CMS
    * estimate is the MIN over the key's d counters; overestimation
    * (never under) is the collision cost the width bought. Top-k by
    * (exact count desc, key asc) — deterministic.
    *
    * @return (key, exact, est, overest) — k rows
    */
  def cmsHeavyHitters(df: DataFrame, keyCol: String, w: Int,
      k: Int): DataFrame =
    cmsHeavyHittersFromSketch(df, cmsSketch(df, keyCol, w), keyCol, w, k)

  /** [[cmsHeavyHitters]] SERVED from an externally-supplied counter
    * table — the store/merge half: counters add, so a sketch merged
    * from any batch split of `df` (e.g.
    * [[IndexStore.readCmsSketch]]'s merge-on-read view) yields the
    * IDENTICAL audit, and a sketch covering a superset corpus yields
    * estimates for the same keys without rescanning it.
    */
  def cmsHeavyHittersFromSketch(df: DataFrame, sketch: DataFrame,
      keyCol: String, w: Int, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    val sk = sketch
    val exact = df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("exact"))
    val top = exact.select(col("key"), col("exact"),
        row_number().over(Window.orderBy(col("exact").desc,
          col("key").asc)).as("rk"))
      .where(col("rk") <= k).drop("rk")
    val probes = As.zip(Bs).zipWithIndex.map { case ((a, b), r) =>
      struct(lit(r).as("r"),
        pmod(pmod(col("key") * a + b, lit(P)), lit(w.toLong)).as("c"))
    }
    top.select(col("key"), col("exact"),
        explode(array(probes: _*)).as("h"))
      .join(sk, col("h.r") === col("r") && col("h.c") === col("c"))
      .groupBy("key", "exact")
      .agg(min("cnt").as("est"))
      .select(col("key"), col("exact"), col("est"),
        (col("est") - col("exact")).as("overest"))
  }

  /** CMS inner-product JOIN-SIZE estimation (Cormode & Muthukrishnan
    * §4.2, the AMS application): |A ⋈ B on key| = Σ_k cA(k)·cB(k),
    * estimated as min over the d rows of Σ_c cntA(r,c)·cntB(r,c) —
    * never an undercount, collisions only add. The planning primitive
    * a 100 TB pipeline wants BEFORE committing to a shuffle join:
    * each side is sketched independently (one scan each, d·w
    * counters — shippable, mergeable across shards), and the
    * estimate is a d·w-bounded join of the two counter tables; the
    * corpus-side exact audit here is Σ over the per-key count tables
    * (key-cardinality-bounded, the cmsHeavyHitters discipline).
    * Degenerate case: fully DISJOINT key sets can leave a sketch
    * row with no common cells, so est/ratio come back NULL beside
    * exact 0 (identically in the oracle) — any shared key makes
    * every row's inner product >= exact and the min well-defined.
    *
    * @return one row: (est_join_rows, exact_join_rows, overest,
    *         ratio 6dp)
    */
  def cmsJoinSize(a: DataFrame, aKey: String, b: DataFrame,
      bKey: String, w: Int): DataFrame = {
    val sa = cmsSketch(a, aKey, w)
      .select(col("r"), col("c"), col("cnt").as("ca"))
    val sb = cmsSketch(b, bKey, w)
      .select(col("r"), col("c"), col("cnt").as("cb"))
    val est = sa.join(sb, Seq("r", "c"))
      .groupBy("r").agg(sum(col("ca") * col("cb")).as("ip"))
      .agg(min("ip").as("est_join_rows"))
    val ea = a.groupBy(col(aKey).as("k")).agg(count(lit(1)).as("na"))
    val eb = b.groupBy(col(bKey).as("k")).agg(count(lit(1)).as("nb"))
    val exact = ea.join(eb, "k")
      .agg(coalesce(sum(col("na") * col("nb")), lit(0L))
        .as("exact_join_rows"))
    est.crossJoin(broadcast(exact))
      .select(col("est_join_rows"), col("exact_join_rows"),
        (col("est_join_rows") - col("exact_join_rows")).as("overest"),
        round(col("est_join_rows").cast("double") /
          col("exact_join_rows"), 6).as("ratio"))
  }

  /** DuckDB replay of [[cmsJoinSize]]; `aSql`/`bSql` yield one `key`
    * column each. */
  def cmsJoinSizeOracleSql(aSql: String, bSql: String, w: Int): String = {
    def hashes(src: String) = As.zip(Bs).zipWithIndex.map {
      case ((a, b), r) =>
        s"SELECT $r AS r, ((key * $a + $b) % $P) % $w AS c FROM ($src) s"
    }.mkString(" UNION ALL ")
    s"""WITH ska AS (SELECT r, c, CAST(count(*) AS BIGINT) AS ca
       |  FROM (${hashes("__A__")}) h GROUP BY r, c),
       |skb AS (SELECT r, c, CAST(count(*) AS BIGINT) AS cb
       |  FROM (${hashes("__B__")}) h GROUP BY r, c),
       |ip AS (SELECT ska.r, CAST(sum(ca * cb) AS BIGINT) AS ip
       |  FROM ska JOIN skb ON ska.r = skb.r AND ska.c = skb.c
       |  GROUP BY ska.r),
       |est AS (SELECT CAST(min(ip) AS BIGINT) AS est_join_rows FROM ip),
       |ea AS (SELECT key AS k, CAST(count(*) AS BIGINT) AS na
       |  FROM (__A__) s GROUP BY 1),
       |eb AS (SELECT key AS k, CAST(count(*) AS BIGINT) AS nb
       |  FROM (__B__) s GROUP BY 1),
       |ex AS (SELECT CAST(coalesce(sum(na * nb), 0) AS BIGINT)
       |    AS exact_join_rows FROM ea JOIN eb USING (k))
       |SELECT est_join_rows, exact_join_rows,
       |  est_join_rows - exact_join_rows AS overest,
       |  round(CAST(est_join_rows AS DOUBLE) / exact_join_rows, 6)
       |    AS ratio
       |FROM est CROSS JOIN ex""".stripMargin
      .replace("__A__", aSql).replace("__B__", bSql)
  }

  /** DuckDB replay of [[cmsHeavyHitters]]. */
  def cmsHeavyHittersOracleSql(table: String, keyExpr: String, w: Int,
      k: Int): String = {
    val hashes = As.zip(Bs).zipWithIndex.map { case ((a, b), r) =>
      s"SELECT $r AS r, (($keyExpr * $a + $b) % $P) % $w AS c" +
        s" FROM $table"
    }.mkString(" UNION ALL ")
    val probes = As.zip(Bs).zipWithIndex.map { case ((a, b), r) =>
      s"SELECT key, exact, $r AS r, ((key * $a + $b) % $P) % $w AS c" +
        s" FROM top"
    }.mkString(" UNION ALL ")
    s"""WITH sk AS (SELECT r, c, CAST(count(*) AS BIGINT) AS cnt
       |  FROM ($hashes) h GROUP BY r, c),
       |exact AS (SELECT $keyExpr AS key, CAST(count(*) AS BIGINT)
       |    AS exact FROM $table GROUP BY 1),
       |top AS (SELECT key, exact FROM (SELECT key, exact,
       |    row_number() OVER (ORDER BY exact DESC, key ASC) AS rk
       |  FROM exact) t WHERE rk <= $k),
       |pr AS ($probes)
       |SELECT p.key, p.exact, min(sk.cnt) AS est,
       |  min(sk.cnt) - p.exact AS overest
       |FROM pr p JOIN sk ON sk.r = p.r AND sk.c = p.c
       |GROUP BY p.key, p.exact""".stripMargin
  }

  // ----------------------------------------------------------------
  // Durable quantile histogram — the rank-query member of the
  // mergeable-store family (moments: PcaOps, counters: cmsSketch,
  // distinct: ProfileOps.kmvSketch). State is a fixed-cell bucket
  // count table: bucket = floor(value_micro / cellMicro) — counts
  // ADD, so per-shard/per-batch deltas merged in any order equal the
  // from-scratch histogram bit-for-bit, and a quantile never needs a
  // global sort: cumulative counts over the BOUNDED bucket table
  // answer any rank query with error at most one cell width.
  // ----------------------------------------------------------------

  /** One batch's bucket-count delta: (bucket, n). Values enter on the
    * micro grid (round(v·1e6), exact for doubles below ~2^53 micro
    * units); the floor division is exact over the full long range
    * ([[ExactArith.floorDiv]]), so negatives bucket correctly.
    */
  def quantHistDelta(df: DataFrame, valueCol: String,
      cellMicro: Long): DataFrame = {
    require(cellMicro >= 1L, s"cellMicro must be >= 1, got $cellMicro")
    df.select(ExactArith.floorDiv(
        round(col(valueCol).cast("double") * 1e6, 0).cast("long"),
        lit(cellMicro)).as("bucket"))
      .where(col("bucket").isNotNull)
      .groupBy("bucket").agg(count(lit(1)).as("n"))
  }

  /** Quantile estimates from a (possibly merge-on-read) histogram,
    * AUDITED against the exact order statistics: for each q (in
    * millionths), rank = ceil(q·N/1e6) computed in exact integers,
    * the estimate is the upper edge of the first bucket whose
    * cumulative count reaches the rank, and the exact value is the
    * same rank over the VALUE DISTRIBUTION (group-by value_micro —
    * bounded by the value grid, never a corpus sort). The invariant
    * the audit proves: 0 < est_hi_micro − exact_micro <= cellMicro.
    *
    * Scale shape: one corpus aggregation for the value distribution
    * (map-side combined; at 100 TB this is the ONLY corpus-wide work
    * and exists purely as the audit — production serves from the
    * store alone); both cumulative windows run single-partition over
    * BOUNDED frames (buckets, distinct grid values). The rank
    * arithmetic is integer end to end — no double ceil can misround
    * a boundary rank.
    *
    * @return (q_micro, rank_n, bucket, est_hi_micro, exact_micro,
    *         err_micro) ordered by q_micro
    */
  def quantileAuditFromHist(df: DataFrame, valueCol: String,
      hist: DataFrame, cellMicro: Long, qMicros: Seq[Long]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(qMicros.nonEmpty && qMicros.forall(q => q > 0 && q <= 1000000L),
      "quantiles must be in (0, 1e6] millionths")
    val spark = df.sparkSession
    import spark.implicits._
    val qs = qMicros.toDF("q_micro")
    val tot = hist.agg(sum("n").as("nt"))
    val ranks = qs.crossJoin(broadcast(tot))
      .select(col("q_micro"),
        ExactArith.floorDiv(col("q_micro") * col("nt") + 999999L,
          lit(1000000L)).as("rank_n"))
    val wb = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.withColumn("cum", sum("n").over(wb))
    val est = broadcast(ranks).join(cum, col("cum") >= col("rank_n"))
      .groupBy("q_micro", "rank_n").agg(min("bucket").as("bucket"))
    val dist = df.select(round(col(valueCol).cast("double") * 1e6, 0)
        .cast("long").as("vm"))
      .where(col("vm").isNotNull)
      .groupBy("vm").agg(count(lit(1)).as("c"))
    val wd = Window.orderBy("vm")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dcum = dist.withColumn("dcm", sum("c").over(wd))
    val exact = broadcast(ranks.select(col("q_micro").as("_q"),
        col("rank_n").as("_r")))
      .join(dcum, col("dcm") >= col("_r"))
      .groupBy("_q").agg(min("vm").as("exact_micro"))
    est.join(exact, col("q_micro") === col("_q"))
      .select(col("q_micro"), col("rank_n"), col("bucket"),
        ((col("bucket") + 1L) * cellMicro).as("est_hi_micro"),
        col("exact_micro"),
        ((col("bucket") + 1L) * cellMicro - col("exact_micro"))
          .as("err_micro"))
      .orderBy("q_micro")
  }

  /** DuckDB replay of [[quantHistDelta]] (from scratch — which is
    * exactly what proves merge-on-read == from-scratch when the
    * engine side serves from a batch-appended store) +
    * [[quantileAuditFromHist]].
    */
  def quantileAuditOracleSql(table: String, valueExpr: String,
      cellMicro: Long, qMicros: Seq[Long]): String = {
    val qsRows = qMicros.map(q => s"($q)").mkString(", ")
    s"""WITH vm AS (SELECT CAST(round(CAST($valueExpr AS DOUBLE) * 1e6,
       |      0) AS BIGINT) AS vm FROM $table
       |  WHERE $valueExpr IS NOT NULL),
       |hist AS (SELECT CASE WHEN vm >= 0 THEN vm // $cellMicro
       |    ELSE -((-vm + $cellMicro - 1) // $cellMicro) END AS bucket,
       |    CAST(count(*) AS BIGINT) AS n
       |  FROM vm GROUP BY 1),
       |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM hist),
       |qs AS (SELECT CAST(q AS BIGINT) AS q_micro
       |  FROM (VALUES $qsRows) v(q)),
       |ranks AS (SELECT q_micro,
       |    (q_micro * nt + 999999) // 1000000 AS rank_n
       |  FROM qs CROSS JOIN tot),
       |cum AS (SELECT bucket, sum(n) OVER (ORDER BY bucket
       |    ROWS UNBOUNDED PRECEDING) AS cum FROM hist),
       |est AS (SELECT q_micro, rank_n, min(bucket) AS bucket
       |  FROM ranks JOIN cum ON cum.cum >= ranks.rank_n
       |  GROUP BY 1, 2),
       |dist AS (SELECT vm, CAST(count(*) AS BIGINT) AS c
       |  FROM vm GROUP BY vm),
       |dcum AS (SELECT vm, sum(c) OVER (ORDER BY vm
       |    ROWS UNBOUNDED PRECEDING) AS dcm FROM dist),
       |ex AS (SELECT q_micro AS _q, min(vm) AS exact_micro
       |  FROM ranks JOIN dcum ON dcum.dcm >= ranks.rank_n
       |  GROUP BY 1)
       |SELECT est.q_micro, CAST(est.rank_n AS BIGINT) AS rank_n,
       |  CAST(est.bucket AS BIGINT) AS bucket,
       |  CAST((est.bucket + 1) * $cellMicro AS BIGINT) AS est_hi_micro,
       |  CAST(ex.exact_micro AS BIGINT) AS exact_micro,
       |  CAST((est.bucket + 1) * $cellMicro - ex.exact_micro AS BIGINT)
       |    AS err_micro
       |FROM est JOIN ex ON est.q_micro = ex._q
       |ORDER BY est.q_micro""".stripMargin
  }
}
