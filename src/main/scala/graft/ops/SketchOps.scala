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
}
