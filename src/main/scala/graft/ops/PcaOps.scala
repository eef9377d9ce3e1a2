package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed PCA over an embedding column — the dimensionality
  * probe/reduction a curation pipeline runs before storing, indexing,
  * or clustering billions of vectors (effective rank of the embedding
  * space, whitening/compression ahead of ANN, variance-explained
  * budgeting for int8/PQ codecs).
  *
  * Reference has no counterpart (its tabular engine is 1-D numeric);
  * this is part of the LLM-pipeline surface (builder brief), built on
  * the same determinism discipline as QualityFit/ProfileOps.corrMatrix:
  *
  *  - **One corpus pass** computes every sufficient statistic: per-row
  *    the flattened vector `[1, x_0..x_{d-1}, x_i*x_j (i<=j)]` is cast
  *    to decimal(38,18) BEFORE summation (products are row-local ⇒
  *    order-free; decimal sums are associative ⇒ bit-identical under
  *    any partitioning). The flattened array posexplodes to
  *    `(pos, term)` rows and aggregates by position — a map-side-
  *    combined shuffle of exactly `1 + d + d(d+1)/2` groups, never a
  *    join, never a second scan. At d=1024 that is ~525k groups of one
  *    decimal each — trivial at any corpus size.
  *  - **Driver-side eigensolve** on the d×d covariance (cyclic Jacobi
  *    rotations, fixed sweep order, symmetric ⇒ guaranteed
  *    convergence). d is model dimension, not data size: the solve is
  *    O(d³) on ~KBs and independent of corpus scale.
  *  - **Deterministic by construction**: exact decimal inputs, fixed
  *    rotation order, eigenvalues sorted (desc, index tie-break), and
  *    each eigenvector sign-normalized so its largest-|.|. coordinate
  *    is positive. Same corpus ⇒ same bits, any partitioning.
  *
  * Projection ([[project]]) is a pure per-row codegen'd expression
  * (zip_with/aggregate against component literals) — zero shuffle,
  * zero driver involvement, filters push past it.
  */
object PcaOps {

  private val D = "decimal(38,18)"

  /** Sufficient statistics in one pass: (n, sums s_i, product sums
    * p_ij for i<=j) — all exact decimal.
    *
    * The flattened term vector `[1, x_0..x_{d-1}, x_i*x_j (i<=j)]` is
    * built with HIGHER-ORDER functions (`transform`/`slice`/`flatten`)
    * so the Catalyst tree is O(1) in `d` — the naive `array(2145
    * literal columns)` spelling at d=64 OOMs the driver during
    * planning/codegen. Each term casts to decimal BEFORE the sum
    * (row-local products → order-free; decimal sums associative →
    * bit-identical under any partitioning). posexplode + groupBy(pos)
    * is map-side combined: each partition emits exactly `1 + d +
    * d(d+1)/2` (pos, partial-sum) rows regardless of row count, so
    * the shuffle is O(partitions · d²), independent of corpus size.
    * The d²-row explode per doc is CPU churn, not a shuffle: at
    * d ≥ ~256 fit on a deterministic sample (SampleOps) — the model
    * needs moments, not the full corpus — and keep [[project]] (zero
    * shuffle) on everything.
    */
  private def moments(emb: DataFrame, vecCol: String, d: Int)
      : (Long, Array[Double], Array[Array[Double]]) =
    fromPosSums(momentsDelta(emb, vecCol, d)
      .collect().map(r => r.getInt(0) -> r.getDecimal(1)).toMap, d)

  /** One batch's moment delta as a FRAME: `(pos, s DECIMAL(38,18))` —
    * pos 0 is the row count (term 1.0 per row), 1..d the coordinate
    * sums, then the upper-triangle product sums in (i ≤ j) scan
    * order. Decimal sums are associative, so deltas append-merge
    * (sum per pos) to EXACTLY the single-pass moments — the additive
    * kernel behind [[graft.ops.IndexStore.appendPcaMoments]] and the
    * streaming ingest twin.
    */
  def momentsDelta(emb: DataFrame, vecCol: String, d: Int): DataFrame = {
    val raw = col(vecCol).cast("array<double>")
    // A short vector would SHIFT flattened positions, not null them,
    // and a null ELEMENT would silently drop from per-position sums
    // while the row still counts toward n — fail loudly on both
    // (matches the fit() contract).
    val vd = when(size(raw) >= d && size(filter(slice(raw, 1, d),
        x => x.isNull)) === 0, slice(raw, 1, d))
      .otherwise(raise_error(lit(
        s"pca: vector shorter than d=$d or has null elements")))
    val prods = flatten(transform(vd, (x, i0) =>
      transform(slice(vd, i0 + 1, lit(d) - i0), y => x * y)))
    val terms = concat(array(lit(1.0)), vd, prods).cast(s"array<$D>")
    emb
      .select(posexplode(terms).as(Seq("pos", "term")))
      .groupBy("pos").agg(sum("term").as("s"))
  }

  private def fromPosSums(sums: Map[Int, java.math.BigDecimal], d: Int)
      : (Long, Array[Double], Array[Array[Double]]) = {
    def at(p: Int): Double = {
      val x = sums.getOrElse(p, null); if (x == null) 0.0 else x.doubleValue
    }
    val n = math.round(at(0))
    val s = Array.tabulate(d)(i => at(1 + i))
    val p = Array.ofDim[Double](d, d)
    var idx = 1 + d
    for { i <- 0 until d; j <- i until d } {
      p(i)(j) = at(idx); p(j)(i) = p(i)(j); idx += 1
    }
    (n, s, p)
  }

  /** Fit from a durable moments store ([[graft.ops.IndexStore]]'s
    * merge-on-read view): bit-identical to [[fit]] on the union of
    * every appended batch — decimal sums are associative, so the
    * merge order (including "one batch") cannot move a single bit,
    * and the eigensolve is a deterministic function of the sums.
    * This is incremental PCA at 100 TB: each new shard appends one
    * tiny (1 + d + d(d+1)/2)-row delta; refits never rescan vectors.
    */
  def fitFromMomentsStore(spark: org.apache.spark.sql.SparkSession,
      path: String, d: Int): PcaModel = {
    val sums = graft.ops.IndexStore.readPcaMoments(spark, path, expectD = d)
      .collect().map(r => r.getInt(0) -> r.getDecimal(1)).toMap
    val (n, s, p) = fromPosSums(sums, d)
    require(n >= 2, s"pca needs at least 2 rows, got $n")
    val (evals, evecs) = jacobiEigen(covariance(n, s, p))
    PcaModel(n, s.map(_ / n.toDouble), evals, evecs)
  }

  /** Population covariance with a FIXED operation order (mirrors
    * corrMatrix: cast-to-double first, then the closed form).
    */
  private def covariance(n: Long, s: Array[Double], p: Array[Array[Double]])
      : Array[Array[Double]] = {
    val d = s.length
    val nn = n.toDouble
    Array.tabulate(d, d)((i, j) => p(i)(j) / nn - (s(i) / nn) * (s(j) / nn))
  }

  /** Cyclic Jacobi eigensolve for a symmetric matrix: returns
    * (eigenvalues, eigenvectors as rows), sorted by eigenvalue desc
    * with index tie-break, each vector sign-normalized (largest-|.|
    * coordinate positive, earliest index on ties).
    */
  private[graft] def jacobiEigen(m: Array[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = m.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    def off(): Double = {
      var s = 0.0
      for { i <- 0 until d; j <- (i + 1) until d } s += a(i)(j) * a(i)(j)
      s
    }
    val eps = 1e-22 * math.max(1.0, m.map(r => r.map(math.abs).max).max)
    var sweep = 0
    while (sweep < 64 && off() > eps) {
      for { pp <- 0 until (d - 1); qq <- (pp + 1) until d } {
        val apq = a(pp)(qq)
        if (math.abs(apq) > 0.0) {
          val theta = (a(qq)(qq) - a(pp)(pp)) / (2.0 * apq)
          val t = math.signum(theta) match {
            case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0))
            case sg  => sg / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
          }
          val c = 1.0 / math.sqrt(t * t + 1.0)
          val sN = t * c
          for (k <- 0 until d) {
            val akp = a(k)(pp); val akq = a(k)(qq)
            a(k)(pp) = c * akp - sN * akq
            a(k)(qq) = sN * akp + c * akq
          }
          for (k <- 0 until d) {
            val apk = a(pp)(k); val aqk = a(qq)(k)
            a(pp)(k) = c * apk - sN * aqk
            a(qq)(k) = sN * apk + c * aqk
          }
          for (k <- 0 until d) {
            val vkp = v(k)(pp); val vkq = v(k)(qq)
            v(k)(pp) = c * vkp - sN * vkq
            v(k)(qq) = sN * vkp + c * vkq
          }
        }
      }
      sweep += 1
    }
    val order = (0 until d).sortBy(i => (-a(i)(i), i))
    val evals = order.map(i => a(i)(i)).toArray
    val evecs = order.map { i =>
      val col = Array.tabulate(d)(k => v(k)(i))
      val big = col.indices.maxBy(k => (math.abs(col(k)), -k))
      if (col(big) < 0.0) col.map(x => -x) else col
    }.toArray
    (evals, evecs)
  }

  /** Fitted model: row count, per-dim means, eigenvalues (desc), and
    * eigenvectors (rows, orthonormal, sign-normalized).
    */
  case class PcaModel(n: Long, means: Array[Double],
      eigenvalues: Array[Double], components: Array[Array[Double]])

  /** Fit PCA on `emb(vecCol)` (dimension `d`): one corpus pass for the
    * exact-decimal moments, then the driver-side covariance + Jacobi
    * eigensolve. Vectors shorter than `d` raise_error inside the scan
    * (a silent slice would shift flattened positions); longer vectors
    * use their leading `d` coordinates.
    */
  def fit(emb: DataFrame, vecCol: String, d: Int): PcaModel = {
    require(d >= 2, s"pca needs d >= 2, got $d")
    val (n, s, p) = moments(emb, vecCol, d)
    require(n >= 2, s"pca needs at least 2 rows, got $n")
    val (evals, evecs) = jacobiEigen(covariance(n, s, p))
    PcaModel(n, s.map(_ / n.toDouble), evals, evecs)
  }

  /** Variance report: one row per component — eigenvalue, fraction of
    * total variance explained, cumulative fraction. The shape a
    * pipeline owner reads to pick a truncation rank.
    */
  def varianceReport(emb: DataFrame, vecCol: String, d: Int): DataFrame = {
    val m = fit(emb, vecCol, d)
    val spark = emb.sparkSession
    import spark.implicits._
    val total = m.eigenvalues.sum
    def r6(x: Double): Double =
      java.math.BigDecimal.valueOf(x)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
    var cum = 0.0
    m.eigenvalues.zipWithIndex.map { case (ev, i) =>
      cum += ev
      (i, m.n, r6(ev), r6(if (total == 0.0) 0.0 else ev / total),
        r6(if (total == 0.0) 0.0 else cum / total))
    }.toSeq.toDF("component", "n", "eigenvalue", "explained_frac", "cum_frac")
  }

  /** Project every vector onto the model's top-`k` components —
    * centered dot products against component LITERALS via
    * zip_with/aggregate (codegen'd, zero shuffle, zero driver). Output
    * coords round to 6dp for cross-engine stability.
    */
  def project(emb: DataFrame, idCol: String, vecCol: String,
      model: PcaModel, k: Int): DataFrame = {
    require(k >= 1 && k <= model.components.length,
      s"k must be in [1, ${model.components.length}], got $k")
    val d = model.means.length
    val raw = col(vecCol).cast("array<double>")
    // Mirror the fit() contract exactly: longer vectors use their
    // leading d coords (slice BEFORE centering — zip_with null-pads
    // the shorter side, which would null every pc_* column), shorter
    // or null-element vectors fail loudly instead of yielding nulls.
    val v = when(size(raw) >= d && size(filter(slice(raw, 1, d),
        x => x.isNull)) === 0, slice(raw, 1, d))
      .otherwise(raise_error(lit(
        s"pca project: vector shorter than d=$d or has null elements")))
    val centered = zip_with(v, typedlit(model.means.toSeq), (x, mu) => x - mu)
    val coords = (0 until k).map { j =>
      val w = typedlit(model.components(j).toSeq)
      round(aggregate(zip_with(centered, w, (x, wj) => x * wj),
        lit(0.0), (acc, t) => acc + t), 6).as(s"pc_$j")
    }
    emb.select((col(idCol).as("id") +: coords): _*)
  }

  /** DuckDB SQL replaying [[project]] under a FROZEN fitted model —
    * the q174-Viterbi frozen-literal discipline extended to PCA: the
    * generator (Verify, driver-side) runs the same decimal-exact
    * moments pass + Jacobi eigensolve on the target data dir and
    * embeds the means and top-`k` components as exact
    * `Double.toString` literals, so DuckDB never re-derives the
    * eigensystem (whose rotation history is not SQL-expressible) —
    * it replays the DATA-SCALE path end-to-end: read every vector,
    * center against the frozen means, sequential-fold dot product
    * per component ((x_i − μ_i)·w_i summed left-to-right — DuckDB's
    * `list_sum` folds in list order, matching Spark's
    * `aggregate(zip_with(...), 0.0, _+_)` term-for-term), round 6dp.
    *
    * Trust split (same as the q174 embedded log-probs): the JVM
    * kernel producing the literals is pinned by PcaSpec
    * (planted-axis recovery, orthonormality, covariance
    * reconstruction, differential vs an in-memory reference); the
    * oracle proves the distributed projection of every row matches
    * an independent engine bit-for-bit.
    */
  def projectOracleSql(table: String, idCol: String, vecCol: String,
      model: PcaModel, k: Int): String = {
    require(k >= 1 && k <= model.components.length,
      s"k must be in [1, ${model.components.length}], got $k")
    val d = model.means.length
    def arr(a: Array[Double]): String =
      a.map(_.toString).mkString("[", ", ", "]")
    val pcs = (0 until k).map { j =>
      s"""round(list_sum(list_transform(generate_series(1, $d),
         |   i -> (CAST($vecCol[i] AS DOUBLE) - (${arr(model.means)}::DOUBLE[])[i])
         |        * (${arr(model.components(j))}::DOUBLE[])[i])), 6) AS pc_$j"""
        .stripMargin
    }.mkString(",\n ")
    s"""SELECT $idCol,
       | $pcs
       |FROM $table""".stripMargin
  }

  /** Closed-form PCA over TWO integer feature columns — the
    * cross-engine-exact twin of [[fit]] for the d=2 probe a pipeline
    * owner runs on scalar signals (e.g. chars × tokens: is length one
    * axis or two?). Moments are decimal(38,0) sums of integers (exact,
    * associative — bit-identical under any partitioning, in Spark AND
    * in any SQL engine), then the 2×2 eigensystem in a FIXED IEEE
    * double operation order (documented inline; [[eigen2OracleSql]]
    * replays the identical order), so the result is exactly
    * reproducible — unlike the Jacobi path, whose rotation history is
    * not SQL-expressible. One scan, one 6-group shuffle, O(1) driver.
    *
    * Output: one row per component (0, 1) with eigenvalue (population
    * covariance), explained-variance fraction, and the sign-normalized
    * eigenvector (largest-|.| coordinate positive, x on ties) — all
    * rounded to 6dp for cross-engine hash stability.
    */
  def eigen2(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val D0 = "decimal(38,0)"
    val x = col(xCol).cast("long"); val y = col(yCol).cast("long")
    val r = df
      .where(col(xCol).isNotNull && col(yCol).isNotNull)
      .agg(
        count(lit(1)).as("n"),
        sum(x.cast(D0)).as("sx"), sum(y.cast(D0)).as("sy"),
        sum((x * x).cast(D0)).as("sxx"),
        sum((y * y).cast(D0)).as("syy"),
        sum((x * y).cast(D0)).as("sxy"))
      .head()
    val n = r.getLong(0).toDouble
    require(n >= 2, s"pca2 needs at least 2 rows, got ${r.getLong(0)}")
    def dd(i: Int): Double = r.getDecimal(i).doubleValue
    // Fixed operation order — every line below is mirrored verbatim in
    // eigen2OracleSql. Population covariance closed form:
    val a = dd(3) / n - (dd(1) / n) * (dd(1) / n)
    val c = dd(4) / n - (dd(2) / n) * (dd(2) / n)
    val b = dd(5) / n - (dd(1) / n) * (dd(2) / n)
    val half = (a + c) / 2.0
    val disc = math.sqrt(((a - c) / 2.0) * ((a - c) / 2.0) + b * b)
    val l1 = half + disc
    val l2 = half - disc
    val tot = l1 + l2
    // Eigenvector for l: (b, l - a) unless b == 0 (already diagonal —
    // axis vectors, ordered by which diagonal entry is larger).
    def vec(l: Double, first: Boolean): (Double, Double) =
      if (b == 0.0) { if ((a >= c) == first) (1.0, 0.0) else (0.0, 1.0) }
      else {
        val nr = math.sqrt(b * b + (l - a) * (l - a))
        val (vx, vy) = (b / nr, (l - a) / nr)
        // Sign-normalize: largest-|.| coordinate positive, x on ties.
        if (if (math.abs(vx) >= math.abs(vy)) vx < 0.0 else vy < 0.0)
          (-vx, -vy) else (vx, vy)
      }
    def r6(v: Double): Double =
      java.math.BigDecimal.valueOf(v)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
    val (v1x, v1y) = vec(l1, first = true)
    val (v2x, v2y) = vec(l2, first = false)
    Seq(
      (0, r.getLong(0), r6(l1), r6(if (tot == 0.0) 0.0 else l1 / tot),
        r6(v1x), r6(v1y)),
      (1, r.getLong(0), r6(l2), r6(if (tot == 0.0) 0.0 else l2 / tot),
        r6(v2x), r6(v2y)))
      .toDF("component", "n", "eigenvalue", "explained_frac", "vx", "vy")
  }

  /** DuckDB SQL replaying [[eigen2]]'s exact operation order over the
    * same integer moments. `xExpr`/`yExpr` are SQL expressions for the
    * two features (must be integral and match the Spark columns).
    */
  def eigen2OracleSql(table: String, xExpr: String, yExpr: String,
      where: String = "TRUE"): String = {
    val d = "CAST(%s AS DOUBLE)"
    s"""WITH m AS (
       | SELECT count(*) AS n,
       |  sum(CAST(x AS DECIMAL(38,0))) AS sx,
       |  sum(CAST(y AS DECIMAL(38,0))) AS sy,
       |  sum(CAST(x*x AS DECIMAL(38,0))) AS sxx,
       |  sum(CAST(y*y AS DECIMAL(38,0))) AS syy,
       |  sum(CAST(x*y AS DECIMAL(38,0))) AS sxy
       | FROM (SELECT CAST($xExpr AS BIGINT) AS x, CAST($yExpr AS BIGINT) AS y
       |       FROM $table
       |       WHERE ($xExpr) IS NOT NULL AND ($yExpr) IS NOT NULL AND ($where))),
       |cov AS (
       | SELECT n,
       |  ${d.format("sxx")} / ${d.format("n")}
       |    - (${d.format("sx")} / ${d.format("n")}) * (${d.format("sx")} / ${d.format("n")}) AS a,
       |  ${d.format("syy")} / ${d.format("n")}
       |    - (${d.format("sy")} / ${d.format("n")}) * (${d.format("sy")} / ${d.format("n")}) AS c,
       |  ${d.format("sxy")} / ${d.format("n")}
       |    - (${d.format("sx")} / ${d.format("n")}) * (${d.format("sy")} / ${d.format("n")}) AS b
       | FROM m),
       |eig AS (
       | SELECT n, a, b, c,
       |  (a + c) / 2.0 + sqrt(((a - c) / 2.0) * ((a - c) / 2.0) + b * b) AS l1,
       |  (a + c) / 2.0 - sqrt(((a - c) / 2.0) * ((a - c) / 2.0) + b * b) AS l2
       | FROM cov),
       |comp AS (
       | SELECT 0 AS component, n, l1 AS l, l1 + l2 AS tot, a, b, c, TRUE AS first FROM eig
       | UNION ALL
       | SELECT 1 AS component, n, l2 AS l, l1 + l2 AS tot, a, b, c, FALSE AS first FROM eig),
       |vecs AS (
       | SELECT component, n, l, tot,
       |  CASE WHEN b = 0.0 THEN (CASE WHEN (a >= c) = first THEN 1.0 ELSE 0.0 END)
       |       ELSE b / sqrt(b * b + (l - a) * (l - a)) END AS rvx,
       |  CASE WHEN b = 0.0 THEN (CASE WHEN (a >= c) = first THEN 0.0 ELSE 1.0 END)
       |       ELSE (l - a) / sqrt(b * b + (l - a) * (l - a)) END AS rvy
       | FROM comp)
       |SELECT component, CAST(n AS BIGINT) AS n,
       | round(l, 6) AS eigenvalue,
       | round(CASE WHEN tot = 0.0 THEN 0.0 ELSE l / tot END, 6) AS explained_frac,
       | round(CASE WHEN (CASE WHEN abs(rvx) >= abs(rvy) THEN rvx < 0.0 ELSE rvy < 0.0 END)
       |   THEN -rvx ELSE rvx END, 6) AS vx,
       | round(CASE WHEN (CASE WHEN abs(rvx) >= abs(rvy) THEN rvx < 0.0 ELSE rvy < 0.0 END)
       |   THEN -rvy ELSE rvy END, 6) AS vy
       |FROM vecs""".stripMargin
  }
}
