package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** TRAINED quality filtering (the CCNet / fastText-filter shape): the
  * linear scorer in [[TextOps.qualityScore]] is only as good as its
  * weights, and real curation pipelines fit them against a labeled
  * target domain rather than hand-tuning. This is a logistic
  * regression fit by IRLS (iteratively reweighted least squares —
  * Newton's method on the log-likelihood) over the five quality
  * signals, run AS AGGREGATIONS on the cluster:
  *
  *  - per Newton step, ONE pass over the corpus computes the 6×6
  *    Gram matrix X'SX and gradient X'(y−μ) as 27 sums (map-side
  *    combined, a few hundred bytes per partition — the corpus never
  *    moves, 100 TB of training text costs `iters` scans);
  *  - the 6×6 solve happens on the driver (Gaussian elimination with
  *    partial pivoting — microseconds, no library);
  *  - every aggregated term is cast to decimal(38,18) BEFORE the sum,
  *    so partial-aggregation order cannot perturb the result: decimal
  *    addition is exact and associative where double addition is not.
  *    The fit is therefore bit-reproducible across partitionings —
  *    a frozen weight vector can be pinned by a spec and re-derived
  *    exactly. (Row terms are bounded by s·max(xᵢxⱼ) ≲ 10⁶; the
  *    38-digit sum would need ~10³² rows to overflow.)
  *
  * A fixed iteration count (no data-dependent stopping) keeps the
  * work deterministic; `ridge` regularizes all six coefficients so
  * separable corpora cannot blow the weights up. Weights are rounded
  * to 6 decimals on return — the same contract as the frozen BPE
  * merge table: training is the offline path, the frozen result is
  * what the 100 TB scoring scan replays.
  *
  * Reference semantics: laccore/feldman has no trained scorer (its
  * filters are fixed thresholds); this follows the published CCNet
  * recipe of fitting a linear model on a target-domain label.
  */
object QualityFit {

  val NumFeatures = 5 // + bias = 6 coefficients

  /** Fit logistic weights for P(label=1 | quality signals of textCol).
    *
    * `label` is any boolean/numeric Column over `df`'s columns
    * (e.g. `col("lang") === "en"` for a target-language filter, or a
    * membership flag for a curated-source sample).
    */
  def fit(df: DataFrame, textCol: String, label: Column,
      iters: Int = 8, ridge: Double = 1e-3): TextOps.QualityWeights = {
    require(iters >= 1, s"need iters >= 1, got $iters")
    val t = col(textCol)
    // same barrier as qualityScore: keep the tokenizer out of the
    // per-element bigram lambdas (O(len²)/doc if inlined)
    val sig = df.select(label.cast("double").as("_y"), t.as(textCol),
        TextOps.tokens(t).as("_w"))
      .select(col("_y"), explode(array(col("_w"))).as("_w"), t)
      .select(col("_y").as("y") +:
        TextOps.qualitySignalCols(t).zipWithIndex.map {
          case (c, i) => c.as(s"x${i + 1}")
        }: _*)
    toWeights(fitPrepared(sig, NumFeatures, iters, ridge))
  }

  /** Fit logistic weights over an ARBITRARY feature-column list — the
    * [[fit]] loop with the feature surface as a parameter instead of
    * the five built-in quality signals (their Gram aggregation was
    * always mechanically general; this exposes it). Returns
    * (bias +: coefficients) aligned with `features`, rounded to 6
    * decimals — the same frozen-model contract. Each feature column
    * must be numeric over `df`'s columns; rows where any feature or
    * the label is NULL would poison the decimal sums, so they are
    * dropped (documented, observable via a count comparison).
    *
    * Scale shape identical to [[fit]]: per Newton step ONE corpus
    * pass computing the (n+1)(n+2)/2 + (n+1) decimal sums map-side
    * combined; the (n+1)×(n+1) solve is driver-side microseconds.
    */
  def fitColumns(df: DataFrame, label: Column, features: Seq[Column],
      iters: Int = 8, ridge: Double = 1e-3): Array[Double] = {
    require(iters >= 1, s"need iters >= 1, got $iters")
    require(features.nonEmpty, "need at least one feature column")
    val sig = df.select(label.cast("double").as("y") +:
        features.zipWithIndex.map { case (c, i) =>
          c.cast("double").as(s"x${i + 1}")
        }: _*)
      .na.drop()
    fitPrepared(sig, features.size, iters, ridge).map(r6)
  }

  /** The shared IRLS loop over a prepared (y, x1..x{nf}) frame. */
  private def fitPrepared(sig: DataFrame, nf: Int, iters: Int,
      ridge: Double): Array[Double] = {
    sig.cache()
    try {
      var w = Array.fill(nf + 1)(0.0)
      for (_ <- 1 to iters) w = newtonStep(sig, nf, w, ridge)
      w
    } finally { sig.unpersist(); () }
  }

  /** One Newton step: returns w + (X'SX + ridge·I)⁻¹ X'(y−μ). */
  private def newtonStep(sig: DataFrame, nf: Int, w: Array[Double],
      ridge: Double): Array[Double] = {
    val n = nf + 1
    val x = lit(1.0) +: (1 to nf).map(i => col(s"x$i"))
    val z = x.zip(w).map { case (c, wi) => c * wi }.reduce(_ + _)
    val mu = lit(1.0) / (lit(1.0) + exp(-z))
    val s = mu * (lit(1.0) - mu)
    def exact(c: Column) = sum(c.cast("decimal(38,18)"))
    val hCols = for (i <- 0 until n; j <- i until n)
      yield exact(s * x(i) * x(j)).as(s"h_${i}_$j")
    val gCols = (0 until n).map(i => exact((col("y") - mu) * x(i)).as(s"g_$i"))
    val row = sig.agg((hCols ++ gCols).head, (hCols ++ gCols).tail: _*).head()
    def get(name: String): Double = {
      val v = row.getAs[java.math.BigDecimal](name)
      require(v != null, s"quality fit aggregate $name overflowed/was null " +
        "(empty input or >1e32 rows?)")
      v.doubleValue()
    }
    val a = Array.ofDim[Double](n, n)
    for (i <- 0 until n; j <- i until n) {
      val v = get(s"h_${i}_$j") + (if (i == j) ridge else 0.0)
      a(i)(j) = v; a(j)(i) = v
    }
    val g = Array.tabulate(n)(i => get(s"g_$i"))
    val delta = solve(a, g)
    w.zip(delta).map { case (wi, d) => wi + d }
  }

  /** In-memory reference fit over pre-computed (signals, label) rows —
    * the differential twin the spec checks the distributed path
    * against. Same algorithm, same fixed iterations, plain doubles.
    */
  def fitLocal(rows: Seq[(Array[Double], Double)], iters: Int = 8,
      ridge: Double = 1e-3): TextOps.QualityWeights = {
    val w = fitLocalVector(rows, iters, ridge)
    require(w.length == NumFeatures + 1,
      s"fitLocal needs $NumFeatures-feature rows, got ${w.length - 1}")
    TextOps.QualityWeights(w(0), w(1), w(2), w(3), w(4), w(5))
  }

  /** [[fitLocal]] over arbitrary-width feature rows — the in-memory
    * differential twin of [[fitColumns]].
    */
  def fitLocalVector(rows: Seq[(Array[Double], Double)], iters: Int = 8,
      ridge: Double = 1e-3): Array[Double] = {
    require(rows.nonEmpty, "need at least one row")
    val n = rows.head._1.length + 1
    var w = Array.fill(n)(0.0)
    for (_ <- 1 to iters) {
      val a = Array.ofDim[Double](n, n)
      val g = Array.fill(n)(0.0)
      rows.foreach { case (feats, y) =>
        val x = 1.0 +: feats
        val z = x.zip(w).map { case (xi, wi) => xi * wi }.sum
        val mu = 1.0 / (1.0 + math.exp(-z))
        val s = mu * (1.0 - mu)
        for (i <- 0 until n; j <- 0 until n) a(i)(j) += s * x(i) * x(j)
        for (i <- 0 until n) g(i) += (y - mu) * x(i)
      }
      for (i <- 0 until n) a(i)(i) += ridge
      val delta = solve(a, g)
      w = w.zip(delta).map { case (wi, d) => wi + d }
    }
    w.map(r6)
  }

  /** Signal rows for [[fitLocal]], via the same Spark signal
    * expressions (collect is test-only; the distributed fit never
    * materializes rows on the driver).
    */
  def collectSignals(df: DataFrame, textCol: String,
      label: Column): Seq[(Array[Double], Double)] = {
    val t = col(textCol)
    df.select(label.cast("double").as("_y"), t.as(textCol),
        TextOps.tokens(t).as("_w"))
      .select(col("_y"), explode(array(col("_w"))).as("_w"), t)
      .select(col("_y") +: TextOps.qualitySignalCols(t): _*)
      .collect().toSeq
      .map(r => (Array.tabulate(NumFeatures)(i => r.getDouble(i + 1)),
        r.getDouble(0)))
  }

  private def r6(v: Double): Double = BigDecimal(v)
    .setScale(6, BigDecimal.RoundingMode.HALF_UP).doubleValue

  private def toWeights(w: Array[Double]): TextOps.QualityWeights =
    TextOps.QualityWeights(r6(w(0)), r6(w(1)), r6(w(2)), r6(w(3)),
      r6(w(4)), r6(w(5)))

  /** Dense Gaussian elimination with partial pivoting (small n). */
  private[graft] def solve(a0: Array[Array[Double]],
      b0: Array[Double]): Array[Double] = {
    val n = b0.length
    val a = a0.map(_.clone); val b = b0.clone
    for (k <- 0 until n) {
      val p = (k until n).maxBy(i => math.abs(a(i)(k)))
      require(math.abs(a(p)(k)) > 1e-300, "singular normal-equations matrix")
      if (p != k) { val t = a(p); a(p) = a(k); a(k) = t
        val tb = b(p); b(p) = b(k); b(k) = tb }
      for (i <- k + 1 until n) {
        val f = a(i)(k) / a(k)(k)
        for (j <- k until n) a(i)(j) -= f * a(k)(j)
        b(i) -= f * b(k)
      }
    }
    val x = Array.fill(n)(0.0)
    for (i <- n - 1 to 0 by -1) {
      var s = b(i)
      for (j <- i + 1 until n) s -= a(i)(j) * x(j)
      x(i) = s / a(i)(i)
    }
    x
  }
}
