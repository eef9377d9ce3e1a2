package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Regular-grid time-series repair and bar aggregation over an event
  * stream — the sensor/metrics-shaped workloads (gap-fill, carry-
  * forward, interpolation, OHLC candles) a feature-store or monitoring
  * pipeline runs before modeling.
  *
  * Reference has no counterpart (its depth axis is the only ordered
  * dimension); this extends the events-stream family (EventOps) the
  * same way q184's RANGE frame extends q08's running sum.
  *
  * Scale notes:
  *  - The dense grid is built per key with `sequence(minH, maxH)` —
  *    its size is (time span / step) per key, independent of event
  *    count, and the explode is narrow (no shuffle beyond the hourly
  *    pre-aggregation's own exchange).
  *  - LOCF / interpolation are per-key window functions: one shuffle
  *    on the key, arbitrarily many keys in parallel, no global sort.
  *    A single pathological key with a decade-long span at 1-second
  *    steps is a data problem (3e8 grid rows), not an operator one —
  *    the grid is linear in span, never quadratic.
  *  - OHLC is a single hash aggregation; open/close use min/max over
  *    a (t, id, value) struct, so the whole thing is map-side
  *    combinable — no window, no per-group sort, no second pass.
  */
object TimeSeriesOps {

  /** Exact integer floor-division for non-negative longs. Column `/`
    * is DOUBLE division — for quotients near an integer boundary the
    * rounding can cross it, so spell a div b as (a - a mod b) / b
    * (numerator an exact multiple of b) and run the division in
    * decimal(38,*): exact for the FULL long range, not just 2^53
    * (micro-unit × gap-span numerators at scale live in that gap).
    * A numerator past 2^63 errors loudly under ANSI.
    */
  private def idiv(a: Column, b: Column): Column =
    ExactArith.floorDiv(a, b)

  /** Hourly observed aggregate: (k, h, v) with h = epoch hour start
    * (BIGINT seconds) and v = 6dp-rounded mean value in that hour.
    */
  def hourlyMeans(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String): DataFrame =
    events.groupBy(col(keyCol).as("k"),
        (floor(col(tsCol).cast("double") / 3600).cast("long") * 3600).as("h"))
      .agg(round(avg(valueCol), 6).as("v"))

  /** Dense hourly grid per key (min..max observed hour) with last-
    * observation-carried-forward fill. Output: (k, h, v_fill, is_gap).
    * The first grid hour per key is observed by construction, so
    * v_fill is never null.
    */
  def locfGapfill(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    val obs = hourlyMeans(events, keyCol, tsCol, valueCol)
    val grid = obs.groupBy("k").agg(min("h").as("h0"), max("h").as("h1"))
      .select(col("k"),
        explode(sequence(col("h0"), col("h1"), lit(3600L))).as("h"))
    val j = grid.join(obs, Seq("k", "h"), "left")
    val w = Window.partitionBy("k").orderBy("h")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    j.select(col("k"), col("h"),
      last("v", ignoreNulls = true).over(w).as("v_fill"),
      col("v").isNull.cast("int").as("is_gap"))
  }

  /** Same dense grid with LINEAR interpolation across gaps: for a gap
    * hour between hourly means (p_h, p_v) and (n_h, n_v) the value is
    * p_v + (n_v - p_v) * (h - p_h) / (n_h - p_h).
    *
    * Every step is EXACT integer arithmetic so the result is
    * bit-identical across engines and partitionings (a floating
    * spelling lands exactly on decimal half-way points whenever the
    * gap midpoint splits two rounded means — engines then disagree at
    * the last digit): values become integer cents per row (inputs are
    * 2dp-valued doubles; round(x*100) is exact), hourly means become
    * half-up-rounded integer MICRO-units ((2*100*sum_cents*10000 ... )
    * spelled as (2*s*10000 + n) div (2*n) — n.b. non-negative inputs),
    * and the interpolation rounds once via (2*num + den) div (2*den).
    * The final /1e6 to double is a single deterministic IEEE op.
    * Requires non-negative values (div-based half-up).
    *
    * EXACTNESS BOUND: idiv divides in decimal(38,*), so it is exact
    * for the full long range. The interpolation numerator is
    * ~value-in-micro-units × gap-span-in-seconds; it fits a long up
    * to ~9.2e18 (e.g. a 1e9-µunit reading across a ~1e9 s gap —
    * three decades), and PAST that the long multiply itself errors
    * loudly under ANSI mode rather than drifting — the bound is
    * machine-enforced, not documentation.
    */
  def interpolateGaps(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    val obs = events.groupBy(col(keyCol).as("k"),
        (floor(col(tsCol).cast("double") / 3600).cast("long") * 3600).as("h"))
      .agg(sum(round(col(valueCol) * 100).cast("long")).as("s"),
        count(lit(1)).as("n"))
      // exact 6dp mean in micro-units: half-up((s/100) * 1e6 / n)
      .select(col("k"), col("h"),
        idiv(col("s") * 20000 + col("n"), col("n") * 2).as("v6"))
    val grid = obs.groupBy("k").agg(min("h").as("h0"), max("h").as("h1"))
      .select(col("k"),
        explode(sequence(col("h0"), col("h1"), lit(3600L))).as("h"))
    val j = grid.join(obs, Seq("k", "h"), "left")
    val wp = Window.partitionBy("k").orderBy("h")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // "next observation" = last-non-null over the REVERSED order with a
    // running (unbounded-preceding) frame: an UnboundedFollowing frame
    // re-aggregates current→end for every row (O(rows²) per key in
    // WindowExec); the reversed running frame is one state pass.
    val wnRev = Window.partitionBy("k").orderBy(col("h").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pv = last("v6", ignoreNulls = true).over(wp)
    val ph = last(when(col("v6").isNotNull, col("h")), ignoreNulls = true).over(wp)
    val nv = last("v6", ignoreNulls = true).over(wnRev)
    val nh = last(when(col("v6").isNotNull, col("h")), ignoreNulls = true).over(wnRev)
    val num = pv * (nh - col("h")) + nv * (col("h") - ph)
    val den = nh - ph
    // no 2^53 guard needed any more: idiv divides in decimal and is
    // exact for the whole long range; a numerator past 2^63 fails
    // loudly in the ANSI long multiply above (see scaladoc bound).
    val vi6 = when(col("v6").isNotNull, col("v6"))
      .otherwise(idiv(num * 2 + den, den * 2))
    j.select(col("k"), col("h"),
      (vi6 / lit(1000000.0)).as("v_interp"),
      col("v6").isNull.cast("int").as("is_gap"))
  }

  /** OHLC bars per (series, hour): open/close are the first/last
    * values in (t, id) order — expressed as min/max over a
    * (t, id, value) struct so the aggregation stays one map-side-
    * combinable pass with a total deterministic order (id breaks
    * timestamp ties). volume = 4dp sum, n = row count.
    */
  def ohlcBars(events: DataFrame, seriesCol: String, tsCol: String,
      idCol: String, valueCol: String): DataFrame = {
    val base = events.select(col(seriesCol).as("series"),
      (floor(col(tsCol).cast("double") / 3600).cast("long") * 3600).as("h"),
      col(tsCol).cast("double").as("t"),
      col(idCol).as("id"), col(valueCol).as("value"))
    base.groupBy("series", "h").agg(
      min(struct(col("t"), col("id"), col("value")))
        .getField("value").as("open"),
      max("value").as("high"),
      min("value").as("low"),
      max(struct(col("t"), col("id"), col("value")))
        .getField("value").as("close"),
      round(sum("value"), 4).as("volume"),
      count(lit(1)).as("n"))
  }

  /** DuckDB twin of [[locfGapfill]] — LOCF spelled with the
    * observation-count grouping trick (no IGNORE NULLS dependence).
    */
  def locfOracleSql(table: String, keyCol: String, tsCol: String,
      valueCol: String): String =
    s"""WITH obs AS (
       |  SELECT $keyCol AS k,
       |    CAST(floor(epoch($tsCol) / 3600) AS BIGINT) * 3600 AS h,
       |    round(avg($valueCol), 6) AS v
       |  FROM $table GROUP BY 1, 2),
       |grid AS (
       |  SELECT k, unnest(generate_series(min(h), max(h), 3600)) AS h
       |  FROM obs GROUP BY k),
       |j AS (
       |  SELECT g.k, g.h, o.v,
       |    count(o.v) OVER (PARTITION BY g.k ORDER BY g.h) AS grp
       |  FROM grid g LEFT JOIN obs o ON g.k = o.k AND g.h = o.h)
       |SELECT k, h,
       |  max(v) OVER (PARTITION BY k, grp) AS v_fill,
       |  CAST(v IS NULL AS INT) AS is_gap
       |FROM j""".stripMargin

  /** DuckDB twin of [[interpolateGaps]] — the identical exact integer
    * micro-unit arithmetic (// is floor division; all quantities
    * non-negative), neighbors via the count-grouping trick in both
    * directions.
    */
  /** Exact lag-autocorrelation per series over the hourly mean grid —
    * the seasonality/persistence diagnostic next to [[ohlcBars]] and
    * the hour-of-day profile: ACF(lag) = Pearson corr of
    * (v_t, v_{t+lag·3600}) over all hours where both exist.
    *
    * Exactness: hourly means are the [[interpolateGaps]] exact
    * half-up MICRO-UNIT integers, so every moment (Σx, Σy, Σxy, Σx²,
    * Σy²) is an exact integer summed as decimal(38,0) —
    * order-independent — and the closed-form corr is one fixed
    * sequence of double ops mirrored by the oracle (the corrMatrix
    * spelling, 6dp). Products stay under 2⁶³ per row for values to
    * ~9·10⁹ micro-units.
    *
    * Scale shape: one corpus aggregation to the (series, hour) grid,
    * one broadcast lag expansion, one equi-join back on (series,
    * hour+lag) — grid-sized, not corpus-sized — and one final
    * (series, lag) aggregate. Constant-valued series emit NULL acf.
    *
    * @return (key, lag, n_pairs, acf)
    */
  def autocorr(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, lagsHours: Seq[Int]): DataFrame = {
    require(lagsHours.nonEmpty && lagsHours.forall(_ >= 1),
      s"lags must be >= 1 hours, got $lagsHours")
    val spark = events.sparkSession
    import spark.implicits._
    val obs = events.groupBy(col(keyCol).as("k"),
        (floor(col(tsCol).cast("double") / 3600).cast("long") * 3600).as("h"))
      .agg(sum(round(col(valueCol) * 100).cast("long")).as("s"),
        count(lit(1)).as("n"))
      .select(col("k"), col("h"),
        idiv(col("s") * 20000 + col("n"), col("n") * 2).as("v6"))
    val a = obs.crossJoin(broadcast(lagsHours.toDF("lag")))
      .select(col("k"), col("lag"),
        (col("h") + col("lag") * 3600L).as("h2"), col("v6").as("x"))
    val pairs = a.join(
      obs.select(col("k"), col("h").as("h2"), col("v6").as("y")),
      Seq("k", "h2"))
    val D = "decimal(38,0)"
    val m = pairs.groupBy("k", "lag").agg(
      count(lit(1)).as("n"),
      sum(col("x").cast(D)).as("s_x"), sum(col("y").cast(D)).as("s_y"),
      sum((col("x") * col("y")).cast(D)).as("p_xy"),
      sum((col("x") * col("x")).cast(D)).as("p_xx"),
      sum((col("y") * col("y")).cast(D)).as("p_yy"))
    def dbl(c: org.apache.spark.sql.Column) = c.cast("double")
    val num = dbl(col("n")) * dbl(col("p_xy")) -
      dbl(col("s_x")) * dbl(col("s_y"))
    val vx = dbl(col("n")) * dbl(col("p_xx")) -
      dbl(col("s_x")) * dbl(col("s_x"))
    val vy = dbl(col("n")) * dbl(col("p_yy")) -
      dbl(col("s_y")) * dbl(col("s_y"))
    m.select(col("k").as(keyCol), col("lag"), col("n").as("n_pairs"),
      when(sqrt(vx) * sqrt(vy) === 0, lit(null).cast("double"))
        .otherwise(round(num / (sqrt(vx) * sqrt(vy)), 6)).as("acf"))
  }

  /** Cross-correlation between two event types at signed hour lags —
    * the lead–lag diagnostic ("does A's hourly level lead B's by k
    * hours"): XCF(lag) = Pearson corr of (A_t, B_{t+lag·3600}).
    * Positive lag = A leads. Same exactness contract as [[autocorr]]
    * (micro-unit hourly means, decimal(38,0) integer moments, the
    * corrMatrix closed form at 6dp).
    *
    * @return (lag, n_pairs, xcf)
    */
  def crossCorr(events: DataFrame, tsCol: String, typeCol: String,
      valueCol: String, typeA: String, typeB: String,
      lagsHours: Seq[Int]): DataFrame = {
    require(lagsHours.nonEmpty, "need at least one lag")
    val spark = events.sparkSession
    import spark.implicits._
    def obs(t: String) = events.where(col(typeCol) === t)
      .groupBy((floor(col(tsCol).cast("double") / 3600).cast("long") * 3600)
        .as("h"))
      .agg(sum(round(col(valueCol) * 100).cast("long")).as("s"),
        count(lit(1)).as("n"))
      .select(col("h"), idiv(col("s") * 20000 + col("n"), col("n") * 2)
        .as("v6"))
    val a = obs(typeA).crossJoin(broadcast(lagsHours.toDF("lag")))
      .select(col("lag"), (col("h") + col("lag") * 3600L).as("h2"),
        col("v6").as("x"))
    val pairs = a.join(obs(typeB).select(col("h").as("h2"),
      col("v6").as("y")), Seq("h2"))
    val D = "decimal(38,0)"
    val m = pairs.groupBy("lag").agg(
      count(lit(1)).as("n"),
      sum(col("x").cast(D)).as("s_x"), sum(col("y").cast(D)).as("s_y"),
      sum((col("x") * col("y")).cast(D)).as("p_xy"),
      sum((col("x") * col("x")).cast(D)).as("p_xx"),
      sum((col("y") * col("y")).cast(D)).as("p_yy"))
    def dbl(c: org.apache.spark.sql.Column) = c.cast("double")
    val num = dbl(col("n")) * dbl(col("p_xy")) -
      dbl(col("s_x")) * dbl(col("s_y"))
    val vx = dbl(col("n")) * dbl(col("p_xx")) -
      dbl(col("s_x")) * dbl(col("s_x"))
    val vy = dbl(col("n")) * dbl(col("p_yy")) -
      dbl(col("s_y")) * dbl(col("s_y"))
    m.select(col("lag"), col("n").as("n_pairs"),
      when(sqrt(vx) * sqrt(vy) === 0, lit(null).cast("double"))
        .otherwise(round(num / (sqrt(vx) * sqrt(vy)), 6)).as("xcf"))
  }

  /** DuckDB replay of [[crossCorr]]. */
  def crossCorrOracleSql(table: String, tsCol: String, typeCol: String,
      valueCol: String, typeA: String, typeB: String,
      lagsHours: Seq[Int]): String = {
    val lagVals = lagsHours.map(l => s"($l)").mkString(", ")
    def dbl(x: String) = s"CAST($x AS DOUBLE)"
    val num = s"${dbl("n")} * ${dbl("p_xy")} - ${dbl("s_x")} * ${dbl("s_y")}"
    val vx = s"${dbl("n")} * ${dbl("p_xx")} - ${dbl("s_x")} * ${dbl("s_x")}"
    val vy = s"${dbl("n")} * ${dbl("p_yy")} - ${dbl("s_y")} * ${dbl("s_y")}"
    def obsCte(name: String, t: String) =
      s"""$name AS (
         |  SELECT CAST(floor(epoch($tsCol) / 3600) AS BIGINT) * 3600 AS h,
         |    (sum(CAST(round($valueCol * 100) AS BIGINT)) * 20000 + count(*))
         |      // (count(*) * 2) AS v6
         |  FROM $table WHERE $typeCol = '$t' GROUP BY 1)"""
    s"""WITH ${obsCte("oa", typeA).stripMargin},
       |${obsCte("ob", typeB).stripMargin},
       |lags (lag) AS (VALUES $lagVals),
       |p AS (SELECT l.lag, a.v6 AS x, b.v6 AS y
       |  FROM oa a CROSS JOIN lags l
       |  JOIN ob b ON b.h = a.h + l.lag * 3600),
       |m AS (SELECT lag, count(*) AS n,
       |  sum(CAST(x AS DECIMAL(38,0))) AS s_x,
       |  sum(CAST(y AS DECIMAL(38,0))) AS s_y,
       |  sum(CAST(x * y AS DECIMAL(38,0))) AS p_xy,
       |  sum(CAST(x * x AS DECIMAL(38,0))) AS p_xx,
       |  sum(CAST(y * y AS DECIMAL(38,0))) AS p_yy
       | FROM p GROUP BY lag)
       |SELECT CAST(lag AS INTEGER) AS lag, CAST(n AS BIGINT) AS n_pairs,
       |  CASE WHEN sqrt($vx) * sqrt($vy) = 0 THEN NULL
       |    ELSE round(($num) / (sqrt($vx) * sqrt($vy)), 6) END AS xcf
       |FROM m""".stripMargin
  }

  /** DuckDB replay of [[autocorr]]. */
  def autocorrOracleSql(table: String, keyCol: String, tsCol: String,
      valueCol: String, lagsHours: Seq[Int]): String = {
    val lagVals = lagsHours.map(l => s"($l)").mkString(", ")
    def dbl(x: String) = s"CAST($x AS DOUBLE)"
    val num = s"${dbl("n")} * ${dbl("p_xy")} - ${dbl("s_x")} * ${dbl("s_y")}"
    val vx = s"${dbl("n")} * ${dbl("p_xx")} - ${dbl("s_x")} * ${dbl("s_x")}"
    val vy = s"${dbl("n")} * ${dbl("p_yy")} - ${dbl("s_y")} * ${dbl("s_y")}"
    s"""WITH obs AS (
       |  SELECT $keyCol AS k,
       |    CAST(floor(epoch($tsCol) / 3600) AS BIGINT) * 3600 AS h,
       |    (sum(CAST(round($valueCol * 100) AS BIGINT)) * 20000 + count(*))
       |      // (count(*) * 2) AS v6
       |  FROM $table GROUP BY 1, 2),
       |lags (lag) AS (VALUES $lagVals),
       |p AS (SELECT o.k, l.lag, o.v6 AS x, o2.v6 AS y
       |  FROM obs o CROSS JOIN lags l
       |  JOIN obs o2 ON o2.k = o.k AND o2.h = o.h + l.lag * 3600),
       |m AS (SELECT k, lag, count(*) AS n,
       |  sum(CAST(x AS DECIMAL(38,0))) AS s_x,
       |  sum(CAST(y AS DECIMAL(38,0))) AS s_y,
       |  sum(CAST(x * y AS DECIMAL(38,0))) AS p_xy,
       |  sum(CAST(x * x AS DECIMAL(38,0))) AS p_xx,
       |  sum(CAST(y * y AS DECIMAL(38,0))) AS p_yy
       | FROM p GROUP BY k, lag)
       |SELECT k AS $keyCol, CAST(lag AS INTEGER) AS lag,
       |  CAST(n AS BIGINT) AS n_pairs,
       |  CASE WHEN sqrt($vx) * sqrt($vy) = 0 THEN NULL
       |    ELSE round(($num) / (sqrt($vx) * sqrt($vy)), 6) END AS acf
       |FROM m""".stripMargin
  }

  def interpolateOracleSql(table: String, keyCol: String, tsCol: String,
      valueCol: String): String =
    s"""WITH obs AS (
       |  SELECT $keyCol AS k,
       |    CAST(floor(epoch($tsCol) / 3600) AS BIGINT) * 3600 AS h,
       |    (sum(CAST(round($valueCol * 100) AS BIGINT)) * 20000 + count(*))
       |      // (count(*) * 2) AS v6
       |  FROM $table GROUP BY 1, 2),
       |grid AS (
       |  SELECT k, unnest(generate_series(min(h), max(h), 3600)) AS h
       |  FROM obs GROUP BY k),
       |j AS (
       |  SELECT g.k, g.h, o.v6,
       |    count(o.v6) OVER (PARTITION BY g.k ORDER BY g.h) AS gp,
       |    count(o.v6) OVER (PARTITION BY g.k ORDER BY g.h DESC) AS gn
       |  FROM grid g LEFT JOIN obs o ON g.k = o.k AND g.h = o.h),
       |nb AS (
       |  SELECT k, h, v6,
       |    max(v6) OVER (PARTITION BY k, gp) AS pv,
       |    max(CASE WHEN v6 IS NOT NULL THEN h END) OVER (PARTITION BY k, gp) AS ph,
       |    max(v6) OVER (PARTITION BY k, gn) AS nv,
       |    min(CASE WHEN v6 IS NOT NULL THEN h END) OVER (PARTITION BY k, gn) AS nh
       |  FROM j)
       |SELECT k, h,
       |  CASE WHEN v6 IS NOT NULL THEN v6
       |       ELSE ((pv * (nh - h) + nv * (h - ph)) * 2 + (nh - ph))
       |            // ((nh - ph) * 2) END / 1000000.0 AS v_interp,
       |  CAST(v6 IS NULL AS INT) AS is_gap
       |FROM nb""".stripMargin

  /** DuckDB twin of [[ohlcBars]] — open/close via row_number in the
    * same total (t, id) order.
    */
  def ohlcOracleSql(table: String, seriesCol: String, tsCol: String,
      idCol: String, valueCol: String): String =
    s"""WITH base AS (
       |  SELECT $seriesCol AS series,
       |    CAST(floor(epoch($tsCol) / 3600) AS BIGINT) * 3600 AS h,
       |    epoch($tsCol) AS t, $idCol AS id, $valueCol AS value
       |  FROM $table),
       |rn AS (
       |  SELECT *,
       |    row_number() OVER (PARTITION BY series, h ORDER BY t, id) AS ra,
       |    row_number() OVER (PARTITION BY series, h ORDER BY t DESC, id DESC) AS rd
       |  FROM base)
       |SELECT series, h,
       |  max(CASE WHEN ra = 1 THEN value END) AS open,
       |  max(value) AS high,
       |  min(value) AS low,
       |  max(CASE WHEN rd = 1 THEN value END) AS close,
       |  round(sum(value), 4) AS volume,
       |  CAST(count(*) AS BIGINT) AS n
       |FROM rn GROUP BY series, h""".stripMargin

  /** CUSUM changepoint detection over hourly event counts per series:
    * the hour k maximizing |Σ_{h≤k}(c_h − μ)| is the level-shift
    * point. Scaled by the grid size H the statistic is the EXACT
    * integer S_k = H·prefix_k − k'·N (k' = 1-based grid position), so
    * the argmax compares integers — no rational mean ever
    * materializes. Ties break to the earliest hour.
    *
    * Scale shape: one count aggregation onto the (series × hour)
    * grid, grid windows only; the normalized statistic
    * s_max/(H·sqrt(N)) (round 6) makes series comparable.
    *
    * @return per series: (series, n_hours, n_events, cp_hour,
    *         s_max_abs, cusum_norm)
    */
  def cusumChangepoint(events: DataFrame, keyCol: String,
      tsCol: String): DataFrame = {
    val hh = events.select(col(keyCol).as("series"),
        date_trunc("hour", col(tsCol)).as("h"))
      .groupBy("series", "h").agg(count(lit(1)).as("c"))
    val wOrd = Window.partitionBy("series").orderBy("h")
    val wCum = wOrd.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    val tot = hh.groupBy("series")
      .agg(sum("c").as("n_events"), count(lit(1)).as("n_hours"))
    val s = hh.join(tot, "series")
      .withColumn("k", row_number().over(wOrd))
      .withColumn("s_k",
        abs(col("n_hours") * sum("c").over(wCum) -
          col("k") * col("n_events")))
    val pick = Window.partitionBy("series")
      .orderBy(col("s_k").desc, col("h").asc)
    s.withColumn("rn", row_number().over(pick)).where(col("rn") === 1)
      .select(col("series"), col("n_hours"), col("n_events"),
        col("h").as("cp_hour"), col("s_k").as("s_max_abs"),
        round(col("s_k").cast("double") /
          (col("n_hours").cast("double") *
            sqrt(col("n_events").cast("double"))), 6).as("cusum_norm"))
  }

  /** DuckDB replay of [[cusumChangepoint]]. */
  def cusumOracleSql(table: String, keyCol: String,
      tsCol: String): String =
    s"""WITH hh AS (SELECT $keyCol AS series,
       |    date_trunc('hour', $tsCol) AS h,
       |    CAST(count(*) AS BIGINT) AS c
       |  FROM $table GROUP BY 1, 2),
       |tot AS (SELECT series, CAST(sum(c) AS BIGINT) AS n_events,
       |    CAST(count(*) AS BIGINT) AS n_hours
       |  FROM hh GROUP BY series),
       |s AS (SELECT hh.series, h, n_hours, n_events,
       |    abs(n_hours * sum(c) OVER (PARTITION BY hh.series ORDER BY h
       |        ROWS UNBOUNDED PRECEDING)
       |      - (row_number() OVER (PARTITION BY hh.series ORDER BY h))
       |        * n_events) AS s_k
       |  FROM hh JOIN tot USING (series)),
       |pick AS (SELECT *, row_number() OVER (PARTITION BY series
       |    ORDER BY s_k DESC, h ASC) AS rn FROM s)
       |SELECT series, n_hours, n_events, h AS cp_hour,
       |  CAST(s_k AS BIGINT) AS s_max_abs,
       |  round(CAST(s_k AS DOUBLE)
       |    / (CAST(n_hours AS DOUBLE) * sqrt(CAST(n_events AS DOUBLE))),
       |    6) AS cusum_norm
       |FROM pick WHERE rn = 1""".stripMargin

  /** Mann–Kendall monotone-trend test over DAILY counts per series —
    * the nonparametric "is this metric drifting up or down"
    * complement of [[cusumChangepoint]]'s level-shift detector:
    * S = Σ_{i<j} sign(c_j − c_i) over day pairs, with the
    * tie-corrected variance 18·Var(S) = n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)
    * kept as an EXACT integer; z applies the standard ±1 continuity
    * correction. S and the variance are integers — the only double is
    * the final z division.
    *
    * Scale shape: counts land on the day grid; the pair stage is the
    * grid self-join (≤ ~365² pairs per series per year — bounded by
    * calendar, not corpus), tie groups from the count-value grid.
    *
    * @return per series: (series, n_days, s, var18, z)
    */
  def mannKendallTrend(events: DataFrame, keyCol: String,
      tsCol: String): DataFrame = {
    val g = events.select(col(keyCol).as("series"),
        to_date(col(tsCol)).as("d"))
      .groupBy("series", "d").agg(count(lit(1)).as("c"))
    val a = g.select(col("series"), col("d").as("da"), col("c").as("ca"))
    val b = g.select(col("series"), col("d").as("db"), col("c").as("cb"))
    val s = a.join(b, Seq("series")).where(col("da") < col("db"))
      .groupBy("series")
      .agg(coalesce(sum(signum(col("cb") - col("ca")).cast("long")),
        lit(0L)).as("s"))
    val nd = g.groupBy("series").agg(count(lit(1)).as("n_days"))
    val ties = g.groupBy("series", "c").agg(count(lit(1)).as("t"))
      .groupBy("series")
      .agg(coalesce(sum(col("t") * (col("t") - 1) *
        (lit(2) * col("t") + 5)), lit(0L)).as("tie18"))
    val var18 = col("n_days") * (col("n_days") - 1) *
      (lit(2) * col("n_days") + 5) - col("tie18")
    nd.join(ties, "series").join(s, "series")
      .select(col("series"), col("n_days"), col("s"),
        var18.as("var18"),
        when(var18 <= 0, lit(null).cast("double"))
          .otherwise(round(
            (col("s") - signum(col("s")).cast("long")).cast("double") /
              sqrt(var18.cast("double") / 18.0), 6)).as("z"))
  }

  /** DuckDB replay of [[mannKendallTrend]]. */
  def mannKendallOracleSql(table: String, keyCol: String,
      tsCol: String): String =
    s"""WITH g AS (SELECT $keyCol AS series, CAST($tsCol AS DATE) AS d,
       |    CAST(count(*) AS BIGINT) AS c
       |  FROM $table GROUP BY 1, 2),
       |s AS (SELECT a.series,
       |    coalesce(sum(CAST(sign(b.c - a.c) AS BIGINT)), 0) AS s
       |  FROM g a JOIN g b ON a.series = b.series AND a.d < b.d
       |  GROUP BY a.series),
       |nd AS (SELECT series, CAST(count(*) AS BIGINT) AS n_days
       |  FROM g GROUP BY series),
       |ties AS (SELECT series,
       |    coalesce(sum(t * (t - 1) * (2 * t + 5)), 0) AS tie18
       |  FROM (SELECT series, c, CAST(count(*) AS BIGINT) AS t
       |        FROM g GROUP BY 1, 2) tt
       |  GROUP BY series)
       |SELECT nd.series, n_days, CAST(s AS BIGINT) AS s,
       |  CAST(n_days * (n_days - 1) * (2 * n_days + 5) - tie18
       |    AS BIGINT) AS var18,
       |  CASE WHEN n_days * (n_days - 1) * (2 * n_days + 5) - tie18 <= 0
       |    THEN NULL
       |    ELSE round(CAST(s - sign(s) AS DOUBLE)
       |      / sqrt(CAST(n_days * (n_days - 1) * (2 * n_days + 5)
       |        - tie18 AS DOUBLE) / 18.0), 6) END AS z
       |FROM nd JOIN ties USING (series) JOIN s USING (series)""".stripMargin

  /** Seasonal-naive forecast backtest: predict each (series, day,
    * hour) count with the SAME HOUR of the PREVIOUS day (the
    * always-compute-this baseline any real forecaster must beat), and
    * score MAE over the scorable grid — the "did the data's shape
    * break" monitor. Absolute errors are exact integers; MAE rounds
    * by half-up integer division.
    *
    * Scale shape: counts land on the (series × day × hour) grid; the
    * prediction is one lag over the hour-of-day partition — grid
    * windows only, the corpus is scanned once.
    *
    * @return per series: (series, n_points, total_abs_err, mae)
    */
  def seasonalNaiveBacktest(events: DataFrame, keyCol: String,
      tsCol: String): DataFrame = {
    val g = events.select(col(keyCol).as("series"),
        to_date(col(tsCol)).as("d"), hour(col(tsCol)).as("hr"))
      .groupBy("series", "d", "hr").agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("series", "hr").orderBy("d")
    val err = g.withColumn("pred", lag("c", 1).over(w))
      .where(col("pred").isNotNull)
      .select(col("series"), abs(col("c") - col("pred")).as("ae"))
    err.groupBy("series")
      .agg(count(lit(1)).as("n_points"), sum("ae").as("total_abs_err"))
      .select(col("series"), col("n_points"), col("total_abs_err"),
        (expr("(2000000 * total_abs_err + n_points) div (2 * n_points)")
          .cast("double") / 1e6).as("mae"))
  }

  /** DuckDB replay of [[seasonalNaiveBacktest]]. Note: the lag runs
    * over observed days only (a fully-silent (series, hour, day) has
    * no row); both engines share that convention.
    */
  def seasonalNaiveOracleSql(table: String, keyCol: String,
      tsCol: String): String =
    s"""WITH g AS (SELECT $keyCol AS series, CAST($tsCol AS DATE) AS d,
       |    hour($tsCol) AS hr, CAST(count(*) AS BIGINT) AS c
       |  FROM $table GROUP BY 1, 2, 3),
       |e AS (SELECT series,
       |    abs(c - lag(c) OVER (PARTITION BY series, hr ORDER BY d))
       |      AS ae
       |  FROM g),
       |agg AS (SELECT series, CAST(count(*) AS BIGINT) AS n_points,
       |    CAST(sum(ae) AS BIGINT) AS total_abs_err
       |  FROM e WHERE ae IS NOT NULL GROUP BY series)
       |SELECT series, n_points, total_abs_err,
       |  CAST((2000000 * total_abs_err + n_points)
       |    // (2 * n_points) AS DOUBLE) / 1e6 AS mae
       |FROM agg""".stripMargin

  /** EWMA level + anomaly band over DAILY mean values per series —
    * the classic monitoring smoother (alpha = aNum/aDen) run as an
    * EXACT integer recurrence so both engines replay it bit-for-bit:
    * daily means become half-up integer MICRO-units, each smoothing
    * step rounds once via (2·(aNum·v + (aDen−aNum)·s) + aDen) div
    * (2·aDen), and a day is flagged when |v − s_prev| exceeds the
    * band (micro-units, i.e. value·1e6). Requires non-negative
    * values (div-based half-up on the cents grid).
    *
    * Scale shape: one hash aggregation to the (series × day) grid,
    * then a per-series sorted fold over the CALENDAR-bounded grid
    * (≤365 elements per series-year — bounded by time span, not
    * corpus size). The fold is the honest shape for a sequential
    * recurrence — s_t depends on s_{t−1}, so no window spelling
    * exists; the collected array never exceeds the grid. DuckDB
    * replays the recurrence as a recursive CTE over the same grid.
    *
    * @return per (series, day): (k, day, v, ewma, is_anom)
    */
  def ewmaBand(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, aNum: Int, aDen: Int,
      bandMicro: Long): DataFrame = {
    require(aNum > 0 && aDen > aNum,
      s"need 0 < alpha = aNum/aDen < 1, got $aNum/$aDen")
    val obs = events.groupBy(col(keyCol).as("k"),
        unix_micros(date_trunc("day", col(tsCol))).as("du"))
      .agg(sum(round(col(valueCol).cast("double") * 100).cast("long"))
          .as("s"),
        count(lit(1)).as("n"))
      .select(col("k"), col("du"),
        expr("(2 * s * 10000 + n) div (2 * n)").as("v6"))
    val b = aDen - aNum
    val step =
      s"(2 * ($aNum * x.v6 + $b * acc.prev) + $aDen) div (2 * $aDen)"
    val folded = obs.groupBy("k")
      .agg(array_sort(collect_list(struct(col("du"), col("v6"))))
        .as("xs"))
      .select(col("k"), explode(expr(
        s"""aggregate(xs,
           |  named_struct('prev', cast(-1 as bigint), 'out',
           |    cast(array() as
           |      array<struct<du:bigint,v6:bigint,ew:bigint,fl:int>>)),
           |  (acc, x) -> named_struct(
           |    'prev',
           |    CASE WHEN acc.prev < 0 THEN x.v6 ELSE $step END,
           |    'out', acc.out || array(named_struct(
           |      'du', x.du, 'v6', x.v6,
           |      'ew',
           |      CASE WHEN acc.prev < 0 THEN x.v6 ELSE $step END,
           |      'fl', CASE WHEN acc.prev >= 0
           |        AND abs(x.v6 - acc.prev) > ${bandMicro}L
           |        THEN 1 ELSE 0 END))),
           |  acc -> acc.out)""".stripMargin)).as("r"))
    folded.select(col("k"), timestamp_micros(col("r.du")).as("day"),
      (col("r.v6").cast("double") / 1e6).as("v"),
      (col("r.ew").cast("double") / 1e6).as("ewma"),
      col("r.fl").as("is_anom"))
  }

  /** DuckDB replay of [[ewmaBand]] — the integer recurrence as a
    * recursive CTE keyed on the per-series day index.
    */
  def ewmaOracleSql(table: String, keyCol: String, tsCol: String,
      valueCol: String, aNum: Int, aDen: Int,
      bandMicro: Long): String = {
    val b = aDen - aNum
    s"""WITH RECURSIVE obs0 AS (SELECT $keyCol AS k,
       |    epoch_us(date_trunc('day', $tsCol)) AS du,
       |    CAST(sum(CAST(round(CAST($valueCol AS DOUBLE) * 100)
       |      AS BIGINT)) AS BIGINT) AS s,
       |    CAST(count(*) AS BIGINT) AS n
       |  FROM $table GROUP BY 1, 2),
       |obs AS (SELECT k, du, (2 * s * 10000 + n) // (2 * n) AS v6,
       |    row_number() OVER (PARTITION BY k ORDER BY du) AS i
       |  FROM obs0),
       |r AS (
       |  SELECT k, i, du, v6, v6 AS ew, 0 AS fl FROM obs WHERE i = 1
       |  UNION ALL
       |  SELECT o.k, o.i, o.du, o.v6,
       |    (2 * ($aNum * o.v6 + $b * r.ew) + $aDen) // (2 * $aDen),
       |    CASE WHEN abs(o.v6 - r.ew) > $bandMicro THEN 1 ELSE 0 END
       |  FROM obs o JOIN r ON o.k = r.k AND o.i = r.i + 1)
       |SELECT k, make_timestamp(du) AS day,
       |  CAST(v6 AS DOUBLE) / 1e6 AS v,
       |  CAST(ew AS DOUBLE) / 1e6 AS ewma, fl AS is_anom
       |FROM r""".stripMargin
  }

  /** Holt double-exponential (level + trend) smoothing of the daily
    * mean series per key, with the one-step-ahead forecast error —
    * the trend-aware sibling of [[ewmaBand]] (EWMA lags a trending
    * series by design; Holt's trend state removes that lag, and the
    * forecast column IS the backtest):
    *
    *   l_t = ½(v_t + (l+b)),  b_t = ½((l_t − l) + b),  ŷ_t = l + b
    *
    * (α = β = ½.) All states are half-up micro-grid longs via
    * explicit FLOOR division `(2x+d − posmod(2x+d, 2d)) / (2d)` —
    * the trend can be NEGATIVE, where Spark's `div` and DuckDB's
    * `//` both truncate toward zero and would disagree with the
    * half-up contract; positive-mod floor division is sign-safe and
    * identical in both engines. Same recurrence machinery as EWMA:
    * per-key sorted fold (series length = day count, bounded), one
    * shuffle on key.
    *
    * @return (k, day, v, level, trend, fcst, err) — micro-exact 6dp
    */
  def holtTrend(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    val obs = events.groupBy(col(keyCol).as("k"),
        unix_micros(date_trunc("day", col(tsCol))).as("du"))
      .agg(sum(round(col(valueCol).cast("double") * 100).cast("long"))
          .as("s"),
        count(lit(1)).as("n"))
      // sign-safe half-up daily mean: the trend machinery below is
      // explicitly signed, so the seed mean must be too — pmod-floor
      // (like hup) instead of truncating `div`, which would disagree
      // with DuckDB's floor `//` spelling on negative daily sums.
      .select(col("k"), col("du"),
        expr("((2 * s * 10000 + n) - pmod(2 * s * 10000 + n, 2 * n))" +
          " div (2 * n)").as("v6"))
    // signed half-up x/d on the micro grid: floor((2x + d) / (2d))
    def hup(x: String, d: Int): String = {
      val a = s"(2 * ($x) + $d)"
      val m = 2 * d
      s"(($a - (pmod($a, $m))) div $m)"
    }
    val lStep = hup("x.v6 + acc.l + acc.b", 2)
    val folded = obs.groupBy("k")
      .agg(array_sort(collect_list(struct(col("du"), col("v6"))))
        .as("xs"))
      .select(col("k"), explode(expr(
        s"""aggregate(xs,
           |  named_struct('first', cast(1 as int),
           |    'l', cast(0 as bigint), 'b', cast(0 as bigint), 'out',
           |    cast(array() as array<struct<du:bigint,v6:bigint,
           |      l:bigint,b:bigint,fcst:bigint,err:bigint>>)),
           |  (acc, x) -> named_struct(
           |    'first', 0,
           |    'l', CASE WHEN acc.first = 1 THEN x.v6 ELSE $lStep END,
           |    'b', CASE WHEN acc.first = 1 THEN cast(0 as bigint)
           |      ELSE ${hup(s"($lStep - acc.l) + acc.b", 2)} END,
           |    'out', acc.out || array(named_struct(
           |      'du', x.du, 'v6', x.v6,
           |      'l', CASE WHEN acc.first = 1 THEN x.v6 ELSE $lStep END,
           |      'b', CASE WHEN acc.first = 1 THEN cast(0 as bigint)
           |        ELSE ${hup(s"($lStep - acc.l) + acc.b", 2)} END,
           |      'fcst', CASE WHEN acc.first = 1
           |        THEN cast(null as bigint) ELSE acc.l + acc.b END,
           |      'err', CASE WHEN acc.first = 1
           |        THEN cast(null as bigint)
           |        ELSE x.v6 - (acc.l + acc.b) END))),
           |  acc -> acc.out)""".stripMargin)).as("r"))
    folded.select(col("k"), timestamp_micros(col("r.du")).as("day"),
      (col("r.v6").cast("double") / 1e6).as("v"),
      (col("r.l").cast("double") / 1e6).as("level"),
      (col("r.b").cast("double") / 1e6).as("trend"),
      (col("r.fcst").cast("double") / 1e6).as("fcst"),
      (col("r.err").cast("double") / 1e6).as("err"))
  }

  /** DuckDB replay of [[holtTrend]] (recursive CTE; floor division
    * spelled with a positive mod, matching the Spark fold). */
  def holtOracleSql(table: String, keyCol: String, tsCol: String,
      valueCol: String): String = {
    def hup(x: String, d: Int): String = {
      val a = s"(2 * ($x) + $d)"
      val m = 2 * d
      s"(($a - ((($a) % $m + $m) % $m)) // $m)"
    }
    val lStep = hup("o.v6 + r.l + r.b", 2)
    s"""WITH RECURSIVE obs0 AS (SELECT $keyCol AS k,
       |    epoch_us(date_trunc('day', $tsCol)) AS du,
       |    CAST(sum(CAST(round(CAST($valueCol AS DOUBLE) * 100)
       |      AS BIGINT)) AS BIGINT) AS s,
       |    CAST(count(*) AS BIGINT) AS n
       |  FROM $table GROUP BY 1, 2),
       |obs AS (SELECT k, du,
       |    ((2 * s * 10000 + n) - (((2 * s * 10000 + n) % (2 * n)
       |      + (2 * n)) % (2 * n))) // (2 * n) AS v6,
       |    row_number() OVER (PARTITION BY k ORDER BY du) AS i
       |  FROM obs0),
       |r AS (
       |  SELECT k, i, du, v6, v6 AS l, CAST(0 AS BIGINT) AS b,
       |    CAST(NULL AS BIGINT) AS fcst, CAST(NULL AS BIGINT) AS err
       |  FROM obs WHERE i = 1
       |  UNION ALL
       |  SELECT o.k, o.i, o.du, o.v6,
       |    $lStep,
       |    ${hup(s"($lStep - r.l) + r.b", 2)},
       |    r.l + r.b, o.v6 - (r.l + r.b)
       |  FROM obs o JOIN r ON o.k = r.k AND o.i = r.i + 1)
       |SELECT k, make_timestamp(du) AS day,
       |  CAST(v6 AS DOUBLE) / 1e6 AS v,
       |  CAST(l AS DOUBLE) / 1e6 AS level,
       |  CAST(b AS DOUBLE) / 1e6 AS trend,
       |  CAST(fcst AS DOUBLE) / 1e6 AS fcst,
       |  CAST(err AS DOUBLE) / 1e6 AS err
       |FROM r""".stripMargin
  }
}
