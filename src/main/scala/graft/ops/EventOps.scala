package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered/event-time operators: sessionization, time bucketing, as-of
  * joins — batch semantics, verifiable against a SQL oracle.
  *
  * Scale notes: everything partitions by the entity key (user_id);
  * window functions sort within the hash-shuffled partition only. The
  * as-of join uses the union trick (tag + merge-sort within key) instead
  * of a range join, so it is one shuffle, never a pair explosion.
  */
object EventOps {

  /** Epoch seconds with sub-second fraction (double). */
  def epochS(ts: Column): Column = ts.cast("double")

  /** Mark rows that start a new session (gap > gapSeconds). */
  def sessionStartFlag(userCol: Column, ts: Column, orderBreaker: Column,
      gapSeconds: Double): Column = {
    val w = Window.partitionBy(userCol).orderBy(ts, orderBreaker)
    val prev = lag(ts, 1).over(w)
    when(prev.isNull || epochS(ts) - epochS(prev) > gapSeconds, 1).otherwise(0)
  }

  /** Sessions per user with an inactivity-gap definition. */
  def sessionCounts(events: DataFrame, gapSeconds: Double): DataFrame =
    events
      .withColumn("is_new",
        sessionStartFlag(col("user_id"), col("ts"), col("event_id"), gapSeconds))
      .groupBy("user_id")
      .agg(sum("is_new").cast("long").as("n_sessions"))

  /** Fixed-width time bucket start, as epoch seconds (engine-neutral —
    * avoids ns-vs-us timestamp precision in outputs).
    */
  def timeBucketS(ts: Column, widthSeconds: Int): Column =
    (floor(epochS(ts) / widthSeconds).cast("long") * widthSeconds).as("bucket_s")

  /** Categorical drift monitor: Jensen–Shannon divergence of the
    * `typeCol` distribution between every pair of CONSECUTIVE time
    * buckets — the pipeline-health probe that catches a source
    * changing shape (new event mix, a crawler losing a domain, a
    * schema migration leaking) before it poisons downstream stats.
    * JSD is symmetric, bounded by ln 2, and defined even when a
    * category vanishes (its KL term is 0 when p=0; m>0 whenever
    * either side has mass).
    *
    * Shape: one scan → (bucket, type) counts (map-side combined,
    * |buckets|·|types| rows), bucket totals re-aggregated from that
    * table, consecutive pairs via a full-outer self-join on
    * (bucket, type) with the later bucket shifted — no window over
    * the raw stream, nothing corpus-sized ever shuffles. Output per
    * pair: both bucket starts, sizes, category count, round(jsd, 6).
    */
  def typeDrift(events: DataFrame, tsCol: String, typeCol: String,
      widthSeconds: Int): DataFrame = {
    require(widthSeconds > 0, s"bad bucket width $widthSeconds")
    val c = events
      .select(timeBucketS(col(tsCol), widthSeconds), col(typeCol).as("t"))
      .groupBy("bucket_s", "t").agg(count(lit(1)).as("c"))
    val tot = c.groupBy("bucket_s").agg(sum("c").as("n"))
    val a = c.select(col("bucket_s").as("b"), col("t"), col("c").as("ca"))
    val bNext = c.select((col("bucket_s") - widthSeconds).as("b"),
      col("t"), col("c").as("cb"))
    val na = tot.select(col("bucket_s").as("b"), col("n").as("n_a"))
    val nb = tot.select((col("bucket_s") - widthSeconds).as("b"),
      col("n").as("n_b"))
    val p = coalesce(col("ca"), lit(0L)).cast("double") / col("n_a")
    val q = coalesce(col("cb"), lit(0L)).cast("double") / col("n_b")
    val m = (p + q) / 2.0
    val term =
      when(p > 0.0, p * log(p / m) * 0.5).otherwise(0.0) +
      when(q > 0.0, q * log(q / m) * 0.5).otherwise(0.0)
    a.join(bNext, Seq("b", "t"), "full_outer")
      .join(na, Seq("b"))
      .join(nb, Seq("b"))
      .groupBy("b").agg(
        first(col("n_a")).as("n_a"), first(col("n_b")).as("n_b"),
        count(lit(1)).as("n_types"),
        round(sum(term), 6).as("jsd"))
      .select(col("b").as("bucket_s"),
        (col("b") + widthSeconds).as("next_bucket_s"),
        col("n_a"), col("n_b"), col("n_types"), col("jsd"))
  }

  /** As-of join within one table: for each `right` event, the most recent
    * strictly-prior `left` event id of the same key. Union trick: a single
    * window over the interleaved stream — one shuffle on the key, no
    * range-join blowup regardless of event counts per key.
    */
  def asOfPriorEventId(events: DataFrame, leftType: String, rightType: String): DataFrame = {
    val e = events.filter(col("event_type").isin(leftType, rightType))
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    e.withColumn("prev_left_id",
        last(when(col("event_type") === leftType, col("event_id")), ignoreNulls = true).over(w))
      .filter(col("event_type") === rightType)
      .select(col("event_id"), col("user_id"), col("prev_left_id"))
  }
}
