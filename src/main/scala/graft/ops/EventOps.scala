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
