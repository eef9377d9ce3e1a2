package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators — the streaming twins of
  * `graft.ops.EventOps`. Batch and stream share semantics; the batch
  * versions are the oracle-verifiable forms.
  *
  * Scale notes: windowed counts are watermarked keyed-state aggs —
  * state is bounded by (watermark horizon × key cardinality); the
  * custom sessionizer uses flatMapGroupsWithState with processing-time
  * timeouts so idle users release state. Both shuffle once on the key.
  */
object StreamOps {

  /** Tumbling event-time window counts with a watermark: the streaming
    * form of EventOps.timeBucketS aggregation (q26). Late rows beyond
    * the watermark are dropped, bounding state.
    */
  def windowedCounts(events: DataFrame, windowSeconds: Int,
      watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), s"$windowSeconds seconds"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(col("window.start").as("bucket_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Streaming exact dedup on a content key with a watermark: the
    * streaming twin of DedupOps.exactDupGroups for continuous
    * ingestion. `dropDuplicatesWithinWatermark` keeps per-key state
    * only for the watermark horizon, so state is bounded by
    * (horizon × distinct keys per horizon) — the standard shape for
    * deduplicating a training-data firehose where true duplicates
    * arrive close together (a crawl re-fetch, an at-least-once
    * source), rather than unbounded dropDuplicates state.
    */
  def dedupStream(docs: DataFrame, keyCol: String, tsCol: String,
      watermarkDelay: String = "10 minutes"): DataFrame =
    docs
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCol)

  case class Event(user_id: Long, ts: Timestamp, value: Double)
  case class SessionState(count: Long, lastTsMs: Long)
  case class SessionOut(user_id: Long, n_sessions: Long)

  /** Inactivity-gap sessionization with explicit keyed state — the
    * streaming form of EventOps.sessionCounts (q25). Emits the running
    * session count per user on every update.
    */
  def sessionize(spark: SparkSession, events: Dataset[Event],
      gapSeconds: Double): Dataset[SessionOut] = {
    import spark.implicits._
    def update(userId: Long, rows: Iterator[Event],
        state: GroupState[SessionState]): Iterator[SessionOut] = {
      var st = state.getOption.getOrElse(SessionState(0L, Long.MinValue))
      // order within the micro-batch: state transition is ts-ordered
      for (e <- rows.toSeq.sortBy(_.ts.getTime)) {
        val tsMs = e.ts.getTime
        if (st.lastTsMs == Long.MinValue || (tsMs - st.lastTsMs) / 1000.0 > gapSeconds)
          st = SessionState(st.count + 1, tsMs)
        else st = st.copy(lastTsMs = tsMs)
      }
      state.update(st)
      Iterator.single(SessionOut(userId, st.count))
    }
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout())(update)
  }
}
