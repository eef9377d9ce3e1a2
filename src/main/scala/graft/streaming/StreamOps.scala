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

  /** Streaming curation filter: the stateless stages of
    * `graft.ops.CurationPipeline` (length / language / repetition)
    * applied to a document stream. Stateless selects compose with any
    * downstream watermarked stage (e.g. `dedupStream` on the
    * fingerprint) — the standard shape for filtering a crawl firehose
    * before it ever lands: per-row expressions only, no state, no
    * shuffle, identical semantics to the batch operator (asserted by
    * StreamingSpec against `CurationPipeline.signals`).
    */
  def curationFilter(docs: DataFrame, idCol: String, textCol: String,
      minTokens: Long = 25, maxTokens: Long = 95,
      maxDup2gramFrac: Double = 0.1): DataFrame = {
    val w = col("_w")
    val g2 = col("_g2")
    val grams2 = when(size(w) >= 2,
      transform(sequence(lit(1), size(w) - 1),
        i => concat_ws(" ", element_at(w, i), element_at(w, i + 1)))
    ).otherwise(array())
    val passthrough = docs.columns.map(col).toSeq
    docs
      .withColumn("_w", split(lower(col(textCol)), graft.ops.TextOps.Ws))
      // explode(array(..)) Generate barrier (see DedupOps.wordShingles)
      // so the tokenizer is not inlined into the per-element gram
      // lambda; Generate is stateless and streaming-safe
      .withColumn("_g2x", explode(array(grams2)))
      .select(passthrough :+ col("_g2x").as("_g2"): _*)
      .withColumn("_toks", regexp_count(col(textCol), lit(graft.ops.TextOps.NonWs)))
      .withColumn("_dup2", when(size(g2) > 0,
        lit(1.0) - size(array_distinct(g2)).cast("double") / size(g2))
        .otherwise(0.0))
      .filter(col("_toks").between(minTokens, maxTokens) &&
        graft.ops.TextOps.langScore(col(textCol), "en") > 0 &&
        col("_dup2") <= maxDup2gramFrac)
      .withColumn("fp", graft.ops.TextOps.fingerprint(col(textCol)))
      .drop("_g2", "_toks", "_dup2")
  }

  /** Stream-static anti join: drop stream documents whose key appears
    * in a static blocklist (known benchmark/eval documents, takedown
    * lists, previously-ingested fingerprints); broadcast when small —
    * the standard shape for filtering a crawl firehose against curated
    * exclusion sets. Stateless on the stream side: no watermark
    * required.
    *
    * Freshness caveat: a PATH-based static frame (spark.read.parquet)
    * snapshots its file listing at creation — appended blocklist files
    * are NOT seen by a running stream. To pick up updates, pass a
    * catalog/DSv2 table (re-resolved per micro-batch) or restart the
    * query with a re-created static frame.
    */
  def blocklistFilter(stream: DataFrame, keyCol: String,
      blocklist: DataFrame, blockKeyCol: String): DataFrame =
    stream.join(
      broadcast(blocklist.select(col(blockKeyCol).as(keyCol)).distinct()),
      Seq(keyCol), "left_anti")

  /** Streaming DSIR scoring — the twin of
    * [[graft.ops.DsirOps.importanceWeights]] for a document firehose:
    * the batch fit freezes the bucket→micronat ratio model
    * ([[graft.ops.DsirOps.fitRatioModel]]), and each arriving doc is
    * scored by a pure per-row token fold over the literal map — no
    * explode, no shuffle, no state, so it composes with any
    * downstream watermarked stage. Scores are bit-identical to the
    * batch path (same micronat long sums; StreamingSpec pins it).
    */
  def dsirScoreStream(stream: DataFrame, idCol: String, textCol: String,
      model: Map[String, Long]): DataFrame =
    graft.ops.DsirOps.scoreWithModel(stream, idCol, textCol, model)

  /** Streaming PSI drift monitor — the twin of
    * [[graft.ops.EventOps.psiDrift]]: score each event-time window's
    * value distribution against a FROZEN reference histogram
    * ([[graft.ops.EventOps.fitPsiRef]], the first-half model the
    * batch op derives internally). ONE windowed aggregation computes
    * all `nBins` bin counts as conditional sums (a second stacked
    * aggregation would be unsupported in append mode), then the PSI
    * is a pure projection with the same smoothing and centinano
    * fixed-point exactness as the batch op.
    *
    * @return (window_start, n_cur, psi) per closed window
    */
  def psiDriftStream(stream: DataFrame, tsCol: String, valueCol: String,
      ref: graft.ops.EventOps.PsiRef, windowSeconds: Int,
      watermarkDelay: String = "10 minutes"): DataFrame = {
    val bin = graft.ops.EventOps.binCol(col(valueCol), ref.vlo, ref.width,
      ref.nBins)
    val counts = (0 until ref.nBins).map(b =>
      sum(when(col("_bin") === b, 1L).otherwise(0L)).as(s"_c$b"))
    val agged = stream
      .withColumn("_bin", bin)
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), s"$windowSeconds seconds"))
      .agg(count(lit(1)).as("n_cur"), counts: _*)
    agged.select(col("window.start").as("window_start"), col("n_cur"),
      graft.ops.EventOps.psiExpr(ref,
        (0 until ref.nBins).map(b => col(s"_c$b")), col("n_cur")).as("psi"))
  }

  /** Streaming chi-squared goodness-of-fit drift — the categorical
    * twin of [[psiDriftStream]]: per event-time window, the observed
    * category counts (one conditional sum per FROZEN baseline
    * category, single watermarked aggregation) are tested against the
    * baseline distribution: χ² = Σ_k d_k²/(n·ref_k·ref_N) with
    * d_k = o_k·ref_N − n·ref_k exact integers — the same algebra as
    * the batch [[graft.ops.ProfileOps.chiSquaredAgainstRest]], folded
    * in the fixed baseline order so it is deterministic. Categories
    * outside the baseline inflate only n (a conservative drift
    * signal); pass a baseline covering the expected domain.
    */
  def chi2DriftStream(stream: DataFrame, tsCol: String, catCol: String,
      ref: Seq[(String, Long)], windowSeconds: Int,
      watermarkDelay: String = "10 minutes"): DataFrame = {
    require(ref.nonEmpty && ref.forall(_._2 > 0),
      "baseline needs positive counts")
    val refN = ref.map(_._2).sum
    val counts = ref.zipWithIndex.map { case ((k, _), i) =>
      sum(when(col(catCol) === k, 1L).otherwise(0L)).as(s"_c$i")
    }
    val agged = stream.withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), s"$windowSeconds seconds"))
      .agg(count(lit(1)).as("n_cur"), counts: _*)
    val chi2 = ref.zipWithIndex.map { case ((_, rk), i) =>
      val d = col(s"_c$i") * refN - col("n_cur") * rk
      (d.cast("double") * d.cast("double")) /
        (col("n_cur") * rk * refN).cast("double")
    }.reduce(_ + _)
    agged.select(col("window.start").as("window_start"), col("n_cur"),
      round(chi2, 6).as("chi2"))
  }

  /** Streaming data-quality monitor — the incremental twin of
    * [[graft.ops.ProfileOps.expectationTrend]]: per event-time
    * window, each contract check's violation count as a conditional
    * sum inside ONE watermarked aggregation (stacked aggregations are
    * unsupported in append mode — the psiDriftStream discipline).
    * The alert feed a DQ pager hangs off.
    */
  def expectationMonitorStream(stream: DataFrame, tsCol: String,
      checks: Seq[(String, org.apache.spark.sql.Column)],
      windowSeconds: Int, watermarkDelay: String = "10 minutes"): DataFrame = {
    require(checks.nonEmpty, "expectationMonitorStream needs >= 1 check")
    val sums = checks.map { case (name, pred) =>
      sum(when(pred, 1L).otherwise(0L)).as(s"v_$name")
    }
    stream
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), s"$windowSeconds seconds"))
      .agg(count(lit(1)).as("n_rows"), sums: _*)
      .select(col("window.start").cast("double").cast("long").as("win_s") +:
        col("n_rows") +: checks.map { case (name, _) => col(s"v_$name") }: _*)
  }

  /** Inactivity-gap sessionization via Spark's NATIVE
    * `session_window` (dynamic-gap merging inside the engine's
    * session-state store) — the declarative twin of the explicit
    * [[sessionize]] mapGroupsWithState operator, for the common case
    * where per-session aggregates suffice and no custom state
    * machine is needed. State is bounded by open sessions; a session
    * closes (and emits, in append mode) once the watermark passes
    * its gap horizon.
    */
  def sessionWindowCounts(events: DataFrame, userCol: String,
      tsCol: String, gapSeconds: Int,
      watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(session_window(col(tsCol), s"$gapSeconds seconds"),
        col(userCol).as("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 4).as("sum_value"))
      .select(col("session_window.start").cast("double").cast("long")
          .as("session_start"),
        col("session_window.end").cast("double").cast("long")
          .as("session_end"),
        col("user_id"), col("n_events"), col("sum_value"))

  /** Streaming OHLC bars — the twin of
    * [[graft.ops.TimeSeriesOps.ohlcBars]]: per (series, event-time
    * hour window) open/high/low/close/volume in ONE watermarked
    * aggregation. Open/close keep the batch op's total deterministic
    * (t, id) order by aggregating min/max over a (t, id, value)
    * struct — order-insensitive, so arrival order across
    * micro-batches cannot change a closed window's bar (struct
    * min/max is associative and commutative, unlike first/last).
    * Late rows beyond the watermark drop; state is one struct pair
    * per open window per series.
    */
  def ohlcBarsStream(events: DataFrame, seriesCol: String, tsCol: String,
      idCol: String, valueCol: String,
      watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), "3600 seconds"), col(seriesCol).as("series"))
      .agg(
        min(struct(col(tsCol).cast("double").as("t"), col(idCol).as("id"),
          col(valueCol).as("value"))).getField("value").as("open"),
        max(col(valueCol)).as("high"),
        min(col(valueCol)).as("low"),
        max(struct(col(tsCol).cast("double").as("t"), col(idCol).as("id"),
          col(valueCol).as("value"))).getField("value").as("close"),
        round(sum(col(valueCol)), 4).as("volume"),
        count(lit(1)).as("n"))
      .select(col("window.start").cast("double").cast("long").as("h"),
        col("series"), col("open"), col("high"), col("low"), col("close"),
        col("volume"), col("n"))

  /** Streaming snapshot diff — incremental corpus change detection,
    * the streaming twin of [[graft.ops.SnapshotOps.snapshotDiff]]
    * (q92 defines the batch semantics): documents ARRIVE as a stream
    * (a crawl refresh, a re-ingest) and each is classified against
    * the static previous snapshot the moment it lands, so downstream
    * refresh work (re-embed, re-dedup, re-pack) starts per document
    * instead of after a full batch diff.
    *
    * Same digest discipline as the batch op: the static side reduces
    * to (id, 16-byte digest) once; each micro-batch ships digests,
    * never text, through one stream-static LEFT join.
    * `broadcastPrev` (default true) pins the broadcast hint — right
    * while the digest table fits an executor (~32 bytes/doc); pass
    * false for a very large previous snapshot and the planner picks a
    * non-broadcast stream-static join instead of OOMing executors.
    * Stateless — no watermark, no keyed state; scale is bounded by
    * the static side's size per executor, not the stream's length.
    *
    * Semantics caveat (inherent, documented not hidden): "removed"
    * is undecidable from a stream — absence has no arrival time. A
    * stream emits added/changed/unchanged; run the batch
    * `snapshotDiff` filtered to "removed" as the end-of-epoch
    * reconciliation. StreamingSpec pins streamed statuses ==
    * batch statuses minus "removed".
    */
  def snapshotDiffStream(stream: DataFrame, prev: DataFrame, idCol: String,
      textCol: String, broadcastPrev: Boolean = true): DataFrame = {
    val prevKeyed = prev.select(col(idCol).as("id"),
      md5(col(textCol).cast("binary")).as("prev_digest"),
      lit(true).as("prev_present"))
    val prevSide = if (broadcastPrev) broadcast(prevKeyed) else prevKeyed
    stream.select(col(idCol).as("id"),
        md5(col(textCol).cast("binary")).as("cur_digest"))
      .join(prevSide, Seq("id"), "left")
      .select(col("id"),
        when(col("prev_present").isNull, lit("added"))
          .when(col("cur_digest") <=> col("prev_digest"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }

  case class CdcRow(k: Long, op: String, value: Double, t: Double, id: Long)
  case class CdcState(op: String, value: Double, t: Double, id: Long)
  case class CdcOut(k: Long, value: Double, last_t: Double, last_op: String,
      deleted: Boolean)

  /** Streaming CDC apply — the incremental twin of
    * [[graft.ops.SnapshotOps.cdcApply]] (q216 defines the batch
    * semantics): per key, keep only the latest (t, id)-ordered op in
    * state and emit the key's current materialized row on every
    * update (`deleted = true` tombstones a terminal D). State is ONE
    * small record per live key — the change stream itself is never
    * buffered; out-of-order rows WITHIN the retained state window
    * resolve exactly like the batch op because the state transition
    * compares (t, id) rather than trusting arrival order.
    */
  def cdcApplyStream(spark: SparkSession, log: Dataset[CdcRow])
      : Dataset[CdcOut] = {
    import spark.implicits._
    def update(k: Long, rows: Iterator[CdcRow],
        state: GroupState[CdcState]): Iterator[CdcOut] = {
      var st = state.getOption.orNull
      for (r <- rows)
        if (st == null || r.t > st.t || (r.t == st.t && r.id > st.id))
          st = CdcState(r.op, r.value, r.t, r.id)
      state.update(st)
      Iterator.single(CdcOut(k, st.value, st.t, st.op, st.op == "D"))
    }
    log.groupByKey(_.k)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(update)
  }

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

  case class JourneyState(lastTsMs: Long, tail: Seq[String])

  /** Streaming twin of [[graft.ops.EventOps.frequentJourneys]]' path
    * EXTRACTION: per-user keyed state holds only the last `k` event
    * types of the open session plus the last timestamp, and each
    * arriving event emits the k-step path it completes (gap >
    * `gapSeconds` resets the tail — paths never cross sessions).
    * Downstream, paths count in a complete-mode aggregation or a
    * foreachBatch store append; the top-n readout is the batch
    * operator over that table.
    *
    * Equivalence contract (the funnelStream discipline): identical
    * path multiset to the batch extraction when events arrive in
    * event-time order across micro-batches (within a batch, rows sort
    * by ts before the state transition; simultaneous events tie-break
    * undefined — the batch side orders by (t, id)). State per user is
    * k strings + one long, bounded by user cardinality.
    */
  def journeyPathStream(spark: SparkSession, events: Dataset[StepEvent],
      gapSeconds: Double, k: Int): Dataset[String] = {
    require(k >= 2, s"a journey needs k >= 2 steps, got $k")
    import spark.implicits._
    def update(userId: Long, rows: Iterator[StepEvent],
        state: GroupState[JourneyState]): Iterator[String] = {
      var st = state.getOption.getOrElse(JourneyState(Long.MinValue, Seq.empty))
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      for (e <- rows.toSeq.sortBy(_.ts.getTime)) {
        val ms = e.ts.getTime
        val fresh = st.lastTsMs == Long.MinValue ||
          (ms - st.lastTsMs) / 1000.0 > gapSeconds
        val tail0 = (if (fresh) Seq.empty else st.tail) :+ e.event_type
        val tail = tail0.takeRight(k)
        if (tail.size == k) out += tail.mkString(" > ")
        st = JourneyState(ms, tail)
      }
      state.update(st)
      out.iterator
    }
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(update)
  }

  case class StepEvent(user_id: Long, ts: Timestamp, event_type: String)
  case class FunnelState(anchorMs: Long, lastMs: Long, depth: Int)
  case class FunnelOut(user_id: Long, depth: Int)

  /** Stateful streaming funnel — the incremental form of
    * EventOps.eventFunnel (q180): per-user keyed state walks the step
    * machine as events arrive, emitting the user's current depth on
    * every update. Same FIRST-TOUCH anchoring: the first step-1 event
    * pins the window; each later step matches its first occurrence
    * strictly after the previous match and within `windowDays` of the
    * anchor.
    *
    * Equivalence contract with the batch operator: identical depths
    * when events arrive in event-time order across micro-batches
    * (within a batch, rows sort by ts before the state transition).
    * Out-of-order arrival can under-count — a stream cannot match a
    * step it has not seen against a boundary it will only learn later
    * — which is the standard streaming-funnel trade; replay the batch
    * form for the authoritative number.
    *
    * State per user is THREE numbers (anchor, last-match, depth) — no
    * event buffering, bounded by user cardinality.
    */
  def funnelStream(spark: SparkSession, events: Dataset[StepEvent],
      steps: Seq[String], windowDays: Int): Dataset[FunnelOut] = {
    import spark.implicits._
    require(steps.size >= 2, s"funnel needs >= 2 steps, got $steps")
    val windowMs = windowDays * 86400000L
    val stepIdx = steps.zipWithIndex.toMap
    def update(userId: Long, rows: Iterator[StepEvent],
        state: GroupState[FunnelState]): Iterator[FunnelOut] = {
      var st = state.getOption.getOrElse(FunnelState(Long.MinValue, Long.MinValue, 0))
      for (e <- rows.toSeq.sortBy(_.ts.getTime)
           if st.depth < steps.size && stepIdx.get(e.event_type).contains(st.depth)) {
        val t = e.ts.getTime
        if (st.depth == 0) st = FunnelState(t, t, 1)
        else if (t > st.lastMs && t <= st.anchorMs + windowMs)
          st = st.copy(lastMs = t, depth = st.depth + 1)
      }
      state.update(st)
      Iterator.single(FunnelOut(userId, st.depth))
    }
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout())(update)
  }

  case class TouchEvent(user_id: Long, ts: Timestamp,
    event_type: String, event_id: Long)
  case class TouchState(lastTouchMs: Long)
  case class AttributionOut(event_id: Long, user_id: Long,
    attributed: Boolean, lat_ms: Long)

  /** Streaming last-touch attribution — the in-flight twin of
    * [[graft.ops.EventOps.lastTouchAttribution]]: per user the state
    * is ONE long (latest touch time); every conversion emits its
    * credit decision the micro-batch it arrives, surviving restarts
    * and batch boundaries (a click in batch 1 credits a purchase in
    * batch 9 — the cross-batch case the batch window gets for free
    * and a naive per-batch join silently loses). Rows sort by
    * (ts, event_id) inside a micro-batch, so intra-batch ordering
    * matches the batch op; cross-batch out-of-order touches are the
    * streaming trade (bounded by the delivery delay), same caveat as
    * [[funnelStream]]. lat_ms = −1 on unattributed conversions.
    */
  def attributionStream(spark: SparkSession, events: Dataset[TouchEvent],
      convType: String, touchType: String, windowSec: Long)
      : Dataset[AttributionOut] = {
    import spark.implicits._
    def update(userId: Long, rows: Iterator[TouchEvent],
        state: GroupState[TouchState]): Iterator[AttributionOut] = {
      var st = state.getOption.getOrElse(TouchState(Long.MinValue))
      val out = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
        .flatMap { e =>
          if (e.event_type == touchType) {
            if (e.ts.getTime > st.lastTouchMs)
              st = TouchState(e.ts.getTime)
            None
          } else if (e.event_type == convType) {
            val lat = e.ts.getTime - st.lastTouchMs
            val ok = st.lastTouchMs != Long.MinValue &&
              lat <= windowSec * 1000L && lat >= 0
            Some(AttributionOut(e.event_id, userId, ok,
              if (ok) lat else -1L))
          } else None
        }
      state.update(st)
      out.iterator
    }
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update(),
        GroupStateTimeout.NoTimeout())(update)
  }

  case class UrlDoc(doc_id: Long, url: String)
  case class QuotaState(admitted: Long)
  case class QuotaOut(doc_id: Long, domain: String)

  /** Streaming per-domain quota: admit at most `n` documents per
    * registered domain over the life of the stream — the ingest-time
    * form of UrlOps.capPerDomain. Semantics necessarily differ from
    * the batch form: a stream admits the FIRST n arrivals per domain
    * (arrival order is the only order a stream has), where batch picks
    * the n lowest hash coordinates; both bound every domain at n.
    * State per domain is ONE long (the admitted count) — no timeout,
    * since a quota is a lifetime budget, and state size is bounded by
    * the domain cardinality, not the corpus.
    */
  def domainQuota(spark: SparkSession, docs: Dataset[UrlDoc], n: Int)
      : Dataset[QuotaOut] = {
    import spark.implicits._
    require(n >= 1, s"quota must be >= 1, got $n")
    val keyed = docs
      .withColumn("domain",
        graft.ops.UrlOps.registeredDomain(
          graft.ops.UrlOps.urlHost(col("url"))))
      .as[(Long, String, String)]
    def update(domain: String, rows: Iterator[(Long, String, String)],
        state: GroupState[QuotaState]): Iterator[QuotaOut] = {
      var st = state.getOption.getOrElse(QuotaState(0L))
      // deterministic admission inside a micro-batch: doc_id order
      val out = rows.toSeq.sortBy(_._1).flatMap { case (id, _, dom) =>
        if (st.admitted < n) { st = QuotaState(st.admitted + 1)
          Some(QuotaOut(id, dom))
        } else None
      }
      state.update(st)
      out.iterator
    }
    keyed.groupByKey(_._3)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(update)
  }

  /** Streaming near-duplicate filter against a STATIC corpus index:
    * drop arriving documents whose minhash LSH bands collide with any
    * indexed band (the incremental-crawl twin of the batch
    * minHashLshPairs candidate rule — "agrees with some corpus doc on
    * at least one full band").
    *
    * Mechanics: the per-row signature comes from `graft_minhash_row`
    * (bit-identical hash family to the batch aggregate), band keys
    * from the SHARED [[graft.ops.DedupOps.minHashBandKeys]]
    * derivation, and membership is a driver-built bloom filter over
    * the index's distinct band keys, evaluated per row — no join, no
    * state, append-safe. That bloom is also the scale story: the
    * band-key set of a 10⁹-doc corpus at 1e-4 fpp is a few GB as an
    * exact set but ~2 bits/key as a bloom (bands×10⁹ keys ≈ 1-2 GB
    * broadcast once per index snapshot, probed at memory speed by
    * every executor).
    *
    * Honesty contract: a bloom false positive DROPS a novel document
    * (rate ≤ `fpp`, tunable); false negatives cannot occur, so no
    * near-dup candidate ever slips through. Documents with fewer than
    * `shingleN` tokens have no signature and always pass (minhash is
    * undefined there — exact dedup is their filter).
    */
  def nearDupFilterStream(stream: DataFrame, idCol: String, textCol: String,
      bandIndex: DataFrame, shingleN: Int = 3, numHashes: Int = 32,
      bands: Int = 8, fpp: Double = 0.001): DataFrame = {
    require(numHashes % bands == 0,
      s"bands must divide numHashes, got $numHashes/$bands")
    graft.functions.GraftFunctions.register(stream.sparkSession)
    val bf = graft.ops.BloomOps.buildBloom(
      bandIndex.select("band_key").distinct(), "band_key", fpp = fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    val bloomLit = lit(bos.toByteArray)

    val w = col("_w")
    val grams = when(size(w) >= shingleN,
      transform(sequence(lit(1), size(w) - (shingleN - 1)),
        i => concat_ws(" ", (0 until shingleN).map(k => element_at(w, i + k)): _*))
    ).otherwise(array())
    val passthrough = stream.columns.map(col).toSeq
    stream
      .withColumn("_w", split(lower(col(textCol)), graft.ops.TextOps.Ws))
      // Generate barrier (see DedupOps.wordShingles): stateless,
      // streaming-safe, keeps split() out of the per-gram lambda
      .withColumn("_gx", explode(array(array_distinct(grams))))
      .select(passthrough :+ col("_gx").as("_g"): _*)
      .withColumn("_bk", when(size(col("_g")) > 0,
        graft.ops.DedupOps.minHashBandKeys(
          call_function("graft_minhash_row", col("_g"), lit(numHashes)),
          numHashes, bands)))
      .filter(col("_bk").isNull ||
        !exists(col("_bk"), bk =>
          call_function("graft_bloom_contains", bloomLit, bk)))
      .drop("_g", "_bk")
  }

  /** Streaming line-boilerplate filter vs a FROZEN census — the
    * streaming twin of [[graft.ops.TextOps.lineBoilerplate]] (q386's
    * crawl loop in flight): the per-group boilerplate line set is
    * computed ONCE from a static reference corpus (the last crawl —
    * production freezes the census per snapshot, as with the minhash
    * band index above), and each arriving document is cleaned
    * ROW-LOCALLY: one stream–static equi-join ships the group's drop
    * set (collect_set per group — small by nature, boilerplate is
    * the handful of template lines a domain repeats), then a single
    * `filter` lambda cuts matching lines in place. Stateless, append
    * mode, no per-batch aggregation state — the census explode/agg
    * never runs on the stream side. Same trimmed-key identity and
    * blank-line exemption as the batch operator; when the reference
    * IS the arriving corpus, output equals the batch operator row
    * for row (StreamingSpec pins it).
    */
  def lineBoilerplateFilterStream(stream: DataFrame, idCol: String,
      textCol: String, groupCol: String, refDocs: DataFrame,
      maxShare: Double = 0.5, minDocs: Int = 3): DataFrame = {
    require(maxShare > 0 && maxShare <= 1,
      s"maxShare must be in (0, 1], got $maxShare")
    require(minDocs >= 1, s"minDocs must be >= 1, got $minDocs")
    val lines = refDocs.select(col(idCol).as("id"),
        col(groupCol).as("_grp"),
        explode(split(col(textCol), "\n")).as("line"))
      .withColumn("lk", trim(col("line")))
    val groupSizes = refDocs.groupBy(col(groupCol).as("_grp"))
      .agg(countDistinct(col(idCol)).as("n_docs"))
    val dropSets = lines.filter(col("lk") =!= "")
      .groupBy("_grp", "lk").agg(countDistinct(col("id")).as("nd"))
      .join(broadcast(groupSizes), Seq("_grp"))
      .filter(col("nd") >= minDocs && col("nd") > col("n_docs") * maxShare)
      .groupBy("_grp").agg(sort_array(collect_set(col("lk"))).as("_drop_lks"))
    val passthrough = stream.columns.map(col).toSeq
    val kept = filter(split(col(textCol), "\n"),
      l => !array_contains(col("_lks"), trim(l)))
    stream
      .join(dropSets.withColumnRenamed("_grp", groupCol),
        Seq(groupCol), "left")
      .withColumn("_lks",
        coalesce(col("_drop_lks"), array().cast("array<string>")))
      .select(passthrough ++ Seq(
        (size(split(col(textCol), "\n")) - size(kept)).cast("long")
          .as("n_lines_removed"),
        array_join(kept, "\n").as("text_clean")): _*)
  }

  /** Streaming passage-overlap filter vs a static fingerprint index —
    * the streaming twin of [[graft.ops.WinnowOps.overlapAgainstIndex]]
    * (q247's crawl loop in flight): each arriving document's winnow
    * fingerprints (per-row native expression — stateless,
    * streaming-safe) are probed against a Bloom filter built ONCE
    * from the index frame, and documents whose known-fingerprint
    * share exceeds `maxOverlap` drop in-stream. Bloom false
    * positives can only OVER-count overlap — the conservative
    * direction for a dedup filter; the batch operator stays the
    * exact accountant, and the batch `indexUpdate` folds surviving
    * batches in between filter restarts.
    */
  def passageOverlapFilterStream(stream: DataFrame, idCol: String,
      textCol: String, index: DataFrame, maxOverlap: Double = 0.5,
      k: Int = 12, w: Int = 6, fpp: Double = 0.001): DataFrame = {
    graft.functions.GraftFunctions.register(stream.sparkSession)
    val bf = graft.ops.BloomOps.buildBloom(
      index.select("fp").distinct(), "fp", fpp = fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    val bloomLit = lit(bos.toByteArray)
    val norm = lower(regexp_replace(col(textCol), "[ \\t\\n\\f\\r]+", ""))
    val fps = array_distinct(transform(
      call_function("graft_winnow", norm, lit(k), lit(w)),
      _.getField("fp")))
    stream
      .withColumn("_fps", fps)
      .withColumn("_known", size(filter(col("_fps"),
        f => call_function("graft_bloom_contains", bloomLit, f))))
      .filter(size(col("_fps")) === 0 ||
        col("_known").cast("double") <=
          lit(maxOverlap) * size(col("_fps")).cast("double"))
      .drop("_fps", "_known")
  }

  /** Streaming IVF sufficient statistics — the streaming twin of
    * [[graft.ops.IvfIndexOps.cellStats]] (q239's index-update path as
    * continuous ingestion): embedding vectors arrive on a stream, are
    * assigned under FROZEN centers by the stateless expression argmin
    * (`nearestCellCol` — the 5dp/cell-asc contract; a window argmin
    * would be illegal on a stream), and the per-(cell, pos) decimal
    * coordinate sums + counts accumulate as a streaming aggregation.
    * State is EXACTLY the persistable index delta: k·d rows, bounded
    * regardless of stream volume. Because the statistics are
    * additive, complete-mode output at any point equals the batch
    * `cellStats` of everything ingested so far (StreamingSpec asserts
    * this cross-batch); a periodic centroid refresh just reads the
    * latest output and calls `IvfIndexOps.refresh`.
    */
  def ivfStatsStream(vecs: DataFrame, idCol: String, vecCol: String,
      centers: Seq[Seq[Double]]): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    vecs
      .select(graft.ops.IvfIndexOps.nearestCellCol(v, centers).as("cell"),
        posexplode(v).as(Seq("pos", "x")))
      .select(col("cell"), col("pos"),
        round(col("x") * 1e7, 0).cast("decimal(38,0)").as("xi"))
      .groupBy("cell", "pos")
      .agg(sum(col("xi")).as("s"), count(lit(1)).as("n"))
  }

  /** Streaming Brier cells — the streaming twin of
    * [[graft.ops.ProfileOps.brierDecomposition]] (q346): state is the
    * (p, nk, yk) score-grid cell table (complete mode, bounded at
    * ≤ 100001 cells regardless of stream volume). The Murphy readout
    * at any instant is [[graft.ops.ProfileOps.brierFromCells]] over
    * this table, and equals the batch decomposition of everything
    * ingested (StreamingSpec asserts cross-batch).
    */
  def brierCellsStream(stream: DataFrame, scoreCol: String,
      labelCol: String): DataFrame =
    stream.select(
        round(col(scoreCol).cast("double") * 100000L).cast("long")
          .as("p"),
        col(labelCol).cast("long").as("y"))
      .groupBy("p")
      .agg(count(lit(1)).as("nk"), sum("y").as("yk"))

  /** Streaming decile-gains histogram — the streaming twin of
    * [[graft.ops.ProfileOps.decileGains]] (q345): state is the
    * (p, y, c) score×label histogram (complete mode, ≤ 2·100001
    * cells); the gains table at any instant is
    * [[graft.ops.ProfileOps.decileGainsFromHist]] over it (exactly
    * the batch ntile when no (score,label)-duplicate straddles a
    * decile boundary — see the finisher's ordering note).
    */
  def decileHistStream(stream: DataFrame, scoreCol: String,
      labelCol: String): DataFrame =
    stream.select(
        round(col(scoreCol).cast("double") * 100000L).cast("long")
          .as("p"),
        col(labelCol).cast("long").as("y"))
      .groupBy("p", "y")
      .agg(count(lit(1)).as("c"))

  /** Streaming value histogram per key — the streaming twin of the
    * q347 SLA readout: state is the (key, v, c) histogram (complete
    * mode, bounded by key×value-grid cardinality — day-grain latency
    * grids, not corpus size); exact type-1 percentiles at any
    * instant via [[graft.ops.ProfileOps.percentilesFromHist]], which
    * equals the batch rank-window order statistic bit-for-bit.
    */
  def valueHistStream(stream: DataFrame, keyCol: String,
      valueCol: String): DataFrame =
    stream.select(col(keyCol), col(valueCol).cast("long").as("v"))
      .groupBy(keyCol, "v")
      .agg(count(lit(1)).as("c"))

  /** Streaming count-min sketch — the streaming twin of
    * [[graft.ops.SketchOps.cmsSketch]] (q310): the counter table is
    * additive by construction, so the stream IS just the sketch's
    * grouped aggregation in complete mode. State is bounded at d·w
    * counters regardless of stream volume — the whole point of
    * keeping a sketch instead of an exact count table; complete-mode
    * output at any instant equals the batch sketch of everything
    * ingested (StreamingSpec asserts this cross-batch).
    */
  def cmsSketchStream(stream: DataFrame, keyCol: String,
      w: Int): DataFrame =
    graft.ops.SketchOps.cmsSketch(stream, keyCol, w)

  /** Streaming Markov transition counts — the ingest twin of
    * [[graft.ops.EventOps.markovTransitions]]' count core for
    * PRE-SESSIONIZED steps (the caller supplies (from, to) step
    * rows, e.g. from a sessionizing upstream stage): counts are
    * additive, so the stream is the grouped aggregation in complete
    * mode, state bounded at |types|² regardless of volume. The
    * stationary finisher
    * ([[graft.ops.EventOps.stationaryDistribution]]) runs on the
    * output at any instant and equals the batch chain exactly
    * (StreamingSpec).
    */
  def markovCountStream(steps: DataFrame, fromCol: String,
      toCol: String): DataFrame =
    steps.groupBy(col(fromCol).as("from_type"), col(toCol).as("to_type"))
      .agg(count(lit(1)).as("n"))

  /** Streaming quantile histogram — the ingest twin of
    * [[graft.ops.SketchOps.quantHistDelta]] (q390): bucket counts
    * are additive by construction, so the stream IS the delta's
    * grouped aggregation in complete mode. State is bounded by the
    * value range / cellMicro regardless of stream volume;
    * complete-mode output at any instant equals the batch histogram
    * of everything ingested, so
    * [[graft.ops.SketchOps.quantileAuditFromHist]] serves rank
    * queries from it directly (StreamingSpec asserts cross-batch
    * equality with the batch delta).
    */
  def quantHistStream(stream: DataFrame, valueCol: String,
      cellMicro: Long): DataFrame =
    graft.ops.SketchOps.quantHistDelta(stream, valueCol, cellMicro)

  /** Streaming Wald SPRT monitor — the streaming twin of
    * [[graft.ops.EventOps.sprtMonitor]] (q317), which is sequential
    * BY NATURE: the decision walk consumes trials in arrival order
    * via per-arm keyed state (n, k, decided flag + crossing index),
    * emitting the walk position after every micro-batch. Once a
    * boundary is crossed the decision LATCHES (the SPRT contract —
    * later reversals don't count). Matches the batch monitor
    * exactly when trials arrive in event order (StreamingSpec).
    * State per arm: four longs.
    */
  def sprtStream(spark: SparkSession, trials: Dataset[(Long, Long)],
      wPosMicro: Long = 200671L, wNegMicro: Long = -50010L,
      boundMicro: Long = 2944439L): DataFrame = {
    import spark.implicits._
    // state: (n, k, crossIdx, decision 0=continue 1=h1 -1=h0)
    def update(arm: Long, rows: Iterator[(Long, Long)],
        st: GroupState[(Long, Long, Long, Int)])
        : Iterator[(Long, Long, Long, Double, Long, String)] = {
      var (n, k, cross, dec) = st.getOption.getOrElse((0L, 0L, 0L, 0))
      rows.foreach { case (_, y) =>
        n += 1; k += y
        if (dec == 0) {
          val llr = k * wPosMicro + (n - k) * wNegMicro
          if (llr >= boundMicro) { dec = 1; cross = n }
          else if (llr <= -boundMicro) { dec = -1; cross = n }
        }
      }
      st.update((n, k, cross, dec))
      val llr = (k * wPosMicro + (n - k) * wNegMicro).toDouble / 1e6
      Iterator((arm, n, k, llr, cross,
        if (dec == 1) "accept_h1"
        else if (dec == -1) "accept_h0" else "continue"))
    }
    trials.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(update)
      .toDF("arm", "n_trials", "n_conv", "llr_final", "cross_idx",
        "decision")
  }

  /** Streaming twin of [[graft.ops.BloomOps.bloomAntiJoin]] — the
    * INCREMENTAL cross-crawl dedup (q377's production shape): crawl
    * shards land as micro-batches (e.g. the q378 landing-directory
    * source) and every document whose key is already in the prior
    * crawl OR an earlier accepted batch drops; survivors go to the
    * caller's `accept` sink and their keys append to a durable
    * parquet key store (batch_id-partitioned, the IndexStore
    * discipline).
    *
    * The reference bloom is UNION-maintained across batches: blooms
    * of identical geometry are bitwise unions (`mergeInPlace`), so
    * each batch pays only its OWN keys' build — never a rebuild of
    * the full reference. That is why `expectedItems` is REQUIRED
    * here: geometry must be fixed up front for merges to be legal.
    * Size it for the LIFETIME key count; overflow past it only
    * raises fpp (more verify traffic), never correctness — exact
    * verification of probable hits reads the key STORE, so a bloom
    * false positive cannot drop a fresh document, and false negatives
    * remain impossible.
    *
    * Retry-safe (at-least-once foreachBatch): the verifying anti join
    * reads only `batch_id < current`, so keys a failed attempt of the
    * SAME batch already appended cannot turn its own documents into
    * "duplicates"; the bloom is an over-approximation by construction
    * (retried merges are idempotent unions). Per-batch equality with
    * the batch operator — survivors(i) == bloomAntiJoin(batch_i,
    * ref_0 ∪ accepted keys < i) — is pinned by StreamingSpec.
    *
    * RESTART contract: a fresh call on an EXISTING store resumes it —
    * `refKeys` is ignored (assumed already folded in) and the bloom
    * rebuilds from the whole store. Store batch ids are EPOCHED: each
    * call starts at `max(stored batch_id) + 1`, so a resumed run's
    * batch 0 still sees every prior run's keys as priors (without the
    * epoch, Spark's restarting batch numbering would exclude them and
    * resurface duplicates), while the current batch's own failed-
    * attempt keys stay excluded. Residual hazard, by design: a batch
    * that crashed BETWEEN its key-append and the `accept` sink is, on
    * the next run, a new epoch — its orphaned keys count as priors
    * and its rows drop on re-ingest. Exactly-once across crashes
    * needs a transactional pairing of sink and key store; for this
    * operator, either make `accept` idempotent-and-first or treat a
    * crashed batch's rows as consumed.
    *
    * The batch frame is persisted across the split's two branches
    * (the split recomputes its input otherwise — satisfying the
    * deterministic-corpus contract of the batch operator even over
    * non-replayable sources) and unpersisted after the sink returns.
    */
  def crossCrawlDedupStream(stream: DataFrame, keyCol: String,
      refKeys: DataFrame, refKeyCol: String, keyStore: String,
      expectedItems: Long, fpp: Double = 0.01,
      checkpointDir: Option[String] = None)(
      accept: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(expectedItems > 0,
      "crossCrawlDedupStream needs an explicit expectedItems: the " +
        "bloom geometry must be fixed up front for cross-batch " +
        "mergeInPlace unions to be legal")
    val spark = stream.sparkSession
    graft.functions.GraftFunctions.register(spark)
    val storePath = new org.apache.hadoop.fs.Path(keyStore)
    val fs = storePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(storePath)) {
      // fresh pipeline: seed the store with the prior-crawl keys as
      // batch -1. An EXISTING store is resumed as-is (restart case) —
      // refKeys are assumed already folded in.
      refKeys.select(col(refKeyCol).as("k")).na.drop().distinct()
        .withColumn("batch_id", lit(-1L))
        .write.partitionBy("batch_id").parquet(keyStore)
    }
    val bloom = graft.ops.BloomOps.buildBloom(
      spark.read.parquet(keyStore).select("k"), "k",
      expectedItems = expectedItems, fpp = fpp)
    // epoch base: this call's batches number from max(stored)+1, so a
    // resumed run's `< base + batchId` read still includes every
    // prior run's keys (seed is -1 → a fresh store starts at 0)
    val base: Long = spark.read.parquet(keyStore)
      .agg(max(col("batch_id").cast("long"))).head().getLong(0) + 1L
    val writer = stream.writeStream.foreachBatch {
      (batch: DataFrame, batchId0: Long) =>
        val batchId = base + batchId0
        val ss = batch.sparkSession
        val ref = ss.read.parquet(keyStore)
          .filter(col("batch_id") < lit(batchId))
          .select(col("k").as("_graft_bk"))
        // Probe an IMMUTABLE per-batch snapshot, never the long-lived
        // mutable filter: on the ≥4 MB broadcast path in local mode,
        // Broadcast.value aliases the driver's object, so a probe
        // bound to `bloom` itself could be re-evaluated under a
        // POST-merge state if the persisted split frames recompute
        // (block eviction, or actions inside the caller's `accept`) —
        // current-batch keys would then probe positive in `clean` and
        // vanish from the split. Serialize ONCE per batch
        // (driver-side, off the row path): the literal path embeds
        // the bytes as-is, the broadcast path deserializes a private
        // copy; the merge below mutates only the long-lived filter.
        val snapshotBytes = {
          val bos = new java.io.ByteArrayOutputStream()
          bloom.writeTo(bos)
          bos.toByteArray
        }
        val mightHit =
          graft.ops.BloomOps.probeColumnBytes(ss, snapshotBytes, col(keyCol))
        val b = batch.persist()
        try {
          val clean = b.filter(col(keyCol).isNull || !mightHit)
          val verified = b.filter(mightHit)
            .join(ref, col(keyCol) === col("_graft_bk"), "left_anti")
          val survivors = clean.unionByName(verified).persist()
          try {
            val newKeys = survivors.select(col(keyCol).as("k"))
              .na.drop().distinct()
              .withColumn("batch_id", lit(batchId))
            newKeys.write.mode("append").partitionBy("batch_id")
              .parquet(keyStore)
            bloom.mergeInPlace(graft.ops.BloomOps.buildBloom(
              newKeys.select("k"), "k",
              expectedItems = expectedItems, fpp = fpp))
            accept(survivors, batchId)
          } finally survivors.unpersist(false)
        } finally b.unpersist(false)
    }
    checkpointDir.foreach(writer.option("checkpointLocation", _))
    writer.start()
  }
}
