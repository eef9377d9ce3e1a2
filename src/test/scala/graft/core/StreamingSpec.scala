package graft.core

import java.sql.Timestamp

import graft.streaming.StreamOps
import graft.streaming.StreamOps.{Event, SessionOut}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Structured Streaming semantics checks via MemoryStream: the
  * streaming operators must agree with their batch twins on the same
  * data (the batch twins are DuckDB-oracle-verified as q25/q26).
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long): Timestamp = new Timestamp(s * 1000L)

  test("windowed counts agree with the batch time-bucket aggregation") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String, Double)]
    val events = input.toDF().toDF("user_id", "ts", "event_type", "value")

    val q = StreamOps.windowedCounts(events, windowSeconds = 300)
      .writeStream.format("memory").queryName("win_counts")
      .outputMode("append").start()
    val rows = Seq(
      (1L, ts(10), "click", 1.0), (1L, ts(200), "click", 2.0),
      (2L, ts(400), "view", 3.0), (1L, ts(650), "click", 4.0),
      // late-but-in-watermark row, then an advancing row to close windows
      (2L, ts(20), "view", 5.0), (1L, ts(5000), "click", 0.0))
    input.addData(rows: _*)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("win_counts")
      .select(col("bucket_start").cast("long").as("bucket_s"), col("event_type"),
        col("n"), col("sum_value"))
    val batch = rows.toDF("user_id", "ts", "event_type", "value")
      .groupBy((floor(col("ts").cast("double") / 300) * 300).cast("long").as("bucket_s"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      // the stream's append mode only emits windows closed by the watermark
      .filter(col("bucket_s") < 5000 - 600)
    assert(streamed.count() > 0)
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
  }

  test("streaming dedup keeps one row per content key, matching batch exact-dedup groups") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val docs = input.toDF().toDF("doc_id", "ts", "text_hash")

    val q = StreamOps.dedupStream(docs, "text_hash", "ts")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    val rows = Seq(
      (1L, ts(10), "h_a"), (2L, ts(20), "h_b"),
      (3L, ts(30), "h_a"), // duplicate within the watermark → dropped
      (4L, ts(40), "h_c"), (5L, ts(50), "h_b"))
    input.addData(rows: _*)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("dedup_out")
    // exactly one survivor per distinct key, same key set as batch dedup
    assert(streamed.count() == 3)
    val streamKeys = streamed.select("text_hash").as[String].collect().toSet
    val batchKeys = rows.toDF("doc_id", "ts", "text_hash")
      .select("text_hash").distinct().as[String].collect().toSet
    assert(streamKeys == batchKeys)
    // first arrival wins within a micro-batch
    val survivors = streamed.select("doc_id").as[Long].collect().toSet
    assert(survivors == Set(1L, 2L, 4L))
  }

  test("streaming domain quota: per-domain cap holds across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamOps.UrlDoc]
    val q = StreamOps.domainQuota(spark, input.toDS(), n = 2)
      .writeStream.format("memory").queryName("quota_out")
      .outputMode("append").start()
    // batch 1: x.com gets 2 of 3, y.org 1 of 1
    input.addData(
      StreamOps.UrlDoc(3L, "https://a.x.com/1"),
      StreamOps.UrlDoc(1L, "https://b.x.com/2"),
      StreamOps.UrlDoc(2L, "https://c.x.com/3"),
      StreamOps.UrlDoc(4L, "https://y.org/1"))
    q.processAllAvailable()
    // batch 2: x.com is EXHAUSTED (state carried), y.org admits 1 more
    input.addData(
      StreamOps.UrlDoc(5L, "https://d.x.com/4"),
      StreamOps.UrlDoc(6L, "https://y.org/2"),
      StreamOps.UrlDoc(7L, "https://y.org/3"))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("quota_out")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // in-batch admission is doc_id-ordered: 1,2 beat 3
    assert(out == Map(1L -> "x.com", 2L -> "x.com", 4L -> "y.org",
      6L -> "y.org"), out.toString)
  }

  test("stream-static blocklist filter drops exactly the blocklisted keys") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "fp")
    val blocklist = Seq("bad1", "bad2", "unused").toDF("blocked_fp")

    val q = StreamOps.blocklistFilter(docs, "fp", blocklist, "blocked_fp")
      .writeStream.format("memory").queryName("blocked_out")
      .outputMode("append").start()
    val rows = Seq((1L, "ok1"), (2L, "bad1"), (3L, "ok2"),
      (4L, "bad2"), (5L, "bad1"), (6L, "ok3"))
    input.addData(rows: _*)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("blocked_out").select("doc_id").as[Long].collect().toSet
    // batch twin: plain left_anti
    val batch = rows.toDF("doc_id", "fp")
      .join(blocklist, col("fp") === col("blocked_fp"), "left_anti")
      .select("doc_id").as[Long].collect().toSet
    assert(streamed == batch && streamed == Set(1L, 3L, 6L))
  }

  test("streaming curation filter keeps exactly the batch pipeline's stateless survivors") {
    implicit val sqlCtx = spark.sqlContext
    val uniq = (1 to 40).map(i => s"tok$i").mkString(" ")
    val rows = Seq(
      (1L, s"the $uniq"),                       // survives
      (2L, Seq.fill(50)("x").mkString(" ")),    // no en markers
      (3L, "the quick brown fox"),              // too short
      (4L, "the " + Seq.fill(30)("ab cd").mkString(" ")))  // repetitive
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val q = StreamOps.curationFilter(docs, "doc_id", "text")
      .writeStream.format("memory").queryName("curated")
      .outputMode("append").start()
    input.addData(rows: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("curated")
    assert(streamed.columns.toSet == Set("doc_id", "text", "fp"))
    val streamIds = streamed.select("doc_id").as[Long].collect().toSet
    // the batch pipeline's pass_rep flag covers the same stateless stages
    val batchIds = graft.ops.CurationPipeline
      .signals(rows.toDF("doc_id", "text"),
        spark.emptyDataFrame.select(lit(0L).as("doc_id"), lit("").as("text")),
        "doc_id", "text")
      .filter(col("pass_rep")).select("id").as[Long].collect().toSet
    assert(streamIds == batchIds && streamIds == Set(1L), s"$streamIds vs $batchIds")
  }

  test("streaming near-dup filter drops exactly the band-colliding docs (bloom, stateless)") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (101L, "one two three four five six seven eight nine ten")).toDF("doc_id", "text")
    val index = graft.ops.DedupOps.minHashBandIndex(corpus, "doc_id", "text")
    val streamRows = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"), // exact dup
      (2L, "one two three four five six seven eight nine TEN-X"),       // near dup
      (3L, "completely different novel content with many fresh tokens here"),
      (4L, "tiny")) // < shingleN tokens: no signature, must pass
    val input = MemoryStream[(Long, String)]
    val q = StreamOps.nearDupFilterStream(input.toDF().toDF("doc_id", "text"),
        "doc_id", "text", index)
      .writeStream.format("memory").queryName("neardup").outputMode("append").start()
    input.addData(streamRows: _*)
    q.processAllAvailable(); q.stop()
    val kept = spark.table("neardup").select("doc_id").as[Long].collect().toSet
    assert(spark.table("neardup").columns.toSet == Set("doc_id", "text"))
    // batch expectation: the SAME band-key derivation joined (exactly,
    // no bloom) against the index — the stream must agree, i.e. the
    // bloom added no false positives at this fpp/scale
    val collide = graft.ops.DedupOps
      .minHashBandIndex(streamRows.toDF("doc_id", "text"), "doc_id", "text")
      .join(index.select("band_key"), Seq("band_key"), "left_semi")
      .select("id").distinct().as[Long].collect().toSet
    val expected = streamRows.map(_._1).toSet -- collide
    assert(kept == expected, s"$kept vs $expected")
    assert(!kept.contains(1L), "an exact duplicate must always be dropped")
    assert(kept.contains(3L) && kept.contains(4L))
  }

  test("graft_minhash_row is bit-identical to the graft_minhash_sig aggregate") {
    implicit val sqlCtx = spark.sqlContext
    graft.functions.GraftFunctions.register(spark)
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six seven eight"),
      (3L, "a b c a b c a b c")).toDF("doc_id", "text") // repeated shingles
    val agg = graft.ops.DedupOps
      .wordShingles(docs, "doc_id", "text", 3)
      .groupBy("id")
      .agg(call_function("graft_minhash_sig", col("shingle"), lit(16)).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    val w = col("_w")
    val grams = when(size(w) >= 3,
      transform(sequence(lit(1), size(w) - 2),
        i => concat_ws(" ", element_at(w, i), element_at(w, i + 1), element_at(w, i + 2)))
    ).otherwise(array())
    val row = docs
      .withColumn("_w", split(lower(col("text")), graft.ops.TextOps.Ws))
      .withColumn("_g", explode(array(array_distinct(grams))))
      .select(col("doc_id"),
        call_function("graft_minhash_row", col("_g"), lit(16)).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(row == agg, s"$row vs $agg")
  }

  test("streaming snapshot diff matches batch snapshotDiff minus removed") {
    implicit val sqlCtx = spark.sqlContext
    val prevRows = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"),
      (4L, null.asInstanceOf[String]), (9L, "will-be-removed"))
    val curRows = Seq(
      (1L, "alpha"),                      // unchanged
      (2L, "beta v2"),                    // changed
      (4L, null.asInstanceOf[String]),    // unchanged (null <=> null)
      (5L, "new doc"),                    // added
      (3L, null.asInstanceOf[String]))    // changed (text -> null)
    val prev = prevRows.toDF("doc_id", "text")

    val input = MemoryStream[(Long, String)]
    val q = StreamOps.snapshotDiffStream(
        input.toDF().toDF("doc_id", "text"), prev, "doc_id", "text")
      .writeStream.format("memory").queryName("snapdiff")
      .outputMode("append").start()
    // two micro-batches: classification is per-arrival, not end-of-batch
    input.addData(curRows.take(2): _*)
    q.processAllAvailable()
    val afterFirst = spark.table("snapdiff").count()
    input.addData(curRows.drop(2): _*)
    q.processAllAvailable()
    q.stop()
    assert(afterFirst == 2, s"first micro-batch emitted $afterFirst rows")

    val streamed = spark.table("snapdiff")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val batch = graft.ops.SnapshotOps
      .snapshotDiff(curRows.toDF("doc_id", "text"), prev, "doc_id", "text",
        statusFilter = col("status") =!= "removed")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(streamed == batch, s"$streamed vs $batch")
    assert(streamed == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "changed", 4L -> "unchanged", 5L -> "added"))
    // the batch op still owns end-of-epoch "removed" reconciliation
    val removed = graft.ops.SnapshotOps
      .snapshotDiff(curRows.toDF("doc_id", "text"), prev, "doc_id", "text",
        statusFilter = col("status") === "removed")
      .collect().map(_.getLong(0)).toSet
    assert(removed == Set(9L))
  }

  test("stateful sessionizer agrees with the batch gap sessionization") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = StreamOps.sessionize(spark, input.toDS(), gapSeconds = 1800.0)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("update").start()
    // user 1: 3 sessions (gaps of 2h); user 2: 1 session
    input.addData(
      Event(1L, ts(0), 1.0), Event(1L, ts(600), 1.0),
      Event(1L, ts(600 + 7200), 1.0), Event(1L, ts(600 + 14400), 1.0),
      Event(2L, ts(100), 1.0), Event(2L, ts(200), 1.0))
    q.processAllAvailable()
    q.stop()

    val last = spark.table("sessions").as[SessionOut].collect()
      .groupBy(_.user_id).map { case (u, rows) => u -> rows.map(_.n_sessions).max }
    assert(last(1L) == 3L, s"user 1: $last")
    assert(last(2L) == 1L, s"user 2: $last")
  }

  test("stateful streaming funnel agrees with the batch funnel on in-order arrival") {
    implicit val sqlCtx = spark.sqlContext
    import StreamOps.{StepEvent, FunnelOut}
    val input = MemoryStream[StepEvent]
    val q = StreamOps.funnelStream(spark, input.toDS(),
        Seq("signup", "view", "purchase"), windowDays = 7)
      .writeStream.format("memory").queryName("funnel")
      .outputMode("update").start()
    def t(days: Double) = ts((days * 86400).toLong)
    // batch-spec hand cases (EventAnalyticsSpec), split across
    // micro-batches so state round-trips:
    input.addData(
      StepEvent(1L, t(0), "signup"), StepEvent(1L, t(1), "view"),
      StepEvent(2L, t(0), "view"),   // pre-signup view: ignored
      StepEvent(3L, t(0), "signup"), StepEvent(3L, t(1), "view"))
    q.processAllAvailable()
    input.addData(
      StepEvent(1L, t(2), "purchase"),          // u1 -> depth 3
      StepEvent(2L, t(1), "signup"),            // u2 -> depth 1
      StepEvent(3L, t(19), "purchase"),         // outside window -> stays 2
      StepEvent(4L, t(0), "view"))              // never signs up -> 0
    q.processAllAvailable()
    q.stop()
    val depth = spark.table("funnel").as[FunnelOut].collect()
      .groupBy(_.user_id).map { case (u, rows) => u -> rows.map(_.depth).max }
    assert(depth(1L) == 3, s"u1: $depth")
    assert(depth(2L) == 1, s"u2: $depth")
    assert(depth(3L) == 2, s"u3: $depth")
    assert(depth(4L) == 0, s"u4: $depth")
  }

  test("streaming heavy hitters accumulate across micro-batches") {
    // complete-mode streaming aggregation with the native Misra-Gries
    // aggregate: the second batch forces the state store to round-trip
    // (serialize/deserialize/merge) the custom buffer between batches
    implicit val sqlCtx = spark.sqlContext
    graft.functions.GraftFunctions.register(spark)
    val input = MemoryStream[String]
    val q = input.toDF().toDF("tok")
      .agg(call_function("graft_topk_freq", col("tok"), lit(4)).as("tops"))
      .writeStream.format("memory").queryName("hh_stream")
      .outputMode("complete").start()
    input.addData("a", "b", "a", "c")
    q.processAllAvailable()
    input.addData("a", "d", "d", "a")
    q.processAllAvailable()
    q.stop()
    val out = spark.table("hh_stream")
      .select(explode(col("tops")).as("t"))
      .select(col("t.tok"), col("t.est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 4 distinct tokens = capacity -> exact cumulative counts
    assert(out == Map("a" -> 4L, "b" -> 1L, "c" -> 1L, "d" -> 2L))
  }

  test("streaming phrase-blocklist tag matches the batch tag (pure projection)") {
    // The Aho-Corasick tag is a zero-shuffle projection, so it runs
    // unchanged on a stream in append mode — the automaton builds once
    // per executor and serves every micro-batch.
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val rows = Seq(
      (1L, "CLICK HERE and click here to Buy Now"),
      (2L, "nothing to see"),
      (3L, "subscribe now, free shipping, buy now"))
    val q = graft.ops.BlocklistOps.tag(
        input.toDF().toDF("doc_id", "text"), "doc_id", "text")
      .writeStream.format("memory").queryName("bl_tag_stream")
      .outputMode("append").start()
    input.addData(rows.take(2): _*)
    q.processAllAvailable()
    input.addData(rows.drop(2): _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("bl_tag_stream").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2), r.getInt(3)))).toMap
    val batch = graft.ops.BlocklistOps.tag(
        rows.toDF("doc_id", "text"), "doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2), r.getInt(3)))).toMap
    assert(streamed === batch)
    assert(streamed(3L) === ((3L, 3, 1)))
  }

  test("streaming drift monitor: per-batch typeDrift over cumulative state matches batch") {
    // The drift monitor's input is the (bucket, type) count table —
    // a standard cumulative streaming aggregation; each micro-batch
    // recomputes consecutive-pair JSD over the complete counts via
    // foreachBatch. Late events update their bucket and the next
    // tick's drift reflects them (no watermark: monitors want
    // corrections, not finality).
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val q = input.toDF().toDF("ts", "event_type")
      .writeStream
      .format("memory").queryName("drift_counts_raw").outputMode("append")
      .start()
    val rows1 = Seq(ts(10) -> "a", ts(20) -> "a", ts(30) -> "b",
      ts(110) -> "a", ts(120) -> "b", ts(130) -> "b")
    input.addData(rows1: _*)
    q.processAllAvailable()
    // tick 1: drift over what has arrived so far
    val t1 = graft.ops.EventOps.typeDrift(
      spark.table("drift_counts_raw"), "ts", "event_type", 100).collect()
    // tick 2: a late event lands in bucket 0 and shifts its mix
    input.addData(ts(40) -> "b")
    q.processAllAvailable()
    val t2 = graft.ops.EventOps.typeDrift(
      spark.table("drift_counts_raw"), "ts", "event_type", 100).collect()
    q.stop()
    val batch1 = graft.ops.EventOps.typeDrift(
      rows1.toDF("ts", "event_type"), "ts", "event_type", 100).collect()
    val batch2 = graft.ops.EventOps.typeDrift(
      (rows1 :+ (ts(40) -> "b")).toDF("ts", "event_type"),
      "ts", "event_type", 100).collect()
    assert(t1.map(_.toString).sorted.toSeq === batch1.map(_.toString).sorted.toSeq)
    assert(t2.map(_.toString).sorted.toSeq === batch2.map(_.toString).sorted.toSeq)
    // the late 'b' moved bucket 0 toward bucket 1's mix: drift shrinks
    assert(t2.head.getDouble(5) < t1.head.getDouble(5),
      s"late correction must reduce drift: ${t1.head} -> ${t2.head}")
  }

  test("streaming KN scoring via foreachBatch reuses the static model across batches") {
    // Train-batch / score-stream: each micro-batch scores against the
    // SAME reference model — LmOps' one-slot session cache makes the
    // per-batch model recomputation a cache hit (identical canonical
    // plan), so the reference corpus is scanned once, not once per
    // micro-batch.
    implicit val sqlCtx = spark.sqlContext
    val ref = Seq((1L, "the cat sat on the mat"),
      (2L, "the dog sat on the rug")).toDF("id", "text")
    val input = MemoryStream[(Long, String)]
    val acc = scala.collection.mutable.Map[Long, (Long, Long)]()
    val q = input.toDF().toDF("id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.ops.LmOps.score(batch, ref, "id", "text").collect()
          .foreach(r => acc.synchronized {
            acc(r.getLong(0)) = (r.getLong(1), r.getLong(2))
          })
      }.start()
    input.addData((10L, "the cat sat"))
    q.processAllAvailable()
    input.addData((11L, "zebra quark flux"))
    q.processAllAvailable()
    q.stop()
    assert(acc(10L) === ((2L, 0L)))   // all bigrams seen in ref
    assert(acc(11L) === ((2L, 2L)))   // all unseen
  }

  test("streaming DSIR scores are bit-identical to the batch importance weights") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq(
      (1L, "alpha alpha alpha"), (2L, "alpha beta"),
      (3L, "beta beta beta beta"), (4L, "gamma alpha beta"))
    val docs = corpus.toDF("doc_id", "text")
    val model = graft.ops.DsirOps.fitRatioModel(docs, "text", col("doc_id") === 1)
    val batch = graft.ops.DsirOps
      .importanceWeights(docs, "doc_id", "text", col("doc_id") === 1)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap

    val input = MemoryStream[(Long, String)]
    val q = StreamOps.dsirScoreStream(
        input.toDF().toDF("doc_id", "text"), "doc_id", "text", model)
      .writeStream.format("memory").queryName("dsir_scores")
      .outputMode("append").start()
    input.addData(corpus: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("dsir_scores")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(streamed == batch)
  }

  test("streaming PSI per closed window equals the batch psiDrift on the same halves") {
    implicit val sqlCtx = spark.sqlContext
    // reference half: ts 0..90; current half: ts 700..790 (one 300 s
    // window [600,900)); combined midpoint 395 splits them exactly
    val refRows = (0 until 10).map(i => (i.toLong, ts(i * 10), i.toDouble))
    val curRows = (0 until 10).map(i =>
      (100L + i, ts(700 + i * 10), 100.0 + i))
    val toDf = (rows: Seq[(Long, Timestamp, Double)]) =>
      rows.toDF("event_id", "ts", "value")
    val ref = graft.ops.EventOps.fitPsiRef(toDf(refRows), "value")
    val batch = graft.ops.EventOps
      .psiDrift(toDf(refRows ++ curRows), "ts", "value")
      .collect()(0)

    val input = MemoryStream[(Long, Timestamp, Double)]
    val q = StreamOps.psiDriftStream(
        input.toDF().toDF("event_id", "ts", "value"), "ts", "value",
        ref, windowSeconds = 300)
      .writeStream.format("memory").queryName("psi_windows")
      .outputMode("append").start()
    // watermark-advancing row closes the [600,900) window
    input.addData(curRows :+ (999L, ts(5000), 0.0): _*)
    q.processAllAvailable()
    q.stop()
    val win = spark.table("psi_windows")
      .where(col("window_start").cast("long") === 600L).collect()
    assert(win.length == 1)
    assert(win(0).getLong(1) == 10L)                  // n_cur
    assert(win(0).getDouble(2) == batch.getDouble(2)) // psi, bit-equal
    assert(win(0).getDouble(2) > 0.5)                 // and it IS a drift
  }

  test("streaming chi2 drift: closed-window GOF matches the hand value") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    // baseline 50/50; window [0,300) sees a 8/2 split:
    // chi2 = (8-5)^2/5 + (2-5)^2/5 = 3.6
    val q = StreamOps.chi2DriftStream(
        input.toDF().toDF("event_id", "ts", "cat"), "ts", "cat",
        ref = Seq("a" -> 50L, "b" -> 50L), windowSeconds = 300)
      .writeStream.format("memory").queryName("chi2_windows")
      .outputMode("append").start()
    val rows = (0 until 8).map(i => (i.toLong, ts(i * 10), "a")) ++
      Seq((8L, ts(80), "b"), (9L, ts(90), "b"),
        (99L, ts(100000), "a")) // watermark-advancing closer
    input.addData(rows: _*)
    q.processAllAvailable()
    q.stop()
    val win = spark.table("chi2_windows")
      .where(col("window_start").cast("long") === 0L).collect()
    assert(win.length == 1)
    assert(win(0).getLong(1) == 10L)
    assert(win(0).getDouble(2) == 3.6)
  }

  test("streaming attribution: a touch in batch 1 credits a purchase in batch 2") {
    implicit val sqlCtx = spark.sqlContext
    import StreamOps.TouchEvent
    val input = MemoryStream[TouchEvent]
    val q = StreamOps.attributionStream(spark, input.toDS(),
        convType = "purchase", touchType = "click", windowSec = 86400L)
      .writeStream.format("memory").queryName("attr_out")
      .outputMode("update").start()
    // batch 1: user 1 clicks; user 2 purchases with no touch
    input.addData(
      TouchEvent(1L, ts(100), "click", 1L),
      TouchEvent(2L, ts(150), "purchase", 2L))
    q.processAllAvailable()
    // batch 2: user 1 purchases (cross-batch credit, lat 50s);
    // user 1 purchases again far outside the window
    input.addData(
      TouchEvent(1L, ts(150), "purchase", 3L),
      TouchEvent(1L, ts(100 + 90000), "purchase", 4L))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("attr_out")
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(2), r.getLong(3)))).toMap
    assert(got(2L) == ((false, -1L)))
    assert(got(3L) == ((true, 50000L)))
    assert(got(4L) == ((false, -1L)))
  }

  test("streaming DQ monitor: per-window violation counts match the batch trend") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double, String)]
    val events = input.toDF().toDF("user_id", "ts", "value", "event_type")
    val checks = Seq(
      "value_over_100" -> (col("value") > 100.0),
      "unknown_type" -> !col("event_type").isin("view", "click"))
    val q = StreamOps.expectationMonitorStream(events, "ts", checks,
        windowSeconds = 300)
      .writeStream.format("memory").queryName("dq_out")
      .outputMode("append").start()
    input.addData(
      (1L, ts(10), 150.0, "view"), (2L, ts(20), 50.0, "bogus"),
      (3L, ts(30), 200.0, "click"), (4L, ts(400), 10.0, "view"),
      (9L, ts(100000), 0.0, "view")) // close windows
    q.processAllAvailable()
    q.stop()
    val got = spark.table("dq_out").where(col("win_s") === 0L).collect()(0)
    assert(got.getLong(1) === 3L) // n_rows in [0, 300)
    assert(got.getLong(2) === 2L) // two value violations
    assert(got.getLong(3) === 1L) // one unknown type
  }

  test("streaming CDC apply converges to the batch compaction, out-of-order and cross-batch") {
    implicit val sqlCtx = spark.sqlContext
    import StreamOps.CdcRow
    val input = MemoryStream[CdcRow]
    val q = StreamOps.cdcApplyStream(spark, input.toDS())
      .writeStream.format("memory").queryName("cdc_out")
      .outputMode("update").start()
    // batch 1: k=1 I then U; k=2 I; an OUT-OF-ORDER stale row for k=2
    input.addData(
      CdcRow(1L, "I", 10.0, 100.0, 1L), CdcRow(1L, "U", 11.0, 200.0, 2L),
      CdcRow(2L, "I", 20.0, 150.0, 3L))
    q.processAllAvailable()
    // batch 2: stale U for k=2 (t older than state) must NOT win;
    // k=1 deleted; same-t tie for k=3 resolved by id
    input.addData(
      CdcRow(2L, "U", 99.0, 120.0, 4L), CdcRow(1L, "D", 0.0, 300.0, 5L),
      CdcRow(3L, "I", 1.0, 50.0, 6L), CdcRow(3L, "U", 2.0, 50.0, 7L))
    q.processAllAvailable()
    q.stop()
    // latest emission per key = final state
    val out = spark.table("cdc_out")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("k").orderBy(col("last_t").desc, col("last_op"))
    val last = out.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getString(3), r.getBoolean(4))).toMap
    assert(last(1L) === ((0.0, "D", true)))
    assert(last(2L) === ((20.0, "I", false))) // stale update rejected
    assert(last(3L) === ((2.0, "U", false))) // id tie-break
    // batch twin agrees (minus tombstones, which batch drops)
    val rows = Seq((1L, "I", 10.0, 100.0, 1L), (1L, "U", 11.0, 200.0, 2L),
      (2L, "I", 20.0, 150.0, 3L), (2L, "U", 99.0, 120.0, 4L),
      (1L, "D", 0.0, 300.0, 5L), (3L, "I", 1.0, 50.0, 6L),
      (3L, "U", 2.0, 50.0, 7L)).toDF("k", "op", "value", "t", "id")
    val batch = graft.ops.SnapshotOps.cdcApply(rows, "k", "op", "value",
        "t", "id")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(batch === Map(2L -> 20.0, 3L -> 2.0))
  }

  test("native session_window sessions match the batch gap-sessionize on closed sessions") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val events = input.toDF().toDF("user_id", "ts", "value")

    val q = StreamOps.sessionWindowCounts(events, "user_id", "ts",
        gapSeconds = 1800)
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    val rows = Seq(
      // u1: two sessions (gap 3600 > 1800 between them)
      (1L, ts(100), 1.0), (1L, ts(700), 2.0), (1L, ts(5000), 3.0),
      // u2: one session
      (2L, ts(50), 4.0))
    input.addData(rows: _*)
    q.processAllAvailable()
    input.addData((9L, ts(100000), 0.0)) // advance watermark, close all
    q.processAllAvailable()
    q.stop()

    val got = spark.table("sess_out")
      .where(col("user_id") < 9)
      .collect().map(r => (r.getLong(2), r.getLong(0)) ->
        (r.getLong(3), r.getDouble(4))).toMap
    assert(got((1L, 100L)) === ((2L, 3.0)))
    assert(got((1L, 5000L)) === ((1L, 3.0)))
    assert(got((2L, 50L)) === ((1L, 4.0)))
    // batch twin: q25's sessionCounts sees the same session count
    val batch = graft.ops.EventOps.sessionCounts(
        rows.zipWithIndex.map { case ((u, t, v), i) => (u, t, v, i.toLong) }
          .toDF("user_id", "ts", "value", "event_id"), 1800.0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(batch(1L) === 2L && batch(2L) === 1L)
  }

  test("streaming OHLC bars match the batch op per closed window, across out-of-order micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Timestamp, Long, Double)]
    val events = input.toDF().toDF("series", "ts", "event_id", "value")

    val q = StreamOps.ohlcBarsStream(events, "series", "ts", "event_id", "value")
      .writeStream.format("memory").queryName("ohlc_out")
      .outputMode("append").start()
    // hour 0 rows arrive OUT of (t, id) order, split across batches;
    // the same-ts tie (ids 2, 3 at t=5) pins the struct tie-break
    val h0 = Seq(
      ("a", ts(3000), 9L, 5.0), ("a", ts(5), 3L, 30.0),
      ("a", ts(5), 2L, 20.0))
    val h0b = Seq(("a", ts(3599), 7L, 11.0))
    input.addData(h0: _*)
    q.processAllAvailable()
    input.addData(h0b: _*)
    q.processAllAvailable()
    // watermark-advancing row closes hour 0
    input.addData(("a", ts(10000), 99L, 1.0))
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("ohlc_out").where(col("h") === 0L)
      .select("h", "series", "open", "high", "low", "close", "volume", "n")
    val batch = graft.ops.TimeSeriesOps.ohlcBars(
        (h0 ++ h0b).toDF("series", "ts", "event_id", "value"),
        "series", "ts", "event_id", "value")
      .select(col("h"), col("series"), col("open"), col("high"), col("low"),
        col("close"), col("volume"), col("n"))
    assert(streamed.count() == 1)
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
    val r = streamed.collect()(0)
    assert(r.getDouble(2) == 20.0 && r.getDouble(5) == 11.0) // open id-tie, close
  }

  test("streaming passage-overlap filter drops near-verbatim docs, matches batch keeps") {
    implicit val sqlCtx = spark.sqlContext
    val page = "the quick brown fox jumps over the lazy dog near the riverbank every single morning without fail"
    val store = graft.ops.WinnowOps.fingerprintIndex(
      Seq((1L, page)).toDF("id", "text"), "id", "text")
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("id", "text")
    val q = StreamOps.passageOverlapFilterStream(docs, "id", "text", store)
      .writeStream.format("memory").queryName("passage_filter")
      .outputMode("append").start()
    val rows = Seq(
      (10L, page),  // verbatim dup of the indexed page -> dropped
      (11L, "entirely novel weather content about alpine snowfall patterns and winter storm accumulation records"),
      (12L, "tiny"), // sub-k, no fingerprints -> passes
      (13L, page + " with one extra clause")) // still mostly known -> dropped
    input.addData(rows: _*)
    q.processAllAvailable()
    q.stop()
    val kept = spark.table("passage_filter")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(11L, 12L), s"got $kept")
    // batch accountant agrees (bloom adds no FPs on this fixture)
    val batchKeep = graft.ops.WinnowOps.overlapAgainstIndex(
        rows.toDF("id", "text"), store, "id", "text")
      .where(col("keep") === 1).collect().map(_.getLong(0)).toSet
    assert(batchKeep == kept)
  }

  test("streaming IVF stats accumulate to the batch cellStats across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val centers = Seq(Seq(0.0, 0.0), Seq(10.0, 10.0))
    val input = MemoryStream[(Long, Seq[Double])]
    val vecs = input.toDF().toDF("vec_id", "embedding")
    val q = StreamOps.ivfStatsStream(vecs, "vec_id", "embedding", centers)
      .writeStream.format("memory").queryName("ivf_stats")
      .outputMode("complete").start()
    val batch1 = Seq((1L, Seq(0.0, 0.2)), (2L, Seq(10.0, 10.4)))
    val batch2 = Seq((3L, Seq(0.4, 0.0)), (4L, Seq(9.8, 10.0)),
      (5L, Seq(0.2, 0.2)))
    input.addData(batch1: _*)
    q.processAllAvailable()
    input.addData(batch2: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("ivf_stats")
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        ((r.getDecimal(2).toPlainString, r.getLong(3)))).toMap
    val batch = graft.ops.IvfIndexOps.cellStats(spark,
        (batch1 ++ batch2).toDF("vec_id", "embedding"),
        "vec_id", "embedding", centers)
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        ((r.getDecimal(2).toPlainString, r.getLong(3)))).toMap
    assert(streamed == batch,
      s"stream state must equal batch sufficient statistics:\n$streamed\nvs\n$batch")
    assert(streamed.keySet.map(_._1) == Set(0, 1), "both cells populated")
  }

  test("journeyPathStream: cross-batch path multiset equals the " +
      "batch extraction; sessions reset the tail") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[StreamOps.StepEvent]
    val q = StreamOps.journeyPathStream(spark, input.toDS(),
        gapSeconds = 1800.0, k = 3)
      .writeStream.format("memory").queryName("journeys")
      .outputMode("append").start()
    def se(u: Long, t: Long, ty: String) =
      StreamOps.StepEvent(u, ts(t), ty)
    // b1 ends mid-session for u1; b2 continues it (state carries the
    // tail across the batch boundary), then a 2h gap starts a new one
    val b1 = Seq(se(1, 100, "a"), se(1, 160, "b"),
      se(2, 100, "a"), se(2, 160, "b"), se(2, 220, "c"))
    val b2 = Seq(se(1, 220, "c"), se(1, 280, "d"),
      se(1, 9000, "a"), se(1, 9060, "b"), se(1, 9120, "c"))
    input.addData(b1: _*); q.processAllAvailable()
    input.addData(b2: _*); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("journeys").as[String]
      .collect().groupBy(identity).view.mapValues(_.length.toLong).toMap
    val all = (b1 ++ b2).zipWithIndex
      .map { case (e, i) => (e.user_id, i.toLong, e.event_type, e.ts) }
      .toDF("user_id", "event_id", "event_type", "ts")
    val batch = graft.ops.EventOps.frequentJourneys(all, "ts", "user_id",
        "event_type", "event_id", gapSeconds = 1800.0, k = 3,
        topN = 1000)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed === batch,
      s"stream paths must equal batch extraction:\n$streamed\nvs\n$batch")
    // the mid-batch session carry produced a>b>c and b>c>d for u1
    assert(streamed("a > b > c") === 3L && streamed("b > c > d") === 1L)
  }

  test("crossCrawlDedupStream: per-batch survivors equal the batch " +
      "bloomAntiJoin against the growing reference; keys accumulate") {
    implicit val sqlCtx = spark.sqlContext
    import scala.collection.mutable
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_crawl_dedup").toString
    val input = MemoryStream[(Long, String)]
    val ref0 = Seq("seen_a", "seen_b", "seen_c").toDF("k0")
    val got = mutable.Map[Long, Set[(Long, String)]]()
    val q = StreamOps.crossCrawlDedupStream(
      input.toDF().toDF("id", "url"), "url", ref0, "k0",
      s"$tmp/keys", expectedItems = 1000L) { (df, bid) =>
      got(bid) = df.select("id", "url").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
    }
    // batch 0: one prior-crawl dup, one internal pair (both kept — the
    // batch operator doesn't dedup within the corpus), one null key
    val b0 = Seq((1L, "seen_a"), (2L, "new_x"), (3L, "new_x"),
      (4L, null.asInstanceOf[String]))
    // batch 1: dups of batch 0's accepted keys must now drop
    val b1 = Seq((5L, "new_x"), (6L, "seen_b"), (7L, "new_y"))
    // batch 2: everything already seen
    val b2 = Seq((8L, "new_y"), (9L, "new_x"), (10L, "seen_c"))
    input.addData(b0: _*); q.processAllAvailable()
    input.addData(b1: _*); q.processAllAvailable()
    input.addData(b2: _*); q.processAllAvailable()
    q.stop()
    // replay each batch through the BATCH operator against the same
    // growing reference the stream maintained
    var refKeys = Seq("seen_a", "seen_b", "seen_c")
    Seq(b0, b1, b2).zipWithIndex.foreach { case (b, i) =>
      val expect = graft.ops.BloomOps.bloomAntiJoin(
          b.toDF("id", "url"), refKeys.toDF("rk"), "url", "rk")
        .collect().map(r => (r.getLong(0),
          if (r.isNullAt(1)) null else r.getString(1))).toSet
      assert(got(i.toLong) === expect, s"batch $i")
      refKeys = refKeys ++ expect.flatMap(t => Option(t._2))
    }
    assert(got(0L) === Set((2L, "new_x"), (3L, "new_x"),
      (4L, null: String)), "b0: internal pair kept, null survives")
    assert(got(1L) === Set((7L, "new_y")), "b1: accepted keys drop dups")
    assert(got(2L) === Set.empty, "b2: all seen")
    // the durable store holds exactly seed + accepted distinct keys
    val stored = spark.read.parquet(s"$tmp/keys")
      .select("k").as[String].collect().toSet
    assert(stored === Set("seen_a", "seen_b", "seen_c", "new_x", "new_y"))
  }

  test("crossCrawlDedupStream: a fresh call on an existing store " +
      "resumes it (bloom rebuilt from the store, refKeys ignored)") {
    implicit val sqlCtx = spark.sqlContext
    import scala.collection.mutable
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_crawl_resume").toString
    def runOnce(batch: Seq[(Long, String)], ref: Seq[String])
        : Set[(Long, String)] = {
      val input = MemoryStream[(Long, String)]
      val got = mutable.Set[(Long, String)]()
      val q = StreamOps.crossCrawlDedupStream(
        input.toDF().toDF("id", "url"), "url", ref.toDF("k0"), "k0",
        s"$tmp/keys", expectedItems = 1000L) { (df, _) =>
        got ++= df.select("id", "url").collect()
          .map(r => (r.getLong(0), r.getString(1)))
      }
      input.addData(batch: _*); q.processAllAvailable(); q.stop()
      got.toSet
    }
    val first = runOnce(Seq((1L, "a"), (2L, "b")), Seq("seed"))
    assert(first === Set((1L, "a"), (2L, "b")))
    // second RUN (new query, batch ids restart at 0): the store
    // already holds seed/a/b — a and b must now drop, and the
    // DIFFERENT refKeys passed here must be ignored (not folded in),
    // so "c" survives even though the second ref names it
    val second = runOnce(Seq((3L, "a"), (4L, "c"), (5L, "seed")),
      Seq("c"))
    assert(second === Set((4L, "c")),
      s"resume must dedup against the store, not re-seed: $second")
  }

  test("crossCrawlDedupStream: forced-high-fpp bloom stays exact " +
      "(verify branch absorbs the false positives); geometry guard") {
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_crawl_fpp").toString
    val input = MemoryStream[(Long, String)]
    var survivors = Set.empty[Long]
    val q = StreamOps.crossCrawlDedupStream(
      input.toDF().toDF("id", "url"), "url",
      Seq("d0").toDF("k0"), "k0", s"$tmp/keys",
      expectedItems = 64L, fpp = 0.5) { (df, _) =>
      survivors ++= df.select("id").as[Long].collect()
    }
    input.addData((0 until 200).map(i => (i.toLong, s"u$i")) :+
      (999L, "d0"): _*)
    q.processAllAvailable(); q.stop()
    assert(survivors === (0 until 200).map(_.toLong).toSet,
      "only the true duplicate drops at fpp=0.5")
    intercept[IllegalArgumentException] {
      StreamOps.crossCrawlDedupStream(
        input.toDF().toDF("id", "url"), "url",
        Seq("d0").toDF("k0"), "k0", s"$tmp/keys2",
        expectedItems = -1L) { (_, _) => () }
    }
  }

  test("streaming ingest -> durable CMS store: foreachBatch-appended " +
      "counter deltas serve the identical heavy-hitter audit") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val store = java.nio.file.Files
      .createTempDirectory("graft_stream_cms").toString + "/cms"
    val input = MemoryStream[Long]
    val q = input.toDF().toDF("k")
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.ops.IndexStore.appendCmsSketch(
          graft.ops.SketchOps.cmsSketch(df, "k", 64), store, w = 64)
      }
      .start()
    val b1 = (0L until 200L).map(_ % 9)
    val b2 = (0L until 150L).map(_ % 4)
    input.addData(b1: _*); q.processAllAvailable()
    input.addData(b2: _*); q.processAllAvailable()
    q.stop()
    val all = (b1 ++ b2).toDF("k")
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))
    val served = graft.ops.SketchOps.cmsHeavyHittersFromSketch(all,
        graft.ops.IndexStore.readCmsSketch(spark, store, expectW = 64),
        "k", 64, 5).collect().map(key).toMap
    val scratch = graft.ops.SketchOps.cmsHeavyHitters(all, "k", 64, 5)
      .collect().map(key).toMap
    assert(served == scratch,
      s"streamed store must serve the from-scratch audit:\n$served\nvs\n$scratch")
  }

  test("streaming ingest -> durable LSH band store: foreachBatch-appended " +
      "band rows serve pairs equal to the from-scratch pipeline") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val store = java.nio.file.Files
      .createTempDirectory("graft_stream_lsh").toString + "/bands"
    val input = MemoryStream[(Long, String)]
    // the crawl-loop ingest: each micro-batch's md5-MinHash band rows
    // append to the parquet store; serving never recomputes a batch
    val q = input.toDF().toDF("doc_id", "text")
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.ops.IndexStore.appendLshBands(
          graft.ops.DedupOps.minHashMd5Bands(df, "doc_id", "text"), store)
      }
      .start()
    val page = "the quick brown fox jumps over the lazy dog near the riverbank every single morning without fail"
    val b1 = Seq((1L, page), (2L, page + " and naps"))
    val b2 = Seq((3L, page), (4L, "completely different content about winter weather patterns across the northern mountain ranges today"))
    input.addData(b1: _*); q.processAllAvailable()
    input.addData(b2: _*); q.processAllAvailable()
    q.stop()
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getLong(1), r.getDouble(2))
    val served = graft.ops.IndexStore
      .serveLshPairs(spark.newSession(), store)
      .collect().map(key).toSet
    val scratch = graft.ops.DedupOps.lshBandPairs(
        graft.ops.DedupOps.minHashMd5Bands(
          (b1 ++ b2).toDF("doc_id", "text"), "doc_id", "text"),
        numHashes = 16, minEstJaccard = 0.5)
      .collect().map(key).toSet
    assert(served == scratch,
      s"streamed store must serve from-scratch pairs:\n$served\nvs\n$scratch")
    assert(served.exists { case (a, b, j) => a == 1L && b == 3L && j == 1.0 },
      "identical docs across batches must pair at est_jaccard 1.0")
  }

  test("streaming ingest -> durable KMV store: foreachBatch-appended batch " +
      "sketches re-derive the from-scratch sketch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val store = java.nio.file.Files
      .createTempDirectory("graft_stream_kmv").toString + "/kmv"
    val input = MemoryStream[(String, String)]
    val q = input.toDF().toDF("grp", "v")
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.ops.ProfileOps.kmvAppend(
          graft.ops.ProfileOps.kmvSketch(df, "grp", "v", k = 16), store,
          k = 16)
      }
      .start()
    val b1 = (0 until 300).map(i => ("g", s"v$i"))
    val b2 = (200 until 500).map(i => ("g", s"v$i")) // overlap on purpose
    input.addData(b1: _*); q.processAllAvailable()
    input.addData(b2: _*); q.processAllAvailable()
    q.stop()
    val stored = graft.ops.ProfileOps
      .kmvFromStore(spark.newSession(), store, k = 16)
      .collect().map(_.getString(1)).sorted
    val whole = graft.ops.ProfileOps.kmvSketch(
        (b1 ++ b2).toDF("grp", "v"), "grp", "v", k = 16)
      .collect().map(_.getString(1)).sorted
    assert(stored.sameElements(whole),
      "streamed sketch store must re-derive the from-scratch sketch")
  }

  test("streaming ingest -> durable IVF store: foreachBatch-appended deltas " +
      "merge-on-read to the from-scratch stats") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val centers = Seq(Seq(0.0, 0.0), Seq(10.0, 10.0))
    val store = java.nio.file.Files
      .createTempDirectory("graft_stream_store").toString + "/cells"
    val input = MemoryStream[(Long, Seq[Double])]
    // the production ingest loop: each micro-batch's sufficient
    // statistics append to the parquet store as one delta
    val q = input.toDF().toDF("vec_id", "embedding")
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.ops.IndexStore.appendIvfStats(
          graft.ops.IvfIndexOps.cellStats(spark, df, "vec_id",
            "embedding", centers), store, k = centers.length)
      }
      .start()
    val b1 = Seq((1L, Seq(0.0, 0.2)), (2L, Seq(10.0, 10.4)))
    val b2 = Seq((3L, Seq(0.4, 0.0)), (4L, Seq(9.8, 10.0)),
      (5L, Seq(0.2, 0.2)))
    input.addData(b1: _*); q.processAllAvailable()
    input.addData(b2: _*); q.processAllAvailable()
    q.stop()
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getInt(0), r.getInt(1)) ->
        ((r.getDecimal(2).toPlainString, r.getLong(3)))
    val stored = graft.ops.IndexStore.readIvfStats(spark.newSession(), store)
      .collect().map(key).toMap
    val scratch = graft.ops.IvfIndexOps.cellStats(spark,
        (b1 ++ b2).toDF("vec_id", "embedding"), "vec_id", "embedding",
        centers)
      .collect().map(key).toMap
    assert(stored == scratch,
      s"streamed store must equal from-scratch stats:\n$stored\nvs\n$scratch")
  }

  test("streaming CMS counters equal the batch sketch across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Long]
    val q = StreamOps.cmsSketchStream(input.toDF().toDF("k"), "k", 64)
      .writeStream.format("memory").queryName("cms_stream")
      .outputMode("complete").start()
    val b1 = (0L until 100L).map(_ % 13)
    val b2 = (0L until 60L).map(_ % 7)
    input.addData(b1: _*)
    q.processAllAvailable()
    input.addData(b2: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("cms_stream")
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val batch = graft.ops.SketchOps.cmsSketch(
        (b1 ++ b2).toDF("k"), "k", 64)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(streamed == batch)
  }

  test("streaming Markov counts + stationary finisher equal the batch chain") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(String, String)]
    val q = StreamOps.markovCountStream(
        input.toDF().toDF("f", "t"), "f", "t")
      .writeStream.format("memory").queryName("markov_stream")
      .outputMode("complete").start()
    val b1 = Seq(("A", "B"), ("A", "B"), ("B", "A"))
    val b2 = Seq(("A", "B"), ("B", "B"), ("B", "B"))
    input.addData(b1: _*); q.processAllAvailable()
    input.addData(b2: _*); q.processAllAvailable()
    q.stop()
    val streamed = graft.ops.EventOps.stationaryDistribution(
        spark.table("markov_stream"), "from_type", "to_type", "n",
        iters = 12)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch = graft.ops.EventOps.stationaryDistribution(
        (b1 ++ b2).toDF("f", "t").groupBy("f", "t")
          .agg(count(lit(1)).as("n")), "f", "t", "n", iters = 12)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed == batch)
  }

  test("streaming quantile histogram equals the batch delta across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Double]
    val q = StreamOps.quantHistStream(input.toDF().toDF("v"), "v", 250000L)
      .writeStream.format("memory").queryName("quant_stream")
      .outputMode("complete").start()
    val b1 = (1 to 80).map(_ * 0.37)
    val b2 = (1 to 50).map(i => -i * 1.13) // negatives bucket via floor
    input.addData(b1: _*)
    q.processAllAvailable()
    input.addData(b2: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("quant_stream")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = graft.ops.SketchOps.quantHistDelta(
        (b1 ++ b2).toDF("v"), "v", 250000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed == batch)
    assert(streamed.keys.exists(_ < 0), "negative buckets must exist")
  }

  test("streaming Brier cells finish to the exact batch Murphy decomposition") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Double, Int)]
    val q = StreamOps.brierCellsStream(
        input.toDF().toDF("score", "pos"), "score", "pos")
      .writeStream.format("memory").queryName("brier_cells")
      .outputMode("complete").start()
    val b1 = Seq((0.9, 1), (0.9, 0), (0.8, 1), (0.2, 0), (0.2, 0))
    val b2 = Seq((0.9, 1), (0.55, 1), (0.55, 0), (0.1, 0), (0.8, 1))
    input.addData(b1: _*); q.processAllAvailable()
    input.addData(b2: _*); q.processAllAvailable()
    q.stop()
    val streamed = graft.ops.ProfileOps
      .brierFromCells(spark.table("brier_cells")).collect().toSeq
    val batch = graft.ops.ProfileOps.brierDecomposition(
      (b1 ++ b2).toDF("score", "pos"), "score", "pos").collect().toSeq
    assert(streamed == batch,
      s"histogram finisher must equal batch:\n$streamed\nvs\n$batch")
  }

  test("streaming decile histogram finishes to the exact batch gains table") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Double, Int)]
    val q = StreamOps.decileHistStream(
        input.toDF().toDF("id", "score", "pos"), "score", "pos")
      .writeStream.format("memory").queryName("decile_hist")
      .outputMode("complete").start()
    // 23 rows, DISTINCT scores (no rank straddle): histogram deciles
    // == the batch (score desc, id asc) ntile exactly, including the
    // uneven first-(N mod 10) bucket sizes
    val rows = (1 to 23).map(i =>
      (i.toLong, i * 0.04 + (if (i % 3 == 0) 0.001 else 0.0),
        if (i % 4 == 0 || i > 18) 1 else 0))
    val (b1, b2) = rows.splitAt(11)
    input.addData(b1: _*); q.processAllAvailable()
    input.addData(b2: _*); q.processAllAvailable()
    q.stop()
    val streamed = graft.ops.ProfileOps
      .decileGainsFromHist(spark.table("decile_hist"))
      .orderBy("decile").collect().toSeq
    val batch = graft.ops.ProfileOps.decileGains(
        rows.toDF("id", "score", "pos"), "id", "score", "pos")
      .orderBy("decile").collect().toSeq
    assert(streamed == batch,
      s"histogram gains must equal batch ntile gains:\n$streamed\nvs\n$batch")
  }

  test("streaming SLA histogram finishes to the exact batch rank percentiles") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(String, Long)]
    val q = StreamOps.valueHistStream(
        input.toDF().toDF("prio", "days"), "prio", "days")
      .writeStream.format("memory").queryName("sla_hist")
      .outputMode("complete").start()
    val b1 = Seq(("HIGH", 3L), ("HIGH", 1L), ("HIGH", 7L), ("LOW", 2L),
      ("LOW", 2L), ("HIGH", 3L))
    val b2 = Seq(("HIGH", 9L), ("LOW", 11L), ("LOW", 5L), ("HIGH", 1L),
      ("LOW", 8L))
    input.addData(b1: _*); q.processAllAvailable()
    input.addData(b2: _*); q.processAllAvailable()
    q.stop()
    val streamed = graft.ops.ProfileOps.percentilesFromHist(
        spark.table("sla_hist"), "prio", Seq(50, 90, 99))
      .orderBy("prio").collect().toSeq
    // batch twin: q347's row-level rank-window type-1 order statistic
    val lat = (b1 ++ b2).toDF("prio", "days")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("prio").orderBy(col("days").asc)
    val ranked = lat.select(col("prio"), col("days"),
      row_number().over(w).as("rk"),
      count(lit(1)).over(org.apache.spark.sql.expressions.Window
        .partitionBy("prio")).as("n"))
    def pick(p: Int) = max(when(col("rk") ===
      ceil(col("n") * p / 100.0).cast("long"), col("days"))).as(s"p$p")
    val batch = ranked.groupBy("prio")
      .agg(max("n").as("n"), pick(50), pick(90), pick(99))
      .orderBy("prio").collect().toSeq
    assert(streamed == batch,
      s"histogram percentiles must equal rank-window batch:\n$streamed\nvs\n$batch")
  }

  test("streaming SPRT walk matches the batch monitor and latches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Long)]
    val q = StreamOps.sprtStream(spark, input.toDS())
      .writeStream.format("memory").queryName("sprt_stream")
      .outputMode("append").start()
    // arm 0: 20 straight successes -> crosses up at 15 (batch-pinned)
    input.addData((1 to 10).map(_ => (0L, 1L)): _*)
    q.processAllAvailable()
    input.addData((1 to 10).map(_ => (0L, 1L)): _*)
    q.processAllAvailable()
    // then failures: the h1 decision must LATCH, not revert
    input.addData((1 to 200).map(_ => (0L, 0L)): _*)
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("sprt_stream")
      .orderBy("n_trials").collect()
      .map(r => (r.getLong(1), r.getLong(4), r.getString(5)))
    assert(rows(0) == ((10L, 0L, "continue")))
    assert(rows(1) == ((20L, 15L, "accept_h1")))
    assert(rows(2) == ((220L, 15L, "accept_h1"))) // latched
  }

  test("streaming line-boilerplate filter equals the batch operator " +
      "when the frozen census IS the arriving corpus") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val rows = Seq(
      (1L, "a", "NAV\nu1\n\npromo"),
      (2L, "a", "NAV\nu2\npromo"),
      (3L, "a", "NAV\nu3"),
      (4L, "a", "NAV\nu4"),
      (5L, "a", " NAV  \nu5"),
      (6L, "b", "NAV\nu6"),   // group of 2: under minDocs, kept
      (7L, "b", "NAV\nu7"))
    val ref = rows.toDF("doc_id", "source", "text")
    val input = MemoryStream[(Long, String, String)]
    val q = StreamOps.lineBoilerplateFilterStream(
        input.toDF().toDF("doc_id", "source", "text"),
        "doc_id", "text", "source", ref, maxShare = 0.5, minDocs = 3)
      .writeStream.format("memory").queryName("lbp_stream")
      .outputMode("append").start()
    input.addData(rows: _*)
    q.processAllAvailable()
    // a group UNSEEN by the census passes through uncut
    input.addData((8L, "c", "NAV\nu8"))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("lbp_stream")
      .select("doc_id", "n_lines_removed", "text_clean")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2))))
      .toMap
    val batch = graft.ops.TextOps
      .lineBoilerplate(ref, "doc_id", "text", "source",
        maxShare = 0.5, minDocs = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2))))
      .toMap
    assert(batch.forall { case (id, v) => streamed.get(id).contains(v) },
      s"stream must equal batch on the census corpus:\n$streamed\nvs\n$batch")
    assert(streamed(8L) === ((0L, "NAV\nu8")), streamed(8L))
  }
}
