package graft.ops

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Runtime bloom pre-filtering for selective joins — the classic
  * 100 TB move: when a huge probe side joins a selective build side,
  * shuffling probe rows that cannot possibly match is pure waste. A
  * bloom filter of the build keys rides to every task (KBs–MBs) and
  * kills non-matching rows AT THE SCAN, before the join exchange;
  * the exact join that follows removes the bloom's false positives,
  * so the composed result is identical to the plain join.
  *
  * Spark's AQE injects such filters only for specific plan shapes;
  * this operator makes the technique explicit and composable. Sizing:
  * 1 M expected keys at 1 % fpp ≈ 1.2 MB of task payload — the
  * filter is built once on the driver (one tree-aggregated action
  * over the build side, the same job `stat.bloomFilter` would run)
  * and probed by a native codegen expression — as a plan literal
  * ([[graft.functions.BloomContains]]) while small, or through a
  * broadcast handle ([[graft.functions.BloomContainsRef]]) once the
  * serialized payload crosses [[BloomOps.BroadcastPayloadBytes]], so
  * a near-ceiling filter never bloats the plan / explain / UI.
  */
object BloomOps {

  /** 2²⁸ bits = 32 MB serialized — the filter lives on the driver and
    * rides to every task as a literal; past this, shard the build side
    * or raise fpp rather than silently shipping a multi-GB payload. */
  val MaxBloomBits: Long = 1L << 28

  /** Aggregate the build side's keys into a bloom filter (nulls
    * dropped — they can never equi-join). `expectedItems <= 0` sizes
    * from a count of the build side — and to keep that a SINGLE scan
    * of the reference plan, the keyed projection is cached across the
    * sizing count and the aggregate (unpersisted before return). At
    * scale, callers who know their cardinality (catalog stats, a
    * prior count) should pass `expectedItems` and skip the cache
    * entirely: the one-pass path touches the reference exactly once.
    */
  def buildBloom(df: DataFrame, key: String, expectedItems: Long = -1L,
      fpp: Double = 0.01): BloomFilter = {
    val keyed0 = df.select(col(key)).na.drop()
    val keyed = if (expectedItems > 0) keyed0
      else keyed0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val expected =
        if (expectedItems > 0) expectedItems else math.max(keyed.count(), 64L)
      val bits = BloomFilter.optimalNumOfBits(expected, fpp)
      require(bits <= MaxBloomBits,
        s"bloom for $expected keys at fpp=$fpp needs $bits bits " +
          s"(> $MaxBloomBits = 32 MB task payload): shard the build side " +
          "or raise fpp")
      def agg[T](ds: org.apache.spark.sql.Dataset[T])(put: (BloomFilter, T) => Unit): BloomFilter =
        ds.rdd.treeAggregate(BloomFilter.create(expected, fpp))(
          (bf, v) => { put(bf, v); bf },
          (a, b) => { a.mergeInPlace(b); a })
      df.schema(key).dataType match {
        case StringType =>
          agg(keyed.as[String](Encoders.STRING))(_ putString _)
        case ByteType | ShortType | IntegerType | LongType =>
          agg(keyed.select(col(key).cast("long")).as[Long](Encoders.scalaLong))(_ putLong _)
        case t => throw new IllegalArgumentException(
          s"buildBloom supports integral or string keys, got ${t.simpleString}")
      }
    } finally {
      if (!(expectedItems > 0)) keyed.unpersist(false)
    }
  }

  /** Serialized-size threshold above which the probe rides as a
    * broadcast reference instead of a plan literal: below it the
    * literal is simpler and the plan stays small; above it the
    * payload would bloat driver plan memory, `explain` and the UI,
    * so only the token string enters the plan and executors pull the
    * filter blocks once via torrent broadcast. */
  val BroadcastPayloadBytes: Int = 4 << 20

  /** Build the per-row probe column for `bf` against `key`: a binary
    * literal + [[graft.functions.BloomContains]] under
    * [[BroadcastPayloadBytes]], a broadcast handle +
    * [[graft.functions.BloomContainsRef]] at or above it. Both forms
    * are single-call codegen probes with identical semantics.
    */
  private[graft] def probeColumn(spark: org.apache.spark.sql.SparkSession,
      bf: BloomFilter, key: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    probeColumnBytes(spark, bos.toByteArray, key)
  }

  /** [[probeColumn]] from an ALREADY-serialized filter — for callers
    * that need an immutable snapshot of a mutable filter anyway
    * (crossCrawlDedupStream serializes once per batch): the literal
    * path embeds the bytes directly, and only the ≥4 MB broadcast
    * path pays the deserialize, so no filter is serialized twice.
    */
  private[graft] def probeColumnBytes(spark: org.apache.spark.sql.SparkSession,
      bytes: Array[Byte], key: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    if (bytes.length < BroadcastPayloadBytes)
      call_function("graft_bloom_contains", lit(bytes), key)
    else {
      val bf = BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
      val token = graft.functions.BloomBroadcasts.put(
        spark.sparkContext.broadcast(bf))
      call_function("graft_bloom_contains_ref", lit(token), key)
    }
  }

  /** `large ⋉ small` with the probe side bloom-pruned before the join
    * shuffle. Exact: bloom false positives are removed by the final
    * semi join; false negatives cannot occur. Pass `expectedItems`
    * (build-side key cardinality, e.g. from catalog stats) to size
    * the bloom without the auto-sizing count — the one-pass build.
    */
  def bloomPrunedSemiJoin(large: DataFrame, small: DataFrame,
      largeKey: String, smallKey: String, fpp: Double = 0.01,
      expectedItems: Long = -1L): DataFrame = {
    // put/probe must use the same hash family: a long-built bloom
    // probed as string (or vice versa) would be all false negatives —
    // a silently empty "exact" result
    def family(t: DataType): String = t match {
      case StringType => "string"
      case ByteType | ShortType | IntegerType | LongType => "integral"
      case other => throw new IllegalArgumentException(
        s"bloomPrunedSemiJoin supports integral or string keys, got ${other.simpleString}")
    }
    require(family(large.schema(largeKey).dataType) == family(small.schema(smallKey).dataType),
      s"key type families differ: ${large.schema(largeKey).dataType.simpleString} vs " +
        s"${small.schema(smallKey).dataType.simpleString}")
    graft.functions.GraftFunctions.register(large.sparkSession)
    val bf = buildBloom(small, smallKey, expectedItems = expectedItems, fpp = fpp)
    val pruned = large.filter(
      probeColumn(large.sparkSession, bf, col(largeKey)))
    pruned.join(small.select(col(smallKey).as(largeKey)), Seq(largeKey), "left_semi")
  }

  /** `corpus ▷ ref` (anti join) with the corpus bloom-SPLIT before
    * the join shuffle — the cross-corpus dedup shape ("drop every doc
    * already in the previous crawl") at 100 TB: the plain `left_anti`
    * shuffles the ENTIRE corpus on the key to discard a few percent;
    * here bloom-NEGATIVE rows (definitely not in the reference — no
    * false negatives) pass through with ZERO shuffle, and only
    * probable hits (true dups + ~fpp of the rest) reach the
    * verifying anti join. Exact on ANY bloom contents — the bloom is
    * invisible in the output, so the oracle is a plain NOT EXISTS
    * (q377).
    *
    * Null-key semantics match `left_anti`: a null key never equals
    * anything, so null-key rows SURVIVE — they are routed around the
    * bloom probe (whose null would otherwise drop them from both
    * branches) straight into the clean branch.
    *
    * REQUIRES A DETERMINISTIC CORPUS PLAN: the split evaluates the
    * corpus under two complementary filters (that is the point — the
    * clean branch must stay a zero-shuffle pass-through, which a
    * materializing cache would forfeit). A non-deterministic upstream
    * (`rand()`, un-seeded `sample`, a changing view) could disagree
    * between the branches, dropping or duplicating rows relative to a
    * plain `left_anti`. Non-deterministic inputs must be
    * checkpointed/written out by the CALLER first — same contract as
    * the other recompute-based split operators in this library.
    */
  def bloomAntiJoin(corpus: DataFrame, ref: DataFrame,
      corpusKey: String, refKey: String, fpp: Double = 0.01,
      expectedItems: Long = -1L): DataFrame = {
    require(fpp > 0.0 && fpp < 1.0, s"fpp must be in (0,1), got $fpp")
    // same put/probe hash-family guard as the semi join — but here a
    // family mismatch would be WORSE than empty: all-false-negatives
    // means every true duplicate sails through the clean branch
    // unverified
    def family(t: DataType): String = t match {
      case StringType => "string"
      case ByteType | ShortType | IntegerType | LongType => "integral"
      case other => throw new IllegalArgumentException(
        s"bloomAntiJoin supports integral or string keys, got ${other.simpleString}")
    }
    require(family(corpus.schema(corpusKey).dataType) ==
        family(ref.schema(refKey).dataType),
      s"key type families differ: ${corpus.schema(corpusKey).dataType.simpleString} vs " +
        s"${ref.schema(refKey).dataType.simpleString}")
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val bf = buildBloom(ref, refKey, expectedItems = expectedItems, fpp = fpp)
    val mightHit = probeColumn(corpus.sparkSession, bf, col(corpusKey))
    val clean = corpus.filter(col(corpusKey).isNull || !mightHit)
    val verified = corpus.filter(mightHit)
      .join(ref.select(col(refKey).as("_graft_bk")),
        col(corpusKey) === col("_graft_bk"), "left_anti")
    clean.unionByName(verified)
  }
}
