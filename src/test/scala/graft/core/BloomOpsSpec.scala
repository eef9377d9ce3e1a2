package graft.core

import graft.ops.BloomOps
import org.apache.spark.sql.functions._

/** Bloom-prefiltered ANTI join (the semi-join flavor is covered by
  * its q-oracle): result must be bit-identical to the plain
  * left_anti join on ANY bloom contents — including a deliberately
  * high-fpp bloom whose false positives exercise the verify path.
  */
class BloomOpsSpec extends SparkSpec {
  import spark.implicits._

  test("equals plain left_anti; planted overlap removed; " +
      "partition-invariant") {
    val corpus = (0 until 500).map(i => (i.toLong, s"text_$i")).toDF("id", "t")
    val ref = (0 until 500 by 7).map(i => s"text_$i").toDF("rt")
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("id").as[Long].collect().sorted.toSeq
    val got = ids(BloomOps.bloomAntiJoin(corpus, ref, "t", "rt"))
    val plain = ids(corpus.join(ref, col("t") === col("rt"), "left_anti"))
    assert(got === plain)
    assert(got === (0 until 500).filter(_ % 7 != 0).map(_.toLong))
    assert(got === ids(BloomOps.bloomAntiJoin(corpus.repartition(13),
      ref.repartition(5), "t", "rt")))
  }

  test("false positives from a high-fpp bloom are verified away " +
      "(exactness does not depend on fpp)") {
    val corpus = (0 until 2000).map(i => (i.toLong, s"v$i")).toDF("id", "t")
    val ref = Seq("v0", "v1", "v2").toDF("rt")
    val got = BloomOps.bloomAntiJoin(corpus, ref, "t", "rt", fpp = 0.5)
      .select("id").as[Long].collect().sorted.toSeq
    assert(got === (3 until 2000).map(_.toLong))
  }

  test("empty reference returns the corpus unchanged; guards fire") {
    val corpus = Seq((1L, "a"), (2L, "b")).toDF("id", "t")
    val empty = Seq.empty[String].toDF("rt")
    val got = BloomOps.bloomAntiJoin(corpus, empty, "t", "rt").count()
    assert(got === 2L)
    intercept[IllegalArgumentException] {
      BloomOps.bloomAntiJoin(corpus, empty, "t", "rt", fpp = 1.5)
    }
    intercept[IllegalArgumentException] { // driver-payload size guard
      BloomOps.buildBloom(corpus, "t", expectedItems = 1000000000000L,
        fpp = 1e-9)
    }
    intercept[IllegalArgumentException] { // cross-family keys fail loudly
      BloomOps.bloomAntiJoin(corpus,
        Seq(1L).toDF("rk"), "t", "rk")
    }
  }

  test("the bloom split MEASURABLY shrinks the exchange: shuffle " +
      "bytes a small fraction of the plain anti join's") {
    // 20k corpus rows, 50 ref keys, 0.25% true overlap. Broadcast is
    // disabled to simulate the regime the operator exists for — a
    // reference too large to broadcast (billions of digests), where
    // the plain anti join sort-merges the WHOLE corpus through the
    // exchange and the bloom split ships only probable hits
    // (~overlap + fpp). (With a broadcastable ref, neither shuffles
    // and bloom's win is probe-time row killing only.)
    val corpus = (0 until 20000).map(i => (i.toLong, s"doc_$i"))
      .toDF("id", "t")
    val ref = (0 until 20000 by 400).map(i => s"doc_$i").toDF("rt")
    import graft.ops.PlanProbe
    val thresholdKey = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(thresholdKey)
    try {
      spark.conf.set(thresholdKey, "-1")
      val plain = PlanProbe.shuffleBytesWritten(
        corpus.join(ref, col("t") === col("rt"), "left_anti"))
      val split = PlanProbe.shuffleBytesWritten(
        graft.ops.BloomOps.bloomAntiJoin(corpus, ref, "t", "rt", fpp = 0.01))
      assert(plain > 0,
        s"plain anti join should shuffle with broadcast disabled, got $plain")
      assert(split < plain / 3,
        s"bloom split should shuffle a small fraction: $split vs $plain bytes")
    } finally spark.conf.set(thresholdKey, prev)
  }

  test("broadcast-ref probe (payload >= 4 MB): same result as the " +
      "literal path, token in the plan instead of the payload") {
    // expectedItems = 4M at 1% fpp sizes the bloom to ~4.8 MB
    // serialized — over BroadcastPayloadBytes, so the probe rides as
    // graft_bloom_contains_ref(token, key) and only the token string
    // enters the plan
    val corpus = (0 until 500).map(i => (i.toLong, s"text_$i")).toDF("id", "t")
    val ref = (0 until 500 by 7).map(i => s"text_$i").toDF("rt")
    val big = BloomOps.bloomAntiJoin(corpus, ref, "t", "rt",
      expectedItems = 4000000L)
    val got = big.select("id").as[Long].collect().sorted.toSeq
    assert(got === (0 until 500).filter(_ % 7 != 0).map(_.toLong))
    val plan = big.queryExecution.analyzed.toString
    assert(plan.contains("graft_bloom_contains_ref"),
      s"expected the broadcast-ref probe in the plan:\n$plan")
    assert(plan.length < 100000,
      s"plan should carry the token, not a multi-MB literal: ${plan.length}")
    // semi-join flavor through the same switch
    val semi = BloomOps.bloomPrunedSemiJoin(corpus, ref, "t", "rt",
      expectedItems = 4000000L)
    assert(semi.count() === corpus.join(ref, col("t") === col("rt"),
      "left_semi").count())
  }

  test("bloom-ref registry: unknown token fails loudly at analysis") {
    graft.functions.GraftFunctions.register(spark)
    val ex = intercept[Exception] {
      Seq("a").toDF("t").select(
        call_function("graft_bloom_contains_ref", lit("bloom-no-such"),
          col("t"))).collect()
    }
    assert(ex.getMessage.contains("unknown or evicted bloom token"))
  }

  test("LRU eviction unpersists the evicted broadcast eagerly and " +
      "its token then fails loudly; live handles keep working") {
    import graft.functions.BloomBroadcasts
    import org.apache.spark.util.sketch.BloomFilter
    val sc = spark.sparkContext
    val evicted = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.broadcast.Broadcast[BloomFilter]]
    val prod = BloomBroadcasts.onEvict
    BloomBroadcasts.onEvict = bc => { evicted += bc; prod(bc) }
    try {
      val first = sc.broadcast(BloomFilter.create(64, 0.01))
      val t1 = BloomBroadcasts.put(first)
      // 128 further registrations push `first` (plus anything older
      // from other suites) past the 128-entry capacity
      val rest = (1 to 128).map(_ =>
        BloomBroadcasts.put(sc.broadcast(BloomFilter.create(64, 0.01))))
      val ex = intercept[IllegalArgumentException](BloomBroadcasts.get(t1))
      assert(ex.getMessage.contains("unknown or evicted bloom token"))
      assert(evicted.contains(first),
        "eviction must run the unpersist hook on the dropped broadcast")
      // unpersist, NOT destroy: a plan analyzed before the eviction
      // still holds the handle and must keep resolving its value
      // (Spark re-ships from the driver on demand)
      assert(first.value.mightContainLong(123L) ||
        !first.value.mightContainLong(123L)) // value accessible at all
      BloomBroadcasts.get(rest.last) // newest survives
    } finally BloomBroadcasts.onEvict = prod
  }

  test("auto-sized build touches the reference plan once (cached " +
      "projection); explicit expectedItems skips the cache") {
    // a scan-counting accumulator via rdd would be invasive; instead
    // pin the OBSERVABLE contract: auto-sizing must not leave the
    // keyed projection cached behind (unpersist before return), and
    // both sizing modes produce equivalent (exact) join results
    val corpus = (0 until 300).map(i => (i.toLong, s"k$i")).toDF("id", "t")
    val ref = (0 until 300 by 5).map(i => s"k$i").toDF("rt")
    val before = spark.sparkContext.getPersistentRDDs.size
    val auto = BloomOps.bloomAntiJoin(corpus, ref, "t", "rt")
      .select("id").as[Long].collect().sorted.toSeq
    assert(spark.sparkContext.getPersistentRDDs.size === before,
      "buildBloom must unpersist its sizing cache")
    val sized = BloomOps.bloomAntiJoin(corpus, ref, "t", "rt",
      expectedItems = 60L).select("id").as[Long].collect().sorted.toSeq
    assert(auto === sized)
  }

  test("null keys survive (anti-join null semantics preserved)") {
    val corpus = Seq((1L, Option("a")), (2L, Option.empty[String]))
      .toDF("id", "t")
    val ref = Seq(Option("a"), Option.empty[String]).toDF("rt")
    val got = BloomOps.bloomAntiJoin(corpus, ref, "t", "rt")
      .select("id").as[Long].collect().sorted.toSeq
    val plain = corpus.join(ref, col("t") === col("rt"), "left_anti")
      .select("id").as[Long].collect().sorted.toSeq
    assert(got === plain && got === Seq(2L))
  }
}
