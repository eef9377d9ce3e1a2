package graft.core

import org.apache.spark.sql.functions._
import graft.ops.{DedupOps, DropGuard}

/** graft_bounded_collect: equivalence with the composed
  * sort_array(collect_list) + size-filter form it replaced, true
  * overflow semantics (count survives, members released), and the
  * DropGuard observability contract.
  */
class BoundedCollectSpec extends SparkSpec {
  import spark.implicits._

  private def awaitMetric(prefix: String): Option[(String, (Long, Long, Long))] = {
    var out: Option[(String, (Long, Long, Long))] = None
    var tries = 0
    while (out.isEmpty && tries < 100) {
      out = DropGuard.lastMetrics.find(_._1.startsWith(s"graft_drop:$prefix"))
      if (out.isEmpty) Thread.sleep(50)
      tries += 1
    }
    out
  }

  test("bounded collect matches sort_array(collect_list) for groups under the cap") {
    graft.functions.GraftFunctions.register(spark)
    val df = (1 to 500).map(i => (i % 7, i)).toDF("k", "x").repartition(5)
    val got = df.groupBy("k")
      .agg(call_function("graft_bounded_collect", struct($"x"), lit(1000)).as("c"))
      .select($"k", $"c.n".as("n"), $"c.ms.x".as("xs"))
    val want = df.groupBy("k")
      .agg(count(lit(1)).as("n"),
        sort_array(collect_list($"x")).as("xs"))
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("bounded collect releases over-cap groups but keeps counting") {
    graft.functions.GraftFunctions.register(spark)
    val rows = (1 to 50).map(i => ("hot", i)) ++ (1 to 5).map(i => ("cold", i))
    val df = rows.toDF("k", "x").repartition(4)
    val out = df.groupBy("k")
      .agg(call_function("graft_bounded_collect", struct($"x"), lit(10)).as("c"))
      .select($"k", $"c.n".as("n"), $"c.ms".as("ms"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.isNullAt(2))).toMap
    assert(out("hot") == ((50L, true)))   // count intact, members gone
    assert(out("cold") == ((5L, false)))
  }

  test("DropGuard reports a total drop (zero-pair cliff) with metrics") {
    val docs = (1 to 40).map(i => (i.toLong, "the same boilerplate text repeated"))
      .toDF("doc_id", "text")
    DropGuard.lastMetrics = Map.empty
    val out = DedupOps.simHashPairs(docs, "doc_id", "text", maxBucketSize = 8)
    assert(out.count() == 0) // every bucket is over-cap: zero pairs possible
    val m = awaitMetric("simHashPairs")
    assert(m.isDefined, "DropGuard never reported simHashPairs metrics")
    val (_, (total, dropped, hot)) = m.get
    assert(total == 160 && dropped == 160 && hot == 4) // 40 docs x 4 bands
  }

  test("DropGuard registry stays bounded across repeated invocations") {
    val docs = (1 to 10).map(i => (i.toLong, s"short text $i")).toDF("doc_id", "text")
    // prime one invocation so the op's entry exists, then hammer it
    DedupOps.simHashPairs(docs, "doc_id", "text").count()
    val base = DropGuard.registrySize
    for (_ <- 1 to 25)
      DedupOps.simHashPairs(docs, "doc_id", "text").count()
    // r8 minted 3 accumulators per *invocation* (registry +25 here);
    // name+appId keying must reuse the existing triple
    assert(DropGuard.registrySize == base,
      s"registry grew from $base to ${DropGuard.registrySize}")
  }

  test("DropGuard reports zero drops on a benign corpus") {
    val docs = (1 to 20).map(i => (i.toLong, s"distinct text number $i with unique words w$i v$i"))
      .toDF("doc_id", "text")
    DropGuard.lastMetrics = Map.empty
    DedupOps.minHashLshPairs(docs, "doc_id", "text", minEstJaccard = 0.5)
      .count()
    val m = awaitMetric("minHashLshPairs")
    assert(m.isDefined, "DropGuard never reported minHashLshPairs metrics")
    val (_, (total, dropped, _)) = m.get
    assert(total > 0 && dropped == 0)
  }
}
