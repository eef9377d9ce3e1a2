package graft.core

import graft.ops.LayoutOps
import org.apache.spark.sql.functions._

/** The layout sinks must produce layouts that actually prune: partition
  * directories prune at planning time, range-sorted files carry the
  * tight per-file min/max statistics that stats-aware readers skip by.
  */
class LayoutSpec extends SparkSpec {

  private val li = "/root/testdata/sf0.001/lineitem.parquet"

  test("partitioned layout: equality predicate prunes directories at planning time") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    LayoutOps.writePartitioned(
      spark.read.parquet(li), dir, Seq("l_returnflag"))
    val filtered = spark.read.parquet(dir).filter(col("l_returnflag") === "R")
      .select("l_orderkey", "l_quantity")
    val s = filtered.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(s.contains("PartitionFilters") && s.contains("l_returnflag"), s)
    // and the pruned read returns exactly the flag's rows
    val expected = spark.read.parquet(li).filter(col("l_returnflag") === "R").count()
    assert(filtered.count() == expected)
  }

  test("range-sorted layout: file stat envelopes are prunable; hash layout's are not") {
    val base = spark.read.parquet(li)
    val sortedDir = java.nio.file.Files.createTempDirectory("graft_sorted").toString
    val hashDir = java.nio.file.Files.createTempDirectory("graft_hash").toString
    LayoutOps.writeRangeSorted(base, sortedDir, Seq("l_shipdate"), 8)
    base.repartition(8).write.mode("overwrite").parquet(hashDir)

    // Per-file [min,max] envelopes of the sort key — the statistics any
    // stats-aware reader (parquet row-group pruning, table formats)
    // skips by. A range-sorted layout makes them near-disjoint; a hash
    // layout smears every file across the whole domain.
    def envelopes(dir: String): Array[(String, Long, Long)] =
      spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg(min(col("l_shipdate").cast("timestamp").cast("long")).as("lo"),
          max(col("l_shipdate").cast("timestamp").cast("long")).as("hi"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

    val cutoff = java.time.LocalDateTime.parse("1996-01-01T00:00:00")
      .toEpochSecond(java.time.ZoneOffset.UTC)
    def overlapping(env: Array[(String, Long, Long)]): Int =
      env.count { case (_, lo, _) => lo < cutoff }
    val sortedEnv = envelopes(sortedDir)
    val hashEnv = envelopes(hashDir)
    assert(sortedEnv.length == 8 && hashEnv.length == 8,
      s"${sortedEnv.length} / ${hashEnv.length} files")
    // every hash file intersects the predicate range; most sorted
    // files fall entirely outside it and are skippable
    assert(overlapping(hashEnv) == 8, s"hash: ${overlapping(hashEnv)} of 8 overlap")
    assert(overlapping(sortedEnv) <= 3,
      s"sorted: ${overlapping(sortedEnv)} of 8 overlap " +
        sortedEnv.map(e => s"[${e._2},${e._3}]").mkString(","))
    // and the sorted files tile the domain: envelopes are disjoint
    val ordered = sortedEnv.map(e => (e._2, e._3)).sortBy(_._1)
    ordered.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2, ordered.mkString(","))
      case _ => ()
    }
    // same answer from either layout
    val a = spark.read.parquet(sortedDir)
      .filter(col("l_shipdate") < lit("1996-01-01").cast("timestamp")).count()
    val b = spark.read.parquet(hashDir)
      .filter(col("l_shipdate") < lit("1996-01-01").cast("timestamp")).count()
    assert(a == b && a > 0)
  }

  test("z-order layout keeps BOTH columns prunable where a 1-D sort smears the second") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val dom = orders.agg(
      min("o_totalprice"), max("o_totalprice"),
      min("o_custkey").cast("double"), max("o_custkey").cast("double")).head()
    val (pLo, pHi, cLo, cHi) =
      (dom.getDouble(0), dom.getDouble(1), dom.getDouble(2), dom.getDouble(3))
    val zDir = java.nio.file.Files.createTempDirectory("graft_z").toString
    val pDir = java.nio.file.Files.createTempDirectory("graft_p").toString
    LayoutOps.writeZOrdered(orders, zDir,
      "o_totalprice", pLo, pHi, "o_custkey", cLo, cHi, numFiles = 16)
    LayoutOps.writeRangeSorted(orders, pDir, Seq("o_totalprice"), 16)

    // per-file envelopes of the SECOND column (custkey)
    def custEnvelopes(dir: String): Array[(Long, Long)] =
      spark.read.parquet(dir)
        .groupBy(input_file_name())
        .agg(min("o_custkey").as("lo"), max("o_custkey").as("hi"))
        .collect().map(r => (r.getLong(1), r.getLong(2)))
    // box: bottom quarter of the custkey domain
    val cut = (cLo + (cHi - cLo) / 4).toLong
    def overlapping(env: Array[(Long, Long)]): Int =
      env.count { case (lo, _) => lo <= cut }
    val zEnv = custEnvelopes(zDir)
    val pEnv = custEnvelopes(pDir)
    assert(zEnv.length == 16 && pEnv.length == 16)
    // price-sorted files each span ~the whole custkey domain: no
    // custkey pruning at all
    assert(overlapping(pEnv) == 16, s"price-sorted: ${overlapping(pEnv)} of 16")
    // z-ordered files tile the (price, cust) plane: a custkey quarter
    // touches only the files in that stripe
    assert(overlapping(zEnv) <= 12,
      s"z-ordered: ${overlapping(zEnv)} of 16 overlap " +
        zEnv.map(e => s"[${e._1},${e._2}]").mkString(","))
    // layout changes nothing about the data
    assert(spark.read.parquet(zDir).count() == orders.count())
  }
}
