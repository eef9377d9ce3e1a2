package graft.core

import graft.ops.{ProfileOps, RetrievalOps}
import org.apache.spark.sql.functions._

/** Hand cases for MAP/MRR, HHI, NMI, and Hellinger drift. */
class InfoMetricsSpec extends SparkSpec {
  import spark.implicits._

  test("map/mrr: textbook ranked list") {
    // query 1: hits at ranks 2 and 4 of 5 -> RR = 1/2,
    // AP = (1/2 + 2/4) / 2 = 0.5 (n_rel = 2)
    val run = Seq((1L, 10L, 0.9), (1L, 11L, 0.8), (1L, 12L, 0.7),
      (1L, 13L, 0.6), (1L, 14L, 0.5))
      .toDF("query_id", "cand_id", "score")
    val labels = Seq((1L, 11L, 1.0), (1L, 13L, 1.0))
      .toDF("query_id", "cand_id", "rel")
    val r = RetrievalOps.mapMrrAtK(run, labels, 10).collect().head
    assert(r.getAs[Long]("n_rel") == 2L)
    assert(r.getAs[Int]("first_rank") == 2)
    assert(r.getAs[Double]("rr") == 0.5)
    assert(r.getAs[Double]("ap") == 0.5)
  }

  test("hhi: monopoly scores 10000, even split N gives 10000/N") {
    val df = Seq(("m1", "a", 100L), ("m2", "a", 50L), ("m2", "b", 50L))
      .toDF("mkt", "mem", "w")
    val r = ProfileOps.hhiIndex(df, "mkt", "mem", "w").collect()
      .map(x => x.getString(0) -> x.getDouble(3)).toMap
    assert(r("m1") == 10000.0 && r("m2") == 5000.0)
  }

  test("nmi: perfect dependence is 1, independence is ~0") {
    val dep = (0L until 100L).map(i => (s"x${i % 4}", s"y${i % 4}"))
      .toDF("x", "y")
    val d = ProfileOps.normalizedMutualInfo(dep, "x", "y").collect().head
    assert(d.getAs[Double]("nmi") == 1.0)
    assert(d.getAs[Double]("mi") == d.getAs[Double]("h_x"))
    val ind = (0L until 100L).map(i => (s"x${i % 4}", s"y${(i / 4) % 5}"))
      .toDF("x", "y")
    val iRow = ProfileOps.normalizedMutualInfo(ind, "x", "y")
      .collect().head
    assert(math.abs(iRow.getAs[Double]("mi")) < 1e-6)
  }

  test("hellinger: identical is 0, disjoint is 1") {
    val df = (Seq.fill(20)(("a", 1L)) ++ Seq.fill(20)(("b", 1L)) ++
      Seq.fill(10)(("far", 99L))).toDF("g", "b0")
    val r = ProfileOps.hellingerAgainstRest(df, "g", col("b0"))
      .collect().map(x => x.getString(0) -> x.getDouble(3)).toMap
    assert(r("far") == 1.0) // no shared bin with the rest
    // a vs rest shares bin 1 with b but not far's 99: strictly between
    assert(r("a") > 0.0 && r("a") < 1.0 && r("a") == r("b"))
  }
}
