package graft.core

import graft.ops.IvfIndexOps
import org.apache.spark.sql.functions._

/** Hand-case pins for incremental IVF/PQ index maintenance
  * (q239/q242): additive-merge exactness, empty-cell retention, and
  * assignment determinism on constructed inputs. The synthetic-table
  * protocol itself is covered end-to-end by the two-path DuckDB
  * oracles.
  */
class IvfIndexSpec extends SparkSpec {
  import spark.implicits._

  private val emb = Seq(
    // two tight groups around (0,0) and (10,10)
    (1L, Seq(0.0, 0.0)), (2L, Seq(0.2, 0.0)), (3L, Seq(0.0, 0.4)),
    (4L, Seq(10.0, 10.0)), (5L, Seq(10.2, 10.0)), (6L, Seq(10.0, 10.4))
  ).toDF("vec_id", "embedding")

  test("assign: nearest center, cell-asc tie-break") {
    val centers = Seq(Seq(0.0, 0.0), Seq(10.0, 10.0))
    val got = IvfIndexOps.assign(spark, emb, "vec_id", "embedding", centers)
      .select("id", "cell").collect().map(r => r.getLong(0) -> r.getInt(1))
      .toMap
    assert(got == Map(1L -> 0, 2L -> 0, 3L -> 0, 4L -> 1, 5L -> 1, 6L -> 1))
    // equidistant point -> smaller cell index wins
    val mid = Seq((9L, Seq(5.0, 5.0))).toDF("vec_id", "embedding")
    val m = IvfIndexOps.assign(spark, mid, "vec_id", "embedding", centers)
      .select("cell").collect().head.getInt(0)
    assert(m == 0)
  }

  test("batched cellStats merge equals from-scratch stats; refresh means are exact") {
    val centers = Seq(Seq(0.0, 0.0), Seq(10.0, 10.0))
    def stats(df: org.apache.spark.sql.DataFrame) =
      IvfIndexOps.cellStats(spark, df, "vec_id", "embedding", centers)
    val merged = IvfIndexOps.mergeStats(
      stats(emb.where(col("vec_id") % 2 === 0)),
      stats(emb.where(col("vec_id") % 2 === 1)))
    val scratch = stats(emb)
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getInt(0), r.getInt(1)) -> ((r.getDecimal(2).toPlainString, r.getLong(3)))
    assert(merged.collect().map(key).toMap == scratch.collect().map(key).toMap)
    val c1 = IvfIndexOps.refresh(centers, merged)
    // cell 0 mean of (0,0),(0.2,0),(0,0.4); cell 1 mean of the 10s
    assert(c1(0) == Seq(0.0666667, 0.1333333))
    assert(c1(1) == Seq(10.0666667, 10.1333333))
  }

  test("refresh: a cell with no members keeps its previous center") {
    val centers = Seq(Seq(0.0, 0.0), Seq(10.0, 10.0), Seq(-99.0, -99.0))
    val st = IvfIndexOps.cellStats(spark, emb, "vec_id", "embedding", centers)
    val c1 = IvfIndexOps.refresh(centers, st)
    assert(c1(2) == Seq(-99.0, -99.0), "empty cell must keep its center")
  }

  test("codebook path: batched codeStats merge equals from-scratch, encodes agree") {
    // 4-dim vectors, m=2 subspaces of 2 dims
    val e4 = Seq(
      (1L, Seq(0.0, 0.0, 1.0, 1.0)), (2L, Seq(0.1, 0.0, 1.1, 1.0)),
      (3L, Seq(5.0, 5.0, 9.0, 9.0)), (4L, Seq(5.1, 5.0, 9.1, 9.0)),
      (5L, Seq(0.0, 0.2, 9.0, 9.2)), (6L, Seq(5.0, 5.2, 1.0, 1.2))
    ).toDF("vec_id", "embedding")
    val c0 = IvfIndexOps.initCenters(spark, e4, "vec_id", "embedding", 2)
    val b0 = IvfIndexOps.initCodebooks(spark, e4, "vec_id", "embedding",
      c0, m = 2, nCodes = 2)
    assert(b0.size == 2 && b0.head.size == 2 && b0.head.head.size == 2)
    val r = IvfIndexOps.residuals(spark, e4, "vec_id", "embedding", c0)
    val merged = IvfIndexOps.mergeCodeStats(
      IvfIndexOps.codeStats(spark, r.where(col("id") % 2 === 0), b0),
      IvfIndexOps.codeStats(spark, r.where(col("id") % 2 === 1), b0))
    val scratch = IvfIndexOps.codeStats(spark, r, b0)
    val key = (x: org.apache.spark.sql.Row) =>
      (x.getInt(0), x.getInt(1), x.getInt(2)) ->
        ((x.getDecimal(3).toPlainString, x.getLong(4)))
    assert(merged.collect().map(key).toMap == scratch.collect().map(key).toMap)
    val bI = IvfIndexOps.refreshCodebooks(b0, merged)
    val bS = IvfIndexOps.refreshCodebooks(b0, scratch)
    assert(bI == bS, "merged refresh must equal scratch refresh exactly")
    val encI = IvfIndexOps.codeAssign(spark, r, bI)
      .select("id", "j", "code").collect()
      .map(x => (x.getLong(0), x.getInt(1)) -> x.getInt(2)).toMap
    val encS = IvfIndexOps.codeAssign(spark, r, bS)
      .select("id", "j", "code").collect()
      .map(x => (x.getLong(0), x.getInt(1)) -> x.getInt(2)).toMap
    assert(encI == encS)
    assert(encI.size == 12, "6 vectors x 2 subspaces")
  }

  test("IndexStore: persisted IVF + PQ stats deltas merge-on-read to the " +
      "from-scratch stats, across a fresh session") {
    import graft.ops.IndexStore
    val e4 = Seq(
      (1L, Seq(0.0, 0.0, 1.0, 1.0)), (2L, Seq(0.1, 0.0, 1.1, 1.0)),
      (3L, Seq(5.0, 5.0, 9.0, 9.0)), (4L, Seq(5.1, 5.0, 9.1, 9.0)),
      (5L, Seq(0.0, 0.2, 9.0, 9.2)), (6L, Seq(5.0, 5.2, 1.0, 1.2))
    ).toDF("vec_id", "embedding")
    val c0 = IvfIndexOps.initCenters(spark, e4, "vec_id", "embedding", 2)
    val b0 = IvfIndexOps.initCodebooks(spark, e4, "vec_id", "embedding",
      c0, m = 2, nCodes = 2)
    val base = java.nio.file.Files
      .createTempDirectory("graft_store_spec").toString
    // three appended batch deltas per store (an ingest cadence)
    for (b <- 0 until 3) {
      val part = e4.where(pmod(col("vec_id"), lit(3)) === b)
      IndexStore.appendIvfStats(IvfIndexOps.cellStats(spark, part, "vec_id",
        "embedding", c0), s"$base/cells", k = 2)
      IndexStore.appendPqStats(IvfIndexOps.codeStats(spark,
        IvfIndexOps.residuals(spark, part, "vec_id", "embedding", c0),
        b0), s"$base/codes", k = 2, m = 2, nCodes = 2)
    }
    // a FRESH session (no lineage, no cache) serves from the store
    val s2 = spark.newSession()
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getInt(0), r.getInt(1)) ->
        ((r.getDecimal(2).toPlainString, r.getLong(3)))
    val cellScratch = IvfIndexOps.cellStats(spark, e4, "vec_id",
      "embedding", c0).collect().map(key).toMap
    assert(IndexStore.readIvfStats(s2, s"$base/cells", expectK = 2)
      .collect().map(key).toMap == cellScratch)
    val key3 = (x: org.apache.spark.sql.Row) =>
      (x.getInt(0), x.getInt(1), x.getInt(2)) ->
        ((x.getDecimal(3).toPlainString, x.getLong(4)))
    val codeScratch = IvfIndexOps.codeStats(spark,
      IvfIndexOps.residuals(spark, e4, "vec_id", "embedding", c0), b0)
      .collect().map(key3).toMap
    assert(IndexStore.readPqStats(s2, s"$base/codes", expectM = 2,
        expectCodes = 2)
      .collect().map(key3).toMap == codeScratch)
    // refreshed centers from the stored stats == from-scratch refresh
    assert(IvfIndexOps.refresh(c0,
      IndexStore.readIvfStats(s2, s"$base/cells")) ==
      IvfIndexOps.refresh(c0, IvfIndexOps.cellStats(spark, e4,
        "vec_id", "embedding", c0)))
  }
}
