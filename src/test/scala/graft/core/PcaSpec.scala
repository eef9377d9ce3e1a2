package graft.core

import graft.ops.PcaOps
import org.apache.spark.sql.functions._

/** PcaOps invariants: fit/project contract symmetry (slice vs fail),
  * differential vs a driver-side reference, the closed-form eigen2
  * twin, and model orthonormality.
  */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  private def refCov(rows: Seq[Array[Double]]): Array[Array[Double]] = {
    val d = rows.head.length
    val n = rows.length.toDouble
    val mu = Array.tabulate(d)(i => rows.map(_(i)).sum / n)
    Array.tabulate(d, d)((i, j) =>
      rows.map(r => (r(i) - mu(i)) * (r(j) - mu(j))).sum / n)
  }

  test("fit recovers a planted dominant axis; eigenvectors orthonormal") {
    // Points spread along (1,1,0,0)/sqrt(2) with small noise axes.
    val rows = (0 until 200).map { i =>
      val t = (i - 100).toDouble
      Array(t + 0.01 * (i % 7), t - 0.01 * (i % 5), 0.001 * (i % 3), 0.002 * (i % 2))
    }
    val df = rows.zipWithIndex
      .map { case (v, i) => (i.toLong, v.toSeq) }.toDF("id", "v")
    val m = PcaOps.fit(df, "v", 4)
    assert(m.n === 200)
    // Eigenvalues descending.
    assert(m.eigenvalues.sliding(2).forall(p => p(0) >= p(1) - 1e-12))
    // Orthonormal rows.
    for { i <- 0 until 4; j <- 0 until 4 } {
      val dot = (0 until 4).map(k => m.components(i)(k) * m.components(j)(k)).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-9,
        s"components $i.$j = $dot")
    }
    // Dominant axis ~ (1,1,0,0)/sqrt(2), sign-normalized positive.
    val c0 = m.components(0)
    assert(math.abs(c0(0) - math.sqrt(0.5)) < 1e-3 &&
      math.abs(c0(1) - math.sqrt(0.5)) < 1e-3, c0.mkString(","))
    // Eigen-decomposition reconstructs the reference covariance.
    val cov = refCov(rows)
    for { i <- 0 until 4; j <- 0 until 4 } {
      val rec = (0 until 4).map(k =>
        m.eigenvalues(k) * m.components(k)(i) * m.components(k)(j)).sum
      assert(math.abs(rec - cov(i)(j)) < 1e-6, s"cov($i,$j): $rec vs ${cov(i)(j)}")
    }
  }

  test("project matches driver-side dot products; longer vectors slice") {
    val rows = (0 until 50).map { i =>
      Array((i % 11).toDouble, (i % 7).toDouble, (i % 5).toDouble)
    }
    val df = rows.zipWithIndex
      .map { case (v, i) => (i.toLong, v.toSeq) }.toDF("id", "v")
    val m = PcaOps.fit(df, "v", 3)
    // Longer vectors must project identically on their leading d coords
    // (the fit() contract) — r9 advice: zip_with null-padding broke this.
    val padded = df.select($"id", concat($"v", array(lit(9.9), lit(8.8))).as("v"))
    val got = PcaOps.project(padded, "id", "v", m, 2)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    def r6(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
    rows.zipWithIndex.foreach { case (v, i) =>
      val want = (0 until 2).map { j =>
        r6((0 until 3).map(k => (v(k) - m.means(k)) * m.components(j)(k)).sum)
      }
      val (p0, p1) = got(i.toLong)
      assert(p0 === want(0) && p1 === want(1), s"row $i: ($p0,$p1) vs $want")
    }
  }

  test("project and fit fail loudly on short vectors and null elements") {
    val df = Seq((1L, Seq(1.0, 2.0, 3.0)), (2L, Seq(1.0, 2.0)))
      .toDF("id", "v")
    val m = PcaOps.fit(df.where($"id" === 1L)
      .union(df.where($"id" === 1L)), "v", 3)
    val shortErr = intercept[Exception] {
      PcaOps.project(df, "id", "v", m, 1).collect()
    }
    assert(shortErr.getMessage.contains("shorter than d=3"))
    val nullDf = Seq((1L, Seq[java.lang.Double](1.0, null, 3.0)))
      .toDF("id", "v")
    val nullErr = intercept[Exception] {
      PcaOps.project(nullDf, "id", "v", m, 1).collect()
    }
    assert(nullErr.getMessage.contains("null elements"))
    val fitErr = intercept[Exception] { PcaOps.fit(nullDf.union(nullDf), "v", 3) }
    assert(fitErr.getMessage.contains("null elements"))
  }

  test("eigen2 agrees with the Jacobi path and handles the diagonal case") {
    val df = (0 until 300).map { i =>
      (i.toLong, (i % 13).toLong * 3 + (i % 4), (i % 13).toLong + (i % 7))
    }.toDF("id", "x", "y")
    val rows = PcaOps.eigen2(df, "x", "y").orderBy("component").collect()
    assert(rows.map(_.getInt(0)).toSeq === Seq(0, 1))
    val (l1, l2) = (rows(0).getDouble(2), rows(1).getDouble(2))
    assert(l1 >= l2 && rows.forall(_.getLong(1) === 300))
    // Differential vs the d=2 Jacobi fit on the same data.
    val vdf = df.select($"id",
      array($"x".cast("double"), $"y".cast("double")).as("v"))
    val m = PcaOps.fit(vdf, "v", 2)
    assert(math.abs(l1 - m.eigenvalues(0)) < 1e-4, s"$l1 vs ${m.eigenvalues(0)}")
    assert(math.abs(l2 - m.eigenvalues(1)) < 1e-4)
    assert(math.abs(math.abs(rows(0).getDouble(4)) - math.abs(m.components(0)(0))) < 1e-4)
    // Explained fractions sum to ~1.
    assert(math.abs(rows(0).getDouble(3) + rows(1).getDouble(3) - 1.0) < 1e-5)
    // b == 0 (independent axes): eigenvectors are the axes themselves.
    val diag = (0 until 100).map(i => (i.toLong, (i % 10).toLong, 0L))
      .toDF("id", "x", "y")
    val dr = PcaOps.eigen2(diag, "x", "y").orderBy("component").collect()
    assert(dr(0).getDouble(4) === 1.0 && dr(0).getDouble(5) === 0.0)
    assert(dr(1).getDouble(4) === 0.0 && dr(1).getDouble(5) === 1.0)
  }

  test("moments store: batch-split append + merge-on-read fits " +
      "BIT-identically to from-scratch; sidecar pins d") {
    import graft.ops.IndexStore
    val rows = (0 until 120).map { i =>
      Array((i % 11).toDouble * 0.3, (i % 7).toDouble - 2.0,
        (i % 5).toDouble * 1.7, (i % 13).toDouble)
    }
    val df = rows.zipWithIndex
      .map { case (v, i) => (i.toLong, v.toSeq) }.toDF("id", "v")
    val store = java.nio.file.Files
      .createTempDirectory("graft_pca_store").toString + "/moments"
    // three deterministic batches, appended out of corpus order
    Seq(2, 0, 1).foreach { b =>
      IndexStore.appendPcaMoments(
        PcaOps.momentsDelta(df.where(col("id") % 3 === b), "v", 4),
        store, d = 4)
    }
    val fromStore = PcaOps.fitFromMomentsStore(spark, store, 4)
    val scratch = PcaOps.fit(df, "v", 4)
    assert(fromStore.n === scratch.n)
    assert(fromStore.means.toSeq === scratch.means.toSeq, "means bit-equal")
    assert(fromStore.eigenvalues.toSeq === scratch.eigenvalues.toSeq)
    assert(fromStore.components.map(_.toSeq).toSeq ===
      scratch.components.map(_.toSeq).toSeq, "components bit-equal")
    // mixed-dimension append and serve fail loudly (sidecar contract)
    intercept[IllegalArgumentException] {
      IndexStore.appendPcaMoments(
        PcaOps.momentsDelta(df, "v", 3), store, d = 3)
    }
    intercept[IllegalArgumentException] {
      IndexStore.readPcaMoments(spark, store, expectD = 8).collect()
    }
  }

  test("streaming ingest -> moments store: foreachBatch-appended " +
      "deltas fit equal to the batch pipeline") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val store = java.nio.file.Files
      .createTempDirectory("graft_pca_stream").toString + "/moments"
    val input = MemoryStream[(Long, Seq[Double])]
    val q = input.toDF().toDF("id", "v")
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.ops.IndexStore.appendPcaMoments(
          PcaOps.momentsDelta(df, "v", 3), store, d = 3)
      }
      .start()
    val b1 = (0 until 40).map(i =>
      (i.toLong, Seq((i % 5).toDouble, (i % 3).toDouble, i * 0.01)))
    val b2 = (40 until 90).map(i =>
      (i.toLong, Seq((i % 7).toDouble, (i % 2).toDouble, -i * 0.02)))
    input.addData(b1: _*); q.processAllAvailable()
    input.addData(b2: _*); q.processAllAvailable()
    q.stop()
    val streamed = PcaOps.fitFromMomentsStore(spark, store, 3)
    val batch = PcaOps.fit((b1 ++ b2).toDF("id", "v"), "v", 3)
    assert(streamed.n === batch.n)
    assert(streamed.means.toSeq === batch.means.toSeq)
    assert(streamed.eigenvalues.toSeq === batch.eigenvalues.toSeq)
    assert(streamed.components.map(_.toSeq).toSeq ===
      batch.components.map(_.toSeq).toSeq)
  }
}
