package graft.core

import graft.ops.SimilarityOps
import org.apache.spark.sql.functions._

/** Distributed full-corpus k-means (q113). */
class KmeansSpec extends SparkSpec {
  import spark.implicits._

  lazy val emb01 = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")

  /** In-memory reference: the same algorithm (hash-order init, fixed
    * iterations, empty cells keep their center) in plain Scala. The
    * distributed path must match its assignments exactly.
    */
  private def referenceKmeans(points: Seq[(Long, Array[Double])], k: Int,
      maxIter: Int): (Array[Array[Double]], Map[Long, Int]) = {
    def md5hex(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
      d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    val seedOrder = points.sortBy(p => md5hex(s"kmeans:${p._1}")).map(_._2)
    var centers = seedOrder.map(_.toSeq).distinct.take(k).map(_.toArray).toArray
    require(centers.length == k)
    def nearest(v: Array[Double]): Int = {
      var best = 0; var bestD = Double.MaxValue
      for (c <- centers.indices) {
        var d = 0.0
        for (j <- v.indices) { val t = v(j) - centers(c)(j); d += t * t }
        if (d < bestD) { bestD = d; best = c }
      }
      best
    }
    for (_ <- 1 to maxIter) {
      val byCell = points.groupBy(p => nearest(p._2))
      val next = centers.map(_.clone)
      byCell.foreach { case (c, ps) =>
        val s = new Array[Double](ps.head._2.length)
        ps.foreach(p => for (j <- s.indices) s(j) += p._2(j))
        for (j <- s.indices) next(c)(j) = s(j) / ps.length
      }
      centers = next
    }
    (centers, points.map(p => p._1 -> nearest(p._2)).toMap)
  }

  test("kmeansAssign matches the in-memory reference on real data") {
    val sub = emb01.filter(col("vec_id") < 120)
    val got = SimilarityOps.kmeansAssign(spark, sub, "vec_id", "embedding",
        k = 5, maxIter = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val pts = sub.select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect().map { case (i, v) => (i, v.toArray) }
      .toSeq
    val (_, want) = referenceKmeans(pts, k = 5, maxIter = 3)
    assert(got.size == want.size)
    val diff = got.count { case (id, c) => want(id) != c }
    // the decimal-sum path divides at different precision than the
    // reference's double sums, so a point EXACTLY on a boundary could
    // flip; on real-valued embeddings that has measure zero
    assert(diff == 0, s"$diff of ${got.size} assignments differ")
  }

  test("kmeansClusterProfile: partition-invariant, exhaustive, sane") {
    val prof = SimilarityOps.kmeansClusterProfile(spark, emb01,
      "vec_id", "embedding", k = 8, maxIter = 4)
    val rows = prof.collect().map(r =>
      (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.map(_._2).sum == emb01.count(), "members must partition corpus")
    assert(rows.forall(_._2 > 0), "empty cluster in the profile")
    rows.foreach { case (_, n, inertia, msd) =>
      assert(inertia >= 0 && math.abs(msd - inertia / n) < 1e-4)
    }
    val repart = SimilarityOps.kmeansClusterProfile(spark,
      emb01.repartition(13), "vec_id", "embedding", k = 8, maxIter = 4)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    assert(repart.toSeq == rows.map(t => (t._1, t._2, t._3)).sortBy(_._1).toSeq,
      "profile must be bit-identical under repartitioning")
  }

  test("more iterations cannot increase total inertia") {
    def total(maxIter: Int): Double =
      SimilarityOps.kmeansClusterProfile(spark, emb01, "vec_id", "embedding",
        k = 8, maxIter = maxIter)
        .agg(sum("inertia")).collect()(0).getDouble(0)
    val i1 = total(1); val i4 = total(4)
    assert(i4 <= i1 + 1e-6, s"inertia rose: $i1 -> $i4")
  }

  test("clusterBalancedSample: deterministic, bounded, cluster-faithful") {
    val sample = SimilarityOps.clusterBalancedSample(spark, emb01,
      "vec_id", "embedding", targetPerCluster = 40, k = 8, maxIter = 4)
    val rows = sample.collect().map(r => (r.getLong(0), r.getInt(1)))
    val again = SimilarityOps.clusterBalancedSample(spark,
      emb01.repartition(7), "vec_id", "embedding",
      targetPerCluster = 40, k = 8, maxIter = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(rows.sorted.toSeq == again.sorted.toSeq,
      "sample must be row-identical under repartitioning")
    // per-cluster counts: clusters at/below target keep everything;
    // larger ones land near target (binomial, not exact — allow 3σ)
    val full = SimilarityOps.kmeansAssign(spark, emb01, "vec_id", "embedding",
        k = 8, maxIter = 4)
      .groupBy("cluster").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val got = rows.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    full.foreach { case (c, n) =>
      val s = got.getOrElse(c, 0L)
      if (n <= 40) assert(s == n, s"cluster $c: kept $s of $n <= target")
      else {
        val sigma = math.sqrt(n * (40.0 / n) * (1 - 40.0 / n))
        assert(math.abs(s - 40.0) <= 3 * sigma + 1,
          s"cluster $c: $s of $n vs target 40")
      }
    }
    // widening the target only ADDS rows (thresholds are monotone in
    // the fraction, coordinates are fixed)
    val wider = SimilarityOps.clusterBalancedSample(spark, emb01,
      "vec_id", "embedding", targetPerCluster = 60, k = 8, maxIter = 4)
      .collect().map(r => r.getLong(0)).toSet
    assert(rows.map(_._1).toSet.subsetOf(wider), "target widening must nest")
  }

  test("kmeansExemplars: nearest members, consistent with the assignment") {
    val ex = SimilarityOps.kmeansExemplars(spark, emb01, "vec_id", "embedding",
      k = 8, maxIter = 4, m = 3)
    val rows = ex.collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(rows.map(_._1).distinct.length == 8, "every cluster has exemplars")
    rows.groupBy(_._1).foreach { case (c, rs) =>
      assert(rs.length == 3 && rs.map(_._3).sorted.toSeq == Seq(1, 2, 3), s"cluster $c")
      val byRank = rs.sortBy(_._3).map(_._4)
      assert(byRank.sorted.toSeq == byRank.toSeq, s"cluster $c distances ordered")
    }
    // exemplars carry their own cluster's assignment
    val assign = SimilarityOps.kmeansAssign(spark, emb01, "vec_id", "embedding",
        k = 8, maxIter = 4)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.foreach { case (c, id, _, _) => assert(assign(id) == c, s"id $id") }
  }

  test("k larger than distinct vectors is rejected") {
    val tiny = Seq((1L, Seq(1.0, 0.0)), (2L, Seq(1.0, 0.0)))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      SimilarityOps.kmeansAssign(spark, tiny, "vec_id", "embedding", k = 3)
    }
    assert(e.getMessage.contains("distinct"))
  }

  test("dbscan2d: two clusters, a border at EXACTLY eps, and noise") {
    // eps = 1.0 (1e6 micro), minPts = 4. A-cluster 1-4 all mutually
    // within eps; point 5 sits exactly 1.0 from point 2 (the <=
    // boundary on the integer grid) but sees only 2 points -> border;
    // 6 is isolated noise; B-cluster 7-10 mirrors A at (10,10).
    val pts = Seq(
      (1L, 0.0, 0.0), (2L, 0.3, 0.0), (3L, 0.0, 0.3), (4L, 0.3, 0.3),
      (5L, 1.3, 0.0), (6L, 5.0, 5.0),
      (7L, 10.0, 10.0), (8L, 10.3, 10.0), (9L, 10.0, 10.3),
      (10L, 10.3, 10.3)).toDF("id", "x", "y")
    val got = SimilarityOps.dbscan2d(pts, "id", "x", "y",
        epsMicro = 1000000L, minPts = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getString(2),
          if (r.isNullAt(3)) -1L else r.getLong(3)))).toMap
    for (i <- Seq(1L, 3L, 4L))
      assert(got(i) == ((4L, "core", 1L)), s"$i: ${got(i)}")
    assert(got(2L) == ((5L, "core", 1L)), s"2: ${got(2L)}") // sees 5 too
    assert(got(5L) == ((2L, "border", 1L)), s"5: ${got(5L)}")
    assert(got(6L) == ((1L, "noise", -1L)), s"6: ${got(6L)}")
    for (i <- 7L to 10L)
      assert(got(i) == ((4L, "core", 7L)), s"$i: ${got(i)}")
  }

  test("dbscan2d: fine-cell contraction matches the brute-force reference on a dense random field") {
    // 150 deterministic points in a tight box so MANY share fine
    // cells and the core graph is dense — exercises the contraction
    // (same-cell merge, inter-cell super-edges, isolated cells,
    // border attach) against an exhaustive O(n^2) reference.
    val eps = 250000L // 0.25 in micro units
    val minPts = 4
    val rnd = new scala.util.Random(7)
    val ptsSeq = (1L to 150L).map(i =>
      (i, math.rint(rnd.nextDouble() * 2e6 - 1e6) / 1e6,
        math.rint(rnd.nextDouble() * 2e6 - 1e6) / 1e6))
    // brute force on the micro grid, replaying the operator contract
    val micro = ptsSeq.map { case (i, x, y) =>
      (i, math.rint(x * 1e6).toLong, math.rint(y * 1e6).toLong) }
    def within(a: (Long, Long, Long), b: (Long, Long, Long)) = {
      val dx = a._2 - b._2; val dy = a._3 - b._3
      dx * dx + dy * dy <= eps * eps
    }
    val nbrs = micro.map(a => a._1 -> micro.filter(b => within(a, b)).map(_._1))
      .toMap
    val coreIds = nbrs.filter(_._2.size >= minPts).keySet
    // union-find over core-core pairs
    val parent = scala.collection.mutable.HashMap[Long, Long](
      coreIds.map(i => i -> i).toSeq: _*)
    def find(x: Long): Long = { var r = x
      while (parent(r) != r) { parent(r) = parent(parent(r)); r = parent(r) }; r }
    for (a <- coreIds; b <- nbrs(a) if coreIds(b) && b != a) {
      val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(ra) = rb
    }
    val clusterOf = coreIds.map { i =>
      i -> coreIds.filter(j => find(j) == find(i)).min }.toMap
    val expected = micro.map { case (i, _, _) =>
      if (coreIds(i)) (i, nbrs(i).size.toLong, "core", clusterOf(i))
      else {
        val coreNb = nbrs(i).filter(j => coreIds(j) && j != i)
        if (coreNb.nonEmpty)
          (i, nbrs(i).size.toLong, "border", coreNb.map(clusterOf).min)
        else (i, nbrs(i).size.toLong, "noise", -1L)
      }
    }.sortBy(_._1)
    val got = SimilarityOps.dbscan2d(
        ptsSeq.toDF("id", "x", "y"), "id", "x", "y", eps, minPts)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).sortBy(_._1).toSeq
    assert(got == expected)
    // sanity: the dense field must actually exercise contraction
    assert(coreIds.nonEmpty && clusterOf.values.toSet.size >= 1)
  }
}
