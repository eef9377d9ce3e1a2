package graft.core

import graft.ops.GraphOps
import org.apache.spark.sql.functions._

/** Deterministic random walks ([[GraphOps.randomWalks]]) + skip-gram
  * pairs ([[GraphOps.skipGramPairs]]): structural validity (every hop
  * is an edge), an independent JDK-MessageDigest replay of the md5
  * neighbor choice (the SelectionSpec DSIR discipline — proves the
  * engine expression computes the documented function, not merely
  * something stable), partition invariance, and the exact pair grid.
  */
class WalkSpec extends SparkSpec {
  import spark.implicits._

  private val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"))
  private def edgesDf = edges.toDF("s", "t")
  private val und: Set[(String, String)] =
    edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }.toSet

  test("every consecutive step is a graph edge; all steps present") {
    val w = GraphOps.randomWalks(edgesDf, "s", "t",
      walkLen = 4, walksPerNode = 3)
    val rows = w.as[(String, Int, Int, String)].collect()
    // 4 nodes x 3 walks x 5 steps
    assert(rows.length == 4 * 3 * 5)
    val byWalk = rows.groupBy(r => (r._1, r._2))
    byWalk.foreach { case ((start, wk), steps) =>
      val path = steps.sortBy(_._3).map(_._4)
      assert(steps.map(_._3).sorted.toSeq == (0 to 4),
        s"walk ($start,$wk) missing steps")
      assert(path.head == start, "step 0 must be the start node")
      path.toSeq.sliding(2).foreach { p =>
        assert(und.contains(p(0) -> p(1)), s"(${p(0)},${p(1)}) is not an edge")
      }
    }
  }

  test("md5 neighbor choice matches an independent JDK replay") {
    def word1(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    }
    val adj: Map[String, IndexedSeq[String]] = und.groupBy(_._1)
      .map { case (a, es) => a -> es.map(_._2).toIndexedSeq.sorted }
    def expectedPath(start: String, wk: Int, len: Int): Seq[String] = {
      var cur = start
      start +: (1 to len).map { t =>
        val nbrs = adj(cur)
        cur = nbrs((word1(s"walk:$start/$wk:$t") % nbrs.size).toInt)
        cur
      }
    }
    val w = GraphOps.randomWalks(edgesDf, "s", "t",
      walkLen = 4, walksPerNode = 2)
    val got = w.as[(String, Int, Int, String)].collect()
      .groupBy(r => (r._1, r._2))
      .map { case (k, rs) => k -> rs.sortBy(_._3).map(_._4).toSeq }
    for (start <- Seq("a", "b", "c", "d"); wk <- 0 to 1)
      assert(got((start, wk)) == expectedPath(start, wk, 4),
        s"walk ($start,$wk) diverges from the JDK replay")
  }

  test("driver fast path is bit-identical to the distributed loop " +
      "(uniform and biased)") {
    val fu = GraphOps.randomWalks(edgesDf, "s", "t", 4, 2)
      .as[(String, Int, Int, String)].collect().sorted.toSeq
    val du = GraphOps.randomWalks(edgesDf, "s", "t", 4, 2,
        driverMaxEdges = 0)
      .as[(String, Int, Int, String)].collect().sorted.toSeq
    assert(fu == du, "uniform: fast path diverges from the loop")
    val fb = GraphOps.biasedWalks(edgesDf, "s", "t", 4, 2, p = 4.0,
        q = 0.5)
      .as[(String, Int, Int, String)].collect().sorted.toSeq
    val db = GraphOps.biasedWalks(edgesDf, "s", "t", 4, 2, p = 4.0,
        q = 0.5, driverMaxEdges = 0)
      .as[(String, Int, Int, String)].collect().sorted.toSeq
    assert(fb == db, "biased: fast path diverges from the loop")
  }

  test("walks are partition-invariant") {
    val a = GraphOps.randomWalks(edgesDf, "s", "t", 3, 2)
      .as[(String, Int, Int, String)].collect().sorted.toSeq
    val b = GraphOps.randomWalks(edgesDf.repartition(7), "s", "t", 3, 2)
      .as[(String, Int, Int, String)].collect().sorted.toSeq
    assert(a == b)
  }

  test("biasedWalks: structure valid and every pick matches the " +
      "JDK replay of the (p,q) weighted choice") {
    def words(s: String): (Long, Long) = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      def w(i: Int): Long = ((d(4 * i) & 0xffL) << 24) |
        ((d(4 * i + 1) & 0xffL) << 16) |
        ((d(4 * i + 2) & 0xffL) << 8) | (d(4 * i + 3) & 0xffL)
      (w(0), w(1))
    }
    val p = 4.0; val q = 0.5
    val retW = math.round(1e6 / p); val outW = math.round(1e6 / q)
    val adj: Map[String, IndexedSeq[String]] = und.groupBy(_._1)
      .map { case (a, es) => a -> es.map(_._2).toIndexedSeq.sorted }
    def expectedPath(start: String, wk: Int, len: Int): Seq[String] = {
      val (w1, _) = words(s"walk:$start/$wk:1")
      var prev = start
      var cur = adj(start)((w1 % adj(start).size).toInt)
      start +: cur +: (2 to len).map { t =>
        val (a, b) = words(s"walk:$start/$wk:$t")
        val r = (a % 1073741824L) * 4294967296L + b
        val cands = adj(cur)
        val wgts = cands.map { x =>
          if (x == prev) retW
          else if (und.contains(prev -> x)) 1000000L
          else outW
        }
        val rm = r % wgts.sum
        var cum = 0L; var pick = cands.head
        cands.zip(wgts).foreach { case (x, wg) =>
          if (cum <= rm && rm < cum + wg) pick = x
          cum += wg
        }
        prev = cur; cur = pick
        cur
      }
    }
    val w = GraphOps.biasedWalks(edgesDf, "s", "t",
      walkLen = 4, walksPerNode = 2, p = p, q = q)
    val got = w.as[(String, Int, Int, String)].collect()
      .groupBy(r => (r._1, r._2))
      .map { case (k, rs) => k -> rs.sortBy(_._3).map(_._4).toSeq }
    assert(got.size == 8 && got.values.forall(_.size == 5))
    for (start <- Seq("a", "b", "c", "d"); wk <- 0 to 1) {
      val path = got((start, wk))
      path.sliding(2).foreach { pr =>
        assert(und.contains(pr(0) -> pr(1)),
          s"(${pr(0)},${pr(1)}) is not an edge")
      }
      assert(path == expectedPath(start, wk, 4),
        s"walk ($start,$wk) diverges from the JDK (p,q) replay")
    }
  }

  test("skipGramPairs: exact (walkLen+1)^2 window grid, no self pairs") {
    // one hand walk: steps 0..4 visiting a,b,c,b,a ; window 2
    val walks = Seq(("x", 0, 0, "a"), ("x", 0, 1, "b"), ("x", 0, 2, "c"),
      ("x", 0, 3, "b"), ("x", 0, 4, "a"))
      .toDF("start", "walk", "step", "node")
    val got = GraphOps.skipGramPairs(walks, window = 2)
      .as[(String, String, Long)].collect().toSet
    // positions: a@0, b@1, c@2, b@3, a@4; pairs (i,j) |i-j|<=2, i!=j
    val pos = Vector("a", "b", "c", "b", "a")
    val exp = (for {
      i <- 0 to 4; j <- 0 to 4
      if i != j && math.abs(i - j) <= 2
    } yield (pos(i), pos(j))).groupBy(identity)
      .map { case ((c0, c1), xs) => (c0, c1, xs.size.toLong) }.toSet
    assert(got == exp)
  }
}
