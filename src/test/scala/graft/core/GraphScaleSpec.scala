package graft.core

import graft.ops.GraphOps
import org.apache.spark.sql.functions._

/** Scale/shape stress for connected components: dedup-realistic star
  * clusters at 10⁵-edge volume (the pair generators emit near-cliques;
  * a star is their sparsest spanning shape, i.e. the worst case that
  * still has diameter 2), plus one long chain to prove multi-round
  * propagation converges and the per-round localCheckpoint keeps the
  * loop flat (round k must not replay rounds 1..k-1 — quadratic
  * blowup would time this out, not just fail it).
  */
class GraphScaleSpec extends SparkSpec {

  test("180k-edge star graph resolves every cluster in bounded rounds") {
    // 20k blocks of 10 nodes: hub b*10, members b*10+1 .. b*10+9
    val edges = spark.range(0, 200000).toDF("id")
      .filter(col("id") % 10 =!= 0)
      .select((col("id") - (col("id") % 10)).as("src"), col("id").as("dst"))
    val t0 = System.nanoTime()
    // driverMaxEdges = 0: this is the DISTRIBUTED loop's stress test
    val cc = GraphOps.connectedComponents(edges, "src", "dst",
      driverMaxEdges = 0L)
    val wrong = cc.filter(col("comp") =!= col("id") - (col("id") % 10)).count()
    val n = cc.count()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(wrong == 0, s"$wrong nodes with a wrong component")
    assert(n == 200000, s"expected 200000 labeled nodes, got $n")
    // stars converge in ~2 rounds; generous bound so only a broken
    // loop (quadratic replay / no convergence) fails it
    assert(secs < 60.0, s"star graph took ${secs}s")
  }

  test("diameter-16 chain fully merges (multi-round propagation)") {
    val base = 10000000L
    val chain = spark.range(0, 16).toDF("i")
      .select((col("i") + base).as("src"), (col("i") + base + 1).as("dst"))
    val comps = GraphOps.connectedComponents(chain, "src", "dst")
      .select("comp").distinct().collect().map(_.getLong(0)).toSeq
    assert(comps == Seq(base), s"chain should collapse to $base, got $comps")
  }

  test("driver union-find fast path produces identical labels to the distributed loop") {
    import spark.implicits._
    val rnd = new scala.util.Random(77)
    for (trial <- 0 until 4) {
      val n = 40 + trial * 15
      val edges = Seq.fill(n + rnd.nextInt(2 * n))(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val df = edges.toDF("src", "dst")
      val fast = GraphOps.connectedComponents(df, "src", "dst")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val dist = GraphOps.connectedComponents(df, "src", "dst",
          driverMaxEdges = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(fast == dist, s"trial $trial diverged")
    }
  }

  test("fast path: mixed int/long id columns carry the union-coerced schema") {
    import spark.implicits._
    // src is int, dst is long — the src/dst union widens both to long,
    // so the fast path must type its output from the COERCED schema
    // (typing from srcCol's declared int put long values in int
    // columns: ClassCastException on first action) and must agree with
    // the distributed loop on both schema and labels
    val df = Seq((1, 2L), (2, 3L), (10, 11L)).toDF("src", "dst")
    val fast = GraphOps.connectedComponents(df, "src", "dst")
    assert(fast.schema("id").dataType == org.apache.spark.sql.types.LongType)
    assert(fast.schema("comp").dataType == org.apache.spark.sql.types.LongType)
    val got = fast.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
    val dist = GraphOps.connectedComponents(df, "src", "dst",
      driverMaxEdges = 0L)
    assert(dist.schema == fast.schema)
    assert(dist.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap == got)
  }

  test("null ids are rejected loudly in both component variants") {
    import spark.implicits._
    // the distributed loop's propagation equi-join drops null keys, so
    // a null node bridging two subgraphs would silently under-merge
    // (it receives labels but never relays them), and the driver
    // comparator can't order null — both variants must fail loudly
    // instead of returning wrong clusters
    val df = Seq(("a", "b"), (null, "b"), (null, "z")).toDF("src", "dst")
    val e1 = intercept[IllegalArgumentException] {
      GraphOps.connectedComponents(df, "src", "dst").collect()
    }
    assert(e1.getMessage.contains("NULL ids"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      GraphOps.connectedComponents(df, "src", "dst", driverMaxEdges = 0L).collect()
    }
    assert(e2.getMessage.contains("NULL ids"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException] {
      GraphOps.connectedComponentsStars(df, "src", "dst").collect()
    }
    assert(e3.getMessage.contains("NULL ids"), e3.getMessage)
  }

  test("double ids skip the fast path and still get the numeric-min label") {
    import spark.implicits._
    // toString ordering would pick "10.0" < "9.0"; the fast path is
    // gated to long/int/string ids, so doubles must take the
    // distributed loop and return the true numeric minimum
    val df = Seq((9.0, 10.0), (10.0, 11.0)).toDF("src", "dst")
    val got = GraphOps.connectedComponents(df, "src", "dst")
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(got == Map(9.0 -> 9.0, 10.0 -> 9.0, 11.0 -> 9.0))
  }

  test("large-star/small-star agrees with min-label on random graphs") {
    import spark.implicits._
    // Differential check: both algorithms must produce the identical
    // (id -> min reachable id) map on graphs with mixed shapes —
    // chains, cliques, stars, singleton edges, dup/reversed edges.
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 6) {
      val n = 30 + trial * 10
      val nEdges = n + rnd.nextInt(2 * n)
      val edges = Seq.fill(nEdges)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val df = edges.toDF("src", "dst")
      val label = GraphOps.connectedComponents(df, "src", "dst")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val stars = GraphOps.connectedComponentsStars(df, "src", "dst")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(stars == label, s"trial $trial (n=$n, e=$nEdges) diverged")
    }
  }

  test("large-star/small-star: long chain in logarithmic rounds, self-loops ignored") {
    import spark.implicits._
    val base = 20000000L
    // diameter 200 — min-label would need ~200 rounds; stars must
    // finish well inside the default 50-round cap
    val chain = spark.range(0, 200).toDF("i")
      .select((col("i") + base).as("src"), (col("i") + base + 1).as("dst"))
      .union(Seq((base + 5, base + 5)).toDF("src", "dst")) // self-loop noise
    val cc = GraphOps.connectedComponentsStars(chain, "src", "dst")
    assert(cc.select("comp").distinct().count() == 1)
    assert(cc.count() == 201)
    // capped before convergence: the one-row-per-node contract still
    // holds, each node mapping to SOME reachable smaller-or-equal id
    val capped = GraphOps.connectedComponentsStars(chain, "src", "dst", maxIter = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(capped.map(_._1).distinct.length == capped.length, "duplicate node rows")
    assert(capped.length == 201)
    assert(capped.forall { case (id, comp) => comp <= id })
  }

  test("50k-node walk corpus: the DISTRIBUTED loop (not the fast " +
      "path) completes join-shaped in bounded time") {
    import spark.implicits._
    val n = 50000L
    // ring + one 7919-stride chord per node: every node degree >= 2
    val ring = spark.range(0, n).toDF("i")
      .select(col("i").as("src"), ((col("i") + 1) % n).as("dst"))
    val chords = spark.range(0, n).toDF("i")
      .select(col("i").as("src"), ((col("i") * 7919) % n).as("dst"))
    val t0 = System.nanoTime()
    val w = GraphOps.randomWalks(ring.unionByName(chords), "src", "dst",
      walkLen = 3, walksPerNode = 1, driverMaxEdges = 0)
    val cnt = w.count()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(cnt == n * 4, s"expected ${n * 4} walk rows, got $cnt")
    assert(secs < 120, s"distributed walk loop took ${secs}s")
    graft.ops.Checkpoints.release(w)
  }

  test("180k-edge star graph: kCore(2) peels everything in the " +
      "cascading two rounds; loop stays flat") {
    // leaves (deg 1) peel round 1; hubs drop to deg 0, peel round 2
    val edges = spark.range(0, 200000).toDF("id")
      .filter(col("id") % 10 =!= 0)
      .select((col("id") - (col("id") % 10)).as("src"), col("id").as("dst"))
    val t0 = System.nanoTime()
    val core = GraphOps.kCore(edges, "src", "dst", k = 2)
    assert(core.count() == 0, "stars have no 2-core")
    val secs = (System.nanoTime() - t0) / 1e9
    assert(secs < 120, s"kCore peel took ${secs}s")
  }
}
