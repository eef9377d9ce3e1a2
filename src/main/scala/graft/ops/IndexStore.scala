package graft.ops

import java.util.concurrent.ConcurrentHashMap
import java.util.function.{Function => JFunction}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Durable index lifecycle — the production composition on top of the
  * in-session index algebra:
  *
  *   - [[IvfIndexOps]] proves the IVF/PQ sufficient statistics are
  *     ADDITIVE (batch merge == from-scratch, bit-exact);
  *   - [[WinnowStage]] materializes the winnow pair frame per session;
  *   - [[DedupOps.dedupAgainstStore]] persists text digests across
  *     sessions.
  *
  * This object extends the dedupAgainstStore discipline to the other
  * two index families: stats/pair frames PERSIST to plain parquet
  * directories (no service, engine-agnostic), new batches APPEND as
  * deltas, and serving reads the STORE — never the raw corpus.
  *
  * Store layout and scale shape:
  *   - an IVF/PQ stats store is an append-only parquet dir of
  *     (key..., s: decimal(38,0), n: long) delta rows; the merged
  *     view is one model-scale groupBy over k·d (or m·codes·d/m)
  *     rows per delta — KBs move, never vectors. Because decimal
  *     sums are associative and commutative, the merge-on-read
  *     aggregate is bit-identical to ANY eager merge order and to a
  *     from-scratch pass over the union of batches — that is the
  *     cross-session refresh contract q351 pins against its oracle.
  *   - a winnow pair store is the verified-pairs frame (ids + two
  *     small numerics, pair-cardinality — corpus text never lands in
  *     the store) written ONCE; every consumer threshold is a filter
  *     on the already-5dp-rounded `jac` column, so serving from the
  *     store is bit-identical to re-running the funnel
  *     ([[WinnowStage]]'s exactness argument, now durable).
  *
  * Concurrency/recovery: appends are single atomic parquet appends;
  * as with dedupAgainstStore, concurrent writers need an external
  * commit protocol, and callers should persist derived results
  * BEFORE appending the delta that admits them.
  */
object IndexStore {

  /** Append one batch's delta frame to an append-only parquet store. */
  def append(delta: DataFrame, path: String): Unit =
    delta.write.mode("append").parquet(path)

  /** ENFORCED single-parameterization contract (r13 ask #3): the
    * first append persists the store's parameterization to a
    * `<path>_params` sidecar (sorted `k=v` lines — engine-agnostic,
    * any Hadoop FS); every later append require-matches the FULL
    * parameter map and every serve require-matches the parameters it
    * consumes, so a mixed-parameterization append or serve fails
    * loudly instead of computing silently ill-defined agreement
    * (mixed-k signature arrays, mixed-band chunks, mixed-k k-mins).
    * Creation uses non-overwriting `create` — a concurrent first
    * append has one winner and the loser re-checks against the
    * winner's sidecar.
    */
  private[graft] def checkParams(spark: SparkSession, path: String,
      kind: String, params: Map[String, String],
      writeIfAbsent: Boolean): Unit = {
    val p = new org.apache.hadoop.fs.Path(path + "_params")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def pretty(m: Map[String, String]) =
      m.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString(", ")
    if (fs.exists(p)) {
      val in = fs.open(p)
      val got = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      val gotMap = got.split("\n").iterator.filter(_.nonEmpty).map { l =>
        val i = l.indexOf('='); l.substring(0, i) -> l.substring(i + 1)
      }.toMap
      require(params.forall { case (k, v) => gotMap.get(k).contains(v) },
        s"$kind store at $path is parameterized (${pretty(gotMap)}); " +
          s"refusing mixed-parameterization use with (${pretty(params)})")
    } else if (writeIfAbsent) {
      val enc = params.toSeq.sortBy(_._1)
        .map { case (k, v) => s"$k=$v" }.mkString("\n")
      try {
        val out = fs.create(p, false)
        try out.write(enc.getBytes("UTF-8")) finally out.close()
      } catch { case _: java.io.IOException => // lost the create race
        checkParams(spark, path, kind, params, writeIfAbsent = false)
      }
    }
  }

  /** Merge-on-read view of an append-only stats store: one row per
    * key tuple with each sum column re-aggregated across deltas.
    * Decimal/long sums are associative, so this equals any eager
    * merge order — including "one batch" (from-scratch).
    */
  def readMerged(spark: SparkSession, path: String, keys: Seq[String],
      sums: Seq[String]): DataFrame = {
    val agg = sums.map(c => sum(col(c)).as(c))
    spark.read.parquet(path)
      .groupBy(keys.map(col): _*)
      .agg(agg.head, agg.tail: _*)
  }

  /** Append one batch's IVF cell-stats delta under the enforced
    * single-parameterization contract: stats from a k-cell quantizer
    * merged into a k'-cell store are meaningless, so `k` is
    * sidecar-pinned on first append and require-matched after.
    */
  def appendIvfStats(delta: DataFrame, path: String, k: Int): Unit = {
    checkParams(delta.sparkSession, path, "IVF stats",
      Map("k" -> k.toString), writeIfAbsent = true)
    append(delta, path)
  }

  /** Append one batch's PQ codebook-stats delta — (k, m, nbits-class
    * nCodes) sidecar-pinned like [[appendIvfStats]].
    */
  def appendPqStats(delta: DataFrame, path: String, k: Int, m: Int,
      nCodes: Int): Unit = {
    checkParams(delta.sparkSession, path, "PQ stats",
      Map("k" -> k.toString, "m" -> m.toString,
        "nCodes" -> nCodes.toString), writeIfAbsent = true)
    append(delta, path)
  }

  /** Merged IVF coarse-quantizer stats (cell, pos, s, n) — feed to
    * [[IvfIndexOps.refresh]]. Pass `expectK` to require-match the
    * store's sidecar-pinned quantizer size at serve time.
    */
  def readIvfStats(spark: SparkSession, path: String,
      expectK: Int = -1): DataFrame = {
    if (expectK >= 0)
      checkParams(spark, path, "IVF stats",
        Map("k" -> expectK.toString), writeIfAbsent = false)
    readMerged(spark, path, Seq("cell", "pos"), Seq("s", "n"))
  }

  /** Merged PQ codebook stats (j, code, p, s, n) — feed to
    * [[IvfIndexOps.refreshCodebooks]]. Pass `expectM`/`expectCodes`
    * to require-match the sidecar at serve time.
    */
  def readPqStats(spark: SparkSession, path: String,
      expectM: Int = -1, expectCodes: Int = -1): DataFrame = {
    val expect = (if (expectM >= 0) Map("m" -> expectM.toString)
      else Map.empty[String, String]) ++
      (if (expectCodes >= 0) Map("nCodes" -> expectCodes.toString)
      else Map.empty[String, String])
    if (expect.nonEmpty)
      checkParams(spark, path, "PQ stats", expect, writeIfAbsent = false)
    readMerged(spark, path, Seq("j", "code", "p"), Seq("s", "n"))
  }

  // ----------------------------------------------------------------
  // Winnow pair store
  // ----------------------------------------------------------------

  private case class WKey(appId: String, dir: String)
  private val winnowStores = new ConcurrentHashMap[WKey, String]()

  /** Path of the persisted winnow pair store for `dir`, writing it on
    * first use (once per application+corpus, [[WinnowStage]]'s
    * memoization made durable): the stage's minJaccard = 0.0 pair
    * frame goes to parquet, and all serving happens from that file.
    */
  def winnowStorePath(spark: SparkSession, dir: String): String = {
    val key = WKey(spark.sparkContext.applicationId, dir)
    winnowStores.computeIfAbsent(key, new JFunction[WKey, String] {
      override def apply(k: WKey): String = {
        val path = java.nio.file.Files
          .createTempDirectory("graft_winnow_store").toString + "/pairs"
        WinnowStage.pairs(spark, dir).write.mode("overwrite").parquet(path)
        path
      }
    })
  }

  /** Persist the winnow pair frame for `dir` to an EXPLICIT caller
    * path (overwrite) — the production write half: a later session
    * (or another engine) serves from that path with
    * [[serveWinnowPairsFrom]], no memoization involved.
    */
  def persistWinnowPairs(spark: SparkSession, dir: String,
      storePath: String): Unit =
    WinnowStage.pairs(spark, dir).write.mode("overwrite")
      .parquet(storePath)

  /** Serve verified pairs at threshold `t` from an explicit store
    * path — a parquet scan of the pair frame plus one filter; the
    * raw document corpus is never touched. Bit-identical to running
    * the funnel at minJaccard = t: `jac` was rounded to 5dp before
    * persisting, so the filter is exact.
    */
  def serveWinnowPairsFrom(spark: SparkSession, storePath: String,
      t: Double): DataFrame =
    spark.read.parquet(storePath).where(col("jac") >= t)

  /** [[serveWinnowPairsFrom]] with the per-application memoized store
    * for `dir` (written on first use) — the registered-query (q352)
    * convenience; PlanSpec asserts the serve plan reads only the
    * store.
    */
  def serveWinnowPairs(spark: SparkSession, dir: String,
      t: Double): DataFrame =
    serveWinnowPairsFrom(spark, winnowStorePath(spark, dir), t)

  /** Test hook: drop an application's winnow stores (spec isolation). */
  private[graft] def invalidateWinnow(appId: String): Unit = {
    val it = winnowStores.keySet.iterator()
    while (it.hasNext) if (it.next().appId == appId) it.remove()
  }

  // ----------------------------------------------------------------
  // IVF demo stats store (q351)
  // ----------------------------------------------------------------

  private val ivfStores = new ConcurrentHashMap[WKey, String]()

  /** Path of the q351 demo IVF stats store for `dir`, built ONCE per
    * application+corpus ([[winnowStorePath]]'s memoization): the
    * initCenters(k) assignment split into three pmod(id, 3) batch
    * deltas, each appended to one parquet store. Warm bench runs
    * re-serve from this store instead of re-creating a temp dir and
    * re-writing three deltas per invocation (which also leaked
    * uncleaned /tmp state). Deterministic: centers, assignment and
    * the batch split are all content-keyed, so the first-run store
    * equals any rebuild.
    */
  def ivfDemoStorePath(spark: SparkSession, dir: String,
      k: Int = 6): String = {
    val key = WKey(spark.sparkContext.applicationId, s"$dir#k=$k")
    ivfStores.computeIfAbsent(key, new JFunction[WKey, String] {
      override def apply(ignored: WKey): String = {
        val path = java.nio.file.Files
          .createTempDirectory("graft_q351").toString + "/cells"
        val emb = graft.Tables(spark, dir, "embeddings")
        val c0 = IvfIndexOps.initCenters(spark, emb, "vec_id",
          "embedding", k)
        val asg = IvfIndexOps.assign(spark, emb, "vec_id",
          "embedding", c0).localCheckpoint()
        (0 until 3).foreach { b =>
          appendIvfStats(IvfIndexOps.cellStatsFromAssigned(
            asg.where(pmod(col("id"), lit(3)) === b)), path, k)
        }
        Checkpoints.release(asg)
        path
      }
    })
  }

  /** Append one batch's PCA moment delta ([[PcaOps.momentsDelta]])
    * under the enforced single-parameterization contract: moments of
    * different dimension (different flattened-position layouts) are
    * meaningless to merge, so `d` is sidecar-pinned on first append
    * and require-matched after.
    */
  def appendPcaMoments(delta: DataFrame, path: String, d: Int): Unit = {
    checkParams(delta.sparkSession, path, "PCA moments",
      Map("d" -> d.toString), writeIfAbsent = true)
    append(delta, path)
  }

  /** Merged PCA moments (pos, s) — feed to
    * [[PcaOps.fitFromMomentsStore]]. Pass `expectD` to require-match
    * the store's sidecar-pinned dimension at serve time.
    */
  def readPcaMoments(spark: SparkSession, path: String,
      expectD: Int = -1): DataFrame = {
    if (expectD >= 0)
      checkParams(spark, path, "PCA moments",
        Map("d" -> expectD.toString), writeIfAbsent = false)
    readMerged(spark, path, Seq("pos"), Seq("s"))
  }

  /** Append one batch's CMS counter delta ([[SketchOps.cmsSketch]])
    * — counters are longs that ADD, the textbook mergeable sketch.
    * Width is sidecar-pinned (counters of different widths hash the
    * same key to different columns; the fixed d=3 polynomial family
    * is part of the code, not the parameterization).
    */
  def appendCmsSketch(delta: DataFrame, path: String, w: Int): Unit = {
    checkParams(delta.sparkSession, path, "CMS sketch",
      Map("w" -> w.toString), writeIfAbsent = true)
    append(delta, path)
  }

  /** Merged CMS counters (r, c, cnt) — feed to
    * [[SketchOps.cmsHeavyHittersFromSketch]]. */
  def readCmsSketch(spark: SparkSession, path: String,
      expectW: Int = -1): DataFrame = {
    if (expectW >= 0)
      checkParams(spark, path, "CMS sketch",
        Map("w" -> expectW.toString), writeIfAbsent = false)
    readMerged(spark, path, Seq("r", "c"), Seq("cnt"))
  }

  private val cmsStores = new ConcurrentHashMap[WKey, String]()

  /** q384's demo store: the events stream split into 3 content-keyed
    * batches (pmod(event_id, 3)), each batch's counter delta appended
    * — memoized per application+corpus like the other demo stores.
    */
  def cmsDemoStorePath(spark: SparkSession, dir: String,
      w: Int = 64): String = {
    val key = WKey(spark.sparkContext.applicationId, s"$dir#cms_w=$w")
    cmsStores.computeIfAbsent(key, new JFunction[WKey, String] {
      override def apply(ignored: WKey): String = {
        val path = java.nio.file.Files
          .createTempDirectory("graft_q384").toString + "/cms"
        val ev = graft.Tables(spark, dir, "events")
        (0 until 3).foreach { b =>
          appendCmsSketch(graft.ops.SketchOps.cmsSketch(
            ev.where(pmod(col("event_id"), lit(3)) === b), "user_id", w),
            path, w)
        }
        path
      }
    })
  }

  /** Append one batch's quantile-histogram delta
    * ([[SketchOps.quantHistDelta]]) — bucket counts are longs that
    * ADD. The cell width is sidecar-pinned: buckets cut at different
    * cell widths are meaningless to merge.
    */
  def appendQuantHist(delta: DataFrame, path: String,
      cellMicro: Long): Unit = {
    checkParams(delta.sparkSession, path, "quantile histogram",
      Map("cell_micro" -> cellMicro.toString), writeIfAbsent = true)
    append(delta, path)
  }

  /** Merged quantile histogram (bucket, n) — feed to
    * [[SketchOps.quantileAuditFromHist]] or serve rank queries
    * directly. */
  def readQuantHist(spark: SparkSession, path: String,
      expectCellMicro: Long = -1L): DataFrame = {
    if (expectCellMicro >= 0)
      checkParams(spark, path, "quantile histogram",
        Map("cell_micro" -> expectCellMicro.toString),
        writeIfAbsent = false)
    readMerged(spark, path, Seq("bucket"), Seq("n"))
  }

  private val quantStores = new ConcurrentHashMap[WKey, String]()

  /** q390's demo store: lineitem prices split into 3 content-keyed
    * batches (pmod(l_orderkey, 3)), each batch's bucket delta
    * appended — memoized per application+corpus like the other demo
    * stores so warm bench runs serve from it.
    */
  def quantHistDemoStorePath(spark: SparkSession, dir: String,
      cellMicro: Long): String = {
    val key = WKey(spark.sparkContext.applicationId,
      s"$dir#quant_cell=$cellMicro")
    quantStores.computeIfAbsent(key, new JFunction[WKey, String] {
      override def apply(ignored: WKey): String = {
        val path = java.nio.file.Files
          .createTempDirectory("graft_q390").toString + "/quant"
        val li = graft.Tables(spark, dir, "lineitem")
        (0 until 3).foreach { b =>
          appendQuantHist(graft.ops.SketchOps.quantHistDelta(
            li.where(pmod(col("l_orderkey"), lit(3)) === b),
            "l_extendedprice", cellMicro), path, cellMicro)
        }
        path
      }
    })
  }

  /** Test hook: drop an application's quantile demo stores. */
  private[graft] def invalidateQuantDemo(appId: String): Unit = {
    val it = quantStores.keySet.iterator()
    while (it.hasNext) if (it.next().appId == appId) it.remove()
  }

  /** Test hook: drop an application's CMS demo stores. */
  private[graft] def invalidateCmsDemo(appId: String): Unit = {
    val it = cmsStores.keySet.iterator()
    while (it.hasNext) if (it.next().appId == appId) it.remove()
  }

  private val pcaStores = new ConcurrentHashMap[WKey, String]()

  /** q381's demo store: the embeddings corpus split into 3
    * content-keyed batches (pmod(vec_id, 3)), each batch's moment
    * delta appended — built ONCE per application+corpus (the
    * ivfDemoStorePath memoization) so warm bench runs serve from it
    * instead of re-appending into a fresh temp dir each run.
    */
  def pcaDemoStorePath(spark: SparkSession, dir: String,
      d: Int = 16): String = {
    val key = WKey(spark.sparkContext.applicationId, s"$dir#pca_d=$d")
    pcaStores.computeIfAbsent(key, new JFunction[WKey, String] {
      override def apply(ignored: WKey): String = {
        val path = java.nio.file.Files
          .createTempDirectory("graft_q381").toString + "/moments"
        val emb = graft.Tables(spark, dir, "embeddings")
        (0 until 3).foreach { b =>
          appendPcaMoments(graft.ops.PcaOps.momentsDelta(
            emb.where(pmod(col("vec_id"), lit(3)) === b), "embedding", d),
            path, d)
        }
        path
      }
    })
  }

  /** Test hook: drop an application's PCA demo stores. */
  private[graft] def invalidatePcaDemo(appId: String): Unit = {
    val it = pcaStores.keySet.iterator()
    while (it.hasNext) if (it.next().appId == appId) it.remove()
  }

  /** Test hook: drop an application's IVF demo stores. */
  private[graft] def invalidateIvfDemo(appId: String): Unit = {
    val it = ivfStores.keySet.iterator()
    while (it.hasNext) if (it.next().appId == appId) it.remove()
  }

  // ----------------------------------------------------------------
  // Banded-LSH (MinHash) store
  // ----------------------------------------------------------------

  /** Append one batch of [[DedupOps.minHashMd5Bands]] rows to an
    * append-only parquet band store — the crawl-loop write half:
    * each ingested batch persists its (id, band, band_key, sig) rows
    * and is never recomputed. One immutable corpus per store path
    * (ids must not change content between appends), and one
    * parameterization per store, ENFORCED via the [[checkParams]]
    * sidecar: every batch must be banded with the SAME (shingleN,
    * numHashes, bands) the serve side assumes — mixed-k signature
    * arrays make pair agreement ill-defined, so a mismatched append
    * now fails loudly instead.
    */
  def appendLshBands(bands: DataFrame, path: String,
      shingleN: Int = 3, numHashes: Int = 16, bandCount: Int = 4): Unit = {
    checkParams(bands.sparkSession, path, "LSH band",
      Map("shingleN" -> shingleN.toString,
        "numHashes" -> numHashes.toString,
        "bands" -> bandCount.toString), writeIfAbsent = true)
    append(bands, path)
  }

  /** Merge-on-read view of a band store: the union of all appended
    * deltas with full-row duplicates collapsed — replaying a batch
    * append is therefore a no-op (the [[WinnowOps.indexUpdate]]
    * idempotence contract), and because band rows carry no cross-doc
    * state, ANY batch split of the corpus merges to exactly the
    * from-scratch frame — that is the q365 oracle argument.
    */
  def readLshBands(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).distinct()

  /** Serve near-dup candidate pairs from a persisted band store:
    * bucket-join + carried-signature agreement over the STORE frame
    * only — the raw corpus text is never touched at serve time. The
    * assumed `numHashes` is require-matched against the store's
    * sidecar ([[checkParams]]) — serving a 32-hash store at 16
    * denominates est_jaccard wrong, so it fails loudly.
    */
  def serveLshPairs(spark: SparkSession, path: String,
      numHashes: Int = 16, minEstJaccard: Double = 0.5): DataFrame = {
    checkParams(spark, path, "LSH band",
      Map("numHashes" -> numHashes.toString), writeIfAbsent = false)
    DedupOps.lshBandPairs(readLshBands(spark, path), numHashes,
      minEstJaccard)
  }

  private val lshStores = new ConcurrentHashMap[WKey, String]()

  /** Path of the q365 demo band store for `dir`, built ONCE per
    * application+corpus: the documents table's md5-MinHash band rows
    * split into three pmod(id, 3) batch appends. Warm bench runs
    * serve from the store ([[ivfDemoStorePath]] discipline).
    */
  def lshDemoStorePath(spark: SparkSession, dir: String): String = {
    val key = WKey(spark.sparkContext.applicationId, dir)
    lshStores.computeIfAbsent(key, new JFunction[WKey, String] {
      override def apply(ignored: WKey): String = {
        val path = java.nio.file.Files
          .createTempDirectory("graft_q365").toString + "/bands"
        val rows = DedupOps.minHashMd5Bands(
          graft.Tables(spark, dir, "documents"), "doc_id", "text")
          .localCheckpoint()
        (0 until 3).foreach { b =>
          appendLshBands(rows.where(pmod(col("id"), lit(3)) === b), path)
        }
        Checkpoints.release(rows)
        path
      }
    })
  }

  /** Test hook: drop an application's LSH demo stores. */
  private[graft] def invalidateLshDemo(appId: String): Unit = {
    val it = lshStores.keySet.iterator()
    while (it.hasNext) if (it.next().appId == appId) it.remove()
  }

  // ----------------------------------------------------------------
  // SimHash band store
  // ----------------------------------------------------------------

  /** Append one batch of [[DedupOps.simHashBands]] rows to an
    * append-only parquet band store — same contract as
    * [[appendLshBands]] (one immutable corpus per store path, one
    * parameterization enforced via the sidecar). `family` names the
    * token-hash family the batch was coded with ("xxhash64"
    * production / "md5" oracle) — the code columns are opaque longs,
    * so a mixed-family append is exactly the silent corruption the
    * sidecar exists to refuse.
    */
  def appendSimHashBands(bands: DataFrame, path: String,
      bandCount: Int = 4, family: String = "xxhash64"): Unit = {
    checkParams(bands.sparkSession, path, "SimHash band",
      Map("bands" -> bandCount.toString, "family" -> family),
      writeIfAbsent = true)
    append(bands, path)
  }

  /** Merge-on-read view of a SimHash band store: full-row dedup, so
    * batch replays are no-ops and any batch split of the corpus
    * merges to the from-scratch frame (band rows carry no cross-doc
    * state).
    */
  def readSimHashBands(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).distinct()

  /** Serve near-dup pairs (a < b, hamming <= maxHamming) from a
    * persisted SimHash band store — bucket group + Hamming from the
    * carried 64-bit codes; corpus text never read at serve time.
    * Bit-identical to [[DedupOps.simHashPairs]] over the same corpus
    * (SimhashStoreSpec pins the equality; the xxhash64 family has no
    * SQL oracle, so q366 registers rows-only).
    */
  def serveSimHashPairs(spark: SparkSession, path: String,
      maxHamming: Int = 3, bands: Int = 4): DataFrame = {
    checkParams(spark, path, "SimHash band",
      Map("bands" -> bands.toString), writeIfAbsent = false)
    DedupOps.simHashBandPairs(readSimHashBands(spark, path),
      maxHamming, bands)
  }

  private val simhashStores = new ConcurrentHashMap[WKey, String]()

  /** Path of the q366 demo SimHash band store for `dir`, built ONCE
    * per application+corpus: the documents table's band rows split
    * into three pmod(id, 3) batch appends ([[lshDemoStorePath]]
    * discipline). Banded under the [[DedupOps.md5Long64]] token-hash
    * family so the store serve is fully SQL-oracled (q366's oracle
    * replays codes digitwise and brute-forces the Hamming pairs —
    * merge-on-read == from-scratch by the same band-row-statelessness
    * argument as q365); the xxhash64 production family keeps its
    * store ≡ live pin in SimhashStoreSpec.
    */
  def simhashDemoStorePath(spark: SparkSession, dir: String): String = {
    val key = WKey(spark.sparkContext.applicationId, dir)
    simhashStores.computeIfAbsent(key, new JFunction[WKey, String] {
      override def apply(ignored: WKey): String = {
        val path = java.nio.file.Files
          .createTempDirectory("graft_q366").toString + "/bands"
        val rows = DedupOps.simHashBands(
          graft.Tables(spark, dir, "documents"), "doc_id", "text",
          tokenHash = DedupOps.md5Long64)
          .localCheckpoint()
        (0 until 3).foreach { b =>
          appendSimHashBands(rows.where(pmod(col("id"), lit(3)) === b), path,
            family = "md5")
        }
        Checkpoints.release(rows)
        path
      }
    })
  }

  /** Test hook: drop an application's SimHash demo stores. */
  private[graft] def invalidateSimhashDemo(appId: String): Unit = {
    val it = simhashStores.keySet.iterator()
    while (it.hasNext) if (it.next().appId == appId) it.remove()
  }
}
