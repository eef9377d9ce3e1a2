package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Durable-store lifecycle at 100x (the one family the r13 sf10
  * breadth passes skipped): for each persisted-index family —
  * banded-LSH (q365), SimHash bands (q366), winnow pairs (q352),
  * IVF stats (q351), KMV sketches (q375) — append the 100x corpus in
  * batches to a fresh store, time the appends and the merge-on-read
  * serve, and assert merged == from-scratch STILL holds at this
  * scale (count-based equality via except, nothing collected).
  *
  * Usage: Test/runMain graft.StoreLifecycleSf10Probe [sfDir]
  */
object StoreLifecycleSf10Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/tmp/graft_sf10")

    def timed[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime(); val a = f
      ((System.nanoTime() - t0) / 1e9, a)
    }
    def freshPath(tag: String): String =
      java.nio.file.Files.createTempDirectory(s"graft_sf10_$tag")
        .toString + "/store"
    // symmetric-difference cardinality — zero iff frames are equal
    // as multiset-free row sets (all frames here are key-distinct)
    def mismatch(a: DataFrame, b: DataFrame): Long =
      a.exceptAll(b).count() + b.exceptAll(a).count()
    def report(family: String, appendSec: Double, serveSec: Double,
        rows: Long, bad: Long): Unit =
      println(f"""{"family":"$family","append_sec":$appendSec%.1f,"serve_sec":$serveSec%.1f,"served_rows":$rows,"mismatch":$bad}""")

    val docs = Tables(spark, dir, "documents")
    val emb = Tables(spark, dir, "embeddings")
    import graft.ops.{DedupOps, IndexStore, IvfIndexOps, ProfileOps}

    // ---- banded-LSH (q365 family) --------------------------------
    locally {
      val path = freshPath("lsh")
      val bands = DedupOps.minHashMd5Bands(docs, "doc_id", "text")
        .localCheckpoint()
      val (tApp, _) = timed {
        (0 until 3).foreach(b => IndexStore.appendLshBands(
          bands.where(pmod(col("id"), lit(3)) === b), path))
      }
      val (tServe, served) = timed {
        val s = IndexStore.serveLshPairs(spark, path).localCheckpoint()
        (s, s.count())
      }
      val scratch = DedupOps.lshBandPairs(bands, 16, 0.5)
      val bad = mismatch(served._1, scratch)
      graft.ops.Checkpoints.release(bands); graft.ops.Checkpoints.release(served._1)
      report("lsh_bands", tApp, tServe, served._2, bad)
    }

    // ---- SimHash bands (q366 family) -----------------------------
    locally {
      val path = freshPath("simhash")
      val bands = DedupOps.simHashBands(docs, "doc_id", "text",
        tokenHash = DedupOps.md5Long64).localCheckpoint()
      val (tApp, _) = timed {
        (0 until 3).foreach(b => IndexStore.appendSimHashBands(
          bands.where(pmod(col("id"), lit(3)) === b), path, family = "md5"))
      }
      val (tServe, served) = timed {
        val s = IndexStore.serveSimHashPairs(spark, path).localCheckpoint()
        (s, s.count())
      }
      val scratch = DedupOps.simHashBandPairs(bands, 3, 4)
      val bad = mismatch(served._1, scratch)
      graft.ops.Checkpoints.release(bands); graft.ops.Checkpoints.release(served._1)
      report("simhash_bands", tApp, tServe, served._2, bad)
    }

    // ---- winnow pair store (q352 family) -------------------------
    locally {
      val path = freshPath("winnow")
      val (tApp, _) = timed(IndexStore.persistWinnowPairs(spark, dir, path))
      val (tServe, served) = timed {
        val s = IndexStore.serveWinnowPairsFrom(spark, path, 0.4)
          .localCheckpoint()
        (s, s.count())
      }
      // true recompute (NOT the memoized stage frame the persist used)
      val scratch = graft.ops.WinnowOps.verifiedPairs(docs, "doc_id",
        "text", 12, 6, 64, 2, 3, minJaccard = 0.4)
      val bad = mismatch(served._1, scratch)
      graft.ops.Checkpoints.release(served._1)
      report("winnow_pairs", tApp, tServe, served._2, bad)
    }

    // ---- IVF stats store (q351 family) ---------------------------
    locally {
      val path = freshPath("ivf")
      val c0 = IvfIndexOps.initCenters(spark, emb, "vec_id", "embedding", 6)
      val asg = IvfIndexOps.assign(spark, emb, "vec_id", "embedding", c0)
        .localCheckpoint()
      val (tApp, _) = timed {
        (0 until 3).foreach(b => IndexStore.appendIvfStats(
          IvfIndexOps.cellStatsFromAssigned(
            asg.where(pmod(col("id"), lit(3)) === b)), path, 6))
      }
      val (tServe, merged) = timed {
        val m = IndexStore.readIvfStats(spark, path, expectK = 6)
        (IvfIndexOps.refresh(c0, m), m)
      }
      val cScratch = IvfIndexOps.refresh(c0,
        IvfIndexOps.cellStatsFromAssigned(asg))
      val bad = if (merged._1 == cScratch) 0L else 1L
      graft.ops.Checkpoints.release(asg)
      report("ivf_stats", tApp, tServe, merged._1.length.toLong, bad)
    }

    // ---- KMV sketch store (q375 family) --------------------------
    locally {
      val path = freshPath("kmv")
      val toks = docs.select(col("source"), col("doc_id"),
        explode(graft.ops.TextOps.tokens(col("text"))).as("t"))
      val (tApp, _) = timed {
        (0 until 3).foreach(b => ProfileOps.kmvAppend(
          ProfileOps.kmvSketch(toks.where(pmod(col("doc_id"), lit(3)) === b),
            "source", "t"), path))
      }
      val (tServe, served) = timed {
        val s = ProfileOps.kmvEstimate(
          ProfileOps.kmvFromStore(spark, path)).localCheckpoint()
        (s, s.count())
      }
      val scratch = ProfileOps.kmvEstimate(
        ProfileOps.kmvSketch(toks, "source", "t"))
      val bad = mismatch(served._1, scratch)
      graft.ops.Checkpoints.release(served._1)
      report("kmv_sketch", tApp, tServe, served._2, bad)
    }

    spark.stop()
  }
}
