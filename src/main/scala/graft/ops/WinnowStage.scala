package graft.ops

import java.util.concurrent.ConcurrentHashMap
import java.util.function.{Function => JFunction}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Materialized shared stage for the winnow dedup funnel.
  *
  * Six production queries consume the candidate→verify funnel over the
  * same corpus (pair report q156, clusters q158, leakage-safe split
  * q160, threshold sweep q165, savings estimate q166, source matrix
  * q167). Re-running the funnel — normalize + per-char MD5 winnow scan,
  * df-guarded self-join, word-3-gram Jaccard verify — once PER QUERY is
  * exactly what a production pipeline does not do: it materializes the
  * verified-pairs frame once (the same persisted-index discipline as
  * [[WinnowOps.refOverlap]]'s reference index and
  * [[DedupOps.dedupAgainstStore]]'s digest store) and fans every
  * analysis out from it. At sf0.1 the funnel was ~4s per query × 5
  * queries of pure recomputation — at 100 TB it would be the difference
  * between one corpus scan and six.
  *
  * The stage is computed at minJaccard = 0.0 — the weakest threshold
  * any consumer needs (the sweep's) — so every stricter consumer is a
  * trivial filter on the ALREADY-ROUNDED 5dp `jac` column; filtering
  * the materialized frame at `jac >= t` is bit-identical to running
  * [[WinnowOps.verifiedPairs]] with minJaccard = t directly, which is
  * what each query's unchanged DuckDB oracle still replays.
  *
  * Memoized per (Spark application, table directory, params) via
  * `localCheckpoint` — the persisted frame is pair-cardinality (ids +
  * two small numerics), never corpus text. A stopped application's
  * entries are keyed away by the next application's fresh id.
  */
object WinnowStage {

  private case class Key(appId: String, dir: String, params: String)
  private val cache = new ConcurrentHashMap[Key, DataFrame]()

  /** The funnel's verified candidate pairs at minJaccard = 0.0:
    * (id_a, id_b, n_shared, jac ≥ 0 rounded 5dp). Computed once per
    * (application, dir); consumers filter `jac` to their threshold.
    */
  def pairs(spark: SparkSession, dir: String,
      k: Int = 12, w: Int = 6, maxDf: Int = 64, minShared: Int = 2,
      n: Int = 3): DataFrame = {
    val key = Key(spark.sparkContext.applicationId, dir,
      s"$k:$w:$maxDf:$minShared:$n")
    cache.computeIfAbsent(key, new JFunction[Key, DataFrame] {
      override def apply(k0: Key): DataFrame =
        WinnowOps.verifiedPairs(graft.Tables(spark, dir, "documents"),
            "doc_id", "text", k, w, maxDf, minShared, n, minJaccard = 0.0)
          .localCheckpoint()
    })
  }

  /** Pairs at a consumer's threshold — identical to running
    * [[WinnowOps.verifiedPairs]] with `minJaccard = t` (jac is already
    * rounded to 5dp before the stage materializes, so the filter is
    * exact), but served from the shared frame.
    */
  def pairsAt(spark: SparkSession, dir: String, t: Double): DataFrame =
    pairs(spark, dir).where(col("jac") >= t)

  /** Test hook: number of materialized stage entries for an app. */
  private[graft] def cachedEntries(appId: String): Int = {
    var n = 0
    cache.forEach((k, _) => if (k.appId == appId) n += 1)
    n
  }

  /** Test hook: drop an application's entries (spec isolation). */
  private[graft] def invalidate(appId: String): Unit = {
    val it = cache.keySet.iterator()
    while (it.hasNext) if (it.next().appId == appId) it.remove()
  }
}
