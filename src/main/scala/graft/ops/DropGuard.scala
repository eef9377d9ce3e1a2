package graft.ops

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener
import org.apache.spark.util.LongAccumulator

/** Runtime observability for the capped bucket paths.
  *
  * Every bucketed pair generator drops over-capacity buckets
  * (`maxBucketSize` / `maxDocFrequency`) — the bound that keeps a
  * degenerate corpus from OOMing a task. Pre-r8 that drop was SILENT:
  * on a corpus where most documents share one bucket (mass-duplicated
  * boilerplate — the typical near-dup corpus), an op could return zero
  * pairs and the caller would read it as "no duplicates". This guard
  * counts total/dropped bucket members and warns loudly on stderr when
  * the drop is material (>50% of members) or total (zero pairs
  * possible), plus a machine-readable [[lastMetrics]] map for specs
  * and triage.
  *
  * Why ACCUMULATORS and not `Dataset.observe`: the zero-pair cliff —
  * the one case that must never pass silently — produces an empty
  * runtime stage, and AQE's PropagateEmptyRelation then rewrites the
  * executed plan so the CollectMetrics node is gone from the final
  * tree; `qe.observedMetrics` comes back EMPTY exactly when the
  * warning matters (verified against Spark 4.1.2). Accumulator updates
  * ride task-completion events instead, so they survive any plan
  * rewrite: a nondeterministic always-true probe filter
  * (`graft_drop_probe`, [[graft.functions.DropProbe]]) counts every
  * bucket row as the aggregation emits it. The probe sits in the same
  * stage as the bounded-collect aggregate — if that stage ran, the
  * counts arrived.
  *
  * Accumulators outlive one action (a cold+warm bench run executes the
  * same frame three times), so reporting works on per-execution DELTAS
  * tracked by the session listener; [[lastMetrics]] holds the latest
  * execution's delta per metric name. Listener delivery is async
  * (Spark's listener bus) — specs poll [[lastMetrics]].
  */
object DropGuard {
  private val sessions = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  /** name → (total, dropped, hot) accumulators; builder lookup.
    * Keyed by OP NAME, not a per-call id: `observed()` on the same op
    * reuses the existing triple, so a long-lived session (streaming,
    * notebook) holds one registry entry per distinct op — bounded —
    * where the r8 shape minted three fresh accumulators per
    * *invocation* and never pruned (a leak at 10⁶ invocations). The
    * trade: two executions of the SAME op overlapping in time blend
    * their counts into one delta at the next sweep — the warning
    * still fires on the blended numbers; per-execution attribution
    * was never a contract (listener delivery is already async).
    */
  private val registry =
    new ConcurrentHashMap[String, (LongAccumulator, LongAccumulator, LongAccumulator)]()
  /** name → last reported cumulative totals (delta baseline). */
  private val reported = new ConcurrentHashMap[String, (Long, Long, Long)]()

  /** metric name → (total members, dropped members, hot buckets) of
    * the most recent execution that moved the counters.
    */
  @volatile var lastMetrics: Map[String, (Long, Long, Long)] = Map.empty

  private[graft] def accumulators(
      name: String): (LongAccumulator, LongAccumulator, LongAccumulator) = {
    val accs = registry.get(name)
    require(accs != null, s"graft_drop_probe: unknown metric '$name' — " +
      "construct the probe through DropGuard.observed")
    accs
  }

  private final class Listener extends QueryExecutionListener {
    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
      sweep()
    override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
  }

  /** Report every metric whose counters moved since the last sweep. */
  private def sweep(): Unit =
    registry.forEach { (name, accs) =>
      val now = (accs._1.value.longValue, accs._2.value.longValue, accs._3.value.longValue)
      val base = reported.getOrDefault(name, (0L, 0L, 0L))
      if (now != base) {
        reported.put(name, now)
        report(name, now._1 - base._1, now._2 - base._2, now._3 - base._3)
      }
    }

  private def report(fullName: String, total: Long, dropped: Long, hot: Long): Unit = {
    lastMetrics = lastMetrics.updated(fullName, (total, dropped, hot))
    // strip the @appId scope for the human-facing line
    val name = fullName.lastIndexOf('@') match {
      case -1 => fullName
      case i => fullName.substring(0, i)
    }
    if (total > 0 && dropped == total)
      System.err.println(s"[graft] $name: ALL $total bucket members exceeded " +
        "the bucket cap — the op can only return ZERO pairs. The corpus is " +
        "denser than the bucketing: raise nbits/bands or maxBucketSize, or " +
        "run exact dedup first.")
    else if (total > 0 && dropped * 2 > total)
      System.err.println(s"[graft] $name: $dropped of $total bucket members " +
        s"(in $hot hot buckets) dropped by the bucket cap — recall is " +
        "materially degraded; raise nbits/bands or maxBucketSize.")
  }

  /** Register the reporting listener once per session. */
  def ensure(spark: SparkSession): Unit =
    if (sessions.putIfAbsent(spark, java.lang.Boolean.TRUE) == null)
      spark.listenerManager.register(new Listener)

  /** Attach drop accounting to a bounded-collect result frame: `df`
    * must carry column `c` = `struct<n, ms>` (graft_bounded_collect
    * output, one row per bucket; `ms` NULL = bucket dropped). Returns
    * the same rows with the probe filter attached.
    */
  def observed(df: DataFrame, op: String): DataFrame = {
    val spark = df.sparkSession
    ensure(spark)
    graft.functions.GraftFunctions.register(spark)
    val sc = spark.sparkContext
    // the app-id suffix scopes the entry to ITS SparkContext: an
    // accumulator outlives its context uselessly (updates are dropped
    // after AccumulatorContext.clear), so a restarted session must
    // mint fresh ones — one entry per (op, context), both bounded
    val name = s"graft_drop:$op@${sc.applicationId}"
    registry.computeIfAbsent(name, _ => (
      sc.longAccumulator(s"$name.total"),
      sc.longAccumulator(s"$name.dropped"),
      sc.longAccumulator(s"$name.hot")))
    df.filter(call_function("graft_drop_probe",
      lit(name), col("c.n"), col("c.ms").isNull))
  }

  /** Registry cardinality — the lifecycle spec's bound probe. */
  private[graft] def registrySize: Int = registry.size
}
