package graft.ops

import org.apache.spark.sql.DataFrame

/** Lifecycle helper for localCheckpoint-backed frames.
  *
  * `Dataset.unpersist()` is a NO-OP for checkpoints — it only consults
  * the cache manager, while `localCheckpoint` persists its RDD
  * directly. Iterative operators (GraphOps) release superseded rounds
  * internally; their RESULT is itself checkpoint-backed, so callers
  * that are done with a returned frame free its storage with
  * [[release]] (safe on any frame: non-checkpoint plans have no
  * LogicalRDD leaves and nothing happens).
  */
object Checkpoints {

  /** Unpersist every checkpointed RDD referenced by `df`'s plan. */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false); ()
      case _ => ()
    }
}
