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

  /** localCheckpoint several INDEPENDENT frames with their jobs in
    * flight together (guide §2.6 "overlap independent jobs"): each
    * materialization is submitted from its own thread, so a cheap
    * subtree's tasks back-fill executors idled by an expensive
    * sibling's stragglers instead of queueing behind the whole job.
    * The q83 ann-recall discipline, shared: plans are built by the
    * caller; only the blocking checkpoint action forks. On failure
    * the surviving siblings' blocks are released as they complete.
    */
  def concurrently(frames: Seq[DataFrame]): Seq[DataFrame] = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val futs = frames.map(f => Future(f.localCheckpoint()))
    try Await.result(Future.sequence(futs), Duration.Inf)
    catch { case e: Throwable =>
      futs.foreach(_.onComplete {
        case scala.util.Success(df) => release(df)
        case _ => ()
      })
      throw e
    }
  }
}
