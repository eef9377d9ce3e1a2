package graft.core

import graft.ops.{WinnowOps, WinnowStage}
import org.apache.spark.sql.functions._

/** The materialized shared funnel stage (WinnowStage): one winnow
  * candidate→verify pass per (app, dir), every consumer a filter over
  * the checkpointed pair frame.
  *
  *  - equivalence: pairsAt(t) must be row-identical to running
  *    verifiedPairs(minJaccard = t) directly (the unchanged DuckDB
  *    oracles replay the direct form);
  *  - single-scan: a consumer's plan must contain NO winnow scan and
  *    NO documents read — the funnel executed once, at stage
  *    materialization;
  *  - identity: repeated calls return the same cached frame.
  */
class WinnowStageSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("pairsAt equals direct verifiedPairs at the same threshold") {
    WinnowStage.invalidate(spark.sparkContext.applicationId)
    val docs = graft.Tables(spark, sfDir, "documents")
    val direct = WinnowOps.verifiedPairs(docs, "doc_id", "text",
        minJaccard = 0.3)
      .collect().map(_.toSeq).toSet
    val staged = WinnowStage.pairsAt(spark, sfDir, 0.3)
      .select("id_a", "id_b", "n_shared", "jac")
      .collect().map(_.toSeq).toSet
    assert(staged == direct)
    assert(staged.nonEmpty, "fixture corpus must produce verified pairs")
  }

  test("consumers read the checkpoint, not the corpus: no winnow scan, no parquet scan in the plan") {
    val consumer = WinnowStage.pairsAt(spark, sfDir, 0.5)
    val plan = (consumer.queryExecution.optimizedPlan.toString +
      consumer.queryExecution.executedPlan.toString).toLowerCase
    assert(!plan.contains("graft_winnow"), "winnow scan re-ran in a consumer")
    assert(!plan.contains("parquet"), "consumer re-read the corpus table")
  }

  test("concurrent first calls race to ONE materialization (computeIfAbsent atomicity)") {
    WinnowStage.invalidate(spark.sparkContext.applicationId)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val frames = Await.result(
      Future.sequence((1 to 4).map(_ =>
        Future(WinnowStage.pairs(spark, sfDir)))), 120.seconds)
    assert(frames.forall(_ eq frames.head),
      "racing callers must share one cached frame")
    assert(WinnowStage.cachedEntries(spark.sparkContext.applicationId) == 1)
  }

  test("stage is computed once: repeated calls return the cached frame") {
    val a = WinnowStage.pairs(spark, sfDir)
    val b = WinnowStage.pairs(spark, sfDir)
    assert(a eq b)
    assert(WinnowStage.cachedEntries(spark.sparkContext.applicationId) == 1)
    // different params -> different stage entry, not a stale hit
    val c = WinnowStage.pairs(spark, sfDir, maxDf = 32)
    assert(!(c eq a))
    assert(WinnowStage.cachedEntries(spark.sparkContext.applicationId) == 2)
  }
}
