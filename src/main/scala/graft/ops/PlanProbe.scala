package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Runtime plan introspection: executes a frame and reads the actual
  * SQL metrics off the final (post-AQE) physical plan. Plan-SHAPE
  * assertions ("no Exchange") say what Catalyst planned; this says
  * what the cluster actually did — the two together pin an operator's
  * scale contract ("zero-shuffle" means zero bytes, measured).
  */
object PlanProbe {

  /** All nodes of the executed plan, descending through AQE boundaries
    * (AdaptiveSparkPlanExec's final plan, QueryStageExec's inner plan).
    */
  def allNodes(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => a +: allNodes(a.executedPlan)
    case q: QueryStageExec => q +: allNodes(q.plan)
    case other => other +: other.children.flatMap(allNodes)
  }

  /** Execute `df` and return the total shuffle bytes its plan wrote
    * (sum of every node's shuffle-write metric). Zero means no row
    * ever crossed an executor boundary.
    */
  def shuffleBytesWritten(df: DataFrame): Long = {
    df.collect()
    allNodes(df.queryExecution.executedPlan)
      .flatMap(_.metrics.collect {
        case (_, m) if m.name.exists(_.toLowerCase.contains("shuffle bytes written")) =>
          math.max(m.value, 0L)
      })
      .sum
  }
}
