package graft
import org.apache.spark.sql.SparkSession

/** Scratch probe: decompose a query's COLD cost into Catalyst phases
  * (QueryPlanningTracker) + first execution, vs a second run. */
object ColdProbe {
  def main(args: Array[String]): Unit = {
    val (sfDir, name) = (args(0), args(1))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try SparkEntry.queries("q01_pricing_summary")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    val fn = SparkEntry.queries(name)
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator",
      org.apache.logging.log4j.Level.DEBUG)
    (1 to 2).foreach { rep =>
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val t1 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t2 = System.nanoTime()
      val tracker = df.queryExecution.tracker
      val phases = tracker.phases.map { case (k, v) =>
        f"$k=${(v.endTimeMs - v.startTimeMs) / 1e3}%.2f"
      }.mkString(" ")
      val rules = tracker.topRulesByTime(8).map { case (r, s) =>
        f"${r.split('.').last}=${s.totalTimeNs / 1e9}%.2f/${s.numInvocations}"
      }.mkString(" ")
      println(f"rep $rep: construct=${(t1 - t0) / 1e9}%.2f exec=${(t2 - t1) / 1e9}%.2f  phases: $phases")
      println(s"  top rules: $rules")
    }
    spark.stop()
  }
}
