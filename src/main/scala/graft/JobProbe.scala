package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerJobEnd, SparkListenerStageCompleted}

/** Optimization-round tooling: run one query N times and print every
  * Spark job it schedules (duration + first-stage name), so a
  * composite operator's wall-clock decomposes into its actual jobs —
  * the local-mode stand-in for the Spark UI's job table (UI stays off
  * in bench sessions; this probe answers "WHERE do the seconds go"
  * without it).
  *
  * Usage: runMain graft.JobProbe <sfDir> <reps> <query>
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: JobProbe <sfDir> <reps> <query>")
    val (sfDir, reps, name) = (args(0), args(1).toInt, args(2))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    case class J(id: Int, var desc: String = "", var start: Long = 0L,
      var end: Long = 0L, var nTasks: Int = 0, var taskMs: Long = 0L)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, J]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val j = J(e.jobId)
        j.desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(e.stageInfos.lastOption.map(_.name.takeWhile(_ != '\n')))
          .getOrElse("")
        j.start = e.time
        jobs.put(e.jobId, j)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val j = jobs.get(e.jobId); if (j != null) j.end = e.time
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val info = e.stageInfo
        // attribute task time to the most recent unfinished job
        // (heuristic — good enough for per-query decomposition)
        val open = jobs.values().toArray(Array.empty[J]).filter(_.end == 0L)
        if (open.nonEmpty) {
          val j = open.maxBy(_.start)
          j.nTasks += info.numTasks
          j.taskMs += info.taskMetrics.executorRunTime
        }
      }
    }
    // warmup (JIT + codegen), same as Bench
    try SparkEntry.queries("q01_pricing_summary")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query: $name"))
    (1 to reps).foreach { rep =>
      jobs.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val total = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(listener)
      Thread.sleep(200) // let the listener bus drain
      val js = jobs.values().toArray(Array.empty[J]).sortBy(_.start)
      println(f"== rep $rep: $name total $total%.3f s, ${js.length} jobs ==")
      js.foreach { j =>
        val dur = if (j.end > 0) (j.end - j.start) / 1e3 else -1.0
        println(f"  job ${j.id}%3d  ${dur}%7.3f s  tasks=${j.nTasks}%4d taskTime=${j.taskMs / 1e3}%8.3f s  ${j.desc.take(110)}")
      }
    }
    spark.stop()
  }
}
