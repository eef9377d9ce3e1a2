package graft
import org.apache.spark.sql.SparkSession

/** Triage harness for bench anomalies: runs a named subset of the
  * registered queries, in the given order, N reps each, and prints
  * every individual rep time (not just a summary statistic) so
  * run-to-run variance is measurable rather than guessed.
  *
  * Usage: runMain graft.ProbeBench <sfDir> <reps> <q1> [q2 ...]
  *
  * Distinct from Bench (the driver artifact): ProbeBench never writes
  * bench_out.json and is free to run any ordering/rep-count, which is
  * exactly what interference hypotheses need ("is q79 slow alone? only
  * after q78? only late in a long session?").
  */
object ProbeBench {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: ProbeBench <sfDir> <reps> <q1> [q2 ...]")
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // Hypothesis knobs ride in via SPARK_GRAFT_CONF="k=v;k=v" so a
    // config theory ("is the ObjectHashAggregate sort-based fallback
    // the cliff?") is one env var, not a recompile.
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(';').filter(_.nonEmpty)
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        builder.config(k, v)
      })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Same JIT warmup as Bench so rep 1 is comparable to a bench cold run.
    try SparkEntry.queries("q01_pricing_summary")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name"))
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val warm = times.drop(1)
      val mean = if (warm.nonEmpty) warm.sum / warm.size else times.head
      val sd = if (warm.size > 1)
        math.sqrt(warm.map(t => (t - mean) * (t - mean)).sum / (warm.size - 1))
      else 0.0
      println(f"""{"query":"$name","runs":[${times.map(t => f"$t%.3f").mkString(",")}],"warm_mean":$mean%.3f,"warm_sd":$sd%.3f}""")
    }
    spark.stop()
  }
}
