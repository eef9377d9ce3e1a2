package graft

/** Isolated single-query bench sample: one fresh JVM = one sample.
  *
  * Rounds 8–10 showed that shared-box bench numbers are routinely
  * contaminated by bursty host contention (BENCH_r10: two warm samples
  * of the same query on identical code differed 17×), and adjudicating
  * "regression or loaded box?" by after-the-fact forensics doesn't
  * scale. This main is the mechanical answer: it runs ONE named query
  * under the exact [[Bench]] configuration and warmup, then prints one
  * JSON line with the cold time, every steady-state sample, and the
  * host load average at start/end so contamination is visible in the
  * record itself. The `tools/isobench.py` wrapper spawns N of these
  * (fresh JVM each — no cross-sample JIT/codegen/page-cache coupling
  * beyond the OS file cache) and reports median + spread.
  *
  * Usage: graft.IsoBench <queryName> [warmRuns=5]
  * (env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS as for Bench)
  */
object IsoBench {
  private def loadAvg(): Double =
    try java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .getSystemLoadAverage
    catch { case _: Throwable => -1.0 }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: IsoBench <queryName> [warmRuns]")
    val name = args(0)
    val warmRuns = if (args.length > 1) args(1).toInt else 5
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query '$name'; see SparkEntry.queries"))
    val load0 = loadAvg()
    val (spark, sfDir) = Bench.session()
    Bench.warmup(spark, sfDir)
    def once(): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val cold = once()
    val warm = Seq.fill(warmRuns)(once())
    val load1 = loadAvg()
    val wj = warm.map(t => f"$t%.3f").mkString("[", ",", "]")
    println(f"""{"query":"$name","cold":$cold%.3f,"warm_runs":$wj,"warm_min":${warm.min}%.3f,"load_avg_start":$load0%.2f,"load_avg_end":$load1%.2f,"sf":"$sfDir"}""")
    spark.stop()
  }
}
