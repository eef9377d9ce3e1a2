package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line. Each query is driven
  * through the noop sink so the full projection executes (a bare
  * .count() would let Catalyst prune all column work); failures are
  * recorded as errors, never as fake timings.
  */
object Bench {

  /** Build the standard bench session (local[cpus], 32-partition
    * shuffle, UTC, UI off). Shared with [[IsoBench]] so isolated
    * samples run under the identical configuration.
    */
  private[graft] def session(): (SparkSession, String) = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    (spark, sfDir)
  }

  /** Warmup: JIT + codegen cache on the flagship parquet query, one
    * tiny CSV read so CSV-datasource init isn't charged to the first
    * CSV-reading query, and the convert machinery (interpreted
    * projections, window exec, encoders, broadcast path) on a
    * 2-interval SYNTHETIC input — different files than any query, so
    * query memoization stays cold and only generic JVM/Spark
    * machinery carries over.
    */
  private[graft] def warmup(spark: SparkSession, sfDir: String): Unit = {
    try SparkEntry.queries("q01_pricing_summary")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    try graft.core.format.CsvIO
      .readRaw(spark, "/root/reference/testdata/GLAD9_SectionSummary.csv")
      .limit(1).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    try {
      val dir = java.nio.file.Files.createTempDirectory("graft_warm")
      val sec = dir.resolve("sec.csv")
      val sp = dir.resolve("sparse.csv")
      java.nio.file.Files.writeString(sec,
        """Site,Hole,Core,CoreType,Section,CuratedLength,TopDepth,BottomDepth,TopDepthScaled,BottomDepthScaled
          |1,A,1,H,1,1.5,0.0,1.5,0.0,1.5
          |1,A,1,H,2,1.5,1.5,3.0,1.5,3.0
          |1,B,1,H,1,1.5,0.5,2.0,0.5,2.0
          |1,B,1,H,2,1.5,2.0,3.5,2.0,3.5
          |1,C,1,H,1,1.5,0.2,1.7,0.2,1.7
          |""".stripMargin)
      // Row 1 must carry a valid SpliceType: the fold consults the
      // PREVIOUS row's type for each subsequent interval and aborts on
      // unknown (reference semantics) — an empty type here made the
      // whole warmup silently no-op for several rounds.
      java.nio.file.Files.writeString(sp,
        """Site,Hole,Core,Type,TopSection,TopOffset,BottomSection,BottomOffset,SpliceType,Comment
          |1,A,1,H,1,10,2,50,TIE,
          |1,B,1,H,1,5,2,40,,
          |""".stripMargin)
      graft.core.splice.Convert.convertInMemory(spark, sec.toString, sp.toString)
    } catch { case _: Throwable => () }
  }

  /** Where the full JSON lands. bench_out.json is the SEAL benchaudit
    * calibrates against, and the driver's per-round (loaded-box) run
    * kept clobbering it — so only a run that declares itself a seal
    * (GRAFT_BENCH_SEAL=1) may write the seal path; every other
    * invocation — the driver's included — lands in
    * bench_out_driver.json, making the seal physically
    * un-clobberable. SPARK_GRAFT_BENCH_OUT overrides both —
    * tools/seal.py uses it to land the run in a CANDIDATE file that
    * is promoted to bench_out.json only after its in-bench control
    * gate passes.
    */
  private[graft] def outPath(env: Map[String, String]): String =
    env.get("SPARK_GRAFT_BENCH_OUT").getOrElse(
      if (env.get("GRAFT_BENCH_SEAL").contains("1")) "bench_out.json"
      else "bench_out_driver.json")

  /** 1-minute system load average (-1.0 where the JVM can't read it). */
  private[graft] def loadAvg(): Double =
    java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage

  /** Cumulative JVM GC time in seconds across all collectors. */
  private[graft] def gcSec(): Double = {
    val it = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.iterator()
    var ms = 0L
    while (it.hasNext) { val t = it.next().getCollectionTime; if (t > 0) ms += t }
    ms / 1e3
  }

  def main(args: Array[String]): Unit = {
    val (spark, sfDir) = session()
    warmup(spark, sfDir)
    val loadStart = loadAvg()
    // Each query runs three times: `queries` (cold) carries
    // first-plan analysis/codegen cost; `queries_warm` is the MIN of
    // two steady-state runs — the bench box shows ±10-15% run-to-run
    // noise (documented across rounds), and min-of-2 strips the
    // scheduling spikes a single sample keeps, while cold stays a
    // single sample by definition.
    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): (Double, Boolean) = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        ((System.nanoTime() - t0) / 1e9, true)
      } catch { case e: Throwable =>
        System.err.println(s"[bench] FAILED: ${e.getMessage}")
        ((System.nanoTime() - t0) / 1e9, false)
      }
    }
    // Per-query box-state telemetry (the seal self-adjudication the
    // r11/r12 contamination triage lacked): 1-min load average sampled
    // after the query's runs and the JVM GC seconds they spent. A
    // 3-10x "mover" whose load column is high (or whose GC column
    // explains the gap) is contamination, not a regression — benchdiff
    // auto-isobenches the rest.
    case class QRes(name: String, cold: Double, warm: Double,
      warmRuns: Seq[Double], ok: Boolean, load: Double, gc: Double)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val gc0 = gcSec()
      val (cold, okCold) = run(fn)
      val (warmRuns, okWarm) =
        if (!okCold) (Seq.empty[Double], false)
        else {
          val (w1, ok1) = run(fn)
          if (!ok1) (Seq(w1), false)
          else {
            val (w2, ok2) = run(fn)
            if (ok2) (Seq(w1, w2), true) else (Seq(w1, w2), false)
          }
        }
      val warm = if (warmRuns.nonEmpty) warmRuns.min else 0.0
      QRes(name, cold, warm, warmRuns, okCold && okWarm,
        loadAvg(), gcSec() - gc0)
    }
    val okResults = results.filter(_.ok)
    def jmap(f: QRes => Double) =
      okResults.map(r => "\"" + r.name + "\":" + f"${f(r)}%.3f").mkString("{", ",", "}")
    // Both steady-state samples per query, not just the min: the r7
    // triage showed cross-round comparisons are impossible without the
    // raw runs (was warm=5.58s a real plan cost or one scheduling
    // spike? the second sample answers that for free).
    val warmRunsJson = okResults.map(r =>
      "\"" + r.name + "\":[" + r.warmRuns.map(t => f"$t%.3f").mkString(",") + "]")
      .mkString("{", ",", "}")
    val errs = results.filterNot(_.ok).map("\"" + _.name + "\"").mkString("[", ",", "]")
    val total = okResults.map(_.cold).sum
    val totalWarm = okResults.map(_.warm).sum
    val loadEnd = loadAvg()
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":${jmap(_.cold)},"queries_warm":${jmap(_.warm)},"queries_warm_runs":$warmRunsJson,"warm_samples":2,"warm_stat":"min","total_warm":$totalWarm,"queries_load":${jmap(_.load)},"queries_gc_sec":${jmap(_.gc)},"load_avg_start":${f"$loadStart%.2f"},"load_avg_end":${f"$loadEnd%.2f"},"errors":$errs,"sf":"$sfDir"}"""
    println(json)
    // The driver scrapes stdout and has twice truncated the tail of
    // this line (r5/r6: "parsed": null, cold block unreadable) — also
    // persist the complete JSON to a file that gets committed, so the
    // full cold+warm read-out survives any pipe truncation.
    //
    // Seal protection (r16 VERDICT "What's wrong" #1): bench_out.json
    // is the QUIET-BOX SEAL benchaudit calibrates against, and the
    // driver's per-round (loaded-box) run kept clobbering it. Only a
    // run that declares itself a seal (GRAFT_BENCH_SEAL=1, set by
    // tools/seal.py after its preflight passes) may write the seal
    // path; every other invocation — the driver's included — lands in
    // bench_out_driver.json, so the seal is physically un-clobberable.
    val outPath = Bench.outPath(sys.env)
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), json + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outPath: ${e.getMessage}")
    }
    // The driver keeps only the LAST ~2000 chars of stdout, so the full
    // per-query line above always loses its head at 120+ queries
    // ("parsed": null in BENCH_r08/r09). Print a compact summary LAST —
    // it fits the tail window whole, so a line-wise JSON scrape finds
    // at least one complete, parseable record; per-query detail lives
    // in the full line and the committed bench_out.json.
    val slowest = okResults.sortBy(-_.warm).take(5)
      .map(r => "\"" + r.name + "\":" + f"${r.warm}%.3f").mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${okResults.size},"total_warm":$totalWarm,"warm_stat":"min","slowest_warm":$slowest,"load_avg_start":${f"$loadStart%.2f"},"load_avg_end":${f"$loadEnd%.2f"},"errors":$errs,"sf":"$sfDir","detail":"$outPath"}""")
    spark.stop()
  }
}
