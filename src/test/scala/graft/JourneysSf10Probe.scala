package graft

/** q385's at-scale datapoint: frequent 3-step journeys over sf10
  * events (1M events, 15k users after gensf.py's key-shifted
  * amplification — within-user session structure preserved exactly,
  * so session/path distributions scale linearly like real traffic).
  * The claims under test at 100×: per-row state stays O(k) (k−1
  * leads, no collect_list), path counts map-side combine, and the
  * global top-n plans as TakeOrderedAndProject — so runtime should
  * scale with the ONE (u, sid) exchange, not with path cardinality.
  */
object JourneysSf10Probe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/tmp/graft_sf10")
    def run(): (Double, Long, Long) = {
      val t0 = System.nanoTime()
      val out = graft.ops.EventOps.frequentJourneys(
        Tables(spark, dir, "events"), "ts", "user_id", "event_type",
        "event_id", gapSeconds = 1800.0, k = 3, topN = 20)
      val rows = out.collect()
      ((System.nanoTime() - t0) / 1e9, rows.length.toLong,
        rows.map(_.getLong(1)).sum)
    }
    val (cold, n1, s1) = run()
    val (warm, n2, s2) = run()
    require(n1 == n2 && s1 == s2, s"nondeterministic: $n1/$s1 vs $n2/$s2")
    println(f"""{"probe":"journeys_sf10","dir":"$dir","cold":$cold%.3f,"warm":$warm%.3f,"top_n":$n1,"sum_counts":$s1}""")
    spark.stop()
  }
}
