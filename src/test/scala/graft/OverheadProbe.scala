package graft
import org.apache.spark.sql.SparkSession

/** Scratch probe: raw per-job and per-stage scheduling overhead on
  * this box (empty jobs, tiny shuffles, broadcast builds) — separates
  * "the box's job round-trip is slow" from "the query does too much".
  */
object OverheadProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def time(label: String, reps: Int)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime()
      (1 to reps).foreach(_ => f)
      println(f"$label: ${(System.nanoTime() - t0) / 1e6 / reps}%.1f ms/op")
    }
    time("empty rdd job (1 task)", 20) {
      spark.sparkContext.parallelize(Seq(1), 1).count()
    }
    time("empty rdd job (32 tasks)", 20) {
      spark.sparkContext.parallelize(1 to 32, 32).count()
    }
    time("df count 1 row (no shuffle)", 20) {
      spark.range(1).toDF("x").count()
    }
    time("df groupBy count (1 shuffle, AQE)", 20) {
      spark.range(100).toDF("x").groupBy($"x" % 10).count()
        .write.format("noop").mode("overwrite").save()
    }
    time("broadcast join tiny", 20) {
      val a = spark.range(100).toDF("x")
      val b = spark.range(10).toDF("x")
      a.join(org.apache.spark.sql.functions.broadcast(b), "x")
        .write.format("noop").mode("overwrite").save()
    }
    time("3-stage chain (2 shuffles)", 10) {
      spark.range(1000).toDF("x").groupBy($"x" % 100).count()
        .groupBy($"count").count()
        .write.format("noop").mode("overwrite").save()
    }
    time("localCheckpoint 1-partition", 10) {
      spark.range(100).toDF("x").repartition(1).localCheckpoint()
    }
    spark.stop()
  }
}
