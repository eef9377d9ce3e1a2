package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All tables are read straight from parquet so Catalyst can push
  * filters/projections into the scan (verified via `PushedFilters` /
  * `ReadSchema` in `.explain("formatted")`).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** `events.parquet` has shipped `ts` two ways across driver testdata
    * generations: parquet TIMESTAMP(NANOS) (which Spark 4 rejects
    * outright — PARQUET_TYPE_ILLEGAL — so it is read as raw nanosecond
    * longs and floored to microseconds, exactly what DuckDB's parquet
    * reader does with the same file; `ts div 1000` is integral
    * division because a double-precision detour would round at
    * ~256 ns for 2024-era epochs and desync the hashes), and plain
    * TIMESTAMP(MICROS) without timezone (Spark: TIMESTAMP_NTZ). Both
    * normalize to session-TZ TIMESTAMP here: the session runs UTC, so
    * the NTZ→TZ cast is value-preserving and matches DuckDB's naive
    * reading of the same column.
    */
  private def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // The NTZ→TIMESTAMP cast below is value-preserving ONLY under UTC;
    // a non-UTC session would silently shift every event timestamp and
    // desync the DuckDB oracle — enforce the invariant here rather
    // than trusting every entry point's builder config.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    val df = spark.read.parquet(s"$dir/events.parquet")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case _ =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast("timestamp"))
    }
  }
}
