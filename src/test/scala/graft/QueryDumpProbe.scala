package graft
import org.apache.spark.sql.SparkSession

/** Local oracle-diff tool: dump a SUBSET of SparkEntry.queries to
  * parquet (Verify dumps all 100+ — too slow for iterating on one
  * query's oracle). Usage: Test/runMain graft.QueryDumpProbe
  * <sfDir> <outDir> <q1> [q2 ...], then diff against DuckDB.
  */
object QueryDumpProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: QueryDumpProbe <sfDir> <outDir> <q1> [q2 ...]")
    val sfDir = args(0); val outDir = args(1)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.drop(2).foreach { n =>
      SparkEntry.queries(n)(spark, sfDir).coalesce(1)
        .write.mode("overwrite").parquet(s"$outDir/$n")
      println(s"dumped $n")
    }
    // the selected queries' oracle SQL, driver-escaped, for the diff
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.view
      .filterKeys(args.drop(2).contains).toMap
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
