package graft
import org.apache.spark.sql.SparkSession
/** Scratch probe main (test scope): short-doc shingle guard. */
object ProbeShingles {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val docs = Seq((1L, "only two"), (2L, "a proper five token document here"), (3L, "")).toDF("doc_id", "text")
    val sh = graft.ops.DedupOps.wordShingles(docs, "doc_id", "text", 3)
    println("SHINGLE_ROWS=" + sh.collect().length)
    println("LSH_PAIRS=" + graft.ops.DedupOps.minHashLshPairs(docs, "doc_id", "text").collect().length)
    println("PROBE_OK")
    spark.stop()
  }
}
