package graft
import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamOps
import graft.streaming.StreamOps.Event

/** Scratch probe main: drive StreamOps via MemoryStream + skew-guarded jaccard. */
object ProbeStream {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled","false").config("spark.sql.shuffle.partitions","4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    def ts(s: Long) = new Timestamp(s*1000)
    // streaming windowed counts
    val in1 = MemoryStream[(Long, Timestamp, String, Double)]
    val q1 = StreamOps.windowedCounts(in1.toDF().toDF("user_id","ts","event_type","value"), 300)
      .writeStream.format("memory").queryName("p_win").outputMode("append").start()
    in1.addData((1L, ts(10), "click", 1.0), (1L, ts(200), "click", 2.0), (1L, ts(5000), "click", 0.0))
    q1.processAllAvailable(); q1.stop()
    println("WIN_ROWS=" + spark.table("p_win").collect().mkString(";"))
    // streaming sessionizer incremental across two batches
    val in2 = MemoryStream[Event]
    val q2 = StreamOps.sessionize(spark, in2.toDS(), 1800.0)
      .writeStream.format("memory").queryName("p_sess").outputMode("update").start()
    in2.addData(Event(7L, ts(0), 1.0)); q2.processAllAvailable()
    in2.addData(Event(7L, ts(10000), 1.0)); q2.processAllAvailable()  // second batch: new session
    q2.stop()
    println("SESS=" + spark.table("p_sess").collect().mkString(";"))
    // skew-guarded jaccard on a pathological hot-shingle corpus
    val hot = "the quick brown fox jumps over the lazy dog"
    val docs = (0 until 200).map(i => (i.toLong, s"$hot tail $i")).toDF("doc_id","text")
    val sh = graft.ops.DedupOps.wordShingles(docs, "doc_id", "text", 3)
    val t0 = System.nanoTime()
    val n = graft.ops.DedupOps.ngramJaccardPairs(sh, 0.5, maxDocFrequency = 10).count()
    println(f"CAPPED_PAIRS=$n in ${(System.nanoTime()-t0)/1e9}%.1fs")
    spark.stop()
  }
}
