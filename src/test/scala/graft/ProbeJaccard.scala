package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProbeJaccard {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def t[A](name: String)(f: => A): A = { val t0=System.nanoTime(); val r=f; println(f"$name ${(System.nanoTime()-t0)/1e9}%.2fs"); r }
    t("warmup count")(docs.count())
    val sh = graft.ops.DedupOps.wordShingles(docs, "doc_id", "text", 3)
    t("shingles count")(println("  n=" + sh.count()))
    val hashed = sh.select(col("id"), xxhash64(col("shingle")).as("shingle"))
    val inter = t("self-join count"){ 
      val i = hashed.as("a").join(hashed.as("b"), col("a.shingle")===col("b.shingle") && col("a.id")<col("b.id"))
        .groupBy(col("a.id").as("a_id"), col("b.id").as("b_id")).agg(count(lit(1)).as("n_common"))
      println("  pairs=" + i.count()); i }
    t("full q39")(graft.ops.DedupOps.ngramJaccardPairs(sh, 0.2).write.format("noop").mode("overwrite").save())
    t("full q39 again")(graft.ops.DedupOps.ngramJaccardPairs(sh, 0.2).write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
