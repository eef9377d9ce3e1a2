package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off: dump kernel scores for a mixed-language corpus so the
  * generated q96 oracle can be cross-checked in DuckDB on text that
  * exercises the non-ASCII unigram branch.
  */
object LangDumpProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val docs = Seq(
      (1L, "The quick brown fox jumps over the lazy dog near the river bank."),
      (2L, "Die Würde des Menschen ist unantastbar und alle sollen das achten."),
      (3L, "Les élèves étudient à l'école près de la rivière chaque été."),
      (4L, "Los niños pequeños juegan en el jardín con su perro según costumbre."),
      (5L, "他们在图书馆里安静地阅读各种各样的书籍"),
      (6L, "mixed 内容 with ümlauts and accents é à ñ"),
      (7L, ""),
      (8L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    docs.write.mode("overwrite").parquet("/tmp/langprobe/documents.parquet")
    val q = graft.queries.PipelineQueries.queries("q96_lang_ngram")
    q(spark, "/tmp/langprobe").coalesce(1).write.mode("overwrite")
      .parquet("/tmp/langprobe_out")
    spark.stop()
  }
}
