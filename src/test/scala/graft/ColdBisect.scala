package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: bisect q243's cold cost — which sub-frame's FIRST noop
  * execution is slow in a fresh session. */
object ColdBisect {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try SparkEntry.queries("q01_pricing_summary")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    def t(label: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val df = f
      df.write.format("noop").mode("overwrite").save()
      val t1 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"$label: first=${(t1 - t0) / 1e9}%.2f second=${(System.nanoTime() - t1) / 1e9}%.2f")
    }
    val docs = Tables(spark, sfDir, "documents")
    val junk = ". zxq vlorp qeth wubble snarv gribbet zund flep vorx."
    val injected = docs.withColumn("text",
      when(col("doc_id") % 13 === 0, concat(col("text"), lit(junk)))
        .otherwise(col("text")))
    t("sentenceSpans") {
      graft.ops.LangSpanOps.sentenceSpans(injected, "doc_id", "text")
    }
    val spans = graft.ops.LangSpanOps.sentenceSpans(injected, "doc_id", "text")
      .select((col("doc_id") * 100000 + col("span_idx")).as("id"), col("span"))
    t("tokens of spans") {
      spans.select(col("id"), graft.ops.TextOps.tokens(col("span")).as("tk"))
    }
    t("ref bigram model (en slice)") {
      graft.ops.LmOps.model(
        docs.where(col("lang") === "en")
          .select(col("doc_id").as("id"), col("text").as("span")),
        "id", "span")
    }
    t("full score") {
      graft.ops.LmOps.score(spans,
        docs.where(col("lang") === "en")
          .select(col("doc_id").as("id"), col("text").as("span")),
        "id", "span")
    }
    spark.stop()
  }
}
