package graft.core

import graft.sources.JsonlIO
import org.apache.spark.sql.functions._

/** JSONL interchange: round-trip exactness (unicode, nulls, gzip)
  * and the fail-loud read contract (a corrupt line must fail the
  * job, not become a silent null row — the PERMISSIVE default's
  * 100 TB failure mode).
  */
class JsonlIOSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_jsonl_$tag")
      .toString + "/data"

  test("round-trip preserves unicode, nulls, and newlines in values") {
    val rows = Seq(
      (1L, Option("plain ascii"), Option("en")),
      (2L, Option("unicode é 世界 😀 and a\ttab"), Option("zh")),
      (3L, Option("embedded \"quotes\" and \\ backslash\nnewline"), None),
      (4L, None, Option("fr")))
    val df = rows.toDF("id", "text", "lang")
    val path = tmp("rt")
    JsonlIO.save(df, path)
    val back = JsonlIO.load(spark, path, df.schema)
      .orderBy("id").collect()
    val orig = df.orderBy("id").collect()
    assert(back.toSeq === orig.toSeq)
  }

  test("gzip round-trip is byte-identical and actually gzipped") {
    val df = (0 until 200).map(i => (i.toLong, s"doc $i é")).toDF("id", "t")
    val path = tmp("gz")
    JsonlIO.save(df, path, gzip = true)
    val files = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("part-"))
    assert(files.nonEmpty && files.forall(_.getName.endsWith(".json.gz")))
    val back = JsonlIO.load(spark, path, df.schema)
    assert(back.orderBy("id").collect().toSeq ===
      df.orderBy("id").collect().toSeq)
  }

  test("streaming ingest of a landing directory equals the batch " +
      "aggregate after each drop (exactly-once file tracking)") {
    val dir = tmp("stream")
    val schema = Seq((1L, "a", "x")).toDF("id", "src", "t").schema
    def drop(tag: String, rows: Seq[(Long, String, String)]): Unit = {
      // one JSONL shard landing in the directory (distinct file name
      // per drop, as a crawl shard would)
      val lines = rows.map { case (i, s, t) =>
        s"""{"id":$i,"src":"$s","t":"$t"}"""
      }.mkString("", "\n", "\n")
      new java.io.File(dir).mkdirs()
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$dir/shard_$tag.json"), lines)
    }
    drop("b1", Seq((1L, "s1", "aa"), (2L, "s2", "bb")))
    val q = JsonlIO.loadStream(spark, dir, schema, maxFilesPerTrigger = 1)
      .groupBy("src").agg(count(lit(1)).as("n"), sum(length(col("t"))).as("chars"))
      .writeStream.format("memory").queryName("jsonl_ingest")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      def got() = spark.sql("SELECT * FROM jsonl_ingest")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1).toSeq
      def batch() = JsonlIO.load(spark, dir, schema)
        .groupBy("src").agg(count(lit(1)).as("n"), sum(length(col("t"))).as("chars"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1).toSeq
      assert(got() === batch())
      drop("b2", Seq((3L, "s1", "cccc"), (4L, "s3", "d")))
      q.processAllAvailable()
      assert(got() === batch())
      assert(got() === Seq(("s1", 2L, 6L), ("s2", 1L, 2L), ("s3", 1L, 1L)))
    } finally q.stop()
  }

  test("a corrupt line fails the read loudly (FAILFAST), not as a " +
      "silent null row") {
    val path = tmp("bad")
    val df = Seq((1L, "ok")).toDF("id", "t")
    JsonlIO.save(df, path)
    // append a malformed line to one part file
    val part = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("part-")).head
    java.nio.file.Files.writeString(part.toPath,
      java.nio.file.Files.readString(part.toPath) + "{not json\n")
    val ex = intercept[org.apache.spark.SparkException] {
      JsonlIO.load(spark, path, df.schema).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("malformed") ||
      ex.getCause != null, ex.getMessage)
  }
}
