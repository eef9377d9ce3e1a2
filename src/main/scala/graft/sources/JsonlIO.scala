package graft.sources

import java.util.concurrent.ConcurrentHashMap
import java.util.function.{Function => JFunction}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSONL (newline-delimited JSON) interchange — the corpus format
  * training pipelines actually exchange (one document object per
  * line, splittable, optionally gzipped per file). Spark's native
  * JSON source/sink does the distributed work; this layer adds the
  * engine's loud-failure discipline on the READ side, where the
  * default (PERMISSIVE) silently nulls corrupt rows — at 100 TB a
  * truncated shard becomes millions of silently-empty documents.
  *
  * Write: `df.write.json` — one JSONL part-file per partition, no
  * driver involvement, codec via option (gzip splits per FILE, so
  * keep partitions sized for that).
  *
  * Read: explicit schema (REQUIRED — schema inference is a full
  * extra pass at corpus scale and type-flaps on dirty data) +
  * FAILFAST mode, so a malformed line fails the job with the line in
  * the error instead of becoming a null row.
  */
object JsonlIO {

  /** Distributed JSONL sink. `gzip = true` compresses per part-file. */
  def save(df: DataFrame, path: String, gzip: Boolean = false): Unit = {
    val w = df.write.mode("overwrite")
    (if (gzip) w.option("compression", "gzip") else w).json(path)
  }

  /** Schema-enforced, fail-loud JSONL scan. */
  def load(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("mode", "FAILFAST").json(path)

  /** Streaming JSONL ingest (the production continuous-ingestion
    * shape: a landing directory that crawl shards drop files into).
    * Same schema-enforced FAILFAST contract as [[load]]; the file
    * source tracks processed files in the checkpoint, so each shard
    * is ingested exactly once across restarts. `maxFilesPerTrigger`
    * bounds per-batch work (at 100 TB a landing burst must not
    * become one giant micro-batch).
    */
  def loadStream(spark: SparkSession, path: String, schema: StructType,
      maxFilesPerTrigger: Int = 16): DataFrame =
    spark.readStream.schema(schema).option("mode", "FAILFAST")
      .option("maxFilesPerTrigger", maxFilesPerTrigger).json(path)

  private case class WKey(appId: String, dir: String)
  private val demoDirs = new ConcurrentHashMap[WKey, String]()

  /** Path of the q378 demo JSONL export of `dir`'s documents table,
    * written ONCE per application+corpus (the IndexStore demo-store
    * discipline): select the portable columns, write gzipped JSONL.
    * The round-trip query reads it back and must hash-match the
    * oracle computed on the ORIGINAL parquet — proving writer,
    * codec, and reader preserve content exactly.
    */
  def demoJsonlPath(spark: SparkSession, dir: String): String = {
    val key = WKey(spark.sparkContext.applicationId, dir)
    demoDirs.computeIfAbsent(key, new JFunction[WKey, String] {
      override def apply(ignored: WKey): String = {
        val path = java.nio.file.Files
          .createTempDirectory("graft_q378").toString + "/docs"
        save(graft.Tables(spark, dir, "documents")
          .select("doc_id", "source", "lang", "n_chars", "text"),
          path, gzip = true)
        path
      }
    })
  }
}
