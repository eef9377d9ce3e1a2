package graft.core

import graft.ops.{CurationPipeline, IngestOps, PackOps}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** End-to-end composition of the training-data pipeline: a raw JSONL
  * drop (with garbage lines) is ingested, curated (length / language /
  * repetition / contamination / dedup), and the survivors are packed
  * into fixed-token training sequences — the full path a user of the
  * library would run, asserted stage by stage.
  */
class PipelineE2ESpec extends SparkSpec {
  import spark.implicits._

  test("jsonl drop → curation → dedup → sequence packing") {
    val words = (1 to 27).map(i => s"w$i").mkString(" ")
    val clean = s"the and of $words" // 30 tokens, en markers, no repeats
    val repeats = Seq.fill(15)("the and").mkString(" ") // dup 2-grams
    val contaminated = s"the and of alpha beta gamma delta " +
      (1 to 23).map(i => s"c$i").mkString(" ") // shares benchmark grams
    val docs = Seq(
      s"""{"doc_id": 1, "text": "$clean"}""",
      s"""{"doc_id": 2, "text": "$clean"}""", // exact dup of 1
      s"""{"doc_id": 3, "text": "$repeats"}""",
      s"""{"doc_id": 4, "text": "$contaminated"}""",
      s"""{"doc_id": 5, "text": "too short"}""",
      """corrupt {{{ line""")
    val dir = java.nio.file.Files.createTempDirectory("graft_e2e")
    java.nio.file.Files.write(dir.resolve("drop.jsonl"),
      docs.mkString("\n").getBytes("UTF-8"))

    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val batch = IngestOps.readJsonl(spark, dir.toString, schema)
    val (good, quarantine) = (batch.good, batch.quarantine)
    assert(good.count() == 5 && quarantine.count() == 1)

    // benchmark set shares doc 4's distinctive 3-grams
    val benchmark = Seq((100L, "alpha beta gamma delta epsilon"))
      .toDF("doc_id", "text")
    val survivors = CurationPipeline.curate(good, benchmark, "doc_id", "text")
    assert(survivors.select("id").as[Long].collect().toSet == Set(1L),
      "expected: dup collapses to lowest id; repeats/contaminated/short filtered")

    // survivors carry forward into chunking + packing
    val survivorDocs = good.join(survivors.select(col("id").as("doc_id")), "doc_id")
    val chunks = PackOps.chunkTokens(survivorDocs, "doc_id", "text",
      chunkSize = 16, overlap = 0)
      .collect().map(r => r.getInt(1) -> r.getInt(2)).toMap
    assert(chunks == Map(0 -> 16, 1 -> 14)) // 30 tokens -> 16 + 14

    val packed = PackOps.packSequences(survivorDocs, "doc_id",
      regexp_count(col("text"), lit("\\S+")), lit(0L), contextLen = 16)
      .head()
    assert(packed.getLong(3) == 0L && packed.getLong(6) == 2L) // spans 2 cuts
  }
}
