package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads + typed metadata.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic STUB — but the Spark-side plumbing is
  * real: a binary column, a typed mapPartitions pass (the Scala analogue
  * of `mapInPandas` batch processing), and a metadata struct schema that
  * downstream operators consume. At scale the binary column rides in
  * parquet alongside the metadata; partitioning is by whatever key the
  * caller already shuffles on (decode is a narrow map — zero shuffles).
  */
object MultimodalOps {

  case class MediaMeta(doc_id: Long, n_bytes: Int, width: Int, height: Int)

  /** Attach an opaque binary payload column (here derived from text —
    * stands in for an image/audio blob column in real data).
    */
  def withBinaryPayload(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"), col(textCol).cast("binary").as("payload"))

  /** "Decode" each payload into media metadata via a per-partition pass.
    * STUB: a real implementation would parse the container format here
    * (e.g. PNG IHDR / JPEG SOF0); this fake derives deterministic
    * dimensions from the byte length so the plumbing is testable.
    */
  def decodeMeta(spark: SparkSession, binDocs: DataFrame): DataFrame = {
    import spark.implicits._
    binDocs.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val n = bytes.length
          // STUB decode — deterministic fake dimensions from the length.
          MediaMeta(id, n, n % 64 + 1, (n / 64) % 64 + 1)
        }
      }
      .toDF()
  }
}
