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

  case class Frame(doc_id: Long, frame_idx: Int, offset: Int, frame: Array[Byte])

  /** Frame sampling: cut each payload into `nFrames` evenly-spaced
    * byte windows — the Spark-side shape of video frame extraction
    * (one input row → N frame rows with index + offset + bytes).
    * STUB codec: real frame boundaries need a demuxer; the windowing,
    * schema, and explode shape are the real plumbing. Narrow map, no
    * shuffle: frames stay co-partitioned with their source rows.
    */
  def sampleFrames(spark: SparkSession, binDocs: DataFrame, nFrames: Int,
      frameBytes: Int = 32): DataFrame = {
    import spark.implicits._
    binDocs.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val n = bytes.length
        (0 until nFrames).iterator.map { i =>
          val off = if (nFrames == 1) 0 else (i.toLong * math.max(n - frameBytes, 0) / math.max(nFrames - 1, 1)).toInt
          Frame(id, i, off, bytes.slice(off, math.min(off + frameBytes, n)))
        }
      }
      .toDF()
  }

  /** "Resize": deterministic fixed-size feature from a payload — the
    * shape of an image-resize/thumbnail stage (binary in, fixed-width
    * vector out). STUB: real resizing needs a codec; here each output
    * element is a byte-bucket average so the batch shape, schema and
    * determinism are testable end-to-end.
    */
  def resizeFeature(spark: SparkSession, binDocs: DataFrame, width: Int): DataFrame = {
    import spark.implicits._
    binDocs.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .map { case (id, bytes) =>
        val out = new Array[Double](width)
        if (bytes.nonEmpty) {
          val bucket = math.max(bytes.length / width, 1)
          var i = 0
          while (i < width) {
            val from = math.min(i * bucket, bytes.length - 1)
            val until = math.min(from + bucket, bytes.length)
            var s = 0.0
            var j = from
            while (j < until) { s += (bytes(j) & 0xff); j += 1 }
            out(i) = s / math.max(until - from, 1)
            i += 1
          }
        }
        (id, out)
      }
      .toDF("doc_id", "feature")
  }
}
