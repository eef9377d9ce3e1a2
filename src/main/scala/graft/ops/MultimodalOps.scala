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

  /** True pixel dimensions from a PNG IHDR or JPEG SOF frame header —
    * pure header arithmetic, no codec library.
    *
    *  - PNG: 8-byte signature, IHDR chunk fixed at offset 8; width and
    *    height are the two big-endian u32s at offsets 16 and 20.
    *  - JPEG: walk FFxx segments from SOI; any start-of-frame marker
    *    (C0-CF except C4/C8/CC) carries [len][precision][height u16]
    *    [width u16]. Standalone markers (SOI, RSTn, TEM) have no
    *    length field; fill bytes are skipped.
    *
    * None ⇒ not a recognizable image payload.
    */
  private[ops] def parseImageDims(b: Array[Byte]): Option[(Int, Int)] = {
    def u8(i: Int) = b(i) & 0xff
    def u16(i: Int) = (u8(i) << 8) | u8(i + 1)
    def u32(i: Int) = (u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    val pngSig = Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt, 0x0d, 0x0a, 0x1a, 0x0a)
    if (b.length >= 24 && pngSig.indices.forall(i => u8(i) == pngSig(i)) &&
        u8(12) == 'I' && u8(13) == 'H' && u8(14) == 'D' && u8(15) == 'R') {
      Some((u32(16).toInt, u32(20).toInt))
    } else if (b.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
      var i = 2
      while (i + 3 < b.length) {
        if (u8(i) != 0xff) return None // lost marker sync
        val m = u8(i + 1)
        if (m == 0xff) i += 1 // fill byte
        else if (m == 0xd8 || m == 0x01 || (m >= 0xd0 && m <= 0xd7)) i += 2 // standalone
        else {
          val len = u16(i + 2)
          if (len < 2) return None
          if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc)
            return if (i + 9 <= b.length) Some((u16(i + 7), u16(i + 5))) else None
          i += 2 + len
        }
      }
      None
    } else None
  }

  /** Decode each payload into media metadata via a per-partition pass.
    * PNG/JPEG payloads get their TRUE header dimensions
    * (parseImageDims); anything else falls back to the clearly-marked
    * deterministic stub (fake dims from byte length) so the plumbing
    * stays testable on text-derived payloads.
    */
  def decodeMeta(spark: SparkSession, binDocs: DataFrame): DataFrame = {
    import spark.implicits._
    binDocs.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val n = bytes.length
          parseImageDims(bytes) match {
            case Some((w, h)) => MediaMeta(id, n, w, h)
            // STUB decode — deterministic fake dimensions from the length.
            case None => MediaMeta(id, n, n % 64 + 1, (n / 64) % 64 + 1)
          }
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
