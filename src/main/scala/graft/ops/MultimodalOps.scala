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

  /** Guarded parallelism floor for the payload generators: a small
    * single-file table scans as ONE split, which serializes the
    * (encode + downstream decode) mapPartitions passes onto one core
    * while the rest idle — measured 1.0 s single-task decode at sf0.1
    * for q177 with 31 cores idle. Repartition the NARROW pre-encode
    * rows (ids only — never payload bytes) up to defaultParallelism,
    * and ONLY when the scan is under-split: at real scale the scan
    * already has >= cores splits and this is a no-op, so no extra
    * exchange ever carries a wide row (guide §2.5 input-skew fix,
    * §8 "move heavy bytes once"). Delegates to the shared guard so
    * the floor logic lives in exactly one place.
    */
  private def spreadIds(df: DataFrame): DataFrame =
    SkewOps.parallelismFloor(df)

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
  private[graft] def parseImageDims(b: Array[Byte]): Option[(Int, Int)] = {
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

  // ---------------------------------------------------------------
  // REAL pixel path (JDK ImageIO — no external codec library):
  // synthetic formula-pixel images are PNG-ENCODED per row, then the
  // decode/resize operators read the payload back through the real
  // codec. PNG is lossless, so decoded pixels equal the generating
  // formula exactly — which makes the whole encode→decode→stats
  // round trip DuckDB-oracle-checkable (the oracle replays the
  // formula; a codec bug, a channel swap, a stride error all break
  // the hash). This replaces "stub decode" honesty with a verified
  // decoder for PNG; JPEG stays spec-only (lossy ⇒ no exact oracle).
  // ---------------------------------------------------------------

  /** Synthetic image dims per doc: width ∈ {8,16,24}, height ∈
    * {8,16,24}, both MULTIPLES of the 8×8 resize grid so box-average
    * cells divide evenly and integer cell math is exact (the resize
    * oracle depends on this).
    */
  private[graft] def imgDims(id: Long): (Int, Int) =
    (((id % 3) + 1).toInt * 8, (((id / 3) % 3) + 1).toInt * 8)

  /** Formula pixels (the oracle's ground truth): each channel a
    * small affine pattern mod 256.
    */
  private[graft] def pxR(id: Long, x: Int, y: Int): Int = ((x * 7 + y * 13 + id * 31) % 256).toInt
  private[graft] def pxG(id: Long, x: Int, y: Int): Int = ((x * 3 + y * 5 + id * 17) % 256).toInt
  private[graft] def pxB(id: Long, x: Int, y: Int): Int = ((x * 11 + y * 2 + id * 23) % 256).toInt

  private[graft] def syntheticImage(id: Long): java.awt.image.BufferedImage = {
    val (w, h) = imgDims(id)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, (pxR(id, x, y) << 16) | (pxG(id, x, y) << 8) | pxB(id, x, y))
        x += 1
      }
      y += 1
    }
    img
  }

  private[graft] def encodePng(img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Real PNG payloads (one per doc, ImageIO-encoded formula pixels).
    * Narrow map — encoding rides the scan, no shuffle; at real scale
    * this column comes from the data, the generator exists so the
    * decode path has verifiable input.
    */
  def withImagePayload(spark: SparkSession, docs: DataFrame, idCol: String): DataFrame = {
    import spark.implicits._
    spreadIds(docs.select(col(idCol).cast("long"))).as[Long]
      .mapPartitions(it => it.map(id => (id, encodePng(syntheticImage(id)))))
      .toDF("doc_id", "payload")
  }

  // ---------------------------------------------------------------
  // REAL JPEG path — the tolerance-band extension of the verified-
  // decoder discipline to the codec that dominates web crawls. JPEG
  // is lossy, so no exact oracle can exist; the engine-portable claim
  // is the CONTRACT: decoded dimensions match and every channel of
  // every pixel lands within a fixed error band of the generating
  // formula. The formula here is deliberately JPEG-FRIENDLY (smooth
  // per-channel linear ramps, no mod-256 wrap — the PNG path's
  // sawtooth formula measures up to 185 max error even at quality
  // 1.0, pure DCT/chroma noise): at quality 0.85 the measured worst
  // per-channel error across 600 docs is 5, while a channel SWAP
  // errs >= 27 on every doc — tolerance 12 sits between, so decode
  // failures, dimension/stride bugs, and channel swaps all flip
  // `within_tol` (a red hash row), and codec-version jitter does not.
  // ---------------------------------------------------------------

  private[graft] def jpxBase(id: Long, x: Int, y: Int): Int =
    (x * 5 + y * 3 + (id % 32)).toInt
  private[graft] def jpxR(id: Long, x: Int, y: Int): Int = jpxBase(id, x, y)
  private[graft] def jpxG(id: Long, x: Int, y: Int): Int = jpxBase(id, x, y) * 3 / 4
  private[graft] def jpxB(id: Long, x: Int, y: Int): Int = jpxBase(id, x, y) / 2

  private[graft] val JpegQuality = 0.85f
  private[graft] val JpegTolerance = 12

  private[graft] def syntheticJpegImage(id: Long): java.awt.image.BufferedImage = {
    val (w, h) = imgDims(id)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y,
          (jpxR(id, x, y) << 16) | (jpxG(id, x, y) << 8) | jpxB(id, x, y))
        x += 1
      }
      y += 1
    }
    img
  }

  private[graft] def encodeJpeg(img: java.awt.image.BufferedImage,
      quality: Float = JpegQuality): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val w = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val p = w.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try { w.setOutput(ios); w.write(null, new javax.imageio.IIOImage(img, null, null), p) }
    finally { ios.close(); w.dispose() }
    bos.toByteArray
  }

  /** Real JPEG payloads (ImageIO-encoded smooth-formula pixels). */
  def withJpegPayload(spark: SparkSession, docs: DataFrame, idCol: String): DataFrame = {
    import spark.implicits._
    spreadIds(docs.select(col(idCol).cast("long"))).as[Long]
      .mapPartitions(it => it.map(id => (id, encodeJpeg(syntheticJpegImage(id)))))
      .toDF("doc_id", "payload")
  }

  case class JpegCheck(doc_id: Long, width: Int, height: Int,
      n_px: Long, within_tol: Boolean)

  /** Decode each JPEG payload through the real codec and verify the
    * tolerance-band contract against the generating formula. Narrow
    * per-partition pass, zero shuffle. Non-decodable payloads drop
    * (a missing row is a red rows-count, not a silent pass).
    */
  def jpegDecodeCheck(spark: SparkSession, binDocs: DataFrame,
      tol: Int = JpegTolerance): DataFrame = {
    import spark.implicits._
    binDocs.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        decodeImage(bytes).map { img =>
          val (w, h) = (img.getWidth, img.getHeight)
          var maxErr = 0
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val er = math.abs(((rgb >> 16) & 0xff) - jpxR(id, x, y))
              val eg = math.abs(((rgb >> 8) & 0xff) - jpxG(id, x, y))
              val eb = math.abs((rgb & 0xff) - jpxB(id, x, y))
              val e = math.max(er, math.max(eg, eb))
              if (e > maxErr) maxErr = e
              x += 1
            }
            y += 1
          }
          JpegCheck(id, w, h, w.toLong * h, maxErr <= tol)
        }
      })
      .toDF()
  }

  case class ImageStats(doc_id: Long, width: Int, height: Int,
      sum_r: Long, sum_g: Long, sum_b: Long, mean_luma: Double)

  /** REAL decode: ImageIO.read each payload, full pixel scan, exact
    * integer channel sums + rounded mean luminance. Narrow
    * per-partition pass, zero shuffle — decoding 100 TB of images is
    * a CPU-bound scan that AQE/partition sizing parallelizes like any
    * other. Non-decodable payloads are dropped (flatMap), the honest
    * contract for a decode stage feeding stats.
    */
  def imageStats(spark: SparkSession, binDocs: DataFrame): DataFrame = {
    import spark.implicits._
    binDocs.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        decodeImage(bytes).map { img =>
          val (w, h) = (img.getWidth, img.getHeight)
          var (sr, sg, sb) = (0L, 0L, 0L)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
              x += 1
            }
            y += 1
          }
          // same double expression the oracle computes: exact integer
          // sums, ONE division, round-half-up at 5dp
          // 3L: an Int product overflows past ~715M pixels (payloads
          // are arbitrary, not just the small synthetic ones)
          val mean = BigDecimal((sr + sg + sb).toDouble / (3L * w * h))
            .setScale(5, BigDecimal.RoundingMode.HALF_UP).doubleValue
          ImageStats(id, w, h, sr, sg, sb, mean)
        }
      })
      .toDF()
  }

  case class ImageHistogram(doc_id: Long, n_bins_used: Int, top_bin: Int,
      top_n: Long, entropy: Double)

  /** Luminance histogram + Shannon entropy per image over the REAL
    * decode path: integer luma (r+g+b)/3 (floor), 8 bins of width 32,
    * per-bin counts as exact longs; entropy −Σ p·ln p summed in
    * fixed bin order and rounded 6dp. The exposure/contrast triage
    * a vision-data pipeline runs before training (flat histogram ≈
    * noise, single-bin ≈ blank/overexposed). Same verified-decoder
    * contract as [[imageStats]]: lossless PNG means the oracle
    * replays the formula pixels and must match exactly.
    */
  def imageHistogram(spark: SparkSession, binDocs: DataFrame): DataFrame = {
    import spark.implicits._
    binDocs.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        decodeImage(bytes).map { img =>
          val (w, h) = (img.getWidth, img.getHeight)
          val bins = new Array[Long](8)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val lum = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) +
                (rgb & 0xff)) / 3
              bins(lum / 32) += 1
              x += 1
            }
            y += 1
          }
          val total = (w.toLong * h).toDouble
          var ent = 0.0
          var used = 0
          var (topBin, topN) = (0, 0L)
          var b = 0
          while (b < 8) {
            val c = bins(b)
            if (c > 0) {
              used += 1
              ent -= (c / total) * math.log(c / total)
              if (c > topN) { topBin = b; topN = c }
            }
            b += 1
          }
          ImageHistogram(id, used, topBin, topN,
            BigDecimal(ent).setScale(6,
              BigDecimal.RoundingMode.HALF_UP).doubleValue)
        }
      })
      .toDF()
  }

  case class ResizeCells(doc_id: Long, n_cells: Int, cell_00: Long,
      sum_cells: Long, min_cell: Long, max_cell: Long)

  /** REAL resize: decode, box-average the pixels onto a `grid`×`grid`
    * luminance thumbnail. Cell values are scaled-integer millis
    * (sum·1000 / (3·boxPx), truncating division) so every engine —
    * this kernel, the pure-Scala spec reference, the DuckDB oracle —
    * computes the identical Long regardless of summation order;
    * a double box-mean would hash-drift on aggregation order.
    * Requires dims divisible by `grid` (the generator guarantees it);
    * indivisible payloads are dropped like non-decodable ones.
    */
  def resizeGrid(spark: SparkSession, binDocs: DataFrame, grid: Int = 8): DataFrame = {
    import spark.implicits._
    require(grid >= 1, s"grid must be >= 1, got $grid")
    binDocs.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        decodeImage(bytes).filter(i =>
          i.getWidth % grid == 0 && i.getHeight % grid == 0).map { img =>
          val (w, h) = (img.getWidth, img.getHeight)
          val (bx, by) = (w / grid, h / grid)
          val cells = Array.ofDim[Long](grid, grid)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              cells(y / by)(x / bx) +=
                ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
              x += 1
            }
            y += 1
          }
          val vals = for (j <- 0 until grid; i <- 0 until grid)
            yield cells(j)(i) * 1000L / (3L * bx * by)
          ResizeCells(id, grid * grid, vals.head, vals.sum, vals.min, vals.max)
        }
      })
      .toDF()
  }

  /** Real PNG payloads keyed by an EFFECTIVE image id: the payload is
    * the formula image of `key`, not of the doc id — distinct docs can
    * carry identical images, which is what an image-dedup operator
    * needs to find. (At real scale the payload column comes from the
    * data; the keyed generator exists so the dedup path has
    * verifiable, deliberately-duplicated input.)
    */
  def withImagePayloadKeyed(spark: SparkSession, docs: DataFrame,
      idCol: String, key: org.apache.spark.sql.Column): DataFrame = {
    import spark.implicits._
    val keyed = spreadIds(docs.select(col(idCol).cast("long").as("doc_id"),
      key.cast("long").as("_k")))
    // Encode each DISTINCT payload ONCE: the keyed generator exists to
    // create deliberate duplicate groups, so |payloads| = |distinct
    // keys| (97 in the fixture queries) while docs is corpus-sized.
    // PNG encode is allocation-heavy — doing it per ROW (600k encodes
    // at sf0.1 for 97 distinct images) made q177 the only >2× mover
    // between the round-10 quiet seals. The key-cardinality payload
    // dim broadcasts; the expensive measured work stays the DECODE
    // scan in the consumer (imageDHash / resizeGrid), which is the
    // per-row path a real binary column exercises.
    val dim = keyed.select(col("_k")).distinct().as[Long]
      .mapPartitions(_.map(k => (k, encodePng(syntheticImage(k)))))
      .toDF("_k", "payload")
    keyed.join(broadcast(dim), Seq("_k")).select("doc_id", "payload")
  }

  case class DHashRow(doc_id: Long, width: Int, height: Int, dhash: Long)

  /** Perceptual difference-hash (dHash) over the REAL decode path:
    * box-average to a `grid`×`grid` luminance thumbnail in exact
    * integer millis (the [[resizeGrid]] contract — summation-order-
    * proof), then one bit per horizontal gradient:
    * bit(j,i) = cell(j,i+1) > cell(j,i), packed row-major into a
    * grid·(grid−1)-bit long (56 bits at grid 8).
    *
    * Identical images → identical hash regardless of byte-level
    * re-encoding; the hash column is the 100 TB image-dedup path:
    * exact groups by equality here, Hamming-band multiprobe rides the
    * same column for near-dups. Zero shuffle (narrow decode scan);
    * non-decodable or grid-indivisible payloads drop, the
    * [[resizeGrid]] honesty contract.
    */
  def imageDHash(spark: SparkSession, binDocs: DataFrame,
      grid: Int = 8): DataFrame = {
    import spark.implicits._
    require(grid >= 2 && grid * (grid - 1) <= 62,
      s"grid must be in [2, 8], got $grid")
    binDocs.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        decodeImage(bytes).filter(i =>
          i.getWidth % grid == 0 && i.getHeight % grid == 0).map { img =>
          val (w, h) = (img.getWidth, img.getHeight)
          val (bx, by) = (w / grid, h / grid)
          val cells = Array.ofDim[Long](grid, grid)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              cells(y / by)(x / bx) +=
                ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
              x += 1
            }
            y += 1
          }
          var hash = 0L
          var j = 0
          while (j < grid) {
            var i = 0
            while (i < grid - 1) {
              val cur = cells(j)(i) * 1000L / (3L * bx * by)
              val nxt = cells(j)(i + 1) * 1000L / (3L * bx * by)
              if (nxt > cur) hash |= 1L << (j * (grid - 1) + i)
              i += 1
            }
            j += 1
          }
          DHashRow(id, w, h, hash)
        }
      })
      .toDF()
  }

  /** Near-duplicate image PAIRS by banded dHash: the 56-bit hash
    * splits into 4 bands of 14 bits; images sharing ANY band become
    * candidates (one equi-join per band via one explode — never a
    * cartesian), then candidates verify on full Hamming distance
    * (`bit_count(a xor b)`). Pigeonhole-EXACT for `maxHamming` ≤ 3:
    * fewer than 4 differing bits cannot touch all 4 bands, so every
    * true pair shares an intact band — recall 1.0 by construction,
    * the q41 SimHash discipline applied to pixels.
    *
    * Scale shape: decode scan (narrow) → 4 banded rows per image →
    * one equi-join keyed (band, bits) → distinct pair dedup → codegen
    * verify filter. Join fan-out is bounded by bucket occupancy
    * (near-dup density), not corpus²; the verify is exact integer
    * math. Output: (id_a < id_b, hamming).
    */
  def imageNearDupPairs(spark: SparkSession, binDocs: DataFrame,
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"maxHamming must be in [0, 3] (pigeonhole-exact with 4 bands), got $maxHamming")
    // the (id, dhash) frame feeds BOTH join sides: localCheckpoint it
    // (eager) or every side re-runs the full decode scan
    val h = imageDHash(spark, binDocs).select(col("doc_id"), col("dhash"))
      .localCheckpoint()
    val bands = explode(array((0 until 4).map { b =>
      struct(lit(b).as("band"),
        (shiftright(col("dhash"), b * 14) bitwiseAND lit((1L << 14) - 1))
          .as("bits"))
    }: _*)).as("bk")
    val banded = h.select(col("doc_id"), col("dhash"), bands)
      .select(col("doc_id"), col("dhash"),
        col("bk.band").as("band"), col("bk.bits").as("bits"))
    val a = banded.select(col("band"), col("bits"),
      col("doc_id").as("id_a"), col("dhash").as("ha"))
    val b = banded.select(col("band"), col("bits"),
      col("doc_id").as("id_b"), col("dhash").as("hb"))
    a.join(b, Seq("band", "bits")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).as("hamming"))
      .dropDuplicates("id_a", "id_b")
      .filter(col("hamming") <= maxHamming)
  }

  /** Near-dup HISTOGRAM without materializing pairs: the corpus
    * collapses to HASH GROUPS first (n, two smallest ids per dhash),
    * then the banded join runs over DISTINCT hashes only —
    * hash-cardinality quadratics instead of corpus-cardinality — and
    * pair counts come back by multiplication:
    *
    *   hamming 0: Σ_groups n·(n−1)/2, first pair = the group's two
    *     smallest ids;
    *   hamming 1..3: per hash pair n_a·n_b, first pair =
    *     (least, greatest) of the two group minima — provably the
    *     lexicographic min over that cell's expanded pairs.
    *
    * Same output contract as aggregating [[imageNearDupPairs]]
    * (spec-pinned differential), but the quadratic step never touches
    * corpus cardinality — at 100 TB with dup-heavy corpora the pair
    * materialization IS the job, and this skips it. Output:
    * (hamming, n_pairs, first_a, first_b).
    */
  def imageNearDupStats(spark: SparkSession, binDocs: DataFrame,
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"maxHamming must be in [0, 3] (pigeonhole-exact with 4 bands), got $maxHamming")
    // (id, dhash) feeds two aggregations and a join — checkpoint so
    // the decode scan runs ONCE (16 bytes/row, corpus-cardinality)
    val h = imageDHash(spark, binDocs).select(col("doc_id"), col("dhash"))
      .localCheckpoint()
    val g1 = h.groupBy("dhash")
      .agg(count(lit(1)).as("n"), min("doc_id").as("m1"))
    // second-smallest id via one more user-keyed pass (no unbounded
    // per-group collects — dup groups can be huge)
    val g2 = h.join(g1, "dhash").filter(col("doc_id") > col("m1"))
      .groupBy("dhash").agg(min("doc_id").as("m2"))
    val groups = g1.join(g2, Seq("dhash"), "left")
    val within = groups.filter(col("n") >= 2)
      .select(lit(0).as("hamming"),
        (col("n") * (col("n") - 1) / 2).cast("long").as("n_pairs"),
        struct(col("m1").as("id_a"), col("m2").as("id_b")).as("fp"))
    val banded = groups.select(col("dhash"), col("n"), col("m1"),
        posexplode(array((0 until 4).map(b =>
          shiftright(col("dhash"), b * 14) bitwiseAND lit((1L << 14) - 1)): _*))
          .as(Seq("band", "bits")))
    val a = banded.select(col("band"), col("bits"), col("dhash").as("ha"),
      col("n").as("na"), col("m1").as("ma"))
    val b = banded.select(col("band"), col("bits"), col("dhash").as("hb"),
      col("n").as("nb"), col("m1").as("mb"))
    val cross = a.join(b, Seq("band", "bits")).filter(col("ha") < col("hb"))
      .select(col("ha"), col("hb"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).as("hamming"),
        col("na"), col("nb"), col("ma"), col("mb"))
      .dropDuplicates("ha", "hb")
      .filter(col("hamming") >= 1 && col("hamming") <= maxHamming)
      .select(col("hamming"), (col("na") * col("nb")).cast("long").as("n_pairs"),
        struct(least(col("ma"), col("mb")).as("id_a"),
          greatest(col("ma"), col("mb")).as("id_b")).as("fp"))
    within.unionByName(cross)
      .groupBy("hamming")
      .agg(sum("n_pairs").as("n_pairs"), min("fp").as("first_pair"))
      .select(col("hamming"), col("n_pairs"),
        col("first_pair.id_a").as("first_a"),
        col("first_pair.id_b").as("first_b"))
  }

  // ImageIO defaults to a FILE-backed ImageInputStream cache: every
  // read/write creates+deletes a temp file, and under 32 concurrent
  // decode tasks the temp-dir churn serialized the stage (measured
  // 67 s of task time for 5000 tiny decodes that take ~1 s
  // sequentially). Payloads here are in-memory byte arrays — the
  // memory cache is strictly better at any scale.
  javax.imageio.ImageIO.setUseCache(false)

  private[graft] def decodeImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
    // NonFatal, not just IOException: codec internals throw unchecked
    // (IllegalArgument/CMM/ArrayIndexOutOfBounds) on corrupt payloads,
    // and the contract is "non-decodable payloads are dropped", not
    // "one malformed image fails the task"
    catch { case scala.util.control.NonFatal(_) => None }

  // ---------------------------------------------------------------
  // REAL audio path (JDK javax.sound.sampled — WAV/PCM): same
  // verified-decode discipline as the PNG path. Formula samples are
  // WAV-encoded through AudioSystem per row; the decode operator
  // reads them back through the real parser (header walk, fmt/data
  // chunks, little-endian s16 frames). PCM is lossless, so decoded
  // samples equal the formula exactly and the whole round trip is
  // DuckDB-oracle-checkable. No audio hardware involved — WAV IO is
  // pure bytes, headless-safe.
  // ---------------------------------------------------------------

  val AudioSampleRate = 8000f

  // javax.sound.sampled.AudioSystem routes EVERY read/write through
  // its provider registry, and the registry lookup
  // (JDK13Services.getProviders) is a static synchronized method — a
  // JVM-WIDE lock taken per call. 32 concurrent encode/decode tasks
  // serialize on it (measured r17: spreading the audio generators to
  // 32 tasks REGRESSED q99 0.7→1.9 s purely on this lock). Resolve
  // the WAV reader/writer ONCE per JVM and call the SPI objects
  // directly — identical parsers, zero registry traffic (guide §4.5
  // "initialise heavyweight state once per task, not per row").
  private lazy val wavWriter: javax.sound.sampled.spi.AudioFileWriter = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileWriter]).asScala
      .find(_.isFileTypeSupported(
        javax.sound.sampled.AudioFileFormat.Type.WAVE))
      .getOrElse(sys.error("no WAVE AudioFileWriter provider on this JVM"))
  }
  private lazy val wavReader: javax.sound.sampled.spi.AudioFileReader = {
    import scala.jdk.CollectionConverters._
    // capability-probe with a minimal WAV rather than matching class
    // names: whichever provider parses a real WAV header is the one
    // AudioSystem would have dispatched to
    val probe = {
      val fmt = new javax.sound.sampled.AudioFormat(AudioSampleRate, 16,
        1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(new Array[Byte](8)), fmt, 4L)
      val bos = new java.io.ByteArrayOutputStream()
      wavWriter.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileReader]).asScala
      .find { r =>
        try {
          r.getAudioInputStream(
            new java.io.ByteArrayInputStream(probe)).close(); true
        } catch { case scala.util.control.NonFatal(_) => false }
      }
      .getOrElse(sys.error("no WAVE AudioFileReader provider on this JVM"))
  }

  /** Samples per doc: 400..2000, varying so frame-count handling is
    * actually exercised.
    */
  private[graft] def audioLen(id: Long): Int = ((id % 5) + 1).toInt * 400

  /** Formula sample (the oracle's ground truth): affine mod 2^16,
    * shifted to signed s16 — full amplitude range, deterministic.
    */
  private[graft] def sampleAt(id: Long, i: Int): Int =
    ((i * 37 + id * 101) % 65536).toInt - 32768

  private[graft] def encodeWav(id: Long): Array[Byte] = {
    val n = audioLen(id)
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = sampleAt(id, i)
      pcm(2 * i) = (s & 0xff).toByte          // little-endian s16
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(AudioSampleRate, 16, 1,
      true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    wavWriter.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Real WAV payloads, one per doc — the audio twin of
    * [[withImagePayload]].
    */
  def withAudioPayload(spark: SparkSession, docs: DataFrame, idCol: String): DataFrame = {
    import spark.implicits._
    // spread restored (r17 had it reverted): encode/decode now call
    // the per-JVM-resolved WAV SPI objects directly, so the
    // AudioSystem registry lock that made 32 concurrent tasks SLOWER
    // than one (q99 0.7→2.0 s) is out of the path entirely.
    spreadIds(docs.select(col(idCol).cast("long"))).as[Long]
      .mapPartitions(it => it.map(id => (id, encodeWav(id))))
      .toDF("doc_id", "payload")
  }

  /** Keyed WAV payloads (doc_id mod a group key) — the audio twin of
    * [[withImagePayloadKeyed]]: distinct docs share identical audio,
    * so fingerprint dedup has real duplicate groups to find.
    */
  def withAudioPayloadKeyed(spark: SparkSession, docs: DataFrame,
      idCol: String, key: org.apache.spark.sql.Column): DataFrame = {
    import spark.implicits._
    // same memoized-dim shape as [[withImagePayloadKeyed]]: encode
    // each distinct key's WAV once, broadcast-join onto the corpus.
    // The corpus ids are spread so the DOWNSTREAM per-row decode
    // parallelizes (lock-free now — see wavReader)
    val keyed = spreadIds(docs.select(col(idCol).cast("long").as("doc_id"),
      key.cast("long").as("_k")))
    val dim = keyed.select(col("_k")).distinct().as[Long]
      .mapPartitions(_.map(k => (k, encodeWav(k))))
      .toDF("_k", "payload")
    keyed.join(broadcast(dim), Seq("_k")).select("doc_id", "payload")
  }

  case class AudioFingerprint(doc_id: Long, n_samples: Int, afp: Long)

  /** Perceptual audio fingerprint over the REAL decode path: split
    * the decoded samples into `frames` equal index ranges (frame of
    * sample i = i·frames/n, exact integer arithmetic), sum |s| per
    * frame, and hash the ENERGY-DERIVATIVE SIGN — bit f set iff
    * frame f+1 is louder than frame f. The dHash discipline on
    * audio: robust to level-preserving re-encodes, exact-integer so
    * the lossless-PCM oracle replays it bit-for-bit. Equal hashes →
    * dedup bucket keys, exactly like the image dHash path. Narrow
    * per-partition pass, zero shuffle; undecodable payloads drop.
    */
  def audioFingerprint(spark: SparkSession, binDocs: DataFrame,
      frames: Int = 32): DataFrame = {
    import spark.implicits._
    require(frames >= 2 && frames <= 63, s"frames must be in [2,63], got $frames")
    binDocs.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        decodeWavS16Mono(bytes).filter(_._2.length >= frames).map {
          case (_, samples) =>
            val n = samples.length
            val e = new Array[Long](frames)
            var i = 0
            while (i < n) {
              e((i.toLong * frames / n).toInt) += math.abs(samples(i))
              i += 1
            }
            var fp = 0L
            var f = 0
            while (f < frames - 1) {
              if (e(f + 1) > e(f)) fp |= 1L << f
              f += 1
            }
            AudioFingerprint(id, n, fp)
        }
      })
      .toDF()
  }

  // ---------------------------------------------------------------
  // Spectral features: fixed-bin DFT over the verified WAV decode —
  // the standard next step past the energy-derivative fingerprint
  // (q214) for audio dedup (tone/timbre structure survives level
  // changes that re-shape frame energies).
  //
  // Exactness discipline (the LangNgram frozen-integer-model move):
  // cos/sin are IRRATIONAL, so a double DFT can drift across engines
  // — instead the basis is a FROZEN integer table round(cos·128) /
  // round(sin·128), derived once at class-init from fixed constants
  // and embedded verbatim in the DuckDB oracle's VALUES. Every
  // feature is then pure integer multiply-add: re,im ≤ 256·2¹⁵·2⁷ =
  // 2³⁰, power = re²+im² ≤ 2⁶¹ — long-exact, order-free,
  // engine-identical.
  // ---------------------------------------------------------------

  /** Analysis frame: first `SpectralFrame` samples (shorter audio is
    * dropped — the verified-decode honesty contract).
    */
  val SpectralFrame = 256

  /** DFT bins analyzed (cycles per frame). */
  val SpectralBins: Seq[Int] = Seq(1, 2, 4, 8, 16)

  /** Integer basis scale (2⁷ — headroom chosen so power fits a long). */
  val SpectralScale = 128

  private[graft] lazy val spectralCos: Array[Array[Long]] =
    SpectralBins.map(k => Array.tabulate(SpectralFrame)(i =>
      math.round(math.cos(2.0 * math.Pi * k * i / SpectralFrame)
        * SpectralScale))).toArray

  private[graft] lazy val spectralSin: Array[Array[Long]] =
    SpectralBins.map(k => Array.tabulate(SpectralFrame)(i =>
      math.round(math.sin(2.0 * math.Pi * k * i / SpectralFrame)
        * SpectralScale))).toArray

  /** Pure-Scala reference for one frame (the differential-spec twin
    * and the in-task kernel): per analyzed bin, power = re² + im²
    * under the frozen integer basis.
    */
  private[graft] def spectralPowers(samples: Array[Int]): Array[Long] = {
    val out = new Array[Long](SpectralBins.size)
    var b = 0
    while (b < SpectralBins.size) {
      val ct = spectralCos(b); val st = spectralSin(b)
      var re = 0L; var im = 0L
      var i = 0
      while (i < SpectralFrame) {
        re += samples(i) * ct(i)
        im += samples(i) * st(i)
        i += 1
      }
      out(b) = re * re + im * im
      b += 1
    }
    out
  }

  case class SpectralRow(doc_id: Long, n_samples: Int, p_1: Long,
      p_2: Long, p_4: Long, p_8: Long, p_16: Long, dom_bin: Int)

  /** Fixed-bin spectral power features over the REAL decode path:
    * first-frame integer DFT at [[SpectralBins]], plus the dominant
    * bin (argmax power, smaller bin on ties). Narrow per-partition
    * scan, zero shuffle; undecodable or sub-frame payloads drop.
    */
  def audioSpectral(spark: SparkSession, binDocs: DataFrame): DataFrame = {
    import spark.implicits._
    binDocs.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        decodeWavS16Mono(bytes).filter(_._2.length >= SpectralFrame).map {
          case (_, samples) =>
            val p = spectralPowers(samples)
            var dom = 0
            var b = 1
            while (b < p.length) {
              if (p(b) > p(dom)) dom = b
              b += 1
            }
            SpectralRow(id, samples.length, p(0), p(1), p(2), p(3), p(4),
              SpectralBins(dom))
        }
      })
      .toDF()
  }

  /** DuckDB replay of [[audioSpectral]] over the keyed synthetic
    * payloads (key = doc_id % `mod`): formula samples for the first
    * frame, the frozen integer basis embedded verbatim as VALUES,
    * identical integer multiply-add.
    */
  def audioSpectralOracleSql(mod: Int): String = {
    val rows = (0 until SpectralFrame).map { i =>
      val cs = SpectralBins.indices
        .flatMap(b => Seq(spectralCos(b)(i), spectralSin(b)(i)))
      s"($i, ${cs.mkString(", ")})"
    }.mkString(",\n ")
    val cols = SpectralBins.map(k => s"c_$k, s_$k").mkString(", ")
    val sums = SpectralBins.map(k =>
      s"sum(s * c_$k) AS re_$k, sum(s * s_$k) AS im_$k").mkString(",\n    ")
    val pows = SpectralBins.map(k =>
      s"re_$k * re_$k + im_$k * im_$k AS p_$k").mkString(",\n  ")
    val dom = SpectralBins.init.zipWithIndex.map { case (k, idx) =>
      val laters = SpectralBins.drop(idx + 1).map(o => s"p_$k >= p_$o")
        .mkString(" AND ")
      s"WHEN $laters THEN $k"
    }.mkString("CASE ", " ", s" ELSE ${SpectralBins.last} END")
    s"""WITH d AS (SELECT doc_id, doc_id % $mod AS k FROM documents),
       |keys AS (SELECT DISTINCT k, (k % 5 + 1) * 400 AS n FROM d),
       |i0 AS (SELECT k, n, unnest(range(0, $SpectralFrame)) AS i FROM keys),
       |sa AS (SELECT k, n, i,
       |    (i * 37 + k * 101) % 65536 - 32768 AS s FROM i0),
       |tab (i, $cols) AS (VALUES
       | $rows),
       |g AS (SELECT k, any_value(n) AS n,
       |    $sums
       |  FROM sa JOIN tab USING (i) GROUP BY k),
       |p AS (SELECT k, n, $pows FROM g)
       |SELECT d.doc_id, CAST(p.n AS INTEGER) AS n_samples,
       |  ${SpectralBins.map(k => s"CAST(p_$k AS BIGINT) AS p_$k").mkString(", ")},
       |  CAST($dom AS INTEGER) AS dom_bin
       |FROM d JOIN p USING (k)""".stripMargin
  }

  case class AudioStats(doc_id: Long, n_samples: Int, sample_rate: Int,
      min_s: Int, max_s: Int, sum_abs: Long, mean_abs: Double)

  /** REAL audio decode: AudioSystem parses each WAV payload (format
    * + frames), then a full sample scan computes exact integer
    * amplitude stats + rounded mean |amplitude|. Narrow
    * per-partition pass, zero shuffle — the audio-feature scan at
    * 100 TB parallelizes like any other. Non-WAV or non-s16-mono
    * payloads are dropped, same contract as [[imageStats]].
    */
  def audioStats(spark: SparkSession, binDocs: DataFrame): DataFrame = {
    import spark.implicits._
    binDocs.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        decodeWavS16Mono(bytes).map { case (rate, samples) =>
          var (mn, mx, sa) = (Int.MaxValue, Int.MinValue, 0L)
          var i = 0
          while (i < samples.length) {
            val s = samples(i)
            if (s < mn) mn = s
            if (s > mx) mx = s
            sa += math.abs(s)
            i += 1
          }
          val mean = BigDecimal(sa.toDouble / samples.length)
            .setScale(5, BigDecimal.RoundingMode.HALF_UP).doubleValue
          AudioStats(id, samples.length, rate, mn, mx, sa, mean)
        }
      })
      .toDF()
  }

  /** Decode a WAV payload to (sampleRate, s16 samples) through the
    * real JDK parser; None unless PCM-signed 16-bit mono (the honest
    * drop, not a guess).
    */
  private[graft] def decodeWavS16Mono(bytes: Array[Byte]): Option[(Int, Array[Int])] =
    try {
      // direct SPI call — see wavReader: AudioSystem's registry lookup
      // is a JVM-wide lock per call. Non-WAV payloads throw
      // UnsupportedAudioFileException here exactly as before → None.
      val ais = wavReader.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val f = ais.getFormat
      if (f.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
          f.getSampleSizeInBits != 16 || f.getChannels != 1) None
      else {
        val raw = ais.readAllBytes()
        val n = raw.length / 2
        val out = new Array[Int](n)
        var i = 0
        if (f.isBigEndian)
          while (i < n) { out(i) = (raw(2 * i) << 8) | (raw(2 * i + 1) & 0xff); i += 1 }
        else
          while (i < n) { out(i) = (raw(2 * i + 1) << 8) | (raw(2 * i) & 0xff); i += 1 }
        Some((f.getSampleRate.toInt, out))
      }
    } catch {
      // same dropped-not-fatal contract as decodeImage
      case scala.util.control.NonFatal(_) => None
    }

  case class AudioFeatures(doc_id: Long, src_rate: Int, n_samples: Int,
      duration_ms: Long, duration_bucket: Long, target_rate: Int,
      n_out: Int, min_out: Int, max_out: Int, sum_abs_out: Long)

  /** Audio FEATURES beyond raw stats: nearest-neighbor resample to
    * `targetRate` plus duration bucketing — the two features a
    * training-data audio pipeline derives before batching (uniform
    * sample rate for the model, duration buckets for length-grouped
    * packing). All math is integer-exact so the oracle replays it:
    * the resampled signal is out(i) = s(floor(i·srcRate/targetRate))
    * for i < floor(n·targetRate/srcRate) — nearest-neighbor on
    * purpose: interpolation needs float rounding contracts that are
    * codec-portable only by convention, while index arithmetic is
    * exact in every engine, and the verified-decode contract (decoded
    * samples equal the formula) carries through the index map
    * untouched. duration_ms = n·1000/srcRate (integer), bucketed
    * every `bucketMs`. Narrow per-partition pass, zero shuffle;
    * non-WAV/non-s16-mono payloads drop.
    */
  def audioFeatures(spark: SparkSession, binDocs: DataFrame,
      targetRate: Int = 3000, bucketMs: Int = 100): DataFrame = {
    import spark.implicits._
    require(targetRate >= 1, s"targetRate must be >= 1, got $targetRate")
    require(bucketMs >= 1, s"bucketMs must be >= 1, got $bucketMs")
    binDocs.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        decodeWavS16Mono(bytes).map { case (rate, samples) =>
          val n = samples.length
          val nOut = (n.toLong * targetRate / rate).toInt
          var (mn, mx, sa) = (Int.MaxValue, Int.MinValue, 0L)
          var i = 0
          while (i < nOut) {
            val s = samples((i.toLong * rate / targetRate).toInt)
            if (s < mn) mn = s
            if (s > mx) mx = s
            sa += math.abs(s)
            i += 1
          }
          if (nOut == 0) { mn = 0; mx = 0 }
          val durMs = n.toLong * 1000 / rate
          AudioFeatures(id, rate, n, durMs, durMs / bucketMs,
            targetRate, nOut, mn, mx, sa)
        }
      })
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

  /** Scene-change segmentation over sampled frames — the video-side
    * dedup/summarization primitive (shot detection): consecutive
    * frames are compared and a "cut" recorded where the frame content
    * changes; a video with k cuts has k+1 scenes. The comparison here
    * is exact byte equality on the [[sampleFrames]] windows (a real
    * deployment swaps in a perceptual distance over decoded frames —
    * same plan, different frame feature); n_distinct_frames bounds the
    * dedup win from per-scene keyframe retention.
    *
    * Scale shape: one narrow frame-explode scan, then a single
    * doc_id-partitioned window (nFrames rows per key) and one
    * aggregation on the same key — one shuffle total, frame bytes
    * never shuffle twice (lag runs inside the partition).
    *
    * @return per doc: (doc_id, n_frames, n_cuts, n_scenes,
    *         n_distinct_frames)
    */
  def sceneSegments(spark: SparkSession, binDocs: DataFrame,
      nFrames: Int, frameBytes: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("doc_id").orderBy("frame_idx")
    sampleFrames(spark, binDocs, nFrames, frameBytes)
      .withColumn("prev", lag("frame", 1).over(w))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_frames"),
        sum(when(col("prev").isNotNull &&
          !(col("frame") <=> col("prev")), 1L).otherwise(0L)).as("n_cuts"),
        countDistinct(col("frame")).as("n_distinct_frames"))
      .select(col("doc_id"), col("n_frames"), col("n_cuts"),
        (col("n_cuts") + 1).as("n_scenes"), col("n_distinct_frames"))
  }

  /** Keyframe selection — the retention artifact of
    * [[sceneSegments]]: the FIRST frame of every scene (frame 0 plus
    * each cut frame) is what a video pipeline actually stores for
    * preview/dedup/embedding; the rest of the scene is redundant by
    * the cut criterion. Emits the frame coordinates (index, offset,
    * length), not the bytes — the downstream fetch is a byte-range
    * read against the original payload, so nothing re-shuffles frame
    * content.
    *
    * Same shape as sceneSegments: one narrow frame scan + one
    * doc-keyed window; zero joins.
    *
    * @return keyframe rows: (doc_id, frame_idx, offset, frame_len)
    */
  def keyframes(spark: SparkSession, binDocs: DataFrame,
      nFrames: Int, frameBytes: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("doc_id").orderBy("frame_idx")
    sampleFrames(spark, binDocs, nFrames, frameBytes)
      .withColumn("prev", lag("frame", 1).over(w))
      .where(col("prev").isNull || !(col("frame") <=> col("prev")))
      .select(col("doc_id"), col("frame_idx"), col("offset"),
        length(col("frame")).cast("int").as("frame_len"))
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

  // ---------------------------------------------------------------
  // Video path: deterministic container ("GVI1" — 16-byte header:
  // magic, w/h u16 LE, fps u8, n_frames u16 LE, 5 reserved; then
  // n_frames × w·h bytes of 8-bit luma), REAL byte-walk decode.
  // Video codec libraries aren't in this container, so the CODEC is
  // a deterministic stub by design (per the builder brief) — but the
  // Spark-side plumbing is real and tested: binary column, header
  // parse + length validation, frame-stride math, every-k frame
  // sampling, scene-cut detection, and a temporal near-dup signature
  // (the dHash/audio-fingerprint discipline applied to the time
  // axis). The luma formula (p·31 + f·57 + id·13) mod 251 is
  // SQL-expressible, so — like the WAV path — every operator here is
  // DuckDB-oracle-checkable end to end.
  // ---------------------------------------------------------------

  /** (width, height, fps, n_frames) per id — sizes vary so frame
    * and stride handling is actually exercised.
    */
  private[graft] def videoDims(id: Long): (Int, Int, Int, Int) =
    (8 + (id % 3).toInt * 4, 8, 10, 24 + (id % 4).toInt * 8)

  /** Formula pixel (the oracle's ground truth). In [0, 250]. */
  private[graft] def videoPixel(id: Long, f: Int, p: Int): Int =
    ((p * 31L + f * 57L + id * 13L) % 251L).toInt

  private[graft] def encodeVideo(id: Long): Array[Byte] = {
    val (w, h, fps, nf) = videoDims(id)
    val out = new Array[Byte](16 + w * h * nf)
    out(0) = 'G'; out(1) = 'V'; out(2) = 'I'; out(3) = '1'
    out(4) = (w & 0xff).toByte; out(5) = ((w >> 8) & 0xff).toByte
    out(6) = (h & 0xff).toByte; out(7) = ((h >> 8) & 0xff).toByte
    out(8) = fps.toByte
    out(9) = (nf & 0xff).toByte; out(10) = ((nf >> 8) & 0xff).toByte
    var f = 0; var o = 16
    while (f < nf) {
      var p = 0
      while (p < w * h) { out(o) = videoPixel(id, f, p).toByte; p += 1; o += 1 }
      f += 1
    }
    out
  }

  /** Header walk + per-frame luma sums. None on any malformation
    * (magic, short header, length != 16 + w·h·nf, zero dims).
    */
  private[graft] def decodeVideo(bytes: Array[Byte])
      : Option[(Int, Int, Int, Int, Array[Long])] = {
    if (bytes == null || bytes.length < 16) return None
    if (bytes(0) != 'G' || bytes(1) != 'V' || bytes(2) != 'I' ||
      bytes(3) != '1') return None
    val w = (bytes(4) & 0xff) | ((bytes(5) & 0xff) << 8)
    val h = (bytes(6) & 0xff) | ((bytes(7) & 0xff) << 8)
    val fps = bytes(8) & 0xff
    val nf = (bytes(9) & 0xff) | ((bytes(10) & 0xff) << 8)
    if (w <= 0 || h <= 0 || fps <= 0 || nf <= 0) return None
    if (bytes.length != 16 + w * h * nf) return None
    val e = new Array[Long](nf)
    var f = 0; var o = 16
    while (f < nf) {
      var s = 0L; var p = 0
      while (p < w * h) { s += (bytes(o) & 0xff); p += 1; o += 1 }
      e(f) = s; f += 1
    }
    Some((w, h, fps, nf, e))
  }

  /** Synthetic video payloads, one per doc — the video twin of
    * [[withImagePayload]]/[[withAudioPayload]].
    */
  def withVideoPayload(spark: SparkSession, docs: DataFrame,
      idCol: String): DataFrame = {
    import spark.implicits._
    docs.select(col(idCol).cast("long")).as[Long]
      .mapPartitions(_.map(id => (id, encodeVideo(id))))
      .toDF("doc_id", "payload")
  }

  /** Keyed video payloads (distinct docs share identical video, so
    * temporal-hash dedup has real duplicate groups) — encode each
    * distinct key ONCE, broadcast-join onto the corpus.
    */
  def withVideoPayloadKeyed(spark: SparkSession, docs: DataFrame,
      idCol: String, key: org.apache.spark.sql.Column): DataFrame = {
    import spark.implicits._
    val keyed = docs.select(col(idCol).cast("long").as("doc_id"),
      key.cast("long").as("_k"))
    val dim = keyed.select(col("_k")).distinct().as[Long]
      .mapPartitions(_.map(k => (k, encodeVideo(k))))
      .toDF("_k", "payload")
    keyed.join(broadcast(dim), Seq("_k")).select("doc_id", "payload")
  }

  case class VideoMeta(doc_id: Long, width: Int, height: Int, fps: Int,
    n_frames: Int, n_bytes: Long, duration_ms: Long)

  /** Container metadata via the REAL header walk — undecodable
    * payloads drop (the PNG/WAV contract). duration_ms is exact
    * integer (nf·1000 div fps). Narrow per-partition pass, zero
    * shuffle.
    */
  def videoMeta(spark: SparkSession, binDocs: DataFrame): DataFrame = {
    import spark.implicits._
    binDocs.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        decodeVideo(bytes).map { case (w, h, fps, nf, _) =>
          VideoMeta(id, w, h, fps, nf, bytes.length.toLong,
            nf.toLong * 1000L / fps)
        }
      }).toDF()
  }

  case class VideoFrame(doc_id: Long, frame_idx: Int, t_ms: Long,
    luma_milli: Long, is_cut: Int)

  /** Every-k frame sampling with mean-luma features and scene-cut
    * flags — THE brief's video frame-sample operator. Per sampled
    * frame: t_ms (exact f·1000 div fps), mean luma in FLOOR
    * milli-units (1000·Σluma div (w·h) — integer, engine-portable),
    * and is_cut = |luma − previous SAMPLED luma| > cutMilli (first
    * sample 0). One narrow pass; the per-doc walk is bounded by the
    * container's frame count, never corpus size.
    */
  def videoFrameSample(spark: SparkSession, binDocs: DataFrame,
      every: Int = 4, cutMilli: Long = 2000L): DataFrame = {
    import spark.implicits._
    require(every >= 1, s"every must be >= 1, got $every")
    binDocs.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        decodeVideo(bytes).toSeq.flatMap { case (w, h, fps, nf, e) =>
          val wh = w.toLong * h
          var prev = -1L
          (0 until nf by every).map { f =>
            val lm = e(f) * 1000L / wh
            val cut = if (prev >= 0 && math.abs(lm - prev) > cutMilli) 1 else 0
            prev = lm
            VideoFrame(id, f, f.toLong * 1000L / fps, lm, cut)
          }
        }
      }).toDF()
  }

  case class VideoHash(doc_id: Long, n_frames: Int, vfp: Long)

  /** Temporal near-dup signature: bit f set iff frame f+1 is
    * brighter than frame f (luma-sum derivative sign) — the
    * [[audioFingerprint]] discipline on the time axis. Equal hashes
    * are dedup bucket keys; robust to brightness-preserving
    * re-encodes. Requires n_frames <= 64.
    */
  def videoTemporalHash(spark: SparkSession, binDocs: DataFrame): DataFrame = {
    import spark.implicits._
    binDocs.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        decodeVideo(bytes).map {
          case (_, _, _, nf, e) =>
            // fail LOUDLY past the 64-bit signature capacity: a
            // silent filter here would surface as an unexplained
            // oracle hash mismatch (q362 hashes every key) the day
            // videoDims ever caps above 64 frames
            require(nf <= 64,
              s"videoTemporalHash: doc $id has $nf frames (> 64-bit " +
                "signature capacity); sample frames down first")
            var fp = 0L
            var f = 0
            while (f < nf - 1) {
              if (e(f + 1) > e(f)) fp |= 1L << f
              f += 1
            }
            VideoHash(id, nf, fp)
        }
      }).toDF()
  }
}
