package graft.core

import org.apache.spark.sql.functions._
import graft.ops.MultimodalOps

class ImageSpec extends SparkSpec {
  import spark.implicits._

  test("PNG round trip: decoded pixels equal the generating formula") {
    Seq(0L, 7L, 42L, 6001L).foreach { id =>
      val img = MultimodalOps.decodeImage(
        MultimodalOps.encodePng(MultimodalOps.syntheticImage(id))).get
      val (w, h) = MultimodalOps.imgDims(id)
      assert((img.getWidth, img.getHeight) == (w, h))
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = img.getRGB(x, y)
        assert(((rgb >> 16) & 0xff) == MultimodalOps.pxR(id, x, y), s"r($x,$y) id=$id")
        assert(((rgb >> 8) & 0xff) == MultimodalOps.pxG(id, x, y), s"g($x,$y) id=$id")
        assert((rgb & 0xff) == MultimodalOps.pxB(id, x, y), s"b($x,$y) id=$id")
      }
    }
  }

  test("imageStats matches a pure-formula reference") {
    val docs = (0L to 20L).toDF("doc_id")
    val stats = MultimodalOps.imageStats(spark,
        MultimodalOps.withImagePayload(spark, docs, "doc_id"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(stats.size == 21)
    (0L to 20L).foreach { id =>
      val (w, h) = MultimodalOps.imgDims(id)
      var (sr, sg, sb) = (0L, 0L, 0L)
      for (y <- 0 until h; x <- 0 until w) {
        sr += MultimodalOps.pxR(id, x, y)
        sg += MultimodalOps.pxG(id, x, y)
        sb += MultimodalOps.pxB(id, x, y)
      }
      val r = stats(id)
      assert((r.getInt(1), r.getInt(2)) == (w, h), s"dims id=$id")
      assert((r.getLong(3), r.getLong(4), r.getLong(5)) == ((sr, sg, sb)), s"sums id=$id")
    }
  }

  test("resizeGrid cells are exact integer box averages") {
    val docs = Seq(5L).toDF("doc_id") // dims (24, 16): boxes 3x2
    val row = MultimodalOps.resizeGrid(spark,
      MultimodalOps.withImagePayload(spark, docs, "doc_id")).head()
    val id = 5L
    val (w, h) = MultimodalOps.imgDims(id)
    val (bx, by) = (w / 8, h / 8)
    val cells = for (j <- 0 until 8; i <- 0 until 8) yield {
      var s = 0L
      for (y <- j * by until (j + 1) * by; x <- i * bx until (i + 1) * bx)
        s += MultimodalOps.pxR(id, x, y) + MultimodalOps.pxG(id, x, y) +
          MultimodalOps.pxB(id, x, y)
      s * 1000L / (3L * bx * by)
    }
    assert(row.getInt(1) == 64)
    assert(row.getLong(2) == cells.head)
    assert(row.getLong(3) == cells.sum)
    assert(row.getLong(4) == cells.min)
    assert(row.getLong(5) == cells.max)
  }

  test("non-image payloads are dropped, not mis-decoded") {
    val bin = Seq((1L, "not an image at all".getBytes("UTF-8")),
      (2L, Array.empty[Byte]))
      .toDF("doc_id", "payload")
    assert(MultimodalOps.imageStats(spark, bin).count() == 0)
    assert(MultimodalOps.resizeGrid(spark, bin).count() == 0)
  }

  test("WAV round trip: decoded samples equal the generating formula") {
    Seq(0L, 3L, 11L, 6002L).foreach { id =>
      val (rate, samples) =
        MultimodalOps.decodeWavS16Mono(MultimodalOps.encodeWav(id)).get
      assert(rate == 8000)
      assert(samples.length == MultimodalOps.audioLen(id))
      samples.indices.foreach { i =>
        assert(samples(i) == MultimodalOps.sampleAt(id, i), s"sample $i id=$id")
      }
    }
  }

  test("audioStats matches a pure-formula reference; non-audio dropped") {
    val docs = (0L to 10L).toDF("doc_id")
    val stats = MultimodalOps.audioStats(spark,
        MultimodalOps.withAudioPayload(spark, docs, "doc_id"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(stats.size == 11)
    (0L to 10L).foreach { id =>
      val n = MultimodalOps.audioLen(id)
      val ss = (0 until n).map(MultimodalOps.sampleAt(id, _))
      val r = stats(id)
      assert(r.getInt(1) == n && r.getInt(2) == 8000, s"meta id=$id")
      assert((r.getInt(3), r.getInt(4)) == ((ss.min, ss.max)), s"minmax id=$id")
      assert(r.getLong(5) == ss.map(s => math.abs(s).toLong).sum, s"sum id=$id")
    }
    val garbage = Seq((1L, "RIFFnope".getBytes("UTF-8"))).toDF("doc_id", "payload")
    assert(MultimodalOps.audioStats(spark, garbage).count() == 0)
  }

  test("JPEG: real lossy codec round trip keeps dims; header parser agrees") {
    val img = MultimodalOps.syntheticImage(4L) // (16, 16)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos))
    val jpeg = bos.toByteArray
    val dec = MultimodalOps.decodeImage(jpeg).get
    assert((dec.getWidth, dec.getHeight) == (16, 16))
    // the q35 header parser and the full decoder must agree on dims
    assert(MultimodalOps.parseImageDims(jpeg).contains((16, 16)))
    val png = MultimodalOps.encodePng(img)
    assert(MultimodalOps.parseImageDims(png).contains((16, 16)))
  }

  test("JPEG tolerance band: within_tol everywhere, and the band does real work") {
    import spark.implicits._
    val docs = (0L until 60L).toDF("doc_id")
    val checks = MultimodalOps.jpegDecodeCheck(spark,
        MultimodalOps.withJpegPayload(spark, docs, "doc_id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getLong(3), r.getBoolean(4)))
    assert(checks.length == 60)
    checks.foreach { case (id, w, h, npx, ok) =>
      assert((w, h) == MultimodalOps.imgDims(id), s"dims id=$id")
      assert(npx == w.toLong * h, s"n_px id=$id")
      assert(ok, s"codec error above tolerance for id=$id")
    }
    // the codec is REALLY lossy on this formula (band > 0 is doing
    // work, not vacuously passing a lossless path)
    val lossy = (0L until 60L).exists { id =>
      val dec = MultimodalOps.decodeImage(
        MultimodalOps.encodeJpeg(MultimodalOps.syntheticJpegImage(id))).get
      (0 until dec.getHeight).exists(y => (0 until dec.getWidth).exists { x =>
        val rgb = dec.getRGB(x, y)
        ((rgb >> 16) & 0xff) != MultimodalOps.jpxR(id, x, y) ||
        ((rgb >> 8) & 0xff) != MultimodalOps.jpxG(id, x, y) ||
        (rgb & 0xff) != MultimodalOps.jpxB(id, x, y)
      })
    }
    assert(lossy, "JPEG round trip was bit-exact — the tolerance band is vacuous")
  }

  test("JPEG tolerance band catches a channel swap; corrupt payloads drop") {
    import spark.implicits._
    // encode with R and B swapped: a decoder channel-order bug
    val swapped = (0L until 30L).map { id =>
      val (w, h) = MultimodalOps.imgDims(id)
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, (MultimodalOps.jpxB(id, x, y) << 16) |
          (MultimodalOps.jpxG(id, x, y) << 8) | MultimodalOps.jpxR(id, x, y))
      (id, MultimodalOps.encodeJpeg(img))
    }.toDF("doc_id", "payload")
    val flags = MultimodalOps.jpegDecodeCheck(spark, swapped)
      .select("within_tol").collect().map(_.getBoolean(0))
    assert(flags.length == 30 && flags.forall(!_),
      "channel swap must land outside the tolerance band for every doc")
    val garbage = Seq((1L, Array.fill[Byte](64)(0x3f))).toDF("doc_id", "payload")
    assert(MultimodalOps.jpegDecodeCheck(spark, garbage).count() == 0)
  }

  test("dHash: identical images hash equal; different images differ; byte-level re-encode is invariant") {
    val docs = Seq(0L, 1L, 2L, 100L, 101L).toDF("doc_id")
    // key (doc_id % 2) * 2: docs 0/2/100 share image 0 (8x8), docs
    // 1/101 share image 2 (24x8 — verified distinct gradient pattern;
    // image 1 would COLLIDE with image 0, all gradients ascending,
    // which is correct perceptual-bucket behavior, not a test case)
    val pay = MultimodalOps.withImagePayloadKeyed(spark, docs, "doc_id",
      (col("doc_id") % 2) * 2)
    val got = MultimodalOps.imageDHash(spark, pay)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got.size === 5)
    assert(got(0L) === got(2L) && got(0L) === got(100L))
    assert(got(1L) === got(101L))
    assert(got(0L) !== got(1L))
    assert(got(0L) === 0xffffffffffffffL) // 8x8: every gradient ascends
    assert(got(1L) === 0x9f3cf9f3e7cf9fL) // pinned reference pattern
    // re-encoding the same pixels (fresh PNG bytes) leaves the hash
    // fixed — the hash is perceptual, not byte-level
    val pay2 = MultimodalOps.withImagePayloadKeyed(spark,
      Seq(7L).toDF("doc_id"), "doc_id", lit(0L))
    val h2 = MultimodalOps.imageDHash(spark, pay2).collect().head.getLong(3)
    assert(h2 === got(0L))
  }

  test("dHash: matches a pure-formula reference bit pattern at grid 8") {
    val id = 4L // 16x24 image
    val pay = MultimodalOps.withImagePayloadKeyed(spark,
      Seq(id).toDF("doc_id"), "doc_id", col("doc_id"))
    val got = MultimodalOps.imageDHash(spark, pay).collect().head.getLong(3)
    val (w, h) = MultimodalOps.imgDims(id)
    val (bx, by) = (w / 8, h / 8)
    val cells = Array.ofDim[Long](8, 8)
    for (y <- 0 until h; x <- 0 until w)
      cells(y / by)(x / bx) += MultimodalOps.pxR(id, x, y) +
        MultimodalOps.pxG(id, x, y) + MultimodalOps.pxB(id, x, y)
    var expect = 0L
    for (j <- 0 until 8; i <- 0 until 7) {
      val cur = cells(j)(i) * 1000L / (3L * bx * by)
      val nxt = cells(j)(i + 1) * 1000L / (3L * bx * by)
      if (nxt > cur) expect |= 1L << (j * 7 + i)
    }
    assert(got === expect)
  }

  test("imageNearDupPairs: banded candidates find EXACTLY the brute-force Hamming<=3 set") {
    val docs = (0L until 60L).toDF("doc_id")
    val pay = MultimodalOps.withImagePayloadKeyed(spark, docs, "doc_id",
      col("doc_id") % 13)
    val hashes = MultimodalOps.imageDHash(spark, pay)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val brute = (for {
      a <- hashes.keys; b <- hashes.keys if a < b
      hd = java.lang.Long.bitCount(hashes(a) ^ hashes(b)) if hd <= 3
    } yield (a, b, hd)).toSet
    val got = MultimodalOps.imageNearDupPairs(spark, pay)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got === brute) // pigeonhole: recall 1.0, no false positives
    assert(brute.nonEmpty) // the mod-13 dup injection must produce work
    assert(brute.forall { case (a, b, hd) =>
      (a % 13 != b % 13) || hd == 0 }) // same key => identical hash
  }

  test("imageNearDupStats == aggregated imageNearDupPairs (group-collapsed equivalence)") {
    val docs = (0L until 80L).toDF("doc_id")
    val pay = MultimodalOps.withImagePayloadKeyed(spark, docs, "doc_id",
      col("doc_id") % 11)
    val fromPairs = MultimodalOps.imageNearDupPairs(spark, pay)
      .groupBy("hamming")
      .agg(count(lit(1)).as("n_pairs"),
        min(struct(col("id_a"), col("id_b"))).as("fp"))
      .select(col("hamming"), col("n_pairs"),
        col("fp.id_a").as("first_a"), col("fp.id_b").as("first_b"))
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val fromStats = MultimodalOps.imageNearDupStats(spark, pay)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(fromStats === fromPairs)
    assert(fromPairs.nonEmpty)
  }

  test("audioFeatures: integer-exact resample + duration buckets match a pure reference") {
    import spark.implicits._
    val docs = (0L until 20L).toDF("doc_id")
    val got = MultimodalOps.audioFeatures(spark,
        MultimodalOps.withAudioPayload(spark, docs, "doc_id"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got.size == 20)
    for (id <- 0L until 20L) {
      val n = MultimodalOps.audioLen(id)
      val nOut = (n.toLong * 3000 / 8000).toInt
      val out = (0 until nOut).map(i =>
        MultimodalOps.sampleAt(id, (i.toLong * 8000 / 3000).toInt))
      val r = got(id)
      assert(r.getInt(2) == n && r.getInt(6) == nOut, s"counts id=$id")
      assert(r.getLong(3) == n.toLong * 1000 / 8000, s"duration id=$id")
      assert(r.getLong(4) == (n.toLong * 1000 / 8000) / 100, s"bucket id=$id")
      assert((r.getInt(7), r.getInt(8)) == ((out.min, out.max)), s"minmax id=$id")
      assert(r.getLong(9) == out.map(s => math.abs(s).toLong).sum, s"sum id=$id")
    }
    val garbage = Seq((1L, "not a wav".getBytes("UTF-8"))).toDF("doc_id", "payload")
    assert(MultimodalOps.audioFeatures(spark, garbage).count() == 0)
  }
}
