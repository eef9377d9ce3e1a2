package graft.core

import graft.ops.MultimodalOps
import org.apache.spark.sql.functions._

/** Video-path contracts (q360-q362): real header-walk decode with
  * loud malformation drops, frame-sample/scene-cut semantics, and
  * temporal-hash determinism on keyed duplicates.
  */
class VideoSpec extends SparkSpec {
  import spark.implicits._

  test("decodeVideo: round-trip exact; malformed payloads all drop") {
    val ok = MultimodalOps.encodeVideo(7L)
    val d = MultimodalOps.decodeVideo(ok)
    assert(d.isDefined)
    val (w, h, fps, nf, e) = d.get
    assert((w, h, fps, nf) == MultimodalOps.videoDims(7L))
    // luma sums equal the formula exactly
    val wh = w * h
    val want = (0 until nf).map(f =>
      (0 until wh).map(p => MultimodalOps.videoPixel(7L, f, p).toLong).sum)
    assert(e.toSeq == want)
    // malformations: bad magic, truncated, length mismatch, empty
    val badMagic = ok.clone(); badMagic(0) = 'X'
    assert(MultimodalOps.decodeVideo(badMagic).isEmpty)
    assert(MultimodalOps.decodeVideo(ok.take(10)).isEmpty)
    assert(MultimodalOps.decodeVideo(ok.dropRight(1)).isEmpty)
    assert(MultimodalOps.decodeVideo(Array.emptyByteArray).isEmpty)
    assert(MultimodalOps.decodeVideo(null).isEmpty)
  }

  test("videoFrameSample: stride, exact timestamps, first-sample never a cut") {
    val docs = Seq(1L, 2L, 3L).toDF("doc_id")
    val rows = MultimodalOps.videoFrameSample(spark,
        MultimodalOps.withVideoPayload(spark, docs, "doc_id"),
        every = 4, cutMilli = 2000L)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getInt(4)))
    for (id <- Seq(1L, 2L, 3L)) {
      val (_, _, fps, nf) = MultimodalOps.videoDims(id)
      val mine = rows.filter(_._1 == id).sortBy(_._2)
      assert(mine.map(_._2).toSeq == (0 until nf by 4).toSeq)
      assert(mine.forall(r => r._3 == r._2.toLong * 1000 / fps))
      assert(mine.head._5 == 0, "first sampled frame can never be a cut")
    }
  }

  test("videoTemporalHash: keyed duplicates share the signature; distinct keys exercised") {
    val docs = (0L until 40L).toDF("doc_id")
    val hashes = MultimodalOps.videoTemporalHash(spark,
        MultimodalOps.withVideoPayloadKeyed(spark, docs, "doc_id",
          col("doc_id") % 5))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(hashes.size == 40)
    for (id <- 0L until 40L)
      assert(hashes(id) == hashes(id % 5),
        s"doc $id must share its key's signature")
    assert(hashes.values.toSet.size >= 2, "keys must not all collide")
  }
}
