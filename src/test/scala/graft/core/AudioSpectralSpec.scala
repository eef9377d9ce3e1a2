package graft.core

import graft.ops.MultimodalOps
import org.apache.spark.sql.functions._

/** Differential + physics pins for the fixed-bin integer DFT
  * (q241): the Spark decode path must equal the pure-Scala reference
  * on the same fixture bytes, and the features must behave like a
  * spectrum (a pure tone at an analyzed bin dominates that bin;
  * orthogonal tones don't leak).
  */
class AudioSpectralSpec extends SparkSpec {
  import spark.implicits._

  private val N = MultimodalOps.SpectralFrame

  private def tone(bin: Int, amp: Double): Array[Int] =
    Array.tabulate(N)(i =>
      math.round(amp * math.cos(2.0 * math.Pi * bin * i / N)).toInt)

  test("spectralPowers: pure tone at an analyzed bin dominates it; off-bin energy is tiny") {
    val p = MultimodalOps.spectralPowers(tone(4, 1000.0))
    val idx4 = MultimodalOps.SpectralBins.indexOf(4)
    assert(MultimodalOps.SpectralBins.indices.forall(b =>
      b == idx4 || p(idx4) > 100L * p(b)),
      s"bin-4 tone must dominate: ${p.toSeq}")
    // a tone at an UNANALYZED bin (3) leaks little into any analyzed bin
    val off = MultimodalOps.spectralPowers(tone(3, 1000.0))
    assert(off.forall(_ < p(idx4) / 100), s"off-bin leakage: ${off.toSeq}")
  }

  test("Spark decode path equals the pure-Scala reference on the synthetic fixture") {
    // two keyed WAV payloads via the real encoder; the decoded frame
    // must reproduce the formula samples exactly (PCM lossless), so
    // audioSpectral == spectralPowers(formula samples)
    val docs = Seq(0L, 1L, 61L).toDF("doc_id") // 0 and 61 share key 0
    val pay = MultimodalOps.withAudioPayloadKeyed(spark, docs, "doc_id",
      col("doc_id") % 61)
    val got = MultimodalOps.audioSpectral(spark, pay)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), (2 to 6).map(r.getLong).toSeq, r.getInt(7)))).toMap
    def expected(key: Long) = {
      val n = ((key % 5) + 1).toInt * 400
      val samples = Array.tabulate(N)(i =>
        ((i * 37 + key * 101) % 65536).toInt - 32768)
      val p = MultimodalOps.spectralPowers(samples)
      val dom = p.indices.maxBy(b => (p(b), -b))
      (n, p.toSeq, MultimodalOps.SpectralBins(dom))
    }
    assert(got(0L) == expected(0L))
    assert(got(1L) == expected(1L))
    assert(got(61L) == expected(0L), "same key -> identical features")
  }
}
