package graft.core

import graft.core.ops.DepthOps
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** The native graft_offset_depth expression (functions/OffsetDepth)
  * must be BIT-identical to the composed round/parse/filter/aggregate
  * form it replaced, across randomized depths, offsets, gap payloads,
  * and null patterns — in both interpreted eval and codegen, for both
  * the scaled and unscaled variants.
  */
class OffsetDepthPropertySpec extends SparkSpec {

  /** The pre-round-4 composed form, kept here as the executable spec. */
  private def composed(secTop: Column, secBot: Column, cl: Column,
      gaps: Column, off: Column, scaled: Boolean): Column = {
    val top = round(secTop, 3)
    val bot = round(secBot, 3)
    val depth = top + off / 100.0 - DepthOps.gapAbove(gaps, off) / 100.0
    if (!scaled) depth
    else {
      val curated = round(cl, 3)
      val drilled = (bot - top) * 100.0
      when(curated > drilled, top + (off / 100.0) * (drilled / curated))
        .otherwise(depth)
    }
  }

  private val depthGen: Gen[java.lang.Double] = Gen.frequency(
    8 -> Gen.chooseNum(-10.0, 400.0).map(d => java.lang.Double.valueOf(math.rint(d * 10000) / 10000)),
    2 -> Gen.chooseNum(-2.0, 2.0).map(d => java.lang.Double.valueOf(d)),
    1 -> Gen.const(null: java.lang.Double))

  /** Well-formed gap payloads (the malformed-token cast semantics are
    * non-ANSI and native-only; the composed form would raise under
    * ANSI mode, so they are covered by FormatLayerSpec fixtures).
    */
  private val gapsGen: Gen[String] = Gen.frequency(
    3 -> Gen.const(null: String),
    2 -> Gen.const(""),
    2 -> Gen.const("   "),
    8 -> Gen.chooseNum(1, 4).flatMap { k =>
      Gen.listOfN(k, for {
        t <- Gen.chooseNum(0.0, 150.0)
        len <- Gen.chooseNum(0.0, 20.0)
      } yield s"${math.rint(t * 10) / 10}-${math.rint((t + len) * 10) / 10}")
        .map(_.mkString(" "))
    })

  /** Curated lengths exclude zero: for cl=0 with inverted sections the
    * composed form raises DIVIDE_BY_ZERO under ANSI mode while the
    * native kernel uses Java division (±Infinity, never an error) —
    * the native behavior is the tolerant superset, asserted separately.
    */
  private val clGen: Gen[java.lang.Double] = Gen.frequency(
    8 -> Gen.chooseNum(0.01, 400.0).map(d => java.lang.Double.valueOf(math.rint(d * 1000) / 1000)),
    1 -> Gen.const(null: java.lang.Double))

  private case class In(secTop: java.lang.Double, secBot: java.lang.Double,
      cl: java.lang.Double, gaps: String, off: java.lang.Double)

  private val inGen: Gen[In] = for {
    t <- depthGen; b <- depthGen; c <- clGen; g <- gapsGen; o <- depthGen
  } yield In(t, b, c, g, o)

  test("native offsetDepth is bit-identical to the composed form (scaled and unscaled)") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val cases = Gen.listOfN(400, inGen).apply(
      org.scalacheck.Gen.Parameters.default, org.scalacheck.rng.Seed(42L)).get
    val df = cases.map(i => (i.secTop, i.secBot, i.cl, i.gaps, i.off))
      .toDF("t", "b", "c", "g", "o")

    for (scaled <- Seq(false, true)) {
      val nat = DepthOps.offsetDepth(col("t"), col("b"), col("c"), col("g"), col("o"), scaled)
      val cmp = composed(col("t"), col("b"), col("c"), col("g"), col("o"), scaled)
      val rows = df.select(nat.as("n"), cmp.as("c"), col("g"), col("t"), col("o")).collect()
      rows.foreach { r =>
        val n = if (r.isNullAt(0)) null else java.lang.Double.valueOf(r.getDouble(0))
        val c = if (r.isNullAt(1)) null else java.lang.Double.valueOf(r.getDouble(1))
        val same = (n == null && c == null) ||
          (n != null && c != null &&
            java.lang.Double.doubleToLongBits(n) == java.lang.Double.doubleToLongBits(c))
        assert(same, s"scaled=$scaled native=$n composed=$c gaps=${r.get(2)} top=${r.get(3)} off=${r.get(4)}")
      }
    }
  }

  test("native offsetDepth never raises on zero curated length (tolerant superset of ANSI)") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    // cl=0 + inverted sections would DIVIDE_BY_ZERO in the composed
    // ANSI form; the native kernel yields a value (Java division)
    val df = Seq((2.0, 1.0, 0.0, null: String, 50.0)).toDF("t", "b", "c", "g", "o")
    val out = df.select(
      DepthOps.offsetDepth(col("t"), col("b"), col("c"), col("g"), col("o"), scaled = true))
      .head()
    assert(!out.isNullAt(0)) // -Infinity, not an error or null
  }
}
