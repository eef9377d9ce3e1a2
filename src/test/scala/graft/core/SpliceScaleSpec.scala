package graft.core

import graft.core.splice.Convert
import org.apache.spark.sql.functions._

/** Headroom check for the domain pipeline: the reference's inputs are
  * human-authored (58 intervals, 1.6k sections), but the conversion
  * must not degrade if a programmatic workflow feeds it 50× that —
  * the driver-side fold is O(intervals), the joins broadcast, and the
  * off-splice chain is one window over the core count.
  */
class SpliceScaleSpec extends SparkSpec {

  test("2000-interval synthetic splice converts in bounded time with a consistent SIT") {
    val nCores = 2000
    val dir = java.nio.file.Files.createTempDirectory("graft_scale")
    val sec = new StringBuilder(
      "Site,Hole,Core,CoreType,Section,CuratedLength,TopDepth,BottomDepth,TopDepthScaled,BottomDepthScaled\n")
    val holes = Seq("A", "B")
    for (c <- 1 to nCores; s <- 1 to 2) {
      // alternate holes; 3 m cores at 2.8 m spacing (overlap for TIEs)
      val hole = holes((c - 1) % 2)
      val top = (c - 1) * 2.8 + (s - 1) * 1.5
      sec.append(s"1,$hole,$c,H,$s,1.5,$top,${top + 1.5},$top,${top + 1.5}\n")
    }
    val sp = new StringBuilder(
      "Site,Hole,Core,Type,TopSection,TopOffset,BottomSection,BottomOffset,SpliceType,Comment\n")
    for (c <- 1 to nCores) {
      val hole = holes((c - 1) % 2)
      // each interval spans into section 2; every row TIEs to the next
      val t = if (c == nCores) "" else "TIE"
      sp.append(s"1,$hole,$c,H,1,10,2,120,$t,\n")
    }
    val secPath = dir.resolve("sec.csv"); val spPath = dir.resolve("sparse.csv")
    java.nio.file.Files.writeString(secPath, sec.toString)
    java.nio.file.Files.writeString(spPath, sp.toString)

    val t0 = System.nanoTime()
    val (sit, aff) = Convert.convertInMemory(spark, secPath.toString, spPath.toString)
    val sitRows = sit.count()
    val affRows = aff.count()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(sitRows == nCores, s"$sitRows SIT rows")
    assert(affRows == nCores, s"$affRows affine rows (all cores on-splice)")
    // composite depths strictly increase down the splice (TIE chain)
    val tops = sit.orderBy(col("_seq"))
      .select(col("TopDepthCCSF")).collect().map(_.getDouble(0))
    assert(tops.sliding(2).forall { case Array(a, b) => a < b; case _ => true },
      "TopDepthCCSF not monotone")
    // bounded time: the 58-interval reference case runs ~3 s; 2000
    // intervals must stay same-order (fold is linear, plans constant).
    // The bound is deliberately loose — it exists to catch a quadratic
    // regression, not to benchmark a possibly-loaded CI machine.
    assert(secs < 60.0, s"2000-interval convert took $secs s")
  }
}
