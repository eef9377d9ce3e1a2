package graft.core.splice

import graft.core.model.CoringFormats._
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** O2 + A5 + A6: affine assembly — global ordering, per-hole
  * differential offset, per-hole expanding-window growth rate.
  * (reference: /root/reference/feldman.py:500-529)
  *
  * Two reference quirks replicated on purpose:
  *  - rows sort by (site, hole, int(core)) but the differential/growth
  *    grouping is by HOLE ONLY (feldman.py:504-506) — holes with the
  *    same letter chain across sites;
  *  - growth rate is the OLS slope over all (CSF, CCSF) pairs from the
  *    hole group's start through the current core (numpy.polyfit deg 1,
  *    feldman.py:516-527). Expressed here in closed form with expanding
  *    window sums — one shuffle on the hole key, no per-row refits.
  */
object AffineFinish {

  def finish(affines: Dataset[AffineEmit]): DataFrame = {
    val coreInt = col("core").cast("int")
    val w = Window.partitionBy("hole").orderBy(col("site"), coreInt)
    val exp = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val n = count(lit(1)).over(exp).cast("double")
    val sx = sum(col("csf")).over(exp)
    val sy = sum(col("ccsf")).over(exp)
    val sxy = sum(col("csf") * col("ccsf")).over(exp)
    val sxx = sum(col("csf") * col("csf")).over(exp)
    val denom = n * sxx - sx * sx
    val slope = (n * sxy - sx * sy) / denom

    affines.toDF()
      // `+ 0.0` canonicalizes IEEE negative zero (-0.0 + 0.0 == +0.0).
      // numpy/pandas can emit -0.0 where a tiny negative rounds to
      // zero, while Spark's BigDecimal round already yields +0.0; both
      // this output and the q43 oracle SQL normalize the sign before
      // hashing, so the bit-level gate compares sign-normalized values
      // on both sides (numerically -0.0 == 0.0 either way).
      .withColumn("diffOffset",
        col("offset") - lag("offset", 1, 0.0).over(w) + lit(0.0))
      .withColumn("growthRate",
        when(row_number().over(w) === 1 || denom === 0.0, 0.0)
          .otherwise(round(slope, 3) + lit(0.0)))
      .orderBy(col("site"), col("hole"), coreInt)
      .select(
        col("site").as(Site.name), col("hole").as(Hole.name),
        col("core").as(Core.name), col("tool").as(Tool.name),
        col("csf").as(DepthCSF.name), col("ccsf").as(DepthCCSF.name),
        col("offset").as(Offset.name),
        col("diffOffset").as(DifferentialOffset.name),
        col("growthRate").as(GrowthRate.name),
        col("shiftType").as(ShiftType.name),
        col("fixedCore").as(FixedCore.name),
        col("fixedTieCsf").as(FixedTieCSF.name),
        col("shiftedTieCsf").as(ShiftedTieCSF.name),
        lit("").as(DataUsed.name),
        col("comment").as(Comment.name))
  }
}
