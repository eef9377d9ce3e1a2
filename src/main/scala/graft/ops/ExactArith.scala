package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Exact integer division helpers shared by the analytics kernels.
  *
  * The problem they solve: Spark's `Column./` is IEEE DOUBLE division.
  * The classic exact spelling `(a - pmod(a, b)) / b` (numerator an
  * exact multiple of b) is only exact while operands stay under 2^53 —
  * past that, the double conversion itself drops low bits and the
  * "exact" quotient is silently off by one at the last digit.
  * Corpus-scale sums (cents × 2e6 ppm scaling, micro-units × gap
  * spans, rank · weight products) reach that gap at 100 TB.
  *
  * These helpers run the division in decimal(38,*): exact over the
  * FULL long range; a product past 2^63 fails loudly in the caller's
  * ANSI long multiply instead of drifting. The bound is therefore
  * machine-enforced end to end: ≤ 2^63 exact, > 2^63 error — no
  * silent window (ExactArithSpec crosses 2^53 and proves it).
  */
object ExactArith {

  /** Exact floor(a / b) for longs, b > 0: `a - pmod(a, b)` is an
    * exact multiple of b, and the decimal division of that multiple
    * has an integral quotient representable exactly at any scale ≥ 0.
    */
  def floorDiv(a: Column, b: Column): Column =
    ((a - pmod(a, b)).cast("decimal(38,0)") / b.cast("decimal(19,0)"))
      .cast("long")

  /** Exact half-up a / b for non-negative longs, b > 0:
    * floor((2a + b) / 2b).
    */
  def halfUpDiv(a: Column, b: Column): Column =
    floorDiv(a * 2 + b, b * 2)
}
