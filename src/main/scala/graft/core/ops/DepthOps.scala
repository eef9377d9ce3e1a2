package graft.core.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Depth-domain scalar operators — P14/P15/P17/A4/J7 of SURVEY §2.
  *
  * P15 (`offsetDepth`) routes to the native Catalyst expression
  * `graft_offset_depth` (graft.functions.OffsetDepth): one plan node,
  * one fused kernel shared by eval and codegen — the composed
  * parse/filter/aggregate tree it replaced dominated plan compile
  * time when expanded four times per splice resolve. The composed
  * forms of P14/A4 remain here as Column combinators (and as the
  * executable spec the native kernel is property-tested against,
  * OffsetDepthPropertySpec).
  *
  * Scale: all narrow per-row expressions; joined against a broadcast
  * section summary they run at full scan speed over any number of
  * splice/measurement rows.
  */
object DepthOps {

  /** P14: decode a Gaps payload ("0.0-0.5 94.5-96.0", cm) into
    * array<struct<top,bot>>. Empty/null → empty array.
    * (reference: coring/sectionSummary.py:132-140)
    */
  def parseGaps(gaps: Column): Column =
    when(gaps.isNull || trim(gaps) === "", array().cast("array<struct<top:double,bot:double>>"))
      .otherwise(transform(split(trim(gaps), " "),
        g => struct(
          element_at(split(g, "-"), 1).cast("double").as("top"),
          element_at(split(g, "-"), 2).cast("double").as("bot"))))

  /** A4: total gap length (cm) strictly above sectionDepth (cm).
    * (coring/sectionSummary.py:145-150)
    */
  def gapAbove(gaps: Column, sectionDepthCm: Column): Column =
    aggregate(
      filter(parseGaps(gaps), g => sectionDepthCm > g.getField("top")),
      lit(0.0d), (acc, g) => acc + (g.getField("bot") - g.getField("top")))

  /** Reference rounds every section-summary depth lookup to 3 decimals
    * BEFORE arithmetic (coring/sectionSummary.py:107-123) — rounding is
    * part of the semantics, not presentation.
    */
  def r3(c: Column): Column = round(c, 3)

  /** P15: gap-aware section offset (cm) → total depth (m).
    * depth = round3(secTop) + off/100 − gapAbove(off)/100.
    *
    * Scaled variant compresses to the drilled interval when
    * curatedLength exceeds drilledLength — replicating the reference's
    * unit quirk faithfully: curatedLength is in METERS while
    * drilledLength is computed in CENTIMETERS (sectionSummary.py:66-73),
    * so compression effectively never triggers on sane data; we keep
    * the comparison bit-identical rather than "fixing" it.
    * (coring/sectionSummary.py:53-75, feldman.py:52-74)
    */
  def offsetDepth(secTop: Column, secBot: Column, curatedLength: Column,
      gaps: Column, offsetCm: Column, scaled: Boolean): Column =
    call_function("graft_offset_depth",
      secTop, secBot, curatedLength, gaps, offsetCm, lit(scaled))

  /** P17: cm → m. */
  def cmToM(cm: Column): Column = cm / 100.0

  /** P16: a valid Section value is an integer string or the literal
    * 'CC' (core catcher). (feldman.py:78-89)
    */
  def isValidSection(section: Column): Column =
    section === "CC" || section.rlike("^-?[0-9]+$")

  /** J7: expand an interval's [topSection .. botSection] to the
    * explicit array of section-name strings ("3","4","5"); a single
    * (possibly non-numeric, e.g. 'CC') section stays as-is.
    * (feldman.py:323-328)
    */
  def sectionRange(topSection: Column, botSection: Column): Column =
    when(topSection === botSection, array(topSection))
      .otherwise(transform(
        sequence(topSection.cast("int"), botSection.cast("int")),
        i => i.cast("string")))
}
