package graft.core

import graft.core.splice.{ResolvedInterval, SpliceBuilder, SpliceError, SpliceOptions}

/** The fold's abort contract (feldman.py:175-179, 216-218): inverted
  * or zero-length intervals and unknown splice types kill the whole
  * conversion; unresolvable section lookups name the offending core.
  */
class SpliceAbortSpec extends SparkSpec {

  private def iv(seq: Long, hole: String, core: String, spliceType: String,
      top: Double, bot: Double): ResolvedInterval =
    ResolvedInterval(seq, "1", hole, core, "H", "1", 0.0, "2", 0.0,
      spliceType, None, "", "",
      topUnscaled = Some(top), botUnscaled = Some(bot),
      topScaled = Some(top), botScaled = Some(bot), coreTop = Some(top))

  test("inverted interval aborts the conversion") {
    val e = intercept[SpliceError] {
      SpliceBuilder.foldIntervals(
        Iterator(iv(0, "A", "1", "TIE", top = 2.0, bot = 1.0)), SpliceOptions())
    }
    assert(e.getMessage.contains("inverted or zero-length"))
  }

  test("zero-length interval aborts too (top == bot)") {
    val e = intercept[SpliceError] {
      SpliceBuilder.foldIntervals(
        Iterator(iv(0, "A", "1", "TIE", top = 1.5, bot = 1.5)), SpliceOptions())
    }
    assert(e.getMessage.contains("inverted or zero-length"))
  }

  test("unknown splice type on the governing row aborts") {
    val e = intercept[SpliceError] {
      SpliceBuilder.foldIntervals(Iterator(
        iv(0, "A", "1", "BANANA", top = 0.0, bot = 1.0),
        iv(1, "B", "1", "TIE", top = 0.5, bot = 1.5)), SpliceOptions())
    }
    assert(e.getMessage.contains("unknown splice type BANANA"))
  }

  test("unresolvable section lookup names the core") {
    val bad = iv(0, "A", "7", "TIE", 0.0, 1.0).copy(topUnscaled = None)
    val e = intercept[SpliceError] {
      SpliceBuilder.foldIntervals(Iterator(bad), SpliceOptions())
    }
    assert(e.getMessage.contains("could not resolve top section for 1A-7"))
  }

  test("TIE overlap does NOT abort; APPEND overlap is repaired downward") {
    // row 2 TIEs above row 1's bottom — reference only warns
    val tieOut = SpliceBuilder.foldIntervals(Iterator(
      iv(0, "A", "1", "TIE", 0.0, 2.0),
      iv(1, "B", "1", "TIE", 1.0, 3.0)), SpliceOptions()).toSeq
    assert(tieOut.length == 2)
    // APPEND overlap: affine bumped so the new top lands on prev bottom
    val apOut = SpliceBuilder.foldIntervals(Iterator(
      iv(0, "A", "1", "APPEND", 0.0, 2.0),
      iv(1, "B", "1", "TIE", 1.0, 3.0).copy(spliceType = "APPEND")), SpliceOptions()).toSeq
    val second = apOut(1).sit
    assert(second.topCCSF >= apOut(0).sit.botCCSF)
  }

  test("P16 local validator matches the distributed rlike semantics") {
    import graft.core.splice.Convert
    import graft.core.format.FormatError
    import spark.implicits._
    // rlike has FIND semantics: `$` matches before a trailing newline
    // (reachable via a quoted CSV field), so "3\n" is VALID to the
    // distributed check — the local one must agree, and a genuinely
    // bad value must still raise FormatError, not pass or CCE.
    val ok = Seq("3\n", "CC", "-2", "117").toDF("Section")
    Convert.validateSectionColumnsLocal(ok, Seq("Section"), "Section Summary")
    val e = intercept[FormatError] {
      Convert.validateSectionColumnsLocal(
        Seq("3", "4A").toDF("Section"), Seq("Section"), "Section Summary")
    }
    assert(e.getMessage.contains("non-integer values"))
    // non-string cells coerce like rlike's implicit cast — no
    // ClassCastException, integers validate as their decimal form
    Convert.validateSectionColumnsLocal(
      Seq(1, 2, -3).toDF("Section"), Seq("Section"), "Section Summary")
    intercept[FormatError] {
      Convert.validateSectionColumnsLocal(
        Seq(1.5).toDF("Section"), Seq("Section"), "Section Summary")
    }
  }
}
