package graft.core.splice

import graft.core.format.{CsvIO, FormatError}
import graft.core.model.CoringFormats._
import graft.core.ops.DepthOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Entry point 3.1: Sparse Splice → Affine table + Splice Interval
  * Table. (reference: /root/reference/feldman.py:96-142)
  *
  * The reference's mid-pipeline file round-trip (it reloads the SIT it
  * just wrote, feldman.py:117) is kept deliberately: reloading applies
  * the 3-decimal output rounding to the depths the off-splice chain
  * consumes, and that rounding is part of the observable semantics.
  */
object Convert {

  /** P16 pre-flight: every value integer or 'CC'. (feldman.py:107-112) */
  def validateSectionColumn(df: DataFrame, colName: String, what: String): Unit =
    validateSectionColumns(df, Seq(colName), what)

  /** Validate several section columns of one table in a single job;
    * failures are reported in column order (the reference checks them
    * sequentially, so first bad column wins).
    */
  def validateSectionColumns(df: DataFrame, colNames: Seq[String], what: String): Unit = {
    val counts = df.select(colNames.map(c =>
      count(when(!DepthOps.isValidSection(col(c)), lit(1))).as(c)): _*).head()
    colNames.zipWithIndex.foreach { case (c, i) =>
      if (counts.getLong(i) > 0)
        throw new FormatError(
          s"$c column in $what contains one or more non-integer values.")
    }
  }

  /** In-memory variant: returns (SIT, affine) DataFrames without the
    * file sinks. The reference's SIT file round-trip is replaced by an
    * explicit 3-decimal rounding — numerically identical to writing
    * and re-parsing the CSV.
    */
  /** Conversion is a pure function of its input files and options, so
    * repeated calls within a session (e.g. one caller wanting the SIT,
    * another the affine table) reuse one plan + cache instead of
    * re-running the whole pipeline. Keyed per SparkSession.
    */
  private val memo = scala.collection.concurrent.TrieMap
    .empty[(Int, String, String, SpliceOptions, Option[String]), (DataFrame, DataFrame)]

  def convertInMemory(spark: SparkSession,
      secSummPath: String, sparsePath: String,
      opts: SpliceOptions = SpliceOptions(),
      manualCorrelationPath: Option[String] = None): (DataFrame, DataFrame) =
    memo.getOrElseUpdate(
      (System.identityHashCode(spark), secSummPath, sparsePath, opts, manualCorrelationPath),
      convertInMemoryUncached(spark, secSummPath, sparsePath, opts, manualCorrelationPath))

  private def convertInMemoryUncached(spark: SparkSession,
      secSummPath: String, sparsePath: String,
      opts: SpliceOptions,
      manualCorrelationPath: Option[String]): (DataFrame, DataFrame) = {
    // control tables feed several broadcast joins each — cache so the
    // CSV is scanned once, not once per broadcast
    val secsumm = CsvIO.load(spark, secSummPath, SectionSummaryFormat, withSeq = true).cache()
    val sparse = CsvIO.load(spark, sparsePath, SparseSpliceFormat, withSeq = true).cache()
    validateSectionColumns(sparse, Seq("TopSection", "BottomSection"), "Sparse Splice")
    validateSectionColumn(secsumm, "Section", "Section Summary")
    val (sitDf, onAffines) = SpliceBuilder.sparseSpliceToSIT(spark, sparse, secsumm, opts)
    val sitRounded = CsvIO.roundNumeric(sitDf, SITFormat)
    val mancorr = manualCorrelationPath.map { p =>
      ManualCorrelation.load(spark, p).getOrElse(
        throw new FormatError(s"The manual correlation file $p could not be loaded."))
    }
    val offAffines = OffSplice.gather(spark, secsumm, sitRounded, mancorr)
    val affDf = CsvIO.roundNumeric(
      AffineFinish.finish(onAffines.unionByName(offAffines)), AffineFormat)
    // outputs are tiny control tables; cache so each is computed at
    // most once per session no matter how many consumers act on it
    (sitRounded.cache(), affDf.cache())
  }

  def convertSparseSplice(spark: SparkSession,
      secSummPath: String, sparsePath: String,
      affineOutPath: String, sitOutPath: String,
      opts: SpliceOptions = SpliceOptions(),
      manualCorrelationPath: Option[String] = None): Unit = {

    val secsumm = CsvIO.load(spark, secSummPath, SectionSummaryFormat, withSeq = true).cache()
    val sparse = CsvIO.load(spark, sparsePath, SparseSpliceFormat, withSeq = true).cache()

    validateSectionColumns(sparse, Seq("TopSection", "BottomSection"), "Sparse Splice")
    validateSectionColumn(secsumm, "Section", "Section Summary")

    val (sitDf, onAffines) = SpliceBuilder.sparseSpliceToSIT(spark, sparse, secsumm, opts)
    CsvIO.save(
      CsvIO.prettyColumns(CsvIO.roundNumeric(sitDf, SITFormat), SITFormat),
      sitOutPath)

    // reload the written SIT — 3-decimal rounding now applied
    val sit = CsvIO.load(spark, sitOutPath, SITFormat, withSeq = true)

    val mancorr = manualCorrelationPath.map { p =>
      ManualCorrelation.load(spark, p).getOrElse(
        throw new FormatError(s"The manual correlation file $p could not be loaded."))
    }

    val offAffines = OffSplice.gather(spark, secsumm, sit, mancorr)
    val all = onAffines.unionByName(offAffines)
    val affDf = AffineFinish.finish(all)
    CsvIO.save(
      CsvIO.prettyColumns(CsvIO.roundNumeric(affDf, AffineFormat), AffineFormat),
      affineOutPath)
  }
}
