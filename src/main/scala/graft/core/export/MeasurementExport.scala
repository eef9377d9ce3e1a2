package graft.core.export

import graft.core.format.{CsvIO, Las}
import graft.core.model.CoringFormats._
import graft.core.ops.DepthOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Entry point 3.2 / O3: splice measurement data onto the composite
  * depth scale and export. (reference: /root/reference/feldman.py:298-393)
  *
  * Plan shape for 100 TB: the measurement table is the only large
  * input. On-splice selection is ONE broadcast hash join (SIT is tiny)
  * with the interval's section-array + depth-range condition evaluated
  * as a post-join filter; off-splice tagging is an anti-join on the row
  * id followed by another broadcast join against the affine table. The
  * measurement scan is never shuffled except for the final presentation
  * sort, which a cluster deployment would drop or replace with a
  * per-file sort — the semantics live in the `block`/row-order keys.
  */
object MeasurementExport {

  /** Columns the reference inserts after the last "Sediment Depth*"
    * column (feldman.py:385-393). */
  private val SpliceDepth = "Splice Depth"
  private val OffsetCol = "Offset"
  private val OnSpliceCol = "On-Splice"

  def exportMeasurementData(spark: SparkSession,
      affinePath: String, sitPath: String, mdPath: String, exportPath: String,
      depthColumn: String,
      includeOffSplice: Boolean = true,
      wholeSpliceSection: Boolean = false): Unit = {

    val affine = CsvIO.load(spark, affinePath, AffineFormat, withSeq = true)
    val sit = CsvIO.load(spark, sitPath, SITFormat, withSeq = true)
    val md = CsvIO.load(spark, mdPath, MeasurementFormat, withSeq = true)
    val depth = col(depthColumn).cast("double")

    val nIntervals = sit.count()

    // J7 + J3: per-interval row selection on (identity, section set,
    // depth range) — SIT broadcast, measurement scan untouched.
    val intervals = broadcast(sit.select(
      col(CsvIO.SeqCol).as("int_seq"),
      col("Site").as("i_site"), col("Hole").as("i_hole"), col("Core").as("i_core"),
      DepthOps.sectionRange(col("TopSection"), col("BottomSection")).as("i_sections"),
      col(TopDepthCSF.name).as("i_top"), col(BottomDepthCSF.name).as("i_bot"),
      (col(TopDepthCCSF.name) - col(TopDepthCSF.name)).as("i_offset")))

    val rangeCond =
      if (wholeSpliceSection) lit(true)
      else depth >= col("i_top") && depth <= col("i_bot")

    val onSplice = md.join(intervals,
        col("Site") === col("i_site") && col("Hole") === col("i_hole") &&
          col("Core") === col("i_core") &&
          array_contains(col("i_sections"), col("Section")) && rangeCond)
      .withColumn(SpliceDepth, depth + col("i_offset"))
      .withColumn(OffsetCol, col("i_offset"))
      .withColumn(OnSpliceCol, lit("splice"))
      .withColumn("_block", col("int_seq"))
      .drop("int_seq", "i_site", "i_hole", "i_core", "i_sections", "i_top", "i_bot", "i_offset")

    val result =
      if (!includeOffSplice) onSplice
      else {
        val matchedSeqs = onSplice.select(col(CsvIO.SeqCol)).distinct()
        val offRows = md.join(matchedSeqs, Seq(CsvIO.SeqCol), "left_anti")
        // J4: apply each affine row's cumulative offset to its core's
        // off-splice rows; blocks follow affine-file order after all
        // interval blocks (feldman.py:346-366).
        val aff = broadcast(affine.select(
          col(CsvIO.SeqCol).as("aff_seq"),
          col("Site").as("a_site"), col("Hole").as("a_hole"), col("Core").as("a_core"),
          col(Offset.name).as("a_offset")))
        val offSplice = offRows.join(aff,
            col("Site") === col("a_site") && col("Hole") === col("a_hole") &&
              col("Core") === col("a_core"))
          .withColumn(SpliceDepth, depth + col("a_offset"))
          .withColumn(OffsetCol, col("a_offset"))
          .withColumn(OnSpliceCol, lit("off-splice"))
          .withColumn("_block", col("aff_seq") + lit(nIntervals))
          .drop("aff_seq", "a_site", "a_hole", "a_core", "a_offset")

        // remainder: off-splice rows matching no affine core → side sink
        // (feldman.py:370-376)
        val unwritten = offRows.join(
          affine.select(col("Site"), col("Hole"), col("Core")).distinct(),
          Seq("Site", "Hole", "Core"), "left_anti")
        if (unwritten.limit(1).count() > 0) {
          val unwrittenPath = mdPath.replaceAll("\\.[^.]*$", "") + "-unwritten.csv"
          CsvIO.save(
            CsvIO.prettyColumns(unwritten.orderBy(CsvIO.SeqCol), MeasurementFormat),
            unwrittenPath)
        }
        onSplice.unionByName(offSplice)
      }

    // presentation: insert the three splice columns after the last
    // "Sediment Depth*" column (feldman.py:385-393), restore row order
    // (interval/affine block, then file order within the block)
    val baseCols = md.columns.filterNot(_.startsWith("_")).toBuffer
    val insertAt = {
      val hits = Las.findAllStartsWith("Sediment Depth", baseCols.toSeq)
      if (hits.isEmpty) 0 else hits.map(baseCols.indexOf).max + 1
    }
    baseCols.insertAll(insertAt, Seq(SpliceDepth, OffsetCol, OnSpliceCol))

    val ordered = result.orderBy(col("_block"), col(CsvIO.SeqCol))
      .select(baseCols.toSeq.map(col): _*)
    CsvIO.save(CsvIO.prettyColumns(ordered, MeasurementFormat), exportPath)
  }
}
