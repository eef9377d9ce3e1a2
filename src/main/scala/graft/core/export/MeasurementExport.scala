package graft.core.export

import graft.core.format.{CsvIO, Las}
import graft.core.model.CoringFormats._
import graft.core.ops.DepthOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Entry point 3.2 / O3: splice measurement data onto the composite
  * depth scale and export. (reference: /root/reference/feldman.py:298-393)
  *
  * Plan shape for 100 TB: the measurement table is the only large
  * input. The SIT and affine tables are control tables (driver-small
  * by construction), so on/off-splice classification is ONE narrow
  * projection against map literals — no join, no shuffle, no anti-join
  * on row identity anywhere in the bulk path. The measurement scan is
  * never shuffled except for the optional final presentation sort
  * (`sortForPresentation`); the ordering semantics live in the
  * `_block`/row-order keys either way.
  */
object MeasurementExport {

  /** Columns the reference inserts after the last "Sediment Depth*"
    * column (feldman.py:385-393). */
  private val SpliceDepth = "Splice Depth"
  private val OffsetCol = "Offset"
  private val OnSpliceCol = "On-Splice"

  /** One splice interval, as carried in the plan's map literal. */
  private[export] case class SpliceIv(seq: Long, sections: Seq[String],
      top: Double, bot: Double, offset: Double)

  /** One affine row (file order + cumulative offset). */
  private[export] case class AffEntry(seq: Long, offset: Double)

  def exportMeasurementData(spark: SparkSession,
      affinePath: String, sitPath: String, mdPath: String, exportPath: String,
      depthColumn: String,
      includeOffSplice: Boolean = true,
      wholeSpliceSection: Boolean = false,
      sortForPresentation: Boolean = true,
      org: String = "IODP"): Unit = {
    import graft.core.Progress
    // feldman.py:307
    Progress.report(0, s"Splicing ${new java.io.File(mdPath).getName}...")
    val (frame, unwritten) = buildExport(spark, affinePath, sitPath, mdPath,
      depthColumn, includeOffSplice, wholeSpliceSection, sortForPresentation)
    unwritten.foreach { u =>
      Progress.report(50, "Gathering data for off-splice rows...")
      if (u.limit(1).count() > 0) {
        val unwrittenPath = mdPath.replaceAll("\\.[^.]*$", "") + "-unwritten.csv"
        CsvIO.save(
          CsvIO.prettyColumns(u.orderBy(CsvIO.SeqCol), MeasurementFormat, org),
          unwrittenPath)
      }
    }
    Progress.report(100, s"Writing spliced data to ${new java.io.File(exportPath).getName}...")
    CsvIO.save(CsvIO.prettyColumns(frame, MeasurementFormat, org), exportPath)
  }

  /** Cluster-scale sink: multi-file CSV export, range-partitioned and
    * sorted within partitions by the (block, file-order) keys. The
    * concatenation of part files in filename order reproduces the
    * single-file export's row order EXACTLY — but the only shuffle is
    * the range partitioning (no single-partition collect, no driver
    * bottleneck), and each task writes its own file. This is the
    * 100 TB form of `exportMeasurementData`; the single-file form
    * remains for byte-identical reference parity.
    */
  def exportMeasurementDataPartitioned(spark: SparkSession,
      affinePath: String, sitPath: String, mdPath: String, exportDir: String,
      depthColumn: String,
      includeOffSplice: Boolean = true,
      wholeSpliceSection: Boolean = false,
      numFiles: Int = 0,
      org: String = "IODP"): Unit = {
    val (frame, _) = buildExport(spark, affinePath, sitPath, mdPath,
      depthColumn, includeOffSplice, wholeSpliceSection,
      sortForPresentation = false, keepOrderColumns = true)
    val n = if (numFiles > 0) numFiles
            else spark.sessionState.conf.numShufflePartitions
    CsvIO.saveDir(
      CsvIO.prettyColumns(
        frame.repartitionByRange(n, col("_block"), col(CsvIO.SeqCol))
          .sortWithinPartitions(col("_block"), col(CsvIO.SeqCol))
          .drop("_block", CsvIO.SeqCol),
        MeasurementFormat, org),
      exportDir)
  }

  /** Build the spliced-export frame (and the unwritten remainder when
    * off-splice rows are included) without touching any sink.
    *
    * `sortForPresentation = false` skips the final global orderBy —
    * the ordering semantics live entirely in the `_block` / `_seq`
    * keys, so a 100 TB deployment writes partition-local order (or
    * sorts within files) instead of paying one total-order shuffle of
    * the full measurement table; the single-file CSV export keeps the
    * sort so the output is byte-identical to the reference's.
    */
  def buildExport(spark: SparkSession,
      affinePath: String, sitPath: String, mdPath: String,
      depthColumn: String,
      includeOffSplice: Boolean = true,
      wholeSpliceSection: Boolean = false,
      sortForPresentation: Boolean = true,
      keepOrderColumns: Boolean = false): (DataFrame, Option[DataFrame]) = {

    val affine = CsvIO.load(spark, affinePath, AffineFormat, withSeq = true)
    val sit = CsvIO.load(spark, sitPath, SITFormat, withSeq = true)
    val md = CsvIO.load(spark, mdPath, MeasurementFormat, withSeq = true)
    val depth = col(depthColumn).cast("double")

    // J7 + J3 + J4, all as NARROW row classification: the SIT and
    // affine tables are driver-small control tables, so they ride into
    // the plan as map literals keyed by site|hole|core, and every
    // measurement row classifies itself in one projection — zero
    // joins, zero shuffles over the bulk scan. (An earlier broadcast-
    // join + anti-join-on-row-identity formulation planned the
    // off-splice exclusion as a sort-merge anti join, i.e. a full
    // shuffle of the measurement table.)
    val sitRows = sit.select(col(CsvIO.SeqCol), col("Site"), col("Hole"), col("Core"),
      col("TopSection"), col("BottomSection"),
      col(TopDepthCSF.name), col(TopDepthCCSF.name), col(BottomDepthCSF.name)).collect()
    val nIntervals = sitRows.length.toLong
    val ivMap: Map[String, Seq[SpliceIv]] = sitRows.map { r =>
      val key = s"${r.get(1)}|${r.get(2)}|${r.get(3)}"
      // J7: expand [topSection .. botSection] (feldman.py:323-328)
      val (ts, bs) = (r.getString(4), r.getString(5))
      val sections = if (ts == bs) Seq(ts) else (ts.toInt to bs.toInt).map(_.toString)
      key -> SpliceIv(r.getLong(0), sections,
        r.getDouble(6), r.getDouble(8), r.getDouble(7) - r.getDouble(6))
    }.groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_.seq).toSeq).toMap

    val affMap: Map[String, AffEntry] = affine
      .select(col(CsvIO.SeqCol), col("Site"), col("Hole"), col("Core"), col(Offset.name))
      .collect()
      .map(r => s"${r.get(1)}|${r.get(2)}|${r.get(3)}" -> AffEntry(r.getLong(0), r.getDouble(4)))
      .reverse.toMap // first row per core wins on (impossible) duplicates

    val mdKey = concat_ws("|", col("Site"), col("Hole"), col("Core"))
    // A row matching SEVERAL intervals is exported once PER interval —
    // the reference concats per-interval selections without dedup
    // (feldman.py:316-343); `explode` reproduces exactly that. The
    // off-splice side excludes rows matched by ANY interval (P5
    // anti-membership, feldman.py:347).
    val rangeOk: Column => Column =
      if (wholeSpliceSection) _ => lit(true)
      else iv => depth >= iv.getField("top") && depth <= iv.getField("bot")
    val matched = filter(element_at(typedlit(ivMap), mdKey),
      iv => array_contains(iv.getField("sections"), col("Section")) && rangeOk(iv))
    val classified = md.withColumn("_ivs", matched)

    val onSplice = classified.withColumn("_iv", explode(col("_ivs")))
      .withColumn(SpliceDepth, depth + col("_iv").getField("offset"))
      .withColumn(OffsetCol, col("_iv").getField("offset"))
      .withColumn(OnSpliceCol, lit("splice"))
      .withColumn("_block", col("_iv").getField("seq"))
      .drop("_ivs", "_iv")

    var unwrittenOut: Option[DataFrame] = None
    val result =
      if (!includeOffSplice) onSplice
      else {
        val isOff = col("_ivs").isNull || size(col("_ivs")) === 0
        val aff = element_at(typedlit(affMap), mdKey)
        // J4: each affine row's cumulative offset applies to its
        // core's off-splice rows; blocks follow affine-file order
        // after all interval blocks (feldman.py:346-366).
        val offSplice = classified.filter(isOff && aff.isNotNull)
          .withColumn(SpliceDepth, depth + aff.getField("offset"))
          .withColumn(OffsetCol, aff.getField("offset"))
          .withColumn(OnSpliceCol, lit("off-splice"))
          .withColumn("_block", aff.getField("seq") + lit(nIntervals))
          .drop("_ivs")

        // remainder: off-splice rows matching no affine core → the
        // caller's side sink (feldman.py:370-376)
        unwrittenOut = Some(classified.filter(isOff && aff.isNull).drop("_ivs"))
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

    val ordered =
      if (sortForPresentation) result.orderBy(col("_block"), col(CsvIO.SeqCol))
      else result
    val outCols = baseCols.toSeq ++
      (if (keepOrderColumns) Seq("_block", CsvIO.SeqCol) else Nil)
    (ordered.select(outCols.map(col): _*), unwrittenOut)
  }
}
