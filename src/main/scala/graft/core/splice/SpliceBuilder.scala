package graft.core.splice

import graft.core.format.CsvIO
import graft.core.model.CoringFormats._
import graft.core.ops.DepthOps
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One sparse-splice interval with every section-summary depth lookup
  * already resolved (broadcast joins), ready for the ordered fold.
  * `seq` is the file-order contract (CsvIO `_seq`).
  */
case class ResolvedInterval(
    seq: Long, site: String, hole: String, core: String, tool: String,
    topSection: String, topOffset: Double, botSection: String, botOffset: Double,
    spliceType: String, gap: Option[Double], dataUsed: String, comment: String,
    topUnscaled: Option[Double], botUnscaled: Option[Double],
    topScaled: Option[Double], botScaled: Option[Double],
    coreTop: Option[Double])

/** SIT depth columns computed by the fold, keyed back to the sparse
  * row by seq.
  */
case class SitDepths(seq: Long, topCSF: Double, topCCSF: Double,
    botCSF: Double, botCCSF: Double)

/** An affine-table row emitted by the fold (on-splice cores) or by the
  * off-splice chain; ordering/differential/growth are filled later by
  * AffineFinish.
  */
case class AffineEmit(seq: Long, site: String, hole: String, core: String,
    tool: String, csf: Double, ccsf: Double, offset: Double,
    shiftType: String, fixedCore: String,
    fixedTieCsf: Option[Double], shiftedTieCsf: Option[Double],
    comment: String)

case class FoldOut(sit: SitDepths, affine: Option[AffineEmit])

final class SpliceError(msg: String) extends RuntimeException(msg)

case class SpliceOptions(
    useScaledDepths: Boolean = false,
    lazyAppend: Boolean = false,
    spliceStartDepth: Option[Double] = None)

/** O1: sparse splice → SIT + on-splice affine rows.
  * (reference: /root/reference/feldman.py:155-291)
  *
  * Architecture: every per-row section lookup the reference does with
  * O(n) scans (feldman.py:181,187) becomes ONE broadcast hash join
  * against the section summary, resolved before the fold — so the
  * recurrence itself touches only pre-computed depths. The recurrence
  * (affine of row i depends on computed CCSF of row i−1) is a true
  * sequential fold and runs as `mapPartitions` over a single
  * seq-sorted partition. At scale, splices are small per-site chains:
  * thousands of independent splices would fold in parallel via
  * `groupByKey(spliceId).flatMapGroups` with identical per-group code;
  * the expensive side (measurement export) never enters a fold.
  */
object SpliceBuilder {

  /** Join the sparse splice against the (broadcast) section summary to
    * resolve top/bottom depths in both unscaled and scaled space, plus
    * each core's top depth (section '1').
    */
  def resolve(spark: SparkSession, sparse: DataFrame, secsumm: DataFrame): Dataset[ResolvedInterval] = {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark) // graft_offset_depth
    // One canonical projection, aliased per use: the two broadcast
    // exchanges canonicalize to the same plan, so Spark builds the
    // hashed relation once and ReusedExchange serves the second join.
    val secProj = secsumm.select(
      col("Site").as("s_site"), col("Hole").as("s_hole"),
      col("Core").as("s_core"), col("Section").as("s_sec"),
      col("TopDepth").as("s_td"), col("BottomDepth").as("s_bd"),
      col("TopDepthScaled").as("s_tds"), col("BottomDepthScaled").as("s_bds"),
      col("CuratedLength").as("s_cl"), col("Gaps").as("s_gaps"))
    def sec(prefix: String) = broadcast(secProj.select(secProj.columns.toIndexedSeq.map(c =>
      col(c).as(prefix + c.stripPrefix("s"))): _*))

    val coreTops = broadcast(secsumm.filter(col("Section") === "1")
      .groupBy(col("Site").as("ct_site"), col("Hole").as("ct_hole"), col("Core").as("ct_core"))
      .agg(first(DepthOps.r3(col("TopDepth"))).as("ct_top")))

    def od(p: String, off: String, scaled: Boolean) =
      DepthOps.offsetDepth(
        col(if (scaled) s"${p}_tds" else s"${p}_td"),
        col(if (scaled) s"${p}_bds" else s"${p}_bd"),
        col(s"${p}_cl"), col(s"${p}_gaps"), col(off), scaled)

    sparse
      .join(sec("t"), col("Site") === col("t_site") && col("Hole") === col("t_hole") &&
        col("Core") === col("t_core") && col("TopSection") === col("t_sec"), "left")
      .join(sec("b"), col("Site") === col("b_site") && col("Hole") === col("b_hole") &&
        col("Core") === col("b_core") && col("BottomSection") === col("b_sec"), "left")
      .join(coreTops, col("Site") === col("ct_site") && col("Hole") === col("ct_hole") &&
        col("Core") === col("ct_core"), "left")
      .select(
        col(CsvIO.SeqCol).as("seq"),
        col("Site").as("site"), col("Hole").as("hole"), col("Core").as("core"),
        col("Tool").as("tool"),
        col("TopSection").as("topSection"), col("TopOffset").as("topOffset"),
        col("BottomSection").as("botSection"), col("BottomOffset").as("botOffset"),
        upper(col("SpliceType")).as("spliceType"), col("Gap").as("gap"),
        col("DataUsed").as("dataUsed"), col("Comment").as("comment"),
        when(col("t_site").isNull, lit(null)).otherwise(od("t", "TopOffset", scaled = false)).as("topUnscaled"),
        when(col("b_site").isNull, lit(null)).otherwise(od("b", "BottomOffset", scaled = false)).as("botUnscaled"),
        when(col("t_site").isNull, lit(null)).otherwise(od("t", "TopOffset", scaled = true)).as("topScaled"),
        when(col("b_site").isNull, lit(null)).otherwise(od("b", "BottomOffset", scaled = true)).as("botScaled"),
        col("ct_top").as("coreTop"))
      .as[ResolvedInterval]
  }

  /** The ordered recurrence. Faithful to feldman.py:155-281:
    * first row anchored (optionally shifted to spliceStartDepth);
    * TIE → affine = prevBotCCSF − shiftTop; APPEND with user gap →
    * prevBotCCSF + gap − shiftTop; APPEND same-hole (or lazyAppend) →
    * inherit prevAffine; APPEND cross-hole → preserve the scaled
    * (CSF-B) gap; APPEND overlap is repaired by bumping the affine
    * down; inverted intervals and unknown splice types abort.
    */
  def foldIntervals(rows: Iterator[ResolvedInterval], opts: SpliceOptions): Iterator[FoldOut] = {
    def req(v: Option[Double], r: ResolvedInterval, what: String): Double =
      v.getOrElse(throw new SpliceError(
        s"SectionSummary: could not resolve $what for ${r.site}${r.hole}-${r.core}"))

    val seen = scala.collection.mutable.Set.empty[String]
    var prevAffine = 0.0
    var prevBotCCSF: Option[Double] = None
    var prevBotCSF: Option[Double] = None
    var prevHole = ""
    var prevCore = ""
    var prevBotScaled: Option[Double] = None
    var sptype: Option[String] = None
    var gap: Option[Double] = None
    var index = 0

    val out = scala.collection.mutable.ArrayBuffer.empty[FoldOut]
    for (r <- rows) {
      val shiftTop = if (opts.useScaledDepths) req(r.topScaled, r, "top section (scaled)")
                     else req(r.topUnscaled, r, "top section")
      val shiftBot = if (opts.useScaledDepths) req(r.botScaled, r, "bottom section (scaled)")
                     else req(r.botUnscaled, r, "bottom section")
      if (shiftTop >= shiftBot)
        throw new SpliceError(
          s"Interval is inverted or zero-length: computed top depth $shiftTop >= computed bottom depth $shiftBot")

      var affine = 0.0
      if (sptype.isEmpty && index == 0) {
        affine = opts.spliceStartDepth.map(_ - shiftTop).getOrElse(0.0)
      } else sptype match {
        case Some("APPEND") =>
          gap match {
            case Some(g) => affine = (prevBotCCSF.get + g) - shiftTop
            case None =>
              if (r.hole == prevHole || opts.lazyAppend) affine = prevAffine
              else {
                val scaledGap = req(r.topScaled, r, "top section (scaled)") - prevBotScaled.get
                affine = (prevBotCCSF.get - shiftTop) + scaledGap
              }
          }
        case Some("TIE") => affine = prevBotCCSF.get - shiftTop
        case other =>
          throw new SpliceError(s"Encountered unknown splice type ${other.getOrElse("")}, bailing out!")
      }

      // overlap repair (feldman.py:227-233): APPEND only
      prevBotCCSF.foreach { pb =>
        if (pb > shiftTop + affine && sptype.contains("APPEND"))
          affine += pb - (shiftTop + affine)
      }

      val coreid = r.site + r.hole + "-" + r.core
      val affineEmit =
        if (!seen.contains(coreid)) {
          seen += coreid
          val isTie = sptype.contains("TIE")
          val shiftType =
            if (isTie) "TIE"
            else if (sptype.contains("APPEND") && gap.isDefined) "SET"
            else "REL"
          val coreTop = req(r.coreTop, r, "core top (section 1)")
          Some(AffineEmit(r.seq, r.site, r.hole, r.core, r.tool,
            coreTop, coreTop + affine, affine, shiftType,
            if (isTie) prevHole + prevCore else "",
            if (isTie) prevBotCSF else None,
            if (isTie) Some(shiftTop) else None,
            comment = "splice"))
        } else None

      out += FoldOut(SitDepths(r.seq, shiftTop, shiftTop + affine, shiftBot, shiftBot + affine), affineEmit)

      prevBotCCSF = Some(shiftBot + affine)
      prevBotCSF = Some(shiftBot)
      prevAffine = affine
      prevHole = r.hole
      prevCore = r.core
      prevBotScaled = Some(req(r.botScaled, r, "bottom section (scaled)"))
      sptype = Some(r.spliceType)
      gap = r.gap
      index += 1
    }
    out.iterator
  }

  /** Run resolve + fold; returns (SIT DataFrame in sparse column order
    * with the four depth columns inserted at the reference's positions,
    * on-splice AffineEmit dataset).
    */
  def sparseSpliceToSIT(spark: SparkSession, sparse: DataFrame, secsumm: DataFrame,
      opts: SpliceOptions = SpliceOptions()): (DataFrame, Dataset[AffineEmit]) = {
    import spark.implicits._
    val resolved = resolve(spark, sparse, secsumm)
    // single ordered partition: the recurrence is sequential by contract
    val folded = resolved.repartition(1).sortWithinPartitions("seq")
      .mapPartitions(it => foldIntervals(it, opts))
      .cache()

    val sitDepths = folded.map(_.sit)
    val affines = folded.flatMap(_.affine)

    // insert depth columns at the reference's positions 6 and 10
    // (feldman.py:270-273)
    val joined = sparse.join(sitDepths.toDF(), sparse(CsvIO.SeqCol) === col("seq")).drop("seq")
    val baseCols = sparse.columns.filterNot(_ == CsvIO.SeqCol).toBuffer
    baseCols.insertAll(6, Seq("topCSF", "topCCSF"))
    baseCols.insertAll(10, Seq("botCSF", "botCCSF"))
    val sit = joined
      .orderBy(CsvIO.SeqCol)
      .select((CsvIO.SeqCol +: baseCols.toSeq).map(col): _*)
      .withColumnsRenamed(Map(
        "topCSF" -> TopDepthCSF.name, "topCCSF" -> TopDepthCCSF.name,
        "botCSF" -> BottomDepthCSF.name, "botCCSF" -> BottomDepthCCSF.name))
    (sit, affines)
  }
}
