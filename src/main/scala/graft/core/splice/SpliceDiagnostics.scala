package graft.core.splice

import graft.core.format.CsvIO
import graft.core.ops.DepthOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference logs warnings and moves on (offset beyond curated
  * length: sectionSummary.py:62-64; interval overlap: feldman.py:227-233;
  * missing sections: sectionSummary.py:171-173). Here they are a
  * first-class queryable dataset — one row per diagnostic with the
  * interval seq, a stable code, and a message — so a pipeline at scale
  * can route them to a sink instead of scraping logs.
  *
  * Pure declarative pass: the same broadcast joins as the resolve step
  * plus one lag window over the SIT; no extra scans of anything large.
  */
object SpliceDiagnostics {

  /** Pre-conversion input diagnostics for a sparse splice against a
    * section summary: unresolvable sections and offsets beyond the
    * curated section length.
    */
  def inputDiagnostics(spark: SparkSession, sparse: DataFrame, secsumm: DataFrame): DataFrame = {
    def sec(prefix: String) = broadcast(secsumm.select(
      col("Site").as(s"${prefix}_site"), col("Hole").as(s"${prefix}_hole"),
      col("Core").as(s"${prefix}_core"), col("Section").as(s"${prefix}_sec"),
      col("CuratedLength").as(s"${prefix}_cl")))

    val joined = sparse
      .join(sec("t"), col("Site") === col("t_site") && col("Hole") === col("t_hole") &&
        col("Core") === col("t_core") && col("TopSection") === col("t_sec"), "left")
      .join(sec("b"), col("Site") === col("b_site") && col("Hole") === col("b_hole") &&
        col("Core") === col("b_core") && col("BottomSection") === col("b_sec"), "left")

    val id = concat(col("Site"), col("Hole"), lit("-"), col("Core"))
    def beyond(off: String, cl: String, secCol: String) =
      col(off) / 100.0 > DepthOps.r3(col(cl)) && col(cl).isNotNull

    val diags = Seq(
      (col("t_site").isNull, lit("MISSING_TOP_SECTION"),
        concat(lit("could not find section "), id, lit("-"), col("TopSection"))),
      (col("b_site").isNull, lit("MISSING_BOTTOM_SECTION"),
        concat(lit("could not find section "), id, lit("-"), col("BottomSection"))),
      (beyond("TopOffset", "t_cl", "TopSection"), lit("OFFSET_BEYOND_CURATED_LENGTH"),
        concat(id, lit("-"), col("TopSection"), lit(": offset "), col("TopOffset"),
          lit("cm beyond curated length "), col("t_cl"), lit("m"))),
      (beyond("BottomOffset", "b_cl", "BottomSection"), lit("OFFSET_BEYOND_CURATED_LENGTH"),
        concat(id, lit("-"), col("BottomSection"), lit(": offset "), col("BottomOffset"),
          lit("cm beyond curated length "), col("b_cl"), lit("m"))))

    val packed = array(diags.map { case (cond, code, msg) =>
      when(cond, struct(code.as("code"), msg.as("message")))
    }: _*)
    joined.select(col(CsvIO.SeqCol).as("seq"), explode(packed).as("d"))
      .filter(col("d").isNotNull)
      .select(col("seq"), col("d.code").as("code"), col("d.message").as("message"))
  }

  /** Post-conversion diagnostics over a SIT: composite-depth overlaps
    * between consecutive intervals (TIEs can legitimately leave these;
    * APPEND overlaps were repaired by the fold).
    */
  def sitOverlaps(sit: DataFrame): DataFrame = {
    import graft.core.model.CoringFormats._
    val w = Window.orderBy(CsvIO.SeqCol)
    sit.select(col(CsvIO.SeqCol).as("seq"),
        col(TopDepthCCSF.name).as("topCCSF"),
        lag(col(BottomDepthCCSF.name), 1).over(w).as("prevBot"))
      .filter(col("prevBot") > col("topCCSF"))
      .select(col("seq"), lit("CCSF_OVERLAP").as("code"),
        concat(lit("previous interval bottom CCSF "), col("prevBot"),
          lit(" is below current interval top CCSF "), col("topCCSF")).as("message"))
  }
}
