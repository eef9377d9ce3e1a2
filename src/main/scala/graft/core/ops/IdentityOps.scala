package graft.core.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** P13: core-ID string parsing (LacCore/IODP naming), as a codegen'd
  * column expression returning a struct — no UDF.
  * (reference: /root/reference/coring/identity.py:74-103,
  *  coring/utils.py:13-29)
  *
  * LacCore form: GLAD7-MAL05-1B-32E-4-A →
  *   name=GLAD7-MAL05, site=1, hole=B, core=32, tool=E, section=4, half=A
  * (5 tokens = no half; half must be A, W or WR to be accepted).
  */
object IdentityOps {

  private val charNum = "([0-9]+)([A-Z]+)"

  /** Parse an identity string into a struct of its 7 components.
    * Malformed token counts yield a null struct, like the reference's
    * parseIdentity returning None implicitly.
    */
  def parseCoreIdentity(id: Column): Column = {
    val toks = split(id, "-")
    val n = size(toks)
    val sh = element_at(toks, 3)
    val cct = element_at(toks, 4)
    val halfTok = when(n === 6, element_at(toks, 6))
    val half = when(halfTok.isin("A", "W", "WR"), halfTok)
    when(n === 5 || n === 6, struct(
      concat_ws("-", element_at(toks, 1), element_at(toks, 2)).as("name"),
      regexp_extract(sh, charNum, 1).as("site"),
      regexp_extract(sh, charNum, 2).as("hole"),
      regexp_extract(cct, charNum, 1).as("core"),
      regexp_extract(cct, charNum, 2).as("tool"),
      element_at(toks, 5).as("section"),
      half.as("half")))
  }

  /** Split a SectionID column into Name/Site/Hole/Core/Tool/Section
    * columns appended after it. (coring/utils.py:13-29)
    */
  def splitSectionId(df: DataFrame, sidCol: String = "SectionID"): DataFrame = {
    val p = parseCoreIdentity(col(sidCol))
    df.withColumn("Name", p.getField("name"))
      .withColumn("Site", p.getField("site"))
      .withColumn("Hole", p.getField("hole"))
      .withColumn("Core", p.getField("core"))
      .withColumn("Tool", p.getField("tool"))
      .withColumn("Section", p.getField("section"))
  }
}
