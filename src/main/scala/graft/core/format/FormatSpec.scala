package graft.core.format

/** Logical datatypes of the tabular format system — the reference's
  * entire type lattice is STRING | NUMERIC
  * (/root/reference/tabular/columns.py:13-15). NUMERIC maps to Spark
  * DoubleType, STRING to StringType with ""-for-null semantics.
  */
sealed trait ColType
object ColType {
  case object Str extends ColType
  case object Num extends ColType
}

/** Identity of one logical column: internal name, accepted synonyms,
  * per-organization output ("pretty") names, datatype, unit, optional
  * flag. (reference: tabular/columns.py:26-66)
  */
final case class ColId(
    name: String,
    synonyms: Seq[String] = Nil,
    orgNames: Map[String, String] = Map.empty,
    datatype: ColType = ColType.Str,
    unit: String = "",
    optional: Boolean = false) {

  def names: Seq[String] = name +: synonyms

  def matches(colname: String): Boolean = Las.matchColumn(colname, names)

  def isNumeric: Boolean = datatype == ColType.Num
  def isString: Boolean = datatype == ColType.Str

  /** Org-specific output name; falls back to the default org (IODP),
    * then to spaceCaps of the internal name. (columns.py:52-60)
    */
  def prettyName(org: String = "IODP"): String =
    orgNames.getOrElse(org, orgNames.getOrElse("IODP", Las.spaceCaps(name)))
}

/** A named logical schema = ordered list of ColIds.
  * (reference: tabular/columns.py:17-23)
  */
final case class FormatSpec(name: String, cols: Seq[ColId]) {
  def columnNames: Seq[String] = cols.map(_.name)

  /** format-name → input-name map over the given input columns. When
    * several inputs las-match one ColId the LAST match wins, mirroring
    * the reference's dict overwrite (columns.py:138-144).
    */
  def mapColumns(inputCols: Seq[String]): Map[String, String] =
    cols.flatMap { fc =>
      inputCols.filter(fc.matches).lastOption.map(fc.name -> _)
    }.toMap

  def missingRequired(inputCols: Seq[String]): Seq[String] = {
    val m = mapColumns(inputCols)
    cols.filterNot(_.optional).map(_.name).filterNot(m.contains)
  }
}

/** Raised when an input file cannot satisfy a format's required
  * columns. (reference: tabular/csvio.py:15-16)
  */
final class FormatError(msg: String) extends RuntimeException(msg)
