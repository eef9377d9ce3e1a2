package graft.core.format

/** Column-name normalization for fuzzy physical→logical schema
  * resolution (reference: /root/reference/tabular/columns.py:70-123).
  *
  * All functions are driver-side (they run over header lists, never
  * over data), so they cost nothing at any data scale.
  */
object Las {

  /** Remove all spaces, then insert a single space at each lower→UPPER
    * boundary: "FooBar", "Foo Bar", "Foo   Bar" → "Foo Bar".
    * (columns.py:70-72)
    */
  def spaceCaps(name: String): String =
    name.replace(" ", "").replaceAll("([a-z])([A-Z])", "$1 $2")

  /** spaceCaps then split on the inserted spaces. (columns.py:74-76) */
  def splitCaps(name: String): Seq[String] = spaceCaps(name).split(" ", -1).toSeq

  /** Remove parenthesized substrings (units): "Top Depth (m)" → "Top Depth ".
    * Spaces are NOT stripped here. (columns.py:78-80)
    */
  def stripUnit(name: String): String = name.replaceAll("\\([^)]*\\)", "")

  /** Contents of the first parenthesized substring, or None.
    * (columns.py:82-85). Mirrors the reference's greedy regex, which
    * captures through the LAST ')' when several groups are present.
    */
  def findUnit(name: String): Option[String] = {
    val m = java.util.regex.Pattern.compile("\\([^\\)].*\\)").matcher(name)
    if (m.find()) Some(m.group().drop(1).dropRight(1)) else None
  }

  /** lowercase + remove all spaces. (columns.py:87-88) */
  def lowerstrip(name: String): String = name.replace(" ", "").toLowerCase

  /** The normalization used for all matching: lowerstrip ∘ stripUnit.
    * "  Column (counts/sec) () " → "column". (columns.py:90-92)
    */
  def las(name: String): String = lowerstrip(stripUnit(name))

  /** Does colname las-match any of names? (columns.py:94-96) */
  def matchColumn(colname: String, names: Seq[String]): Boolean =
    names.exists(n => las(n) == las(colname))

  /** First name in names las-equal to colname. (columns.py:98-106) */
  def findMatch(colname: String, names: Seq[String]): Option[String] =
    names.find(n => las(n) == las(colname))

  /** First name in names whose las starts with las(startstr).
    * (columns.py:108-116)
    */
  def findStartsWith(startstr: String, names: Seq[String]): Option[String] =
    names.find(n => las(n).startsWith(las(startstr)))

  /** All names whose las starts with las(startstr). (columns.py:118-123) */
  def findAllStartsWith(startstr: String, names: Seq[String]): Seq[String] =
    names.filter(n => las(n).startsWith(las(startstr)))
}
