package graft.core

import scala.io.Source

/** Value-based CSV comparison: cells that parse as numbers on both
  * sides compare within a tolerance (absorbs float-formatting noise
  * like `1483` vs `1483.0` and numpy-vs-JVM rounding at the 3-decimal
  * output grid); everything else compares as trimmed strings.
  */
object CsvCompare {

  def parseCsv(path: String): Vector[Vector[String]] = {
    val src = Source.fromFile(path, "UTF-8")
    try src.getLines().filter(_.nonEmpty).map(parseLine).toVector
    finally src.close()
  }

  /** Minimal RFC-4180 line parser (quotes + embedded commas). */
  def parseLine(line: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    val cur = new StringBuilder
    var inQ = false
    var i = 0
    while (i < line.length) {
      val c = line(i)
      if (inQ) {
        if (c == '"' && i + 1 < line.length && line(i + 1) == '"') { cur += '"'; i += 1 }
        else if (c == '"') inQ = false
        else cur += c
      } else c match {
        case '"' => inQ = true
        case ',' => out += cur.result(); cur.clear()
        case _ => cur += c
      }
      i += 1
    }
    out += cur.result()
    out.result()
  }

  /** Returns list of human-readable diffs (empty = match). */
  def diff(actualPath: String, expectedPath: String, tol: Double = 1.1e-3,
      maxDiffs: Int = 12): Seq[String] = {
    val a = parseCsv(actualPath)
    val e = parseCsv(expectedPath)
    val errs = scala.collection.mutable.ArrayBuffer.empty[String]
    if (a.head != e.head) errs += s"header mismatch:\n  actual:   ${a.head}\n  expected: ${e.head}"
    if (a.length != e.length) errs += s"row count ${a.length - 1} vs expected ${e.length - 1}"
    val rows = math.min(a.length, e.length)
    var r = 1
    while (r < rows && errs.length < maxDiffs) {
      val (ra, re) = (a(r), e(r))
      if (ra.length != re.length) errs += s"row $r: ${ra.length} cells vs ${re.length}"
      else {
        var c = 0
        while (c < ra.length && errs.length < maxDiffs) {
          val (va, ve) = (ra(c).trim, re(c).trim)
          val na = va.toDoubleOption
          val ne = ve.toDoubleOption
          val same = (na, ne) match {
            case (Some(x), Some(y)) => math.abs(x - y) <= tol
            case (None, None) => va == ve
            case _ => va == ve || (va.isEmpty && ve.isEmpty)
          }
          if (!same) errs += s"row $r col $c (${a.head(c)}): '$va' vs expected '$ve'"
          c += 1
        }
      }
      r += 1
    }
    errs.toSeq
  }
}
