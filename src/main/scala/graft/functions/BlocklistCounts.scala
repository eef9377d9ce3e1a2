package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick multi-pattern counter:
  * `graft_blocklist_counts(text)` → array<long> of occurrence counts,
  * one slot per pattern in the constructor order. The automaton is
  * built once per executor ( @transient lazy, patterns ship in the
  * task binary — the LangModelScores idiom) and every document is a
  * SINGLE left-to-right pass regardless of how many patterns the
  * blocklist holds; the per-pattern-regex alternative scans the corpus
  * |patterns| times. Counts are ALL match positions (a self-
  * overlapping pattern counts each start; see BlocklistOps for the
  * oracle-compatibility note). CodegenFallback: the cost is the
  * automaton walk, not the interpreter hop.
  */
case class BlocklistCounts(child: Expression, patterns: Seq[String])
    extends UnaryExpression with CodegenFallback {

  require(patterns.nonEmpty, "blocklist needs at least one pattern")
  require(patterns.forall(_.nonEmpty), "empty blocklist pattern")
  require(patterns.distinct.size == patterns.size,
    s"duplicate blocklist patterns would double-count")

  @transient private lazy val ac = new AcAutomaton(patterns.toArray)

  override def prettyName: String = "graft_blocklist_counts"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName: text argument must be string, got ${child.dataType.sql}")

  override def nullSafeEval(text: Any): Any =
    new GenericArrayData(ac.countAll(text.asInstanceOf[UTF8String].toString))

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Classic Aho–Corasick automaton (goto + failure + merged output
  * links), built eagerly at construction on the executor. Node count
  * is bounded by total pattern length; the walk is O(|text| + matches).
  */
final class AcAutomaton(patterns: Array[String]) extends Serializable {
  import scala.collection.mutable

  private val gotoM = mutable.ArrayBuffer(mutable.HashMap.empty[Char, Int])
  private val outPat = mutable.ArrayBuffer[List[Int]](Nil)

  { // trie
    var pi = 0
    while (pi < patterns.length) {
      var s = 0
      val p = patterns(pi)
      var i = 0
      while (i < p.length) {
        val ch = p.charAt(i)
        s = gotoM(s).getOrElseUpdate(ch, {
          gotoM += mutable.HashMap.empty; outPat += Nil; gotoM.size - 1
        })
        i += 1
      }
      outPat(s) = pi :: outPat(s)
      pi += 1
    }
  }

  private val fail = Array.fill(gotoM.size)(0)
  /** outputs of the node PLUS its whole failure chain, merged so the
    * text walk never follows fail links just to report matches.
    */
  private val outAll: Array[Array[Int]] = {
    val acc = Array.fill[Array[Int]](gotoM.size)(Array.empty)
    val q = mutable.Queue[Int]()
    gotoM(0).valuesIterator.foreach { s => q += s; acc(s) = outPat(s).toArray }
    while (q.nonEmpty) {
      val r = q.dequeue()
      gotoM(r).foreach { case (ch, s) =>
        q += s
        var f = fail(r)
        while (f != 0 && !gotoM(f).contains(ch)) f = fail(f)
        fail(s) = gotoM(f).get(ch).filter(_ != s).getOrElse(0)
        acc(s) = (outPat(s) ++ acc(fail(s))).toArray
      }
    }
    acc
  }

  /** Per-pattern occurrence counts over one text (all positions). */
  def countAll(text: String): Array[Long] = {
    val counts = Array.fill(patterns.length)(0L)
    var s = 0
    var i = 0
    while (i < text.length) {
      val ch = text.charAt(i)
      while (s != 0 && !gotoM(s).contains(ch)) s = fail(s)
      s = gotoM(s).getOrElse(ch, 0)
      val hits = outAll(s)
      var h = 0
      while (h < hits.length) { counts(hits(h)) += 1; h += 1 }
      i += 1
    }
    counts
  }
}
