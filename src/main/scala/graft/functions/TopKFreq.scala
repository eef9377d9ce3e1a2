package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_topk_freq(token, capacity)` — Misra–Gries heavy hitters as
  * ONE mergeable aggregate: at most `capacity` (token, estimate)
  * entries per buffer, one pass, no token-keyed shuffle. The scale
  * twin of the exact vocabulary aggregation: each partition ships a
  * bounded summary instead of its full distinct-token set.
  *
  * Guarantees (Misra–Gries / mergeable-summaries merge rule):
  *  - estimates never exceed true counts;
  *  - undercount is at most n/(capacity+1) over n observed tokens, so
  *    every token with true count > n/(capacity+1) is present;
  *  - if `capacity` ≥ the number of distinct tokens, the summary is
  *    EXACT (which is what the harness oracle pins — the approximate
  *    regime is spec-tested against the invariants above).
  * Estimates (not membership of heavy hitters) can vary with merge
  * order, like any mergeable sketch — callers wanting exact counts
  * re-count the reported tokens in a second cheap pass.
  *
  * Output: array<struct<tok, est>> sorted by (est desc, tok) for
  * deterministic presentation of a given buffer state.
  */
case class TopKFreq(child: Expression, capacityExpr: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]] {

  override def children: Seq[Expression] = Seq(child, capacityExpr)

  override def checkInputDataTypes(): TypeCheckResult =
    (child.dataType, capacityExpr.dataType) match {
      case (StringType, IntegerType) if capacityExpr.foldable =>
        if (capacity > 0) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(s"$prettyName requires capacity > 0")
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, foldable int) arguments")
    }

  @transient private lazy val capacity: Int =
    capacityExpr.eval(null).asInstanceOf[Int]

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("tok", StringType, nullable = false),
    StructField("est", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_topk_freq"

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    new mutable.HashMap[UTF8String, Long]()

  override def update(buf: mutable.HashMap[UTF8String, Long],
      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      buf.get(s) match {
        case Some(c) => buf.update(s, c + 1) // existing key object retained
        case None if buf.size < capacity =>
          buf.update(s.clone(), 1L) // clone: input UTF8Strings are reused
        case None => // classic MG: decrement everyone, drop zeros
          buf.mapValuesInPlace((_, c) => c - 1)
          buf.filterInPlace((_, c) => c > 0)
      }
    }
    buf
  }

  /** Mergeable-summaries rule: sum counts, then subtract the
    * (capacity+1)-th largest combined count and drop non-positives —
    * keeps ≤ capacity entries and preserves the MG error bound.
    */
  override def merge(buf: mutable.HashMap[UTF8String, Long],
      other: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    other.foreach { case (k, c) =>
      buf.update(k, buf.getOrElse(k, 0L) + c)
    }
    if (buf.size > capacity) {
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(buf.size - capacity - 1) // (capacity+1)-th largest
      buf.mapValuesInPlace((_, c) => c - cut)
      buf.filterInPlace((_, c) => c > 0)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    val entries = buf.toArray.sortWith { case ((t1, c1), (t2, c2)) =>
      if (c1 != c2) c1 > c2 else t1.compareTo(t2) < 0
    }
    new GenericArrayData(entries.map { case (t, c) =>
      new GenericInternalRow(Array[Any](t, c))
    })
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    var size = 4
    buf.foreach { case (k, _) => size += 4 + k.numBytes() + 8 }
    val bb = ByteBuffer.allocate(size)
    bb.putInt(buf.size)
    buf.foreach { case (k, c) =>
      val bytes = k.getBytes
      bb.putInt(bytes.length); bb.put(bytes); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new mutable.HashMap[UTF8String, Long]()
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val arr = new Array[Byte](len)
      bb.get(arr)
      buf.update(UTF8String.fromBytes(arr), bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKFreq =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKFreq =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKFreq =
    copy(child = newChildren(0), capacityExpr = newChildren(1))
}
