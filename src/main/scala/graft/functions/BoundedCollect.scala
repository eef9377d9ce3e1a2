package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** Aggregation state of [[BoundedCollect]]: member list plus a count
  * that keeps advancing after the list overflows and is discarded.
  */
final class BoundedCollectBuffer(
    var n: Long,
    var overflowed: Boolean,
    val items: ArrayBuffer[Any])

/** Size-bounded sorted collect as ONE aggregate:
  * `graft_bounded_collect(expr, max)` → `struct<n: bigint, ms: array<T>>`
  * where `ms` is the ascending-sorted member list while the group holds
  * at most `max` elements and NULL once it exceeds that — but `n` keeps
  * counting either way.
  *
  * This is the memory-safe spine of every bucketed pair generator
  * (MinHash/SimHash bands, embedding LSH buckets, n-gram posting
  * lists): the pre-r8 form ran `collect_list` THEN filtered on the
  * collected size, so one degenerate bucket (mass-duplicated
  * boilerplate) still materialized millions of members in a single
  * aggregation row before being thrown away. Here the buffer is
  * physically capped at `max` members — the moment a group exceeds it
  * the members are released and only the running count survives, so
  * the cap is an actual memory bound, not a post-hoc filter. The
  * surviving count is what makes the drop OBSERVABLE: callers report
  * `sum(c.n)` vs `sum(c.n) where c.ms is null` through
  * [[graft.ops.DropGuard]] instead of silently losing recall.
  *
  * Equivalent to `sort_array(collect_list(expr))` + a size filter for
  * every group at or under the cap (nulls skipped, ascending interpreted
  * ordering — same as sort_array on non-null members).
  */
case class BoundedCollect(child: Expression, maxExpr: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BoundedCollectBuffer] {

  override def children: Seq[Expression] = Seq(child, maxExpr)

  override def checkInputDataTypes(): TypeCheckResult = {
    val integralMax = maxExpr.dataType match {
      case IntegerType | LongType | ShortType => true
      case _ => false
    }
    if (!maxExpr.foldable || !integralMax)
      return TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable integral max, got ${maxExpr.sql}")
    TypeUtils.checkForOrderingExpr(child.dataType, prettyName)
  }

  private lazy val maxSize: Long = maxExpr.eval() match {
    case i: java.lang.Integer => i.longValue()
    case l: java.lang.Long => l.longValue()
    case s: java.lang.Short => s.longValue()
    case other => sys.error(s"$prettyName: non-integral max $other")
  }

  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(child.dataType)

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("ms", ArrayType(child.dataType, containsNull = false))))

  override def nullable: Boolean = false
  override def prettyName: String = "graft_bounded_collect"

  override def createAggregationBuffer(): BoundedCollectBuffer =
    new BoundedCollectBuffer(0L, false, ArrayBuffer.empty)

  override def update(buf: BoundedCollectBuffer, input: InternalRow): BoundedCollectBuffer = {
    val v = child.eval(input)
    if (v != null) {
      buf.n += 1
      if (!buf.overflowed) {
        // copy: unsafe-backed values are views into a reused row buffer
        buf.items += InternalRow.copyValue(v)
        if (buf.items.length > maxSize) { buf.overflowed = true; buf.items.clear() }
      }
    }
    buf
  }

  override def merge(buf: BoundedCollectBuffer, other: BoundedCollectBuffer): BoundedCollectBuffer = {
    buf.n += other.n
    if (other.overflowed) { buf.overflowed = true; buf.items.clear() }
    else if (!buf.overflowed) {
      buf.items ++= other.items
      if (buf.items.length > maxSize) { buf.overflowed = true; buf.items.clear() }
    }
    buf
  }

  override def eval(buf: BoundedCollectBuffer): Any =
    if (buf.overflowed) InternalRow(buf.n, null)
    else InternalRow(buf.n, new GenericArrayData(buf.items.sorted(ordering).toArray))

  @transient private lazy val serProj = UnsafeProjection.create(Array[DataType](
    LongType, BooleanType, ArrayType(child.dataType, containsNull = false)))

  override def serialize(buf: BoundedCollectBuffer): Array[Byte] =
    serProj.apply(InternalRow(buf.n, buf.overflowed,
      new GenericArrayData(buf.items.toArray))).getBytes

  override def deserialize(bytes: Array[Byte]): BoundedCollectBuffer = {
    val row = new UnsafeRow(3)
    row.pointTo(bytes, bytes.length)
    val arr = row.getArray(2)
    val items = ArrayBuffer.empty[Any]
    var i = 0
    while (i < arr.numElements()) {
      items += InternalRow.copyValue(arr.get(i, child.dataType))
      i += 1
    }
    new BoundedCollectBuffer(row.getLong(0), row.getBoolean(1), items)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedCollect =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedCollect =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BoundedCollect =
    copy(child = newChildren(0), maxExpr = newChildren(1))
}
