package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Bounded k-min DISTINCT set as ONE aggregate:
  * `graft_kmin_distinct(value, k)` → array<string> of the k
  * lexicographically-smallest distinct non-null values, ascending.
  *
  * The KMV-sketch kernel ([[graft.ops.ProfileOps.kmvSketch]]): the
  * composed form (`distinct()` + rank window ≤ k) shuffles EVERY
  * distinct (group, coordinate) pair and sorts whole groups to keep
  * k rows — at 100 TB that is the full coordinate set through one
  * exchange. This aggregate is map-side combined: each partition
  * ships at most k values per group, the merge is a bounded set
  * union, and no sort exchange exists at all. State is strictly
  * bounded at k entries (a TreeSet that evicts its max once full),
  * so executor memory is k × coordinate-width per group regardless
  * of input size.
  *
  * Deterministic by construction: the k-min distinct set of a
  * multiset is partition-invariant (min-merge is associative and
  * commutative, duplicates collapse by set semantics), so the result
  * is bit-identical to the composed form on any layout.
  */
case class KMinDistinct(child: Expression, kExpr: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[UTF8String]] {

  override def children: Seq[Expression] = Seq(child, kExpr)

  override def checkInputDataTypes(): TypeCheckResult =
    (child.dataType, kExpr.dataType) match {
      case (StringType, IntegerType) if kExpr.foldable =>
        // eval before the lazy `k` cast: a foldable NULL k (e.g.
        // CAST(NULL AS INT)) must be a TypeCheckFailure, not an NPE
        // mid-analysis
        if (kExpr.eval(null) == null)
          TypeCheckResult.TypeCheckFailure(s"$prettyName requires non-null k")
        else if (k > 0) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(s"$prettyName requires k > 0")
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, foldable int) arguments")
    }

  @transient private lazy val k: Int = kExpr.eval(null).asInstanceOf[Int]

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_kmin_distinct"

  override def createAggregationBuffer(): java.util.TreeSet[UTF8String] =
    new java.util.TreeSet[UTF8String]()

  /** Insert with the accept test BEFORE any copy: once the set is
    * saturated, a value only needs cloning when it beats the current
    * kth min — acceptance probability ~ k/n, so the hot path is one
    * compareTo against a row-backed buffer, zero allocation (the KMV
    * property that makes the sketch cheap is the same one that makes
    * this aggregate allocation-free). `owned` = true when v already
    * has its own backing bytes (merge path).
    */
  private def add(buf: java.util.TreeSet[UTF8String],
      v: UTF8String, owned: Boolean): Unit = {
    if (buf.size < k) {
      buf.add(if (owned) v else v.clone()); ()
    } else if (v.compareTo(buf.last) < 0) {
      // add first, THEN evict: if v is already present the set is
      // unchanged and nothing may be evicted
      if (buf.add(if (owned) v else v.clone())) buf.pollLast()
      ()
    }
  }

  override def update(buf: java.util.TreeSet[UTF8String],
      input: InternalRow): java.util.TreeSet[UTF8String] = {
    val v = child.eval(input)
    // the input row's UTF8String is backed by a reused buffer —
    // add() clones it if (and only if) it is accepted
    if (v != null) add(buf, v.asInstanceOf[UTF8String], owned = false)
    buf
  }

  override def merge(buf: java.util.TreeSet[UTF8String],
      other: java.util.TreeSet[UTF8String]): java.util.TreeSet[UTF8String] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next(), owned = true)
    buf
  }

  override def eval(buf: java.util.TreeSet[UTF8String]): Any = {
    val arr = new Array[Any](buf.size)
    val it = buf.iterator() // TreeSet iterates ascending
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.TreeSet[UTF8String]): Array[Byte] = {
    var total = 4
    val it0 = buf.iterator()
    while (it0.hasNext) total += 4 + it0.next().numBytes()
    val bb = ByteBuffer.allocate(total)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) {
      val b = it.next().getBytes
      bb.putInt(b.length); bb.put(b)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[UTF8String] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val set = new java.util.TreeSet[UTF8String]()
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      set.add(UTF8String.fromBytes(b))
      i += 1
    }
    set
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KMinDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KMinDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KMinDistinct =
    copy(child = newChildren(0), kExpr = newChildren(1))
}
