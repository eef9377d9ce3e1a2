package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `graft_gram_agg(x, y)` over two equal-length bigint arrays → ONE
  * flat bigint array holding the three d×d integer gram matrices
  * [Σx_j·y_k | Σx_j·x_k | Σy_j·y_k] in j-major order — the sufficient
  * statistics of linear CKA (and any cross-covariance audit) in a
  * single corpus pass.
  *
  * The composed twin (explode n·d² product structs → hash agg) is
  * semantically identical but materializes and shuffles 245M rows at
  * sf0.1; this aggregate carries one long[3d²] buffer per partition
  * with additive merge — the MinHashSig/SimHashAgg discipline.
  * Exact-long contract: |x|·|y|·n must stay under 2^63 (int8-scale
  * codes × 10^4-grid values hold to ~10^12 rows).
  */
case class GramAgg(xChild: Expression, yChild: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(xChild, yChild)

  override def checkInputDataTypes(): TypeCheckResult =
    (xChild.dataType, yChild.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint> arguments, got " +
          s"${a.simpleString(10)} and ${b.simpleString(10)}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_gram_agg"

  // sized lazily on the first row (d isn't known at planning time);
  // empty buffer = "no rows seen"
  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val xv = xChild.eval(input)
    val yv = yChild.eval(input)
    if (xv == null || yv == null) return buf
    val x = xv.asInstanceOf[ArrayData].toLongArray()
    val y = yv.asInstanceOf[ArrayData].toLongArray()
    val d = x.length
    require(y.length == d,
      s"$prettyName: array lengths differ ($d vs ${y.length})")
    val b = if (buf.length == 3 * d * d) buf else {
      require(buf.isEmpty,
        s"$prettyName: vector length changed mid-aggregation")
      new Array[Long](3 * d * d)
    }
    val dd = d * d
    var j = 0
    while (j < d) {
      val xj = x(j)
      val yj = y(j)
      val row = j * d
      var k = 0
      while (k < d) {
        b(row + k) += xj * y(k)
        b(dd + row + k) += xj * x(k)
        b(2 * dd + row + k) += yj * y(k)
        k += 1
      }
      j += 1
    }
    b
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    if (other.isEmpty) return buf
    if (buf.isEmpty) return other.clone()
    require(buf.length == other.length,
      s"$prettyName: partials disagree on vector length")
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.length * 8)
    bb.putInt(buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bb.getInt)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GramAgg =
    copy(xChild = newChildren(0), yChild = newChildren(1))
}
