package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature as ONE aggregate: `graft_minhash_sig(shingle, k)`
  * → array<long> of k minimums over the deterministic family
  * h_i(s) = xxhash64(i, s).
  *
  * Bit-identical to k separate `min(xxhash64(lit(i), col))` aggregate
  * columns (the seeds chain exactly like the built-in's multi-argument
  * fold), but the plan carries one expression instead of k, and the
  * update loop hashes the shingle bytes k times in-place with no
  * per-column aggregate machinery. Partial aggregation (map-side
  * combine) works as for any imperative aggregate: buffers are
  * element-wise-min merged.
  */
case class MinHashSig(child: Expression, numHashesExpr: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child, numHashesExpr)

  override def checkInputDataTypes(): TypeCheckResult =
    (child.dataType, numHashesExpr.dataType) match {
      case (StringType, IntegerType) if numHashesExpr.foldable =>
        if (numHashes > 0) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(s"$prettyName requires k > 0")
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, foldable int) arguments")
    }

  @transient private lazy val numHashes: Int =
    numHashesExpr.eval(null).asInstanceOf[Int]

  /** Seed of h_i = the xxhash64 fold after its first (int) argument:
    * hash(i, seed=42), exactly like xxhash64(lit(i), s). */
  @transient private lazy val seeds: Array[Long] =
    Array.tabulate(numHashes)(i => XxHash64Function.hash(i, IntegerType, 42L))

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash_sig"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      var i = 0
      while (i < numHashes) {
        val h = XxHash64Function.hash(s, StringType, seeds(i))
        if (h < buf(i)) buf(i) = h
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) {
      if (other(i) < buf(i)) buf(i) = other(i)
      i += 1
    }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashSig =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashSig =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashSig =
    copy(child = newChildren(0), numHashesExpr = newChildren(1))
}
