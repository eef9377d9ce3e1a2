package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/** Row-level kernel shared by interpreted eval and generated code. */
object MinHashRowUtil {
  def sig(shingles: ArrayData, seeds: Array[Long]): ArrayData = {
    val k = seeds.length
    val buf = Array.fill(k)(Long.MaxValue)
    val n = shingles.numElements()
    var e = 0
    while (e < n) {
      val s = shingles.getUTF8String(e)
      if (s != null) {
        var i = 0
        while (i < k) {
          val h = XxHash64Function.hash(s, StringType, seeds(i))
          if (h < buf(i)) buf(i) = h
          i += 1
        }
      }
      e += 1
    }
    new GenericArrayData(buf)
  }
}

/** `graft_minhash_row(shingles, k)` → array<long>: the MinHash
  * signature of ONE row's shingle array — the per-row twin of the
  * `graft_minhash_sig` aggregate, using the IDENTICAL deterministic
  * hash family (h_i = xxhash64 seeded by hash(i, 42), exactly the
  * aggregate's seed chain), so the two paths produce bit-identical
  * signatures over the same shingle set (spec-pinned).
  *
  * Exists for STREAMING: an append-mode stream cannot run the
  * per-document aggregate (no watermark-free groupBy), but each
  * arriving row carries its full text, so the signature is a pure
  * projection. Min over a multiset ignores duplicates, so distinct
  * vs non-distinct shingle arrays agree.
  */
case class MinHashRow(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), IntegerType) if right.foldable =>
      if (numHashes > 0) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"$prettyName requires k > 0")
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<string>, foldable int), got " +
        s"${l.simpleString(10)} and ${r.simpleString(10)}")
  }

  @transient private lazy val numHashes: Int =
    right.eval(null).asInstanceOf[Int]

  /** Same seed chain as MinHashSig: hash(i, seed=42). */
  @transient private lazy val seeds: Array[Long] =
    Array.tabulate(numHashes)(i => XxHash64Function.hash(i, IntegerType, 42L))

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_row"

  override def nullSafeEval(v: Any, _ignored: Any): Any =
    MinHashRowUtil.sig(v.asInstanceOf[ArrayData], seeds)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val seedsRef = ctx.addReferenceObj("seeds", seeds, "long[]")
    val util = MinHashRowUtil.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (v, _) =>
      s"${ev.value} = $util.sig($v, $seedsRef);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinHashRow =
    copy(left = newLeft, right = newRight)
}
