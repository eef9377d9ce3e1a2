package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass winnowing kernel (Schleimer et al. 2003) — the native
  * replacement for the composed HOF pipeline
  * `transform(sequence)·md5·slice·array_min·array_position`, which
  * pays one commons-codec digest allocation, one substring copy, one
  * 32-char hex string, and an O(w) window slice PER CHARACTER.
  * Here: one reused MessageDigest, k-gram bytes addressed by
  * precomputed codepoint offsets (no substring objects), window
  * minima via a monotone deque (O(1) amortized), and hex strings
  * materialized only for the ~2/(w+1) fraction of grams actually
  * selected. Bit-identical to the composed form (WinnowNativeSpec
  * pins it differentially, including hash-tie and multi-byte cases):
  *
  *  - gram hash value = first 16 lowercase-hex chars of
  *    md5(utf8 bytes of the k-codepoint substring); compared as an
  *    UNSIGNED long of the first 8 digest bytes — exactly the
  *    lexicographic hex order the composed form sorts by.
  *  - per window, the emitted position is the FIRST occurrence of
  *    the minimal value (array_position semantics): the deque pops
  *    strictly-greater tails, so an equal-valued later gram never
  *    displaces the earlier front.
  *  - consecutive windows selecting the same (value, position) are
  *    emitted once — dropping exact duplicates, which downstream
  *    set/min-pos consumers cannot observe.
  */
object WinnowFpUtil {
  def winnow(text: UTF8String, k: Int, w: Int): ArrayData = {
    val bytes = text.getBytes
    // codepoint start offsets (UTF8String character counting)
    val nChars = text.numChars()
    if (nChars < k) return new GenericArrayData(Array.empty[Any])
    val offs = new Array[Int](nChars + 1)
    var ci = 0; var bi = 0
    while (bi < bytes.length) {
      offs(ci) = bi
      bi += UTF8String.numBytesForFirstByte(bytes(bi))
      ci += 1
    }
    offs(nChars) = bytes.length
    val nGrams = nChars - k + 1

    val md = digest.get()
    val hv = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      md.reset()
      md.update(bytes, offs(i), offs(i + k) - offs(i))
      val d = md.digest()
      hv(i) = ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
        ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
        ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
      i += 1
    }

    // monotone deque of gram indices; values unsigned-increasing from
    // front to back; strictly-greater tails pop so the front is the
    // FIRST occurrence of the window minimum
    val dq = new Array[Int](nGrams)
    var head = 0; var tail = 0 // [head, tail)
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var lastEmitted = -1
    i = 0
    while (i < nGrams) {
      while (tail > head &&
          java.lang.Long.compareUnsigned(hv(dq(tail - 1)), hv(i)) > 0)
        tail -= 1
      dq(tail) = i; tail += 1
      val windowStart = i - w + 1 // may be negative for the short-doc prefix
      while (dq(head) < windowStart) head += 1
      // a window "closes" at i once i >= w-1, or at the very end for
      // docs with fewer grams than one window
      if (i >= w - 1 || i == nGrams - 1) {
        val sel = dq(head)
        if (sel != lastEmitted) {
          out += InternalRow(UTF8String.fromString(hex16(hv(sel))),
            (sel + 1).toLong) // 1-based gram position
          lastEmitted = sel
        }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val HexChars = "0123456789abcdef".toCharArray
  private def hex16(v: Long): String = {
    val c = new Array[Char](16)
    var i = 0
    while (i < 16) {
      c(i) = HexChars(((v >>> ((15 - i) * 4)) & 0xf).toInt)
      i += 1
    }
    new String(c)
  }
}

/** `graft_winnow(text, k, w)` → array<struct<fp: string, pos: bigint>>:
  * the winnowing fingerprint selection over char-k-grams with window
  * w — one (fp, 1-based gram position) entry per front change. */
case class WinnowFp(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, IntegerType, IntegerType) =>
        if (!second.foldable || !third.foldable)
          TypeCheckResult.TypeCheckFailure(
            s"$prettyName requires literal k/w arguments")
        else if (kk < 1 || ww < 1)
          TypeCheckResult.TypeCheckFailure(
            s"$prettyName requires k >= 1 and w >= 1, got k=$kk w=$ww")
        else TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, int, int), got " +
          s"${a.simpleString(10)}, ${b.simpleString(10)}, ${c.simpleString(10)}")
    }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("fp", StringType, nullable = false),
      StructField("pos", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_winnow"

  @transient private lazy val kk: Int = second.eval(null).asInstanceOf[Int]
  @transient private lazy val ww: Int = third.eval(null).asInstanceOf[Int]

  override def nullSafeEval(t: Any, _k: Any, _w: Any): Any =
    WinnowFpUtil.winnow(t.asInstanceOf[UTF8String], kk, ww)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = WinnowFpUtil.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (t, _, _) =>
      s"${ev.value} = $util.winnow($t, $kk, $ww);")
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): WinnowFp =
    copy(first = newFirst, second = newSecond, third = newThird)
}
