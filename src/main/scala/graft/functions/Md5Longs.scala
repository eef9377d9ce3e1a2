package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** Scalar kernel shared by interpreted eval and generated code. */
object Md5LongsUtil {
  // MessageDigest is stateful; one instance per thread, reset by
  // digest() itself — no per-row allocation (DigestUtils.md5 news an
  // instance per call, the cost this kernel exists to remove is the
  // hex round-trip, so don't reintroduce allocation here)
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** The four big-endian 32-bit words of md5(bin), each in [0, 2³²)
    * — word w equals `conv(substring(md5_hex, 8w+1, 8), 16, 10)`,
    * the value the composed form derives through a 32-char hex
    * string and four conv/substring parses. One digest, zero
    * strings.
    */
  def longs(bin: Array[Byte]): ArrayData = {
    val d = md.get().digest(bin)
    val out = new Array[Long](4)
    var i = 0
    while (i < 4) {
      out(i) = ((d(4 * i) & 0xffL) << 24) | ((d(4 * i + 1) & 0xffL) << 16) |
        ((d(4 * i + 2) & 0xffL) << 8) | (d(4 * i + 3) & 0xffL)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `graft_md5_longs(binary)` → array<long> of the digest's four
  * big-endian 32-bit words — the md5-oracle families' digest-split
  * primitive as ONE plan node.
  *
  * Why native: the md5-twin hash families (affine MinHash, md5Long64
  * SimHash, shard hashing) need the digest as integers, and the
  * composed form pays a full hex round-trip per value — md5 renders
  * 32 hex chars, then 2–4 `conv(substring(...), 16, 10)` calls parse
  * them back. That string traffic is the standing 0.3–0.8 s/query
  * premium the md5 families carried over their xxhash twins (r14
  * seal). This expression emits the words straight from the digest
  * bytes; callers assemble halves with shifts (exactly what the
  * conv/cast chain produced, bit-for-bit — each word is < 2³², so
  * the long arithmetic downstream is unchanged).
  *
  * The DuckDB oracles are untouched: they replay the hex digits
  * digitwise, and the differential spec (Md5LongsSpec) pins this
  * kernel word-for-word to the composed conv/substring form.
  */
case class Md5Longs(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary input, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_md5_longs"

  override def nullSafeEval(bin: Any): Any =
    Md5LongsUtil.longs(bin.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = Md5LongsUtil.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $util.longs($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): Md5Longs =
    copy(child = newChild)
}
