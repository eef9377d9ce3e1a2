package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Product-quantization scalar kernels shared by interpreted eval and
  * generated code. `books` is the per-subspace codebook set: books(j)
  * is subspace j's centroid table (nCodes × ds_j); subvector j of the
  * input covers dims [Σ_{i<j} ds_i, Σ_{i≤j} ds_i).
  */
object PqCodecUtil {
  /** PQ encode: per subspace, the index of the nearest centroid to
    * the corresponding subvector (squared euclidean; ties break on
    * the lower index). One array<int> of m codes per vector — the
    * compressed representation a 100 TB index stores instead of the
    * 4·d-byte float vector.
    */
  def encode(vec: ArrayData, books: Array[Array[Array[Double]]]): ArrayData = {
    val m = books.length
    val codes = new Array[Int](m)
    var off = 0
    var j = 0
    while (j < m) {
      val book = books(j)
      val ds = if (book.length > 0) book(0).length else 0
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < book.length) {
        val cv = book(c)
        var acc = 0.0
        var i = 0
        val lim = math.min(ds, math.max(vec.numElements() - off, 0))
        while (i < lim) {
          val t = vec.getDouble(off + i) - cv(i)
          acc += t * t
          i += 1
        }
        if (acc < bestD) { bestD = acc; best = c }
        c += 1
      }
      codes(j) = best
      off += ds
      j += 1
    }
    new GenericArrayData(codes)
  }

  /** ADC lookup table: table(j)(c) = squared distance between the
    * query's subvector j and centroid c of codebook j. Computed ONCE
    * per (query, probed cell); each candidate then costs m array
    * lookups + a sum instead of a d-dim distance.
    */
  def adcTable(vec: ArrayData, books: Array[Array[Array[Double]]]): ArrayData = {
    val m = books.length
    val rows = new Array[ArrayData](m)
    var off = 0
    var j = 0
    while (j < m) {
      val book = books(j)
      val ds = if (book.length > 0) book(0).length else 0
      val row = new Array[Double](book.length)
      var c = 0
      while (c < book.length) {
        val cv = book(c)
        var acc = 0.0
        var i = 0
        val lim = math.min(ds, math.max(vec.numElements() - off, 0))
        while (i < lim) {
          val t = vec.getDouble(off + i) - cv(i)
          acc += t * t
          i += 1
        }
        row(c) = acc
        c += 1
      }
      rows(j) = new GenericArrayData(row)
      off += ds
      j += 1
    }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }
}

/** Shared shape for the two PQ expressions: (vector, foldable 3-D
  * codebook literal) → result. The codebook literal is extracted once
  * as a plan reference object (the NearestCells discipline) — never
  * per-element literal nodes, never re-parsed per row.
  */
abstract class PqCodecExpression extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(ArrayType(ArrayType(DoubleType, _), _), _)) =>
      if (right.foldable) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable (literal) codebooks argument")
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<double>, array<array<array<double>>>), got " +
        s"${l.simpleString(10)} and ${r.simpleString(10)}")
  }

  @transient protected lazy val bookArrays: Array[Array[Array[Double]]] = {
    val ad = right.eval(null).asInstanceOf[ArrayData]
    Array.tabulate(ad.numElements()) { j =>
      val bj = ad.getArray(j)
      Array.tabulate(bj.numElements())(c => bj.getArray(c).toDoubleArray())
    }
  }

  protected def kernel: String // method name on PqCodecUtil

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val booksRef = ctx.addReferenceObj("books", bookArrays, "double[][][]")
    val util = PqCodecUtil.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (v, _) =>
      s"${ev.value} = $util.$kernel($v, $booksRef);")
  }
}

/** `graft_pq_encode(vec, codebooks)` → array<int>: the m PQ codes. */
case class PqEncode(left: Expression, right: Expression)
    extends PqCodecExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_pq_encode"
  override protected def kernel: String = "encode"
  override def nullSafeEval(v: Any, _ignored: Any): Any =
    PqCodecUtil.encode(v.asInstanceOf[ArrayData], bookArrays)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqEncode =
    copy(left = newLeft, right = newRight)
}

/** `graft_pq_adc_table(vec, codebooks)` → array<array<double>>: the
  * per-subspace centroid-distance table for asymmetric distance
  * computation.
  */
case class PqAdcTable(left: Expression, right: Expression)
    extends PqCodecExpression {
  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def prettyName: String = "graft_pq_adc_table"
  override protected def kernel: String = "adcTable"
  override def nullSafeEval(v: Any, _ignored: Any): Any =
    PqCodecUtil.adcTable(v.asInstanceOf[ArrayData], bookArrays)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcTable =
    copy(left = newLeft, right = newRight)
}
