package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/** Native sign-bit LSH bucket: `graft_lsh_bits(vec, nbits)` → long
  * whose bit p is the sign of vec·plane_p, for `nbits` deterministic
  * pseudo-random hyperplanes.
  *
  * BIT-IDENTICAL to the composed form it replaces
  * (`SimilarityOps.composedLshBucket`): plane component (p, d) is
  * `xxhash64(p, d)` (ints, default seed 42, chained) cast to double
  * and divided by Long.MaxValue, and each projection folds the
  * products in element order — same FP result to the last ulp, so
  * bucket assignments (and therefore every LSH query's output) are
  * unchanged.
  *
  * Why native: the composed form evaluates nbits×dims xxhash64 calls
  * per ROW through interpreted higher-order lambdas, but the plane
  * matrix depends only on (p, d) — this expression computes it once
  * per task (grown to the longest vector seen, served to shorter
  * ones) and each row costs nbits tight-loop dot products.
  *
  * Null/degenerate semantics replicate the composed form exactly:
  * NULL vector or any NULL element → projection NULL → every
  * `when(proj >= 0, bit)` falls to its 0 branch → bucket 0; empty
  * vector → bucket 0 too (`sequence(0, -1)` steps DOWN to `[0, -1]`,
  * zip_with null-pads the empty side, the null poisons the fold);
  * NaN element → NaN projection → bit SET (Spark SQL orders NaN
  * above every number, so `NaN >= 0` is true — unlike Java).
  */
case class LshBits(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "graft_lsh_bits"
  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = {
    if (!left.dataType.isInstanceOf[ArrayType] ||
        left.dataType.asInstanceOf[ArrayType].elementType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: vec must be array<double>, got ${left.dataType.simpleString}")
    else if (!right.foldable || right.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: nbits must be a foldable int")
    else right.eval() match {
      case n: java.lang.Integer if n >= 1 && n <= 62 =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName: nbits must be in [1, 62], got $other")
    }
  }

  @transient private lazy val nbits: Int =
    right.eval().asInstanceOf[Int]

  /** Plane matrix grown to the longest vector seen by this task; a
    * matrix built for length L serves any row of length ≤ L (the
    * component for (p, d) never depends on the vector length). The
    * single volatile tuple ref keeps a racing reader from seeing a
    * partially built matrix — worst case two threads build the same
    * matrix once.
    */
  @transient @volatile
  private var cached: (Int, Array[Array[Double]]) = (-1, null)

  private def planes(len: Int): Array[Array[Double]] = {
    // c == null after Java deserialization (@transient var fields come
    // back null, not their initializer) — treat like an empty cache
    val c = cached
    if (c != null && c._1 >= len) c._2
    else {
      val m = Array.tabulate(nbits, len) { (p, d) =>
        // = xxhash64(lit(p), d): seed 42, children chained as ints
        XXH64.hashInt(d, XXH64.hashInt(p, 42L)).toDouble /
          Long.MaxValue.toDouble
      }
      cached = (len, m)
      m
    }
  }

  override def eval(input: InternalRow): Any = {
    val v = left.eval(input)
    if (v == null) return 0L
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return 0L
    var i = 0
    while (i < n) { if (arr.isNullAt(i)) return 0L; i += 1 }
    val m = planes(n)
    var bits = 0L
    var p = 0
    while (p < nbits) {
      val row = m(p)
      var s = 0.0
      var d = 0
      while (d < n) { s += arr.getDouble(d) * row(d); d += 1 }
      // Spark SQL comparison: NaN >= 0 is TRUE (NaN sorts above all)
      if (s >= 0 || java.lang.Double.isNaN(s)) bits |= (1L << p)
      p += 1
    }
    bits
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}
