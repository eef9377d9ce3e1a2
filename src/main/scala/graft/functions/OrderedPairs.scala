package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StructField, StructType}

/** Native ordered-pair generator: `graft_ordered_pairs(arr)` emits one
  * row (a, b) per index pair i < j of the input array — the pair
  * expansion at the heart of every posting-list self-comparison
  * (n-gram Jaccard intersections, MinHash band buckets).
  *
  * Why native: the composed form
  * `explode(flatten(transform(arr, (x,i) => transform(slice(arr, i+2, n),
  * y => struct(x, y)))))` materializes the full O(f²) nested array —
  * per outer element a slice COPY of the tail plus an array of structs,
  * all allocated before the explode even starts. The generator yields
  * pairs lazily straight out of the source array: zero intermediate
  * arrays, no slice copies, allocation per EMITTED row only. Skew
  * remains the caller's contract exactly as before: posting lists are
  * feasible only where O(f²) output is (document-frequency caps).
  */
case class OrderedPairs(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array argument, got ${t.simpleString(10)}")
  }

  private def arrayType: ArrayType = child.dataType.asInstanceOf[ArrayType]

  override def elementSchema: StructType = StructType(Seq(
    StructField("a", arrayType.elementType, arrayType.containsNull),
    StructField("b", arrayType.elementType, arrayType.containsNull)))

  override def prettyName: String = "graft_ordered_pairs"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val data = child.eval(input)
    if (data == null) return Iterator.empty
    val arr = data.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < 2) return Iterator.empty
    val et: DataType = arrayType.elementType
    // extract elements once; ArrayData.get on unsafe arrays returns
    // buffer-backed views, valid for the lifetime of the source row —
    // the same contract the built-in explode relies on
    val elems = new Array[Any](n)
    var i = 0
    while (i < n) { elems(i) = arr.get(i, et); i += 1 }
    new Iterator[InternalRow] {
      private var a = 0
      private var b = 1
      override def hasNext: Boolean = a < n - 1
      override def next(): InternalRow = {
        val r = InternalRow(elems(a), elems(b))
        b += 1
        if (b >= n) { a += 1; b = a + 1 }
        r
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): OrderedPairs =
    copy(child = newChild)
}
