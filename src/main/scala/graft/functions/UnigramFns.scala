package graft.functions

import graft.ops.UnigramOps
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native expressions for the unigram-LM tokenizer family
  * (ops/UnigramOps.scala). All three follow the BpeEncode contract:
  * model argument must be FOLDABLE (decoded once per task, validated
  * at analysis time on the driver), per-word work memoized in an LRU
  * cache, CodegenFallback (the cost is the string DP, not the
  * interpreter hop).
  */
private[graft] trait UnigramModelArg { self: BinaryExpression =>
  def prettyName: String

  protected def checkModelArg(): TypeCheckResult = {
    if (left.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: text argument must be string, got ${left.dataType.sql}")
    else if (!right.dataType.isInstanceOf[ArrayType] ||
        right.dataType.asInstanceOf[ArrayType].elementType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: model argument must be array<string>, got ${right.dataType.sql}")
    else if (!right.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable (literal) model argument")
    else right.eval() match {
      case null => TypeCheckResult.TypeCheckFailure(
        s"$prettyName: model must not be NULL")
      case arr: ArrayData =>
        val bad = (0 until arr.numElements()).iterator.map { i =>
          val e = arr.getUTF8String(i)
          if (e == null) "null" else e.toString
        }.find { s => val cut = s.lastIndexOf(' '); cut <= 0 || cut >= s.length - 1 }
        bad match {
          case Some(s) => TypeCheckResult.TypeCheckFailure(
            s"$prettyName: model entry '$s' is not 'piece value'")
          case None => TypeCheckResult.TypeCheckSuccess
        }
    }
  }

  protected def modelEntries: Seq[String] = {
    val arr = right.eval().asInstanceOf[ArrayData]
    (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
  }
}

/** `graft_unigram_expect(word, model)` → map<piece, micro> — the
  * per-word E-step: expected piece counts under the model, scaled to
  * micro-unit longs (round(e · 1e6)). Rounding HERE, per (word,
  * piece), is what makes the downstream aggregation exact and
  * partition-invariant.
  */
case class UnigramExpect(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback with UnigramModelArg {

  override def prettyName: String = "graft_unigram_expect"
  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override def nullable: Boolean = left.nullable
  override def checkInputDataTypes(): TypeCheckResult = checkModelArg()

  @transient private lazy val model: UnigramOps.UnigramModel =
    UnigramOps.modelFromEntries(modelEntries)

  override def nullSafeEval(word: Any, modelIgnored: Any): Any = {
    val ec = UnigramOps.expectedCounts(
      word.asInstanceOf[UTF8String].toString, model)
    val keys = new Array[Any](ec.length)
    val vals = new Array[Any](ec.length)
    var i = 0
    ec.foreach { case (piece, e) =>
      keys(i) = UTF8String.fromString(piece)
      vals(i) = math.round(e * 1e6)
      i += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): UnigramExpect =
    copy(left = newLeft, right = newRight)
}

/** `graft_unigram_encode(text, model)` → array of Viterbi pieces
  * (model entries are "piece prob", linear probabilities).
  */
case class UnigramEncode(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback with UnigramModelArg {

  override def prettyName: String = "graft_unigram_encode"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = left.nullable
  override def checkInputDataTypes(): TypeCheckResult = checkModelArg()

  @transient private lazy val model: UnigramOps.UnigramModel =
    UnigramOps.modelFromEntries(modelEntries)
  @transient private lazy val cache = graft.ops.BpeOps.newWordCache()

  override def nullSafeEval(text: Any, modelIgnored: Any): Any = {
    val toks = UnigramOps.viterbiEncode(
      text.asInstanceOf[UTF8String].toString, model, cache)
    new GenericArrayData(toks.map(UTF8String.fromString).toArray[Any])
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): UnigramEncode =
    copy(left = newLeft, right = newRight)
}

/** `graft_greedy_pieces(text, vocab)` → array of greedy longest-match
  * pieces; `vocab` is a foldable space-joined piece list (pieces come
  * from whitespace-split words, so space is unambiguous).
  */
case class GreedyPieces(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "graft_greedy_pieces"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = left.nullable

  override def checkInputDataTypes(): TypeCheckResult = {
    if (left.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: text argument must be string, got ${left.dataType.sql}")
    else if (right.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: vocab argument must be string, got ${right.dataType.sql}")
    else if (!right.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable (literal) vocab argument")
    else if (right.eval() == null)
      TypeCheckResult.TypeCheckFailure(s"$prettyName: vocab must not be NULL")
    else TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val vocab: Set[String] =
    right.eval().asInstanceOf[UTF8String].toString
      .split(' ').iterator.filter(_.nonEmpty).toSet
  // Exactly the longest vocab piece: keeps the candidate ladder in
  // lock-step with greedyOracleSql's unrolled lengths.
  @transient private lazy val maxLen: Int =
    if (vocab.isEmpty) 1 else vocab.iterator.map(_.length).max
  @transient private lazy val cache = graft.ops.BpeOps.newWordCache()

  override def nullSafeEval(text: Any, vocabIgnored: Any): Any = {
    val toks = UnigramOps.greedyEncode(
      text.asInstanceOf[UTF8String].toString, vocab, maxLen, cache)
    new GenericArrayData(toks.map(UTF8String.fromString).toArray[Any])
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GreedyPieces =
    copy(left = newLeft, right = newRight)
}
