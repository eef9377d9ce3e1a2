package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Nondeterministic}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.LongAccumulator

/** Always-true probe filter that counts bucket-drop accounting into
  * SparkContext accumulators: `graft_drop_probe(name, n, isDropped)`.
  *
  * Used only through [[graft.ops.DropGuard.observed]] — the function
  * builder resolves `name` (a string literal) to that guard's
  * accumulators on the driver, and the accumulators then serialize
  * into the task closures like any Spark metric. Accumulator updates
  * arrive with task completion, so the counts survive AQE plan
  * rewrites (PropagateEmptyRelation erases CollectMetrics-based
  * `observe` metrics exactly in the all-dropped case this probe
  * exists to catch).
  *
  * Declared NONDETERMINISTIC so the optimizer can neither eliminate
  * the filter nor reorder other predicates below it — every bucket row
  * the aggregation emits is counted exactly once per execution.
  */
case class DropProbe(n: Expression, isDropped: Expression,
    totalAcc: LongAccumulator, droppedAcc: LongAccumulator,
    hotAcc: LongAccumulator)
    extends Expression with Nondeterministic with CodegenFallback {

  override def children: Seq[Expression] = Seq(n, isDropped)

  override def checkInputDataTypes(): TypeCheckResult =
    (n.dataType, isDropped.dataType) match {
      case (LongType, BooleanType) => TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (bigint, boolean), got (${a.simpleString}, ${b.simpleString})")
    }

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_drop_probe"

  override protected def initializeInternal(partitionIndex: Int): Unit = ()

  override protected def evalInternal(input: InternalRow): Any = {
    val nv = n.eval(input)
    if (nv != null) {
      val members = nv.asInstanceOf[Long]
      totalAcc.add(members)
      if (isDropped.eval(input) == true) {
        droppedAcc.add(members)
        hotAcc.add(1L)
      }
    }
    true
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): DropProbe =
    copy(n = newChildren(0), isDropped = newChildren(1))
}
