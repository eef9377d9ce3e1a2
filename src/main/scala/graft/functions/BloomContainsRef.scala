package graft.functions

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Driver-side registry pairing an opaque token with a broadcast
  * bloom filter, so the filter payload NEVER enters the logical plan:
  * the `graft_bloom_contains_ref(token, key)` builder (which runs on
  * the driver, at analysis — the DropProbe accumulator pattern)
  * resolves the token here and embeds the [[Broadcast]] HANDLE in the
  * expression instance. Executors pull the blocks once via the
  * torrent protocol; the plan, `explain` output and UI carry only the
  * token string.
  *
  * Returned Columns must be attached to a DataFrame promptly: the
  * token resolves at ANALYSIS time, and an unanalyzed Column held
  * across 128+ further registrations fails loudly with "unknown or
  * evicted bloom token" (every current call site analyzes
  * immediately; the eager failure is the guard for future ones).
  *
  * Entries are LRU-bounded, and eviction `unpersist`s the broadcast
  * (non-blocking) so executor block memory returns EAGERLY — a
  * long-lived session cycling many ≥4 MB blooms no longer holds up
  * to MaxEntries×32 MB of executor blocks hostage to GC timing.
  * Deliberately unpersist, NOT destroy: an already-analyzed plan
  * still holding the evicted handle keeps working (Spark re-ships
  * the value from the driver on next use), whereas destroy would
  * fail a live-but-lazy DataFrame that analyzed before the eviction.
  * Driver-side, the handle stays reachable only from such live
  * plans; once they go, ContextCleaner reclaims the rest.
  */
object BloomBroadcasts {
  private val MaxEntries = 128
  private val counter = new AtomicLong(0L)

  /** Eviction hook — a seam so BloomOpsSpec can observe evictions;
    * production behavior is the non-blocking unpersist. */
  private[graft] var onEvict: Broadcast[BloomFilter] => Unit =
    _.unpersist(blocking = false)

  private val reg =
    new java.util.LinkedHashMap[String, Broadcast[BloomFilter]](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, Broadcast[BloomFilter]]): Boolean = {
        val evict = size() > MaxEntries
        if (evict) {
          try onEvict(e.getValue)
          catch { case _: Throwable => () } // eviction must never throw
        }
        evict
      }
    }

  /** Register a broadcast bloom; returns the token to pass as the
    * first argument of `graft_bloom_contains_ref`. */
  def put(bc: Broadcast[BloomFilter]): String = reg.synchronized {
    val token = s"bloom-${counter.incrementAndGet()}"
    reg.put(token, bc)
    token
  }

  def get(token: String): Broadcast[BloomFilter] = reg.synchronized {
    val bc = reg.get(token)
    require(bc != null,
      s"graft_bloom_contains_ref: unknown or evicted bloom token '$token' " +
        "(tokens come from BloomBroadcasts.put and are LRU-bounded)")
    bc
  }
}

/** `graft_bloom_contains_ref(token, key)` — the broadcast-payload twin
  * of [[BloomContains]] for blooms too big to ride the plan as a
  * binary literal (BloomOps switches at 4 MB serialized). Semantics
  * are identical: membership probe, false positives pass, false
  * negatives impossible.
  *
  * The broadcast handle (a few bytes) serializes with the expression;
  * `bc.value` materializes the filter once per executor. Codegen pins
  * the resolved filter in a mutable-state slot initialized once per
  * generated-class instance, so the per-row work is the same single
  * `mightContainLong`/`mightContainString` call as the literal form.
  */
case class BloomContainsRef(left: Expression, right: Expression)(
    val bc: Broadcast[BloomFilter]) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != StringType || !left.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable string bloom token as argument 1, " +
          s"got ${left.dataType.simpleString} (foldable=${left.foldable})")
    else right.dataType match {
      case LongType | IntegerType | ShortType | ByteType | StringType | NullType =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName supports integral or string keys, got ${t.simpleString}")
    }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_contains_ref"

  // curried-ctor extra args are NOT part of case equality — two
  // expressions with equal children but different blooms must not
  // compare equal, so the token (left child) must be unique per
  // bloom, which BloomBroadcasts.put guarantees.

  @transient private lazy val bloom: BloomFilter = bc.value

  override def nullSafeEval(token: Any, key: Any): Any = right.dataType match {
    case StringType => bloom.mightContainString(key.asInstanceOf[UTF8String].toString)
    case _ => bloom.mightContainLong(key.asInstanceOf[Number].longValue())
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bfCls = classOf[BloomFilter].getName
    val bcRef = ctx.addReferenceObj("graftBloomBc", bc,
      classOf[Broadcast[BloomFilter]].getName)
    val filterVar = ctx.addMutableState(bfCls, "graftBloomRefFilter",
      v => s"$v = ($bfCls) $bcRef.value();")
    nullSafeCodeGen(ctx, ev, (_, key) => right.dataType match {
      case StringType =>
        s"${ev.value} = $filterVar.mightContainString($key.toString());"
      case _ =>
        s"${ev.value} = $filterVar.mightContainLong((long) $key);"
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomContainsRef =
    copy(left = newLeft, right = newRight)(bc)
}
