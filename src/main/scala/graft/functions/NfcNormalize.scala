package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization: `graft_nfc(text)` — composes combining
  * sequences into their canonical precomposed form (e +  ́ → é), the
  * standard first step of corpus text canonicalization. Spark has no
  * built-in for this; the JDK's Normalizer implements the same UAX#15
  * algorithm DuckDB's `nfc_normalize` does, which is what makes the
  * q87 oracle a true cross-engine value check.
  *
  * Fast path: Normalizer.isNormalized is a cheap scan and nearly all
  * real text is already NFC — the allocation-heavy normalize call
  * runs only on rows that actually need it.
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "graft_nfc"
  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC))
      input
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
