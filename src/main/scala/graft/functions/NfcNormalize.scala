package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a codegen-capable expression.
  *
  * Canonically-equivalent byte sequences ("é" precomposed U+00E9 vs
  * decomposed U+0065 U+0301) hash differently, so exact and MinHash
  * dedup both miss duplicates whose only difference is the encoder
  * that produced them — routine in web corpora, where the same page
  * arrives via different toolchains. NFC is the canonical composition
  * (semantics-preserving, byte-canonical), the standard first step of
  * an LLM-corpus normalization pipeline; matches DuckDB's
  * `nfc_normalize`, which oracle-checks it.
  *
  * Spark has no built-in (the `java.text.Normalizer` call below is the
  * same one Spark's own collation support uses internally), so this is
  * the custom-`Expression` altitude: codegen'd per-row call, no UDF
  * serialization, null-intolerant like the hash expressions it feeds.
  * The fast path skips allocation entirely for strings `isNormalized`
  * already reports as composed — the overwhelming majority in practice.
  */
object NfcNormalizeMath {
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    NfcNormalizeMath.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = NfcNormalizeMath.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, c => s"$m.normalize($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalizeFn {
  def apply(c: Column): Column = exprToColumn(NfcNormalize(columnToExpr(c)))
}
