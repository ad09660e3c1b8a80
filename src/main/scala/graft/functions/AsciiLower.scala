package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** ASCII-only lowercase: bytes 'A'-'Z' get +32, everything else (incl.
  * multi-byte UTF-8 sequences, which always have the high bit set) is
  * untouched.
  *
  * Why not builtin `lower`: Spark 4 routes Lower through
  * CollationSupport -> CollationAwareUTF8String, whose static
  * initializer builds a full-Unicode ICU title-case table — measured
  * 3+ MINUTES of one-time class-init on this VM, during which every
  * executor thread calling lower() blocks on the class-init monitor
  * (thread dumps showed 31/32 workers parked there). For the engine's
  * hot paths (tokenization, shingling) ASCII case folding is the
  * documented semantic, identical to DuckDB lower() on ASCII input.
  */
object AsciiLowerImpl {
  def lower(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    var i = 0
    var changed = false
    while (i < bytes.length && !changed) {
      if (bytes(i) >= 'A' && bytes(i) <= 'Z') changed = true else i += 1
    }
    if (!changed) return s
    val out = java.util.Arrays.copyOf(bytes, bytes.length)
    while (i < out.length) {
      if (out(i) >= 'A' && out(i) <= 'Z') out(i) = (out(i) + 32).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }
}

case class AsciiLower(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_ascii_lower"

  override def nullSafeEval(input: Any): Any =
    AsciiLowerImpl.lower(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = AsciiLowerImpl.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, c => s"$m.lower($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): AsciiLower =
    copy(child = newChild)
}

object AsciiLowerFn {
  def apply(c: Column): Column = exprToColumn(AsciiLower(columnToExpr(c.cast("string"))))
}
