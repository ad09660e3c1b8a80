package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Morton/Z-order bit interleave as a codegen-capable expression.
  *
  * `interleave(a, b)` weaves the low 31 bits of two non-negative ints
  * into one long whose ordering clusters points that are close in BOTH
  * dimensions — sort a table by it and every output file covers a
  * compact 2-D tile instead of a full-width stripe, so parquet min/max
  * stats can skip files for predicates on EITHER column (the Delta
  * Z-ORDER technique; a single-column sort only ever buys skipping on
  * that one column). The bit-spread uses the standard magic-mask
  * doubling sequence — O(log bits) shifts, no per-bit loop, branch-free
  * in generated code.
  */
object ZOrderMath {
  /** Spread the low 31 bits of x to the even bit positions of a long. */
  def spread(x: Int): Long = {
    var v = x.toLong & 0x7fffffffL
    v = (v | (v << 16)) & 0x0000ffff0000ffffL
    v = (v | (v << 8)) & 0x00ff00ff00ff00ffL
    v = (v | (v << 4)) & 0x0f0f0f0f0f0f0f0fL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  def interleave(a: Int, b: Int): Long = {
    // loud failure beats silent corruption: a negative ordinal would
    // mask to the TOP of the curve and quietly destroy the layout's
    // locality (the whole point of the key); branch is free in
    // practice (always-false, perfectly predicted)
    if ((a | b) < 0)
      throw new IllegalArgumentException(
        s"graft_zvalue requires non-negative bucket ordinals, got ($a, $b)")
    spread(a) | (spread(b) << 1)
  }
}

/** Inputs must already be IntegerType — the [[ZValueFn]] wrapper (and
  * the SQL registration) cast, the same discipline as [[DotProduct]].
  */
case class InterleaveBits(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_zvalue"

  override def nullSafeEval(l: Any, r: Any): Any =
    ZOrderMath.interleave(l.asInstanceOf[Int], r.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ZOrderMath.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, (a, b) => s"$m.interleave($a, $b)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): InterleaveBits =
    copy(left = newLeft, right = newRight)
}

object ZValueFn {
  def apply(a: Column, b: Column): Column =
    exprToColumn(InterleaveBits(
      columnToExpr(a.cast("int")), columnToExpr(b.cast("int"))))
}
