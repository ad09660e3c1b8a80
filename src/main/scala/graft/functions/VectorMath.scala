package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Primitive-loop dot product over two array<double> columns.
  *
  * The builtin higher-order-function route
  * (`aggregate(zip_with(a, b, _*_), 0d, _+_)`) allocates an
  * intermediate array and evaluates a lambda per element in
  * interpreted mode — measured ~17x slower on the brute-force ANN
  * pair loop. This expression evaluates a tight primitive loop and
  * participates in whole-stage codegen, which is what a 100 TB
  * all-pairs/ANN scan needs. Summation order (left-to-right) matches
  * the SQL oracle's list_sum(list_transform(...)) fold.
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    // fail fast on ragged vectors: a silently-truncated dot product
    // yields wrong cosines (norms still use the full arrays) and
    // corrupts every downstream ranking
    if (n != y.numElements())
      throw new IllegalArgumentException(
        s"graft_dot: mismatched vector lengths $n vs ${y.numElements()}")
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "graft_dot: mismatched vector lengths " + $n + " vs " + $b.numElements());
         |}
         |double ${ev.value}Acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value}Acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = ${ev.value}Acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

/** Primitive-loop squared L2 distance over two array<double> columns —
  * the product-quantization distance kernel ([[graft.ops.Pq]]). Same
  * tight-loop/codegen rationale as [[DotProduct]]; the summation is the
  * DIRECT (x-y)^2 fold left-to-right (never the expanded
  * |x|^2 - 2xy + |y|^2 form, which sums in a different order and
  * breaks the bit-exact oracle twin
  * `list_sum(list_transform(e, (x,i) -> (x - c[i]) * (x - c[i])))`).
  */
case class L2SqDistance(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_l2sq"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements())
      throw new IllegalArgumentException(
        s"graft_l2sq: mismatched vector lengths $n vs ${y.numElements()}")
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = x.getDouble(i) - y.getDouble(i)
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "graft_l2sq: mismatched vector lengths " + $n + " vs " + $b.numElements());
         |}
         |double ${ev.value}Acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = $a.getDouble($i) - $b.getDouble($i);
         |  ${ev.value}Acc += $d * $d;
         |}
         |${ev.value} = ${ev.value}Acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): L2SqDistance =
    copy(left = l, right = r)
}

object VectorMath {
  import graft.functions.{columnToExpr, exprToColumn}
  import org.apache.spark.sql.functions._

  /** dot(a, b) — tight-loop codegen over array<double>. */
  def dot(a: Column, b: Column): Column =
    exprToColumn(DotProduct(columnToExpr(a), columnToExpr(b)))

  /** L2 norm via the same codegen dot. */
  def norm(v: Column): Column = sqrt(dot(v, v))

  /** Squared L2 distance — tight-loop codegen, direct (x-y)^2 fold. */
  def l2sq(a: Column, b: Column): Column =
    exprToColumn(L2SqDistance(columnToExpr(a), columnToExpr(b)))

  /** v / ||v|| as array<double> (HOF; computed once per row, not per pair). */
  def l2normalize(v: Column): Column = {
    val n = norm(v)
    transform(v, x => x / n)
  }
}
