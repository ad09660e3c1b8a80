package graft.functions

import org.apache.commons.math3.special.Beta
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Two-sided Student-t survival probability P(|T_df| >= |t|) as a
  * whole-stage-codegen-capable Catalyst expression.
  *
  * This is the EXACT Spearman p-value the reference's primary path
  * computes (scipy.stats.spearmanr, reference correlation.py:11-12,128)
  * — the engine's default stays the reference's own normal-approx
  * fallback (correlation.py:50-61, [[graft.stats.PValues.spearmanP]])
  * because that is what the cross-engine oracle can express; this
  * expression is the opt-in exact path for users comparing against
  * scipy output at small n.
  *
  * Math: 2·P(T_df > |t|) = I_x(df/2, 1/2) with x = df/(df + t²), the
  * standard incomplete-beta identity — one regularized-beta call per
  * row (commons-math3, bundled with Spark), no distribution object
  * allocation, fully inside codegen via a static helper call.
  */
object StudentTMath {
  /** Two-sided p for t with df degrees of freedom; NaN for df <= 0. */
  def twoSidedP(t: Double, df: Double): Double =
    if (df <= 0.0 || df.isNaN || t.isNaN) Double.NaN
    else if (t.isInfinite) 0.0
    else Beta.regularizedBeta(df / (df + t * t), df / 2.0, 0.5)
}

case class StudentTTwoSidedP(left: Expression, right: Expression)
    extends BinaryExpression {

  // Input typing enforced by the Column/SQL wrappers (cast to double);
  // ExpectsInputTypes is private[sql] in Spark 4.
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_tdist_p2"

  override def nullSafeEval(t: Any, df: Any): Any =
    StudentTMath.twoSidedP(t.asInstanceOf[Double], df.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = StudentTMath.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, (t, df) => s"$m.twoSidedP($t, $df)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): StudentTTwoSidedP =
    copy(left = newLeft, right = newRight)
}

object StudentTFn {
  /** Two-sided Student-t p-value P(|T_df| >= |t|) as a Column. */
  def apply(t: Column, df: Column): Column =
    exprToColumn(StudentTTwoSidedP(
      columnToExpr(t.cast("double")), columnToExpr(df.cast("double"))))
}
