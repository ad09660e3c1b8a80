package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Gauss error function as a whole-stage-codegen-capable Catalyst
  * expression.
  *
  * Uses the Abramowitz & Stegun 7.1.26 rational approximation
  * (max abs error 1.5e-7) rather than a library erf so that the exact
  * same arithmetic is expressible in ANSI SQL for the DuckDB oracle:
  * identical operation order on IEEE doubles gives identical bits on
  * both engines.
  *
  * The reference engine computes a normal CDF for Spearman p-values
  * (reference: src/etl_for_all_studies/correlation.py:50-61, using
  * statistics.NormalDist().cdf); we standardize on
  * Phi(z) = 0.5 * (1 + erf(z / sqrt(2))) with this erf as the single
  * p-value definition (SURVEY.md §7.4 decision 2).
  */
object ErfMath {
  // A&S 7.1.26 coefficients.
  final val P = 0.3275911
  final val A1 = 0.254829592
  final val A2 = -0.284496736
  final val A3 = 1.421413741
  final val A4 = -1.453152027
  final val A5 = 1.061405429

  def erf(x: Double): Double = {
    val sign = if (x < 0.0) -1.0 else 1.0
    val ax = math.abs(x)
    val t = 1.0 / (1.0 + P * ax)
    val poly = ((((A5 * t + A4) * t + A3) * t + A2) * t + A1) * t
    sign * (1.0 - poly * math.exp(-ax * ax))
  }

  /** Standard normal CDF via this erf. */
  def normCdf(z: Double): Double = 0.5 * (1.0 + erf(z / math.sqrt(2.0)))
}

case class Erf(child: Expression) extends UnaryExpression {

  // Input typing is enforced by the ErfFn wrapper (casts to double);
  // ExpectsInputTypes is private[sql] in Spark 4 so we don't mix it in.
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_erf"

  override def nullSafeEval(input: Any): Any =
    ErfMath.erf(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ErfMath.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, c => s"$m.erf($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Erf =
    copy(child = newChild)
}

object ErfFn {
  /** erf as a Column function, e.g. `ErfFn(col("z"))`. */
  def apply(c: Column): Column = exprToColumn(Erf(columnToExpr(c.cast("double"))))

  /** Standard normal CDF Phi(z) built from [[Erf]]; stays inside
    * whole-stage codegen (pure column math + codegen'd erf).
    */
  def normCdf(z: Column): Column = {
    import org.apache.spark.sql.functions._
    lit(0.5) * (lit(1.0) + apply(z / math.sqrt(2.0)))
  }
}
