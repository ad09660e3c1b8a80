package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Percentile}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule: fuse N separate `percentile(c, p_i)` aggregates over
  * the SAME column into ONE `percentile(c, array(p_1..p_N))` buffer,
  * rewriting each original output to an array index of the fused
  * result.
  *
  * Why: every separate Percentile aggregate maintains its own
  * OpenHashMap value buffer over the same column — N aggregates means
  * N copies of the aggregation state, N map-side merge streams, and N
  * sorts of identical data at evaluation. One array-percentile keeps
  * ONE buffer and sorts once (round-2 measurement on the a3 query
  * shape: 3.4 s → 1.2 s at sf0.1 for 4 percentiles, BASELINE.md). The
  * a3 query hand-applies this; the rule gives the same plan to ANY
  * query — including raw `spark.sql` — so users don't need to know
  * the idiom.
  *
  * Fusion conditions (everything else is left untouched): same
  * canonicalized child and frequency, literal double percentage,
  * non-distinct, unfiltered, forward (reverse = false), and at least
  * two such aggregates in one Aggregate node. The rewrite shares one
  * AggregateExpression instance across the rewritten columns, so
  * physical planning computes exactly one buffer.
  *
  * Registered through [[graft.functions.GraftExtensions]]
  * (`injectOptimizerRule` — runs after the main optimizer batches,
  * when literal percentages have been constant-folded).
  */
object FusePercentiles extends Rule[LogicalPlan] {

  private case class Key(child: Expression, frequency: Expression)

  private def fusable(ae: AggregateExpression): Option[(Key, Double)] =
    ae match {
      case AggregateExpression(
          Percentile(c, Literal(p: Double, DoubleType), freq, _, _, false),
          _, false, None, _) =>
        Some((Key(c.canonicalized, freq.canonicalized), p))
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case agg: Aggregate =>
      // distinct percentages per (column, frequency), in first-seen order
      val groups: Map[Key, Seq[Double]] = {
        val seen = scala.collection.mutable.LinkedHashMap.empty[Key, Vector[Double]]
        agg.aggregateExpressions.foreach(_.foreach {
          case ae: AggregateExpression => fusable(ae).foreach { case (k, p) =>
            val ps = seen.getOrElse(k, Vector.empty)
            if (!ps.contains(p)) seen(k) = ps :+ p
          }
          case _ => ()
        })
        seen.filter(_._2.length >= 2).toMap
      }
      if (groups.isEmpty) agg
      else {
        // one fused AggregateExpression per group, built lazily from the
        // first matching template and SHARED across rewritten columns
        val fused = scala.collection.mutable.Map.empty[Key, AggregateExpression]
        def fusedFor(k: Key, template: AggregateExpression,
            tchild: Expression, tfreq: Expression): AggregateExpression =
          fused.getOrElseUpdate(k, {
            val arr = CreateArray(groups(k).map(Literal(_, DoubleType)))
            template.copy(aggregateFunction = Percentile(tchild, arr, tfreq),
              resultId = NamedExpression.newExprId)
          })
        val newExprs = agg.aggregateExpressions.map { ne =>
          ne.transform {
            case ae: AggregateExpression if fusable(ae).isDefined =>
              val (k, p) = fusable(ae).get
              val Percentile(c, _, freq, _, _, _) = ae.aggregateFunction
              GetArrayItem(fusedFor(k, ae, c, freq),
                Literal(groups(k).indexOf(p)), failOnError = false)
          }.asInstanceOf[NamedExpression]
        }
        agg.copy(aggregateExpressions = newExprs)
      }
  }
}
