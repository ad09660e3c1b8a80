package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions registering this engine's custom Catalyst
  * expressions in the SQL function registry, so `spark.sql` users get
  * the same surface as the Column API:
  *
  *   spark.sql("SELECT graft_erf(z), graft_md5_hex64(s), graft_dot(a, b)")
  *
  * Install via `.withExtensions(new GraftExtensions)` (GraftSession
  * does) or `spark.sql.extensions=graft.functions.GraftExtensions`
  * on any cluster — no code changes, standard plugin mechanism.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    // optimizer rule: fuse N percentile(c, p_i) buffers into one
    // percentile(c, array(...)) — measured ~3x on 4-percentile aggs
    // (BASELINE.md round-2 a3); runs after the main batches so literal
    // percentages are already constant-folded
    ext.injectOptimizerRule(_ => graft.plans.FusePercentiles)
    // planner strategy for the custom as-of join node (logical plan +
    // physical sort-merge exec, graft.plans.AsOfJoinPlan) — the
    // whole-operator escalation tier, same plugin seam
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectFunction((
      FunctionIdentifier("graft_erf"),
      info("graft_erf", "graft_erf(x) - Gauss error function (A&S 7.1.26)."),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_erf takes exactly 1 argument")
        Erf(org.apache.spark.sql.catalyst.expressions.Cast(
          args.head, org.apache.spark.sql.types.DoubleType))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_md5_hex64"),
      info("graft_md5_hex64",
        "graft_md5_hex64(s) - 60-bit integer hash from the md5 digest " +
          "(equals ('0x' || substr(md5(s),1,15))::BIGINT)."),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_md5_hex64 takes exactly 1 argument")
        Md5Hex64(org.apache.spark.sql.catalyst.expressions.Cast(
          args.head, org.apache.spark.sql.types.StringType))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_zvalue"),
      info("graft_zvalue",
        "graft_zvalue(a, b) - Morton/Z-order interleave of two " +
          "non-negative int bucket ordinals (multi-dim layout key)."),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_zvalue takes exactly 2 arguments")
        def i(e: Expression) = org.apache.spark.sql.catalyst.expressions.Cast(
          e, org.apache.spark.sql.types.IntegerType)
        InterleaveBits(i(args.head), i(args(1)))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_nfc_normalize"),
      info("graft_nfc_normalize",
        "graft_nfc_normalize(s) - Unicode NFC canonical composition " +
          "(equals DuckDB nfc_normalize)."),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_nfc_normalize takes exactly 1 argument")
        NfcNormalize(org.apache.spark.sql.catalyst.expressions.Cast(
          args.head, org.apache.spark.sql.types.StringType))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_tdist_p2"),
      info("graft_tdist_p2",
        "graft_tdist_p2(t, df) - two-sided Student-t survival " +
          "probability P(|T_df| >= |t|) via the regularized incomplete beta."),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_tdist_p2 takes exactly 2 arguments")
        def d(e: Expression) = org.apache.spark.sql.catalyst.expressions.Cast(
          e, org.apache.spark.sql.types.DoubleType)
        StudentTTwoSidedP(d(args.head), d(args(1)))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      info("graft_dot",
        "graft_dot(a, b) - primitive-loop dot product of two array<double>."),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_dot takes exactly 2 arguments")
        // cast like the Column wrapper does: DotProduct reads 8-byte
        // doubles positionally, so an int-element array would be
        // misread, not coerced
        val arrD = org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)
        DotProduct(
          org.apache.spark.sql.catalyst.expressions.Cast(args.head, arrD),
          org.apache.spark.sql.catalyst.expressions.Cast(args(1), arrD))
      }))
  }
}
