package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations (the dbt-test /
  * Great-Expectations shape): a rule set evaluated against a table in
  * ONE aggregation pass, reported as one row per rule —
  * (rule, n_rows, n_violations, pass).
  *
  * Two rule kinds, because they aggregate differently:
  *  - row rules: a per-row predicate that must hold (not-null, range,
  *    domain membership, cross-column consistency). Each costs one
  *    conditional sum inside the shared aggregate — free on the scan.
  *  - uniqueness rules: a column set that must be duplicate-free
  *    among rows where EVERY key column is non-null (dbt `unique`
  *    semantics — null keys are `not_null`'s business). Each costs a
  *    conditional count minus a conditional distinct count; the
  *    distinct rewrite expands the input once per distinct aggregate,
  *    so keep the uniqueness rule count small (the row-rule count is
  *    unconstrained).
  *
  * A NULL predicate result (SQL unknown — e.g. `n_chars = length(text)`
  * when either side is null) counts as a VIOLATION: an expectation
  * that cannot be shown true is not satisfied. That is the
  * fail-closed reading an expectations gate needs, and it is pinned
  * in the oracle replay (`CASE WHEN pred THEN 0 ELSE 1`).
  *
  * 100 TB: one scan, map-side partial aggregation, a one-row result
  * per rule — the report is a driver-sized artifact regardless of
  * table size, and the scan cost is shared across ALL rules instead
  * of one pass per check (the naive dbt pattern).
  */
object Expectations {

  /** @param rowRules    (name, predicate) — predicate must hold per row
    * @param uniqueRules (name, columns) — column combo must be unique
    */
  def check(df: DataFrame, rowRules: Seq[(String, Column)],
      uniqueRules: Seq[(String, Seq[String])] = Nil): DataFrame =
    reshape(aggRow(df, rowRules, uniqueRules),
      rowRules.map(_._1) ++ uniqueRules.map(_._1))

  /** The one-row violation aggregate — split from [[reshape]] so the
    * STREAMING monitor form can run it as unbounded aggregation state
    * (complete mode) and reshape the drained row in a post-pass (the
    * x22 monitor pattern; a stack() generator directly on a streaming
    * aggregate is not a supported streaming plan). Batch [[check]] is
    * aggRow ∘ reshape — one rule definition, both execution modes.
    */
  def aggRow(df: DataFrame, rowRules: Seq[(String, Column)],
      uniqueRules: Seq[(String, Seq[String])] = Nil): DataFrame = {
    require(rowRules.nonEmpty || uniqueRules.nonEmpty, "no rules given")
    // rule names ride inside a generated stack() expression as both
    // identifiers and string literals — restrict them to identifiers
    // (and uniqueness) rather than attempting to escape arbitrary text
    val names0 = rowRules.map(_._1) ++ uniqueRules.map(_._1)
    require(names0.forall(_.matches("[A-Za-z_][A-Za-z0-9_]*")),
      s"rule names must be identifiers: ${names0.mkString(", ")}")
    require(names0.distinct.length == names0.length,
      s"duplicate rule names: ${names0.diff(names0.distinct).mkString(", ")}")
    val rowAggs = rowRules.map { case (name, pred) =>
      sum(when(pred, 0L).otherwise(1L)).as(s"__v_$name")
    }
    val uniqAggs = uniqueRules.map { case (name, cols) =>
      // dbt `unique` semantics: rows with a null in the key are
      // excluded from the check entirely (they are `not_null`'s
      // business) — mirrored in SQL as count(DISTINCT col) ignoring
      // nulls. A raw countDistinct(struct(...)) would instead count
      // the null key as one distinct value and silently diverge.
      val allSet = cols.map(col(_).isNotNull).reduce(_ && _)
      (sum(when(allSet, 1L).otherwise(0L)) -
        countDistinct(when(allSet, struct(cols.map(col): _*))))
        .as(s"__v_$name")
    }
    df.agg(count(lit(1)).as("__n"), (rowAggs ++ uniqAggs): _*)
  }

  /** Unpivot the one-row aggregate into (rule, n_rows, n_violations,
    * pass) — stack over a single row, no second scan.
    */
  def reshape(base: DataFrame, names: Seq[String]): DataFrame = {
    // reshape is public (the streaming monitor calls it directly on a
    // drained aggRow), so it must enforce the same identifier-and-
    // uniqueness invariant aggRow does — the names are interpolated
    // into a generated stack() string, and a quoted/spaced name would
    // otherwise become expression injection or an opaque parse error
    require(names.forall(_.matches("[A-Za-z_][A-Za-z0-9_]*")),
      s"rule names must be identifiers: ${names.mkString(", ")}")
    require(names.distinct.length == names.length,
      s"duplicate rule names: ${names.diff(names.distinct).mkString(", ")}")
    base.select(
      expr(s"stack(${names.length}, " +
        names.map(n => s"'$n', coalesce(__v_$n, 0L)").mkString(", ") +
        ") AS (rule, n_violations)"),
      col("__n").as("n_rows"))
      .select(col("rule"), col("n_rows"), col("n_violations"),
        (col("n_violations") === 0L).as("pass"))
  }

  /** The STREAMING form of a uniqueness rule: the survivor stream of
    * `dropDuplicatesWithinWatermark` over the rule's key columns. The
    * monitor composes it with an arrival count — violations = arrived
    * non-null-key rows − survivors — which is exactly the batch
    * rule's `count(allSet) − countDistinct(key)` when every duplicate
    * lands inside the watermark horizon (the horizon IS the
    * uniqueness window a stream can promise; an unbounded-horizon
    * guarantee needs unbounded state by definition, the p16 dedup
    * trade).
    *
    * Rows with a null key column are excluded, the batch rule's dbt
    * semantics (null keys are `not_null`'s business). State is
    * bounded by the watermark horizon: expired keys are dropped by
    * the dedup operator itself, never accumulated.
    */
  def uniqueSurvivors(stream: DataFrame, keys: Seq[String],
      eventTimeCol: String, delay: String): DataFrame = {
    require(keys.nonEmpty, "keys must be non-empty")
    val allSet = keys.map(col(_).isNotNull).reduce(_ && _)
    stream.where(allSet)
      .withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark(keys)
  }

  /** Assemble one uniqueness-rule report row in [[check]]'s exact
    * schema from the two drained monitor counts ([[uniqueSurvivors]]'
    * count and the arrival aggregate). Validates the rule name like
    * every other report path.
    */
  def uniqueReportRow(spark: org.apache.spark.sql.SparkSession, name: String,
      nRows: Long, nonNullRows: Long, survivors: Long): DataFrame = {
    require(name.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"rule name must be an identifier: $name")
    require(nonNullRows >= survivors,
      s"survivors $survivors exceed arrivals $nonNullRows — drain order bug")
    import spark.implicits._
    Seq((name, nRows, nonNullRows - survivors, nonNullRows - survivors == 0L))
      .toDF("rule", "n_rows", "n_violations", "pass")
  }

  /** Referential-integrity rule — the expectation [[check]] can't
    * express in one scan: every child row's foreign key must exist in
    * the parent. Reports in [[check]]'s exact schema so FK rules
    * stack with row/uniqueness rules into one gate artifact.
    *
    * Null foreign keys are excluded from the check (they are
    * `not_null`'s business — the same division of labor as the
    * uniqueness rules). One distinct-project of the parent keys + one
    * left join + one aggregate; dim-sized parents broadcast, so the
    * fact side never shuffles for the audit.
    */
  def fkCheck(child: DataFrame, parent: DataFrame, name: String,
      keys: Seq[(String, String)]): DataFrame = {
    require(keys.nonEmpty, "keys must be non-empty")
    require(name.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"rule name must be an identifier: $name")
    val allSet = keys.map { case (ck, _) => col(ck).isNotNull }.reduce(_ && _)
    val c = child.where(allSet)
      .select(keys.map { case (ck, _) => col(ck) }: _*)
    val p = parent
      .select(keys.map { case (_, pk) => col(pk).as(s"__p_$pk") }: _*)
      .distinct()
      .withColumn("__pm", lit(1))
    val cond = keys.map { case (ck, pk) => col(ck) === col(s"__p_$pk") }
      .reduce(_ && _)
    c.join(p, cond, "left")
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("__pm").isNull, 1L).otherwise(0L)).as("n_violations"))
      .select(lit(name).as("rule"), col("n_rows"),
        coalesce(col("n_violations"), lit(0L)).as("n_violations"))
      .withColumn("pass", col("n_violations") === 0L)
  }
}
