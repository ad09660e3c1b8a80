package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Privacy-aware release gates for corpus reporting.
  *
  * A training-data pipeline publishes aggregate dashboards (events per
  * source per day, users per cohort). Releasing a group that describes
  * fewer than k individuals re-identifies them — the classic
  * k-anonymity failure (Sweeney 2002). The release gate here is the
  * standard suppression form: groups whose DISTINCT-individual count
  * clears k publish as-is; all sub-k groups collapse into a single
  * `__suppressed__` bucket whose counts are re-derived from the
  * underlying rows, so the published table never contains a row
  * describing fewer than k people (the bucket itself aggregates the
  * union of all suppressed groups — by construction at least as many
  * individuals as any one of them).
  *
  * Reference scope note: the reference engine publishes per-study
  * quality aggregates (`metadata.py` A1) with no release gate; this is
  * the extension-surface gate a public release of those aggregates
  * would need.
  *
  * Scale: one shuffle for the per-group distinct count, one semi-join
  * of the input against the suppressed-group list for the bucket's
  * re-aggregation, one scalar union. The suppressed-group list is
  * bounded by the group space, not the data — usually broadcastable,
  * but the join strategy is left to AQE because a worst-case group
  * space (every group sub-k) is data-sized.
  */
object Privacy {

  /** Suppressing k-anonymizer over `quasi` (quasi-identifier columns,
    * pre-cast to string by the caller), counting distinct `idCol`
    * individuals per group.
    *
    * Output: quasi columns (suppressed rows carry
    * `__suppressed__` in every quasi column) + `n_ids` (distinct
    * individuals) + `n_rows`. The suppressed bucket's `n_ids` is a
    * distinct count over the UNION of suppressed groups' rows — never
    * the sum of per-group distincts, which double-counts individuals
    * spanning groups. No bucket row is emitted when nothing is
    * suppressed.
    */
  def kAnonymize(df: DataFrame, quasi: Seq[String], k: Long,
      idCol: String): DataFrame = {
    require(quasi.nonEmpty, "quasi must be non-empty")
    require(k >= 1, s"k must be >= 1, got $k")
    val g = df.groupBy(quasi.map(col): _*)
      .agg(countDistinct(col(idCol)).as("n_ids"), count(lit(1)).as("n_rows"))
    val kept = g.where(col("n_ids") >= k)
    val suppGroups = g.where(col("n_ids") < k)
      .select(quasi.map(q => col(q).as(s"__sg_$q")): _*)
    // NULL-SAFE membership: groupBy treats NULL as a group, so a
    // null-keyed sub-k group must still reach the bucket — a plain
    // equi-semi-join would never match it and its individuals would
    // vanish from BOTH output branches, silently breaking count
    // conservation exactly for the least-identified rows.
    // No forced broadcast: the suppressed-group list is the number of
    // sub-k groups, which in the regime where k-anonymity matters most
    // (high-cardinality quasi-identifiers, many tiny groups) approaches
    // the full group space — a broadcast() hint would blow the driver
    // limit exactly when suppression is heaviest. AQE picks broadcast
    // when the list is actually small.
    val suppCond = quasi.map(q => col(q) <=> col(s"__sg_$q")).reduce(_ && _)
    val suppRows = df.join(suppGroups, suppCond, "left_semi")
    val bucket = suppRows
      .agg(countDistinct(col(idCol)).as("n_ids"), count(lit(1)).as("n_rows"))
      .where(col("n_rows") > 0)
      .select(quasi.map(q => lit("__suppressed__").as(q))
        :+ col("n_ids") :+ col("n_rows"): _*)
    kept.unionByName(bucket)
  }
}
