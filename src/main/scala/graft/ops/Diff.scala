package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot differencing — the audit step between two materialized
  * generations of a table (yesterday's warehouse load vs today's, a
  * pre-migration copy vs post). Emits one row per changed key with a
  * change class, so a load that silently dropped or mutated rows is
  * visible as data, not as a diff of file listings.
  *
  * Relation to the lake family: [[graft.etl.Warehouse]]'s S7 replace
  * and d6's SCD-2 history answer "what is current" and "what was true
  * when"; snapshot diff answers "what did this load DO" — the
  * reconciliation report a production ETL reviews before promoting.
  *
  * Scale: ONE full-outer shuffle join co-partitioned on the key —
  * both sides hash-exchange once, comparison is per-row column math
  * inside codegen. Snapshots bucketed by key ([[graft.etl.Warehouse
  * .writeBucketed]]) diff with no exchange at all. Never a
  * collect-and-compare.
  */
object Diff {

  /** CDC apply — MERGE a change feed into a snapshot: the complement
    * of [[snapshotDiff]] (which derives the feed) and the batch form
    * of what `x20_stream_latest` maintains as streaming state. Each
    * key's LATEST change (max `seqCol`) wins: `D` deletes, `I`/`U`
    * upsert the payload (an upsert for an absent key inserts — the
    * standard MERGE leniency); untouched keys pass through.
    *
    * Latest-change selection is ONE max-of-struct aggregation on the
    * key (the d5 compaction shape — no per-key window sort); applying
    * is one co-partitioned full-outer join against the base. Ties on
    * `seqCol` resolve lexicographically over (op, payload) —
    * deterministic, but feeds should carry unique per-key sequence
    * numbers; feed rows must carry non-null payloads (D rows use
    * placeholders) so the struct ordering never consults
    * engine-specific null ranking.
    *
    * An op outside {I,U,D} fails the job loudly per row rather than
    * silently passing the base row through.
    */
  def applyChanges(base: DataFrame, changes: DataFrame, key: Seq[String],
      seqCol: String, opCol: String): DataFrame = {
    require(key.nonEmpty, "key must be non-empty")
    val payload = base.columns.filterNot(key.contains).toSeq
    val checkedOp = when(col(opCol).isin("I", "U", "D"), col(opCol))
      .otherwise(raise_error(concat(
        lit(s"applyChanges: op must be I|U|D, got "), col(opCol))).cast("string"))
    val latest = changes
      .withColumn(opCol, checkedOp)
      .groupBy(key.map(col): _*)
      .agg(max(struct(col(seqCol).as("__seq") +: col(opCol).as("__op")
        +: payload.map(c => col(c).as(s"__p_$c")): _*)).as("__c"))
      .select((key.map(col) :+ col("__c.__op").as("__op"))
        ++ payload.map(c => col(s"__c.__p_$c").as(s"__c_$c")): _*)
    val b = base.select(key.map(col) ++ payload.map(c => col(c).as(s"__b_$c")): _*)
    b.join(latest, key, "full_outer")
      .where(col("__op").isNull || col("__op") =!= "D")
      .select(key.map(col) ++ payload.map(c =>
        when(col("__op").isNull, col(s"__b_$c"))
          .otherwise(col(s"__c_$c")).as(c)): _*)
  }

  /** Full-outer diff of `oldDf` vs `newDf` on `key` columns.
    *
    * Non-key columns are compared null-safely (`<=>`); output is one
    * row per key whose presence or payload changed: `change_type` in
    * {`added`, `removed`, `changed`} plus `old_<c>` / `new_<c>` for
    * every compared column. Unchanged keys are dropped — at 100 TB the
    * interesting output is the delta, which is small; emitting
    * unchanged rows would make the report the size of the table.
    *
    * Both inputs must share the schema on `key` and `compare`
    * columns; `compare` defaults to all non-key columns of `oldDf`.
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, key: Seq[String],
      compare: Seq[String] = Nil): DataFrame = {
    require(key.nonEmpty, "key must be non-empty")
    val cmp = if (compare.nonEmpty) compare
      else oldDf.columns.filterNot(key.contains).toSeq
    require(cmp.nonEmpty, "nothing to compare: every column is a key column")
    // presence flags ride INSIDE each side so a full-outer miss reads
    // as null flag, never a null-valued payload masquerading as absent
    val o = oldDf.select(key.map(col) ++ cmp.map(c => col(c).as(s"old_$c"))
      :+ lit(1).as("__in_old"): _*)
    val n = newDf.select(key.map(col) ++ cmp.map(c => col(c).as(s"new_$c"))
      :+ lit(1).as("__in_new"): _*)
    val joined = o.join(n, key, "full_outer")
    val payloadDiffers = cmp.map(c => !(col(s"old_$c") <=> col(s"new_$c")))
      .reduce(_ || _)
    joined
      .withColumn("change_type",
        when(col("__in_old").isNull, lit("added"))
          .when(col("__in_new").isNull, lit("removed"))
          .when(payloadDiffers, lit("changed")))
      .where(col("change_type").isNotNull)
      .drop("__in_old", "__in_new")
  }
}
