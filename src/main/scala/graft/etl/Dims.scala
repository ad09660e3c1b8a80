package graft.etl

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dimension maintenance — get-or-create as set algebra (reference:
  * src/etl_for_all_studies/repositories.py:67-251; SURVEY.md §2.5
  * D1-D3).
  *
  * The reference's per-row cache-probe + insert-if-absent becomes:
  * distinct incoming naturals → anti-join against the existing dim →
  * deterministic surrogate keys (max existing key + row_number over the
  * natural key, SURVEY.md §7.4 decision 1 — stable across re-runs,
  * unlike monotonically_increasing_id) → append.
  *
  * Scale note: the global row_number window only ever runs over NEW dim
  * rows (small by construction — dims are bounded vocabularies). Facts
  * never pass through it.
  */
object Dims {
  import Schema.UnknownValue

  /** D1/D2 generic unique dimension upsert. `incoming` has one column
    * = naturalCol. Returns the updated dim (existing ∪ keyed-new).
    * `dropUnknown`: platform/illness never create an UNKNOWN dim row
    * (F8 maps those to null FKs); genes keep UNKNOWN-valued ids (no
    * UNKNOWN guard in the reference's get_or_create_gene).
    */
  def upsertDim(existing: DataFrame, incoming: DataFrame,
      keyCol: String, naturalCol: String, dropUnknown: Boolean = true): DataFrame = {
    val guard =
      if (dropUnknown) col(naturalCol).isNotNull && col(naturalCol) =!= "" &&
        col(naturalCol) =!= UnknownValue
      else col(naturalCol).isNotNull && col(naturalCol) =!= ""
    val fresh = incoming
      .select(trim(col(naturalCol)).as(naturalCol))
      .where(guard)
      .distinct()
      .join(existing, Seq(naturalCol), "left_anti")
    val maxKey = existing.agg(coalesce(max(col(keyCol)), lit(0L))).head.getLong(0)
    // zipKeys, not a partition-less row_number window: the vocabulary
    // dims are usually small, but "usually" is not a bound — a first
    // load or a vocabulary blow-up would serialize the whole batch
    // into ONE window task, while zipKeys assigns the identical dense
    // numbering through a parallel range-partitioned sort.
    val keyed = zipKeys(fresh, Seq(naturalCol), keyCol, maxKey)
      .select(col(keyCol), col(naturalCol))
    existing.select(col(keyCol), col(naturalCol)).unionByName(keyed)
  }

  def upsertGeneDim(existing: DataFrame, incoming: DataFrame): DataFrame =
    upsertDim(existing, incoming, "gene_key", "ensembl_id", dropUnknown = false)

  /** D3: sample-dimension merge-upsert on (gsm_accession, study_key).
    *
    * `incoming` columns: gsm_accession, study_key, platform_key,
    * illness_key (already-resolved nullable FKs — UNKNOWN ⇒ null, F8),
    * age, sex, __ord (intra-batch order for duplicate-GSM resolution).
    *
    * Matched rows: platform/illness overwritten by the LAST non-null
    * incoming value (each differing value updates in the reference's
    * row loop); age/sex filled by the FIRST non-UNKNOWN incoming value
    * and only if the current value is UNKNOWN (repositories.py:188-251).
    * New rows: inserted with UNKNOWN defaults and fresh keys.
    */
  def upsertSampleDim(existing: DataFrame, incoming: DataFrame): DataFrame = {
    val collapsed = incoming
      .groupBy("gsm_accession", "study_key")
      .agg(
        max_by(struct(col("platform_key")), when(col("platform_key").isNotNull, col("__ord")))
          .getField("platform_key").as("platform_key"),
        max_by(struct(col("illness_key")), when(col("illness_key").isNotNull, col("__ord")))
          .getField("illness_key").as("illness_key"),
        min_by(struct(col("age")), when(col("age") =!= UnknownValue, col("__ord")))
          .getField("age").as("age"),
        min_by(struct(col("sex")), when(col("sex") =!= UnknownValue, col("__ord")))
          .getField("sex").as("sex"))

    val inc = collapsed.select(
      col("gsm_accession").as("i_gsm"), col("study_key").as("i_study"),
      col("platform_key").as("i_platform"), col("illness_key").as("i_illness"),
      col("age").as("i_age"), col("sex").as("i_sex"))

    val joined = existing.join(inc,
      col("gsm_accession") === col("i_gsm") && col("study_key") === col("i_study"),
      "full_outer")

    val matchedOrExisting = joined.where(col("sample_key").isNotNull).select(
      col("sample_key"), col("gsm_accession"), col("study_key"),
      coalesce(col("i_platform"), col("platform_key")).as("platform_key"),
      coalesce(col("i_illness"), col("illness_key")).as("illness_key"),
      when((col("age").isNull || col("age") === UnknownValue) &&
        col("i_age").isNotNull && col("i_age") =!= UnknownValue, col("i_age"))
        .otherwise(coalesce(col("age"), lit(UnknownValue))).as("age"),
      when((col("sex").isNull || col("sex") === UnknownValue) &&
        col("i_sex").isNotNull && col("i_sex") =!= UnknownValue, col("i_sex"))
        .otherwise(coalesce(col("sex"), lit(UnknownValue))).as("sex"))

    val maxKey = existing.agg(coalesce(max(col("sample_key")), lit(0L))).head.getLong(0)
    // Unlike the bounded-vocabulary dims, new SAMPLES can be millions of
    // rows per batch (envelope: 50k samples/study x hundreds of studies)
    // — a row_number window with no partition would sort them all in ONE
    // task. zipKeys assigns the identical dense numbering through a
    // parallel range-partitioned sort instead.
    val fresh = zipKeys(
      joined.where(col("sample_key").isNull).select(
        col("i_gsm").as("gsm_accession"), col("i_study").as("study_key"),
        col("i_platform").as("platform_key"), col("i_illness").as("illness_key"),
        coalesce(col("i_age"), lit(UnknownValue)).as("age"),
        coalesce(col("i_sex"), lit(UnknownValue)).as("sex")),
      Seq("gsm_accession", "study_key"), "sample_key", maxKey)

    matchedOrExisting.unionByName(fresh.select(
      "sample_key", "gsm_accession", "study_key", "platform_key", "illness_key", "age", "sex"))
  }

  /** Deterministic dense keys offset+1..offset+N in `orderCols` order,
    * assigned WITHOUT a single-partition window: orderBy is a parallel
    * range-partitioned sort, and zipWithIndex numbers rows by
    * (partition, position) — identical values to
    * `row_number().over(Window.orderBy(...))`, minus the one-task sort.
    * The RDD round-trip breaks codegen only for this keyed subset.
    */
  private def zipKeys(df: DataFrame, orderCols: Seq[String], keyCol: String,
      offset: Long): DataFrame = {
    val sorted = df.orderBy(orderCols.map(col(_).asc): _*)
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+ org.apache.spark.sql.types.StructField(
        keyCol, org.apache.spark.sql.types.LongType, nullable = false))
    val rdd = sorted.rdd.zipWithIndex().map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (offset + i + 1L))
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** Resolve a dim's natural value to its nullable FK with the UNKNOWN
    * guard (F8): blank/UNKNOWN ⇒ null key, never a dim row.
    */
  def resolveFk(df: DataFrame, dim: DataFrame, naturalCol: String,
      dimNatural: String, keyCol: String): DataFrame = {
    val d = dim.select(col(keyCol), col(dimNatural).as(naturalCol))
    df.withColumn(naturalCol,
        when(col(naturalCol) === UnknownValue || col(naturalCol) === "", lit(null))
          .otherwise(col(naturalCol)))
      .join(broadcast(d), Seq(naturalCol), "left")
  }
}
