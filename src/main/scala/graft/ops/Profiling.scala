package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Column-level data profiling — the first query every pipeline runs
  * against a new drop: per column, row count, null count, distinct
  * count, and min/max rendered as strings so heterogeneous columns
  * share one output schema.
  *
  * One aggregation pass over the table computes every metric (count +
  * per-column count/distinct/min/max); the single wide result row is
  * collected (bounded: 4 metrics × |cols| values — driver metadata,
  * same discipline as dim key maps) and reshaped to one row per
  * column.
  *
  * Scale note: countDistinct columns each add an Expand branch; exact
  * distincts keep the DuckDB oracle byte-matching here, and the
  * documented corpus-scale swap is `approx_count_distinct` (the a6
  * sketch discipline — mergeable partial state, no expand).
  */
object Profiling {

  private val outSchema = StructType(Seq(
    StructField("col_name", StringType, nullable = false),
    StructField("n_rows", LongType, nullable = false),
    StructField("n_nulls", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("min_value", StringType, nullable = true),
    StructField("max_value", StringType, nullable = true)))

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns not in frame: ${missing.mkString(", ")}")
    val aggs = count(lit(1)).as("__total") +: cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__cnt_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val r = df.agg(aggs.head, aggs.tail: _*).head
    val total = r.getAs[Long]("__total")
    val rows = cols.map { c =>
      Row(c, total, total - r.getAs[Long](s"__cnt_$c"),
        r.getAs[Long](s"__nd_$c"),
        r.getAs[String](s"__min_$c"), r.getAs[String](s"__max_$c"))
    }
    df.sparkSession.createDataFrame(
      df.sparkSession.sparkContext.parallelize(rows, 1), outSchema)
  }

  /** Group-wise winsorization — outlier clipping to the group's
    * [pLo, pHi] quantile band, the robust-scaling companion to
    * [[standardize]] (a z-score over winsorized values is the
    * standard robust feature pipeline). Same broadcast shape: one
    * percentile aggregation per group, stats broadcast back, the clip
    * is per-row `least`/`greatest` inside codegen.
    *
    * The band edges quantize to 6 dp before the clip, so every output
    * value is one of {v, lo, hi} — each engine-identical (the
    * [[standardize]] argument; Spark's exact interpolated `percentile`
    * is the proven cross-engine twin of `quantile_cont`, a3).
    */
  def winsorize(df: DataFrame, groupCols: Seq[String], valueCol: String,
      pLo: Double = 0.01, pHi: Double = 0.99,
      out: String = "v_clipped"): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    require(pLo >= 0 && pHi <= 1 && pLo < pHi,
      s"need 0 <= pLo < pHi <= 1, got ($pLo, $pHi)")
    val stats = df.groupBy(groupCols.map(col): _*)
      .agg(round(expr(s"percentile($valueCol, $pLo)"), 6).as("__lo"),
        round(expr(s"percentile($valueCol, $pHi)"), 6).as("__hi"))
    // LEFT join: a NULL group key never equi-matches, so an inner join
    // would silently DROP null-keyed rows — breaking row conservation
    // exactly where the data is dirtiest. They stay, and gate to a NULL
    // clipped value (fail-visible), as does a group whose band is NULL
    // (all-null values). Explicit gate, not least/greatest NULL
    // semantics — Spark's least/greatest skip NULL args, which would
    // silently pass the value through UNclipped.
    df.join(broadcast(stats), groupCols, "left")
      .withColumn(out,
        when(col("__lo").isNull || col("__hi").isNull, lit(null))
          .otherwise(least(greatest(col(valueCol), col("__lo")), col("__hi"))))
      .drop("__lo", "__hi")
  }

  /** Group-wise head/middle/tail bucketing by score terciles — the
    * CCNet quality-bucket shape (Wenzek et al. 2020 split their corpus
    * per language into head/middle/tail by LM perplexity terciles;
    * here the score axis is pluggable — p45 feeds the p43 linear
    * logit). Same broadcast discipline as [[standardize]]: one
    * percentile aggregation per group, 6 dp-quantized boundaries
    * broadcast back, the bucket label is per-row CASE inside codegen —
    * no window over the data, no corpus sort (CCNet's actual
    * implementation sorts the whole corpus; the percentile-aggregate
    * form is the shuffle the sort avoids... inverted: one |groups|-row
    * broadcast instead of a corpus-wide range exchange).
    *
    * NULL scores and NULL-keyed groups gate to a NULL bucket
    * (fail-visible, the [[Expectations]] discipline).
    */
  def tercileBuckets(df: DataFrame, groupCols: Seq[String], scoreCol: String,
      out: String = "bucket"): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    val stats = df.groupBy(groupCols.map(col): _*)
      .agg(round(expr(s"percentile($scoreCol, 0.3333333333333333)"), 6).as("__t1"),
        round(expr(s"percentile($scoreCol, 0.6666666666666666)"), 6).as("__t2"))
    df.join(broadcast(stats), groupCols, "left")
      .withColumn(out,
        when(col(scoreCol).isNull, lit(null))
          .when(col("__t1").isNull || col("__t2").isNull, lit(null))
          .when(col(scoreCol) > col("__t2"), "head")
          .when(col(scoreCol) > col("__t1"), "middle")
          .otherwise("tail"))
      .drop("__t1", "__t2")
  }

  /** Exact top-k heavy hitters with a Count-Min-Sketch cross-check —
    * the a6 sketch discipline applied to frequency: the exact
    * aggregation is the oracle-checkable twin, and the CMS (the
    * mergeable fixed-size state a 100 TB streaming counter actually
    * keeps) rides along as a deterministically-TRUE flag, because a
    * count-min estimate NEVER undercounts (every hash row only ever
    * adds colliding keys' counts on top of the true one). A sketch
    * regression — wrong merge, wrong seed plumbing — flips the flag
    * and fails the hash.
    *
    * The sketch is a distributed aggregate (`df.stat.countMinSketch`,
    * fixed seed); the driver holds only the d×w counter grid. The
    * exact side is one shuffle + top-k. At corpus scale the exact twin
    * is the expensive half — the production path keeps ONLY the
    * sketch and this operator is how its quality stays pinned.
    */
  def heavyHitters(df: DataFrame, keyCol: String, k: Int,
      eps: Double = 0.001, confidence: Double = 0.99,
      seed: Int = 42): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // the CMS hashes items BY TYPE (an Int and the equal-valued Long
    // land in different counters), so integral keys canonicalize to
    // bigint on BOTH the build side and the probe side, and the probe
    // UDF's static type must match — a Long-typed probe over a string
    // sketch would silently return 0 and flip the no-undercount flag
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val keyed = df.schema(keyCol).dataType match {
      case LongType | IntegerType | ShortType | ByteType =>
        df.select(col(keyCol).cast("long").as(keyCol))
      case org.apache.spark.sql.types.StringType => df.select(col(keyCol))
      case other => throw new IllegalArgumentException(
        s"heavyHitters key '$keyCol' must be integral or string, got $other")
    }
    val exact = keyed.groupBy(col(keyCol)).agg(count(lit(1)).as("n_events"))
      .orderBy(col("n_events").desc, col(keyCol).asc).limit(k)
    val cms = keyed.stat.countMinSketch(col(keyCol), eps, confidence, seed)
    val cmsB = df.sparkSession.sparkContext.broadcast(cms)
    val est = keyed.schema(keyCol).dataType match {
      case StringType => udf { key: String => cmsB.value.estimateCount(key) }
      case _ => udf { key: Long => cmsB.value.estimateCount(key) }
    }
    exact.withColumn("cms_ok", est(col(keyCol)) >= col("n_events"))
  }

  /** Group-wise z-score standardization — the feature-normalization
    * step of a training pipeline (per-source quality scores, per-type
    * metric scales). Appends `out` = (value − μ_g) / σ_g with the
    * group stats computed in one aggregation and BROADCAST back onto
    * the rows: the stats table is bounded by the group space, so the
    * per-row pass is map-side — no shuffle of the data itself (a
    * window formulation would exchange every row on the group key).
    *
    * Degenerate groups yield NULL, not a poisoned value: σ is NULL for
    * singleton groups (stddev_samp) and 0 for constant groups — both
    * gate to NULL, fail-visible (the [[Expectations]] discipline).
    *
    * Cross-engine determinism: μ and σ are quantized to 6 dp BEFORE
    * the per-row math. An engine-ordered SUM is only reproducible to
    * ~1e-10 relative; per-ROW rounding of a z built on raw aggregates
    * would land within that noise of a 6-dp grid boundary for ~1 row
    * in 10⁴ — at corpus row counts, guaranteed hash flips. Dividing
    * identical quantized doubles instead makes every downstream digit
    * bit-identical in any IEEE engine (the k-means-centroid argument,
    * [[Similarity]], applied per row).
    */
  def standardize(df: DataFrame, groupCols: Seq[String], valueCol: String,
      out: String = "z"): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    val stats = df.groupBy(groupCols.map(col): _*)
      .agg(round(avg(col(valueCol)), 6).as("__mu"),
        round(stddev_samp(col(valueCol)), 6).as("__sigma"))
    // LEFT join (the winsorize argument): null-group rows keep their
    // place in the output with z = NULL instead of silently vanishing
    // through a never-matching equi-join.
    df.join(broadcast(stats), groupCols, "left")
      .withColumn(out,
        when(col("__sigma").isNull || col("__sigma") === 0.0, lit(null))
          .otherwise(round((col(valueCol) - col("__mu")) / col("__sigma"), 6)))
      .drop("__mu", "__sigma")
  }
}
