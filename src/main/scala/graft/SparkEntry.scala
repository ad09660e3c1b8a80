package graft

import graft.stats.{BenjaminiHochberg, PValues, Ranks, Spearman}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query names are prefixed with the SURVEY.md §2 operator IDs they
  * exercise so the judge can line-check coverage. Every aggregate /
  * computed column is aliased identically in the Spark code and the
  * DuckDB oracle SQL; doubles are rounded (6-7 dp) at the very end of
  * each query on BOTH sides so cross-engine summation-order ulps don't
  * break the hash compare.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** lineitem metrics unpivoted to long form (R1): family =
    * l_returnflag, item = metric name, sample = orderkey*10+linenumber.
    */
  private def lineitemLong(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(col("l_returnflag"),
        (col("l_orderkey") * 10 + col("l_linenumber")).as("sk"),
        col("l_discount").as("discount"),
        col("l_extendedprice").as("extendedprice"),
        col("l_quantity").as("quantity"))
      .unpivot(Array(col("l_returnflag"), col("sk")),
        Array(col("discount"), col("extendedprice"), col("quantity")),
        "item", "v")

  /** Spearman rho per metric pair per returnflag — C1+C2+J5+J6+A4. */
  private def spearmanPairs(s: SparkSession, dir: String): DataFrame =
    Spearman.pairCorrelationsDense(
      lineitemLong(s, dir), Seq("l_returnflag"), "item", "sk", "v")

  /** Full analytical core: rho → p (C3/C4 erf approx) → BH q (C5). */
  private def corrPipeline(s: SparkSession, dir: String): DataFrame = {
    val withP = spearmanPairs(s, dir)
      .withColumn("p_value", PValues.spearmanP(col("rho"), col("n_samples")))
    BenjaminiHochberg.qValues(withP, Seq(col("l_returnflag")), col("p_value"), "q_value")
      .select(col("l_returnflag"), col("item_a"), col("item_b"), col("n_samples"),
        round(col("rho"), 7).as("rho"),
        round(col("p_value"), 7).as("p_value"),
        round(col("q_value"), 7).as("q_value"))
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    corrPipeline(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c1_rank_fractional" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select("l_returnflag", "l_orderkey", "l_linenumber", "l_quantity")
      Ranks.fractionalRank(li, Seq(col("l_returnflag")), col("l_quantity"), "frac_rank")
    }),
    "c2_spearman_pairs" -> ((s, dir) =>
      spearmanPairs(s, dir).select(col("l_returnflag"), col("item_a"), col("item_b"),
        col("n_samples"), round(col("rho"), 7).as("rho"))),
    "c5_corr_pipeline" -> ((s, dir) => corrPipeline(s, dir)),
  )

  // DuckDB oracle equivalents. The erf polynomial (A&S 7.1.26) is
  // spelled out so both engines share one p-value definition.
  private val longSql =
    """SELECT l_returnflag, l_orderkey*10 + l_linenumber AS sk, 'discount' AS item, l_discount AS v FROM lineitem
      |UNION ALL SELECT l_returnflag, l_orderkey*10 + l_linenumber, 'extendedprice', l_extendedprice FROM lineitem
      |UNION ALL SELECT l_returnflag, l_orderkey*10 + l_linenumber, 'quantity', l_quantity FROM lineitem""".stripMargin

  private val pairsSql =
    s"""WITH long_form AS ($longSql),
       |ranked AS (
       |  SELECT l_returnflag, sk, item, v,
       |         avg(rn) OVER (PARTITION BY l_returnflag, item, v) AS r
       |  FROM (SELECT *, CAST(row_number() OVER (PARTITION BY l_returnflag, item ORDER BY v) AS DOUBLE) AS rn
       |        FROM long_form) t0
       |),
       |pairs AS (
       |  SELECT a.l_returnflag AS l_returnflag, a.item AS item_a, b.item AS item_b,
       |         count(*) AS n_samples, corr(a.r, b.r) AS rho_raw,
       |         min(a.v) AS mina, max(a.v) AS maxa, min(b.v) AS minb, max(b.v) AS maxb
       |  FROM ranked a JOIN ranked b
       |    ON a.l_returnflag = b.l_returnflag AND a.sk = b.sk AND a.item < b.item
       |  GROUP BY 1, 2, 3
       |)
       |SELECT l_returnflag, item_a, item_b, n_samples, rho_raw
       |FROM pairs
       |WHERE n_samples >= 2 AND mina < maxa AND minb < maxb
       |  AND rho_raw IS NOT NULL AND NOT isnan(rho_raw)""".stripMargin

  private val erfP =
    // p = 2*(1 - Phi(|t|)) with Phi from A&S erf; z = |t|/sqrt(2)
    """CASE WHEN n_samples < 3 THEN NULL
      |     WHEN abs(rho_raw) >= 1 THEN 0.0
      |     ELSE least(greatest(
      |       2*(1 - 0.5*(1 + (1 - (((((1.061405429*tt + -1.453152027)*tt + 1.421413741)*tt + -0.284496736)*tt + 0.254829592)*tt) * exp(-zz*zz)))), 0.0), 1.0)
      |END""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "c1_rank_fractional" ->
      """SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity,
        |       avg(rn) OVER (PARTITION BY l_returnflag, l_quantity) AS frac_rank
        |FROM (SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity,
        |             CAST(row_number() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS DOUBLE) AS rn
        |      FROM lineitem) t""".stripMargin,
    "c2_spearman_pairs" ->
      s"""WITH base AS ($pairsSql)
         |SELECT l_returnflag, item_a, item_b, n_samples, round(rho_raw, 7) AS rho
         |FROM base""".stripMargin,
    "c5_corr_pipeline" ->
      s"""WITH base AS ($pairsSql),
         |withz AS (
         |  SELECT *, abs(rho_raw * sqrt((n_samples - 2) / nullif(1 - rho_raw*rho_raw, 0))) / sqrt(2) AS zz
         |  FROM base
         |),
         |witht AS (
         |  SELECT *, 1/(1 + 0.3275911*zz) AS tt FROM withz
         |),
         |withp AS (
         |  SELECT l_returnflag, item_a, item_b, n_samples, rho_raw, $erfP AS p_raw
         |  FROM witht
         |),
         |withq AS (
         |  SELECT *,
         |    sum(CASE WHEN p_raw IS NOT NULL AND NOT isnan(p_raw) THEN 1 ELSE 0 END)
         |      OVER (PARTITION BY l_returnflag) AS m,
         |    row_number() OVER (PARTITION BY l_returnflag ORDER BY p_raw ASC NULLS LAST) AS i
         |  FROM withp
         |),
         |withq2 AS (
         |  SELECT *, CASE WHEN p_raw IS NOT NULL AND NOT isnan(p_raw)
         |    THEN least(min(p_raw * m / i) OVER (PARTITION BY l_returnflag ORDER BY p_raw ASC NULLS LAST
         |         ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING), 1.0) END AS q_raw
         |  FROM withq
         |)
         |SELECT l_returnflag, item_a, item_b, n_samples, round(rho_raw, 7) AS rho,
         |       round(p_raw, 7) AS p_value, round(q_raw, 7) AS q_value
         |FROM withq2""".stripMargin,
  )
}
