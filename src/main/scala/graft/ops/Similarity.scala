package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  * Baseline: exact brute-force cosine top-k (all-pairs). Scale path:
  * LSH over deterministic md5-derived random hyperplanes — bucket the
  * vectors by sign pattern, join only within buckets. Both are pure
  * column math (`zip_with`/`aggregate`) inside whole-stage codegen; no
  * UDFs.
  *
  * 100 TB notes: brute-force is O(N²·d) — correct as the quality
  * oracle and for small N re-ranking. The LSH variant's join fan-out
  * is bounded by bucket occupancy (~N/2^planes); more planes = smaller
  * buckets = lower recall, the standard trade. For IVF-style
  * partitioning, bucket ids double as shuffle keys so each bucket's
  * pairs co-locate on one executor.
  */
object Similarity {
  import Hashing._

  private def toDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Sum of element-wise products (dot) in doc order — deterministic
    * summation order in both engines.
    */
  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, _ * _), lit(0.0), _ + _)

  private def norm(v: Column): Column =
    sqrt(aggregate(transform(v, x => x * x), lit(0.0), _ + _))

  def cosine(a: Column, b: Column): Column =
    dot(toDouble(a), toDouble(b)) / (norm(toDouble(a)) * norm(toDouble(b)))

  /** Exact brute-force cosine top-k neighbors per vector.
    * Ties broken by neighbor id (ascending) for determinism.
    */
  def cosineTopK(emb: DataFrame, k: Int,
      id: String = "vec_id", vec: String = "embedding"): DataFrame = {
    val a = emb.select(col(id).as("query_id"), toDouble(col(vec)).as("va"))
    val b = emb.select(col(id).as("neighbor_id"), toDouble(col(vec)).as("vb"))
    val pairs = a.join(b, col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", dot(col("va"), col("vb")) /
        (norm(col("va")) * norm(col("vb"))))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    pairs
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }

  /** Deterministic hyperplane weight for (plane, dim): uniform in
    * [-1, 1] derived from md5 — identical in the SQL oracle.
    */
  private def planeWeight(plane: Column, dim: Column): Column =
    ((hex64(concat_ws("_", plane, dim)) % 2001L) - 1000L).cast("double") / 1000.0

  /** Sign-LSH bucket id from `planes` hyperplanes. */
  def lshBucket(emb: DataFrame, planes: Int,
      id: String = "vec_id", vec: String = "embedding"): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val planesDf = (0 until planes).toDF("plane")
    val dims = emb.select(col(id), posexplode(toDouble(col(vec))).as(Seq("dim", "x")))
    dims.crossJoin(broadcast(planesDf))
      .withColumn("wx", col("x") * planeWeight(col("plane"), col("dim")))
      .groupBy(col(id), col("plane"))
      .agg(sum(col("wx")).as("proj"))
      .groupBy(col(id))
      .agg(sum(when(col("proj") > 0, expr("shiftleft(1L, plane)")).otherwise(0L))
        .as("bucket"))
  }

  /** Approximate cosine top-k: exact ranking within sign-LSH buckets. */
  def lshCosineTopK(emb: DataFrame, k: Int, planes: Int = 8,
      id: String = "vec_id", vec: String = "embedding"): DataFrame = {
    val buckets = lshBucket(emb, planes, id, vec)
    val withB = emb.join(buckets, id)
    val a = withB.select(col(id).as("query_id"), toDouble(col(vec)).as("va"), col("bucket"))
    val b = withB.select(col(id).as("neighbor_id"), toDouble(col(vec)).as("vb"), col("bucket"))
    val pairs = a.join(b, Seq("bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", dot(col("va"), col("vb")) /
        (norm(col("va")) * norm(col("vb"))))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    pairs
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }

  /** Embedding-cosine near-duplicate pairs (id_a < id_b, cosine >= tau)
    * — exact all-pairs; compose with [[lshBucket]] for the blocked
    * variant at scale.
    */
  def cosineDupPairs(emb: DataFrame, tau: Double,
      id: String = "vec_id", vec: String = "embedding"): DataFrame = {
    val a = emb.select(col(id).as("id_a"), toDouble(col(vec)).as("va"))
    val b = emb.select(col(id).as("id_b"), toDouble(col(vec)).as("vb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cosine", dot(col("va"), col("vb")) /
        (norm(col("va")) * norm(col("vb"))))
      .where(col("cosine") >= tau)
      .select("id_a", "id_b", "cosine")
  }
}
