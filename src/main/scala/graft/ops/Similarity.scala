package graft.ops

import graft.functions.VectorMath
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  * Baseline: exact brute-force cosine top-k (all-pairs). Scale path:
  * LSH over deterministic md5-derived random hyperplanes — bucket the
  * vectors by sign pattern, join only within buckets. The inner dot
  * product is a custom codegen expression ([[graft.functions.DotProduct]]);
  * norms are computed once per row BEFORE the pair join, so the
  * per-pair work is exactly one primitive O(d) loop.
  *
  * 100 TB notes: brute-force is O(N²·d) — correct as the quality
  * oracle and for small-N re-ranking. The LSH variant's join fan-out
  * is bounded by bucket occupancy (~N/2^planes); more planes = smaller
  * buckets = lower recall, the standard trade. Bucket ids double as
  * shuffle keys so each bucket's pairs co-locate on one executor.
  */
object Similarity {
  import Hashing._

  private def toDouble(v: Column): Column = transform(v, _.cast("double"))

  def cosine(a: Column, b: Column): Column = {
    val ad = toDouble(a); val bd = toDouble(b)
    VectorMath.dot(ad, bd) / (VectorMath.norm(ad) * VectorMath.norm(bd))
  }

  /** (id, vector-as-double, norm) projection — one norm per row.
    * Zero-norm vectors are EXCLUDED: their cosine is NaN, which Spark
    * orders above every double, so one all-zeros embedding would
    * otherwise become the rank-1 neighbor of every query and pass any
    * dup threshold (NaN >= tau is true in non-ANSI mode).
    */
  private def withNorm(emb: DataFrame, id: String, vec: String,
      idOut: String, vecOut: String, normOut: String): DataFrame =
    emb.select(col(id).as(idOut), toDouble(col(vec)).as(vecOut))
      .withColumn(normOut, VectorMath.norm(col(vecOut)))
      .where(col(normOut) > 0.0)

  private def rankTopK(pairs: DataFrame, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    pairs.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }

  /** Spread the streamed side of a nested-loop pair join: embedding
    * tables often arrive as one input split, and the O(N·broadcast)
    * probe loop otherwise runs in that single task (measured: the whole
    * brute-force scan single-threaded at sf0.1).
    */
  private def spread(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  /** Exact brute-force cosine top-k neighbors per vector.
    * Ties broken by neighbor id (ascending) for determinism.
    */
  def cosineTopK(emb: DataFrame, k: Int,
      id: String = "vec_id", vec: String = "embedding"): DataFrame = {
    val a = spread(withNorm(emb, id, vec, "query_id", "va", "na"))
    val b = withNorm(emb, id, vec, "neighbor_id", "vb", "nb")
    val pairs = a.join(broadcast(b), col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", VectorMath.dot(col("va"), col("vb")) / (col("na") * col("nb")))
    rankTopK(pairs, k)
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
    // materialize the bucketed table once: the self-join sides project
    // different columns, so neither exchange reuse nor subplan sharing
    // applies and the dims-by-planes bucket lineage would run twice
    val withB = emb.join(lshBucket(emb, planes, id, vec), id)
      .select(col(id), toDouble(col(vec)).as("__v"), col("bucket"))
      .withColumn("__n", VectorMath.norm(col("__v")))
      .where(col("__n") > 0.0)
      .localCheckpoint(true)
    val a = withB.select(col(id).as("query_id"), col("__v").as("va"),
      col("__n").as("na"), col("bucket"))
    val b = withB.select(col(id).as("neighbor_id"), col("__v").as("vb"),
      col("__n").as("nb"), col("bucket"))
    val pairs = a.join(b, Seq("bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", VectorMath.dot(col("va"), col("vb")) / (col("na") * col("nb")))
    rankTopK(pairs, k)
  }

  /** IVF (inverted-file) coarse quantization: each vector ranks the
    * `nCentroids` centroid vectors by cosine (ties to the lowest
    * centroid id). Centroids are the `nCentroids` vectors with the
    * smallest ids — deterministic (no RNG, oracle-replicable) and a
    * stand-in for a k-means codebook.
    *
    * One ranked vector-by-centroid similarity table serving BOTH the
    * inverted-list assignment (rank 1) and the query probes (rank <=
    * nProbe) — computing them separately would run the dominant
    * N x nCentroids dot-product scan twice.
    * Returns (idOut, vecOut, normOut, cell, __rk).
    */
  private def ivfRankedCells(emb: DataFrame, nCentroids: Int,
      id: String, vec: String,
      idOut: String, vecOut: String, normOut: String): DataFrame = {
    val vs = withNorm(emb, id, vec, idOut, vecOut, normOut)
    val cents = withNorm(emb, id, vec, "__cid", "__cv", "__cn")
      .orderBy(col("__cid").asc).limit(nCentroids)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idOut))
      .orderBy(col("__sim").desc, col("__cid").asc)
    spread(vs).join(broadcast(cents))
      .withColumn("__sim",
        VectorMath.dot(col(vecOut), col("__cv")) / (col(normOut) * col("__cn")))
      .withColumn("__rk", row_number().over(w))
      .select(col(idOut), col(vecOut), col(normOut), col("__cid").as("cell"), col("__rk"))
  }

  /** IVF approximate cosine top-k: queries probe their `nProbe` nearest
    * centroid cells and rank exactly within the union of those cells'
    * inverted lists.
    *
    * 100 TB shape: the cell id is the shuffle key — each cell's list
    * co-locates, the probe join is an equi-join on `cell`, and fan-out
    * is bounded by list occupancy (~N/nCentroids x nProbe per query).
    * Recall/cost trades by nProbe exactly as in FAISS-style IVF-Flat.
    */
  def ivfCosineTopK(emb: DataFrame, k: Int, nCentroids: Int = 8, nProbe: Int = 2,
      id: String = "vec_id", vec: String = "embedding"): DataFrame = {
    // materialize the ranked cells once; assignment and probes are two
    // filters over the same subtree (localCheckpoint — Spark would
    // otherwise recompute the scan for each reference)
    val cells = ivfRankedCells(emb, nCentroids, id, vec, "vid", "v", "nrm")
      .localCheckpoint(true)
    val lists = cells.where(col("__rk") === 1)
      .select(col("vid").as("neighbor_id"), col("v").as("vb"), col("nrm").as("nb"),
        col("cell"))
    val probes = cells.where(col("__rk") <= nProbe)
      .select(col("vid").as("query_id"), col("v").as("va"), col("nrm").as("na"),
        col("cell"))
    val pairs = probes.join(lists, Seq("cell"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", VectorMath.dot(col("va"), col("vb")) / (col("na") * col("nb")))
    rankTopK(pairs, k)
  }

  /** Embedding-cosine near-duplicate pairs (id_a < id_b, cosine >= tau)
    * — exact all-pairs; compose with [[lshBucket]] for the blocked
    * variant at scale.
    */
  def cosineDupPairs(emb: DataFrame, tau: Double,
      id: String = "vec_id", vec: String = "embedding"): DataFrame = {
    val a = spread(withNorm(emb, id, vec, "id_a", "va", "na"))
    val b = withNorm(emb, id, vec, "id_b", "vb", "nb")
    a.join(broadcast(b), col("id_a") < col("id_b"))
      .withColumn("cosine", VectorMath.dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .where(col("cosine") >= tau)
      .select("id_a", "id_b", "cosine")
  }
}
