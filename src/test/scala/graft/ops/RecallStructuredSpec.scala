package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ANN recall floors on a STRUCTURED embedding fixture (round-9
  * verdict #6): every RecallSpec floor is measured on the testdata
  * embeddings, which are near-iid — product quantization's and
  * coarse quantization's WORST case, so those floors are conservative
  * by construction. That claim ("real corpora rank better") was
  * documentation until now; this spec measures it on a deterministic
  * mixture-of-Gaussians corpus with genuine low-dim cluster
  * structure, the shape real text/image embeddings actually have.
  *
  * Fixture: 500 vectors, 64-dim, 8 isotropic Gaussian clusters —
  * centers uniform in [-5,5)^64, noise sigma 0.6 via Box-Muller —
  * every draw hex64-seeded ([[Hashing.hex64Local]]), so the corpus is
  * a pure function of the seed strings: the same rows on every run,
  * every machine (the repo's determinism discipline; no
  * Math.random).
  *
  * Measured 2026-08-15 (floors pinned under): p13 IVF 1.0, p44
  * capture 1.0 (vs 0.52 / ~0.8 near-iid — cells align with real
  * clusters, so the coarse-quantizer floors are indeed the
  * conservative end), p66 residual IVF-PQ 0.803 (vs 0.476), and —
  * the sharpest finding — p64 raw-vector IVF-PQ stays at 0.462:
  * cluster structure does NOT help raw-vector codes, because the
  * m×ksub budget still has to span the full inter-cluster spread, so
  * within-cell ADC resolution is unchanged. Residual codes spend the
  * same budget inside the cell and gain 2x. That measured 0.46→0.80
  * gap IS the FAISS residual-quantization argument, demonstrated on
  * data — and it justifies p66 being the recommended production
  * ranker, with p64 the documented raw-vector deviation.
  */
class RecallStructuredSpec extends SparkSpec {
  import spark.implicits._

  private val Dim = 64
  private val Clusters = 8
  private val N = 500

  /** Uniform (0,1) from a seed string — deterministic, engine-free. */
  private def u(seed: String): Double =
    ((Hashing.hex64Local(seed) % 1000000L) + 0.5) / 1000000.0

  /** Standard normal via Box-Muller from two seeded uniforms. */
  private def gauss(seed: String): Double =
    math.sqrt(-2.0 * math.log(u(seed + "/u1"))) *
      math.cos(2.0 * math.Pi * u(seed + "/u2"))

  private lazy val emb: DataFrame = {
    val centers = Array.tabulate(Clusters, Dim) { (c, j) =>
      u(s"mog-center-$c-$j") * 10.0 - 5.0
    }
    val rows = (0 until N).map { id =>
      val c = id % Clusters
      val v = Array.tabulate(Dim) { j =>
        (centers(c)(j) + 0.6 * gauss(s"mog-noise-$id-$j")).toFloat
      }
      (id.toLong, c.toLong, v.toSeq)
    }
    rows.toDF("vec_id", "label", "embedding")
      .repartition(8).cache()
  }

  /** Mean over queries of |approx@k ∩ exact@k| / |exact@k| (the
    * RecallFloorsSpec measure, restated over this fixture).
    */
  private def topkRecall(exact: DataFrame, approx: DataFrame): Double = {
    val e = exact.select("query_id", "neighbor_id")
    val hits = e.join(approx.select("query_id", "neighbor_id"),
        Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("hit"))
    e.groupBy("query_id").agg(count(lit(1)).as("total"))
      .join(hits, Seq("query_id"), "left")
      .select(avg(coalesce(col("hit"), lit(0L)).cast("double") / col("total")))
      .head.getDouble(0)
  }

  test("p13 on clustered embeddings: IVF recall approaches 1 when cells align with real structure") {
    val exact = Similarity.cosineTopK(emb, k = 5).cache()
    val r = topkRecall(exact, Similarity.ivfCosineTopK(emb, k = 5, nCentroids = 8, nProbe = 2))
    info(s"p13 structured recall@5=$r (near-iid fixture: 0.52)")
    assert(r >= 0.9, s"p13 structured recall $r < 0.9 — the coarse quantizer " +
      "no longer finds obvious cluster structure")
    exact.unpersist()
  }

  test("p64/p66 on clustered embeddings: residual codes exploit the structure, raw codes cannot") {
    val exact = Pq.l2TopK(emb, k = 5).cache()
    val r64 = topkRecall(exact, Pq.ivfPqTopK(emb, k = 5))
    val r66 = topkRecall(exact, Pq.ivfPqResidualTopK(emb, k = 5))
    info(s"p64 structured recall@5=$r64, p66=$r66 (near-iid fixture: 0.465 / 0.476)")
    // raw-vector codes (p64's documented deviation) see no benefit
    // from clusters — the codebook still spans the inter-cluster
    // spread, so in-cell resolution is what it was on iid data
    assert(r64 >= 0.4, s"p64 structured recall $r64 < 0.4")
    // residual codes spend the same m x ksub budget INSIDE the cell:
    // the measured ~2x gap over p64 is the FAISS residual argument,
    // pinned as a floor AND as the structural ordering
    assert(r66 >= 0.75, s"p66 structured recall $r66 < 0.75")
    assert(r66 >= r64 + 0.2,
      s"residual PQ must exploit cluster structure raw PQ cannot: p66 $r66 vs p64 $r64")
    exact.unpersist()
  }

  test("p71 on clustered embeddings: cluster stats recover the generative structure") {
    val stats = Similarity.clusterStats(emb).cache()
    val rows = stats.collect()
    // every vector lands in exactly one audit row; the fit recovers
    // most generative clusters cleanly (3 Lloyd rounds from hashed
    // seeds: one seed pair landing in the same generative cluster can
    // merge two clusters and split a third — measured layout
    // 63/125/62/53/63/63/62/9 — which is k-means reality, and exactly
    // what this audit table exists to SHOW a curation pipeline)
    assert(rows.length == 8, s"expected 8 clusters, got ${rows.length}")
    assert(rows.map(_.getAs[Long]("n_vectors")).sum == N.toLong)
    val tight = rows.filter(r => r.getAs[Double]("mean_cosine") >= 0.9 &&
      r.getAs[Long]("n_vectors") >= 50)
    assert(tight.length >= 6,
      s"at least 6 of 8 clusters must be recovered tight: " +
        rows.map(r => (r.getAs[Long]("n_vectors"),
          r.getAs[Double]("mean_cosine"))).toSeq.toString)
    // deterministic: a refit is bit-identical
    val again = Similarity.clusterStats(emb).collect()
    assert(rows.map(_.toSeq).toSet == again.map(_.toSeq).toSet)
    stats.unpersist()
  }

  test("p44 on clustered embeddings: semantic dedup captures every co-clustered dup pair") {
    // within-cluster cosine is ~||center||^2 / (||center||^2 + noise)
    // >> 0.45; cross-cluster ~0 — so the exact dup set IS the
    // within-cluster pair set, and capture measures whether the
    // operator's cells recover the true clusters
    val exact = Similarity.cosineDupPairs(emb, tau = 0.45).cache()
    val total = exact.count()
    assert(total > 1000, s"fixture must have dense within-cluster dup pairs, got $total")
    val verdict = Similarity.semanticDedup(emb, tau = 0.45, nCentroids = 8)
    val dropped = verdict.where(!col("keep")).select(col("vec_id").as("id_b"))
    val capture = exact.join(dropped, Seq("id_b"), "left_semi").count().toDouble / total
    info(s"p44 structured capture=$capture over $total exact pairs")
    assert(capture >= 0.95, s"p44 structured capture $capture < 0.95")
    exact.unpersist()
  }
}
