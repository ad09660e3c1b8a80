package graft.ops

import graft.functions.VectorMath
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Product quantization (PQ) over an embedding column — the memory
  * half of the ANN family: [[Similarity]] prunes WHICH vectors a query
  * compares against (IVF cells, LSH buckets); PQ shrinks WHAT each
  * comparison costs. A d-dim float vector becomes m small integer
  * codes (one per subspace, each indexing a ksub-entry per-subspace
  * codebook), and approximate distances are computed code-side without
  * ever touching the original floats — at 100 TB the candidate lists
  * hold m bytes per vector instead of 4d, which is the difference
  * between an in-memory index and a disk-bound one.
  *
  * Reference scope: the reference engine has no vector search at all
  * (SURVEY.md §2 — correlation statistics only); this module is part
  * of the engine's LLM-pipeline extension surface alongside
  * [[Similarity]].
  *
  * Design decisions, twinned with the DuckDB oracle:
  *  - Per-subspace k-means is EUCLIDEAN (direct (x-y)^2 fold via
  *    [[graft.functions.L2SqDistance]]) — the classical PQ objective —
  *    while the coarse IVF quantizer stays spherical-cosine
  *    ([[Similarity.fitCodebookKMeans]]). Codes quantize RAW vectors,
  *    not residuals against the coarse centroid (the FAISS refinement;
  *    documented deviation — residual encoding would double the
  *    oracle's CTE surface for a constant-factor accuracy gain).
  *  - Seeding, tie-breaks, and the 6-dp HALF_UP centroid quantization
  *    per Lloyd round all follow the [[Similarity.fitCodebookKMeans]]
  *    discipline, so both engines replay the fit bit-for-bit.
  *  - ksub stays FIXED as the corpus grows (unlike the auto-scaled
  *    coarse centroid count): PQ cost is per-row encode work and a
  *    per-query m×ksub table — neither degrades with N.
  */
object Pq {

  /** codebooks(j) = subspace j's centroid list, (cid, subd-dim
    * vector), cid-ascending. Cells that lose all members during the
    * fit drop out, so cids may be sparse.
    */
  type Codebooks = Seq[Seq[(Int, Seq[Double])]]

  private def toDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Deterministic per-subspace Euclidean k-means codebooks (Lloyd
    * iterations as DataFrame aggregations, one subspace at a time —
    * the fit input is bounded, see below):
    *  - the vector splits into m contiguous subd = d/m slices;
    *  - init: all m subspaces seed from the SAME ksub rows — the
    *    smallest (hex64(id), id), the [[Similarity.fitCodebookKMeans]]
    *    seeded draw;
    *  - each round: assign every subvector to its nearest centroid by
    *    squared L2 (ties to the lowest centroid id), recompute
    *    centroids as element-wise means quantized to 6 dp HALF_UP
    *    (kills partial-agg-order ulp drift — the established
    *    cross-engine grid); member-less cells drop. Zero subvectors
    *    and zero centroids are legitimate under L2 (no norm filter —
    *    unlike the cosine fit, which must drop them).
    *
    * 100 TB: fit on a deterministic hash-sample (`fitSamplePct`) —
    * codebook quality needs thousands of vectors per cell, not the
    * corpus; each round is m bounded aggregations over the sample.
    */
  def fitPqCodebooks(emb: DataFrame, m: Int, ksub: Int, iters: Int,
      id: String = "vec_id", vec: String = "embedding",
      fitSamplePct: Int = 100): Codebooks = {
    require(m >= 1, s"m must be >= 1, got $m")
    require(ksub >= 1, s"ksub must be >= 1, got $ksub")
    require(iters >= 0, s"iters must be >= 0, got $iters")
    require(fitSamplePct >= 1 && fitSamplePct <= 100,
      s"fitSamplePct must be in [1,100], got $fitSamplePct")
    val dRow = emb.select(size(toDouble(col(vec))).as("d")).head
    val d = dRow.getInt(0)
    require(d % m == 0, s"dim $d not divisible into $m subspaces")
    val subd = d / m
    val fitInput =
      if (fitSamplePct >= 100) emb
      else Sampling.bernoulliByHash(emb, col(id), fitSamplePct)
    // slice once per row, cache across the m × iters aggregation
    // rounds (and spread: the single-split testdata trap)
    val sliced = fitInput
      .select(col(id).as("vid") +: (0 until m).map(j =>
        slice(toDouble(col(vec)), j * subd + 1, subd).as(s"sv_$j")): _*)
      .repartition(emb.sparkSession.sparkContext.defaultParallelism, col("vid"))
      .cache()
    try {
      val seedRows = sliced
        .withColumn("__h", Hashing.hex64(col("vid").cast("string")))
        .orderBy(col("__h").asc, col("vid").asc)
        .limit(ksub)
        .select((0 until m).map(j => col(s"sv_$j")): _*)
        .collect()
      if (seedRows.isEmpty) return Seq.fill(m)(Seq.empty)
      var cbs: IndexedSeq[Seq[(Int, Seq[Double])]] = (0 until m).map { j =>
        seedRows.toSeq.zipWithIndex.map { case (r, i) => (i, r.getSeq[Double](j)) }
      }
      // ONE pass + ONE (m·ksub)-group aggregation per round for ALL
      // subspaces: each row explodes into its m (sub, subvector,
      // assigned-cell) entries — subspace assignments are independent
      // by construction, so fusing the rounds changes nothing the
      // per-subspace oracle unroll can observe. struct sort ascending
      // = distance asc, cid asc — the oracle's (dist ASC, cid ASC)
      // rank order.
      for (_ <- 1 to iters) {
        val subEntries = (0 until m).map { j =>
          val assign = sort_array(array(cbs(j).map { case (cid, cv) =>
            struct(VectorMath.l2sq(col(s"sv_$j"), typedlit(cv)).as("d"),
              lit(cid).as("cid"))
          }: _*)).getItem(0).getField("cid")
          struct(lit(j).as("sub"), col(s"sv_$j").as("sv"), assign.as("cell"))
        }
        val aggs = (1 to subd).map(q =>
          avg(element_at(col("sv"), q)).as(s"m_$q"))
        val rows = sliced
          .select(explode(array(subEntries: _*)).as("__e"))
          .select(col("__e.sub").as("sub"), col("__e.sv").as("sv"),
            col("__e.cell").as("cell"))
          .groupBy(col("sub"), col("cell")).agg(aggs.head, aggs.tail: _*)
          .collect()
        cbs = (0 until m).map { j =>
          rows.toSeq.filter(_.getAs[Int]("sub") == j).map { r =>
            val mv = (1 to subd).map { q =>
              BigDecimal(r.getAs[Double](s"m_$q"))
                .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
            }
            (r.getAs[Int]("cell"), mv)
          }.sortBy(_._1)
        }
      }
      cbs
    } finally sliced.unpersist()
  }

  /** Per-subspace code columns for a frame already carrying sliced
    * subvector columns `svPrefix_j`: for each subspace the nearest
    * centroid's (cid, distance) under the fit's exact tie order.
    */
  private def bestEntry(codebook: Seq[(Int, Seq[Double])], sv: Column): Column =
    sort_array(array(codebook.map { case (cid, cv) =>
      struct(VectorMath.l2sq(sv, typedlit(cv)).as("d"), lit(cid).as("cid"))
    }: _*)).getItem(0)

  /** Encode every vector: (id, sub, code, qdist) — one row per
    * subspace, `code` the nearest centroid id, `qdist` the 6-dp
    * squared quantization error (the per-subspace reconstruction
    * quality signal). Map-only column math over one scan: the
    * codebooks ride the plan as literals, like every fitted model in
    * this engine (p43/p57/p58's weight arrays).
    */
  def encodePq(emb: DataFrame, codebooks: Codebooks,
      id: String = "vec_id", vec: String = "embedding"): DataFrame = {
    require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
      "codebooks must be non-empty per subspace")
    val m = codebooks.length
    val subd = codebooks.head.head._2.length
    val sliced = emb.select(col(id) +: (0 until m).map(j =>
      slice(toDouble(col(vec)), j * subd + 1, subd).as(s"sv_$j")): _*)
    val cells = (0 until m).map { j =>
      val best = bestEntry(codebooks(j), col(s"sv_$j"))
      struct(lit(j.toLong).as("sub"),
        best.getField("cid").cast("long").as("code"),
        round(best.getField("d"), 6).as("qdist"))
    }
    sliced
      .select(col(id), explode(array(cells: _*)).as("__e"))
      .select(col(id), col("__e.sub").as("sub"), col("__e.code").as("code"),
        col("__e.qdist").as("qdist"))
  }

  /** Exact brute-force squared-L2 top-k — [[ivfPqTopK]]'s quality
    * oracle (defines the recall target PqSpec/RecallSpec floor it
    * against), the L2 counterpart of [[Similarity.cosineTopK]].
    * O(N²·d): a labeled twin, not a scale path — the scale path is
    * the IVF-PQ form. Includes zero vectors (legitimate under L2; the
    * cosine twins must drop them).
    */
  def l2TopK(emb: DataFrame, k: Int,
      id: String = "vec_id", vec: String = "embedding"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val a = emb.select(col(id).as("query_id"), toDouble(col(vec)).as("va"))
      .repartition(emb.sparkSession.sparkContext.defaultParallelism)
    val b = emb.select(col(id).as("neighbor_id"), toDouble(col(vec)).as("vb"))
    val pairs = a.join(broadcast(b), col("query_id") =!= col("neighbor_id"))
      .withColumn("l2sq", VectorMath.l2sq(col("va"), col("vb")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("l2sq").asc, col("neighbor_id").asc)
    pairs.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        round(col("l2sq"), 6).as("l2sq"), col("rank"))
  }

  /** IVF-PQ approximate top-k with exact refinement — the full
    * two-level ANN shape: the coarse spherical-cosine IVF quantizer
    * ([[Similarity]], auto-scaled centroid count) prunes candidates to
    * the query's nProbe cells; ranking inside the probed lists runs on
    * PQ codes via ADC (asymmetric distance computation — each query
    * precomputes its m per-subspace lookup tables ONCE, each candidate
    * pair costs m map lookups + (m-1) adds instead of a d-dim float
    * scan); the ADC top-`rerankK` shortlist then re-ranks by EXACT
    * squared L2 (the FAISS refine step — fetching `rerankK` full
    * vectors per query by id, never scanning floats inside the lists).
    * Returns the exact distances of the refined top-k, ascending, ties
    * to the lowest neighbor id.
    *
    * Measured on the sf0.01 fixture (ProbePq decomposition): raw
    * m=4/ksub=8 ADC ranks at 0.085 recall vs the exact-L2 twin — the
    * quantization noise of 3-bit codes over 16-dim subspaces swamps
    * neighbor distance gaps — while m=16/ksub=16 + top-20 refine
    * recovers the cell-capture ceiling (~0.52, the same regime as
    * p13's exact-ranked cells). Hence the defaults.
    *
    * 100 TB: the cell id is the shuffle key exactly as in
    * [[Similarity.ivfCosineTopK]]; the candidate side carries only
    * (id, cell, m codes) — the PQ memory win — and fan-out stays
    * bounded by cell occupancy × nProbe. The LUT side is |queries| ×
    * m×ksub doubles, per-row state, never a join. The refine step
    * joins |queries|·rerankK id rows back to the vector table — a
    * bounded equi-join, the only place full vectors are touched.
    */
  def ivfPqTopK(emb: DataFrame, k: Int, m: Int = 16, ksub: Int = 16,
      pqIters: Int = 2, nCentroids: Int = 8, nProbe: Int = 2,
      rerankK: Int = -1,
      id: String = "vec_id", vec: String = "embedding",
      codebook: String = "kmeans", fitSamplePct: Int = 100,
      targetOccupancy: Int = 1024, corpusCount: Long = -1L): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(nProbe >= 1, s"nProbe must be >= 1, got $nProbe")
    val shortK = if (rerankK <= 0) 4 * k else rerankK
    require(shortK >= k, s"rerankK $shortK must be >= k $k")
    val cbs = fitPqCodebooks(emb, m, ksub, pqIters, id, vec, fitSamplePct)
    require(cbs.forall(_.nonEmpty), "PQ fit produced an empty subspace codebook")
    val subd = cbs.head.head._2.length
    val c = if (targetOccupancy <= 0) nCentroids
      else Similarity.autoCentroids(
        Similarity.sizingCount(emb, vec, corpusCount), nCentroids, targetOccupancy)
    val cells = Similarity.ivfRankedCells(emb, c, math.max(1, nProbe),
      id, vec, "vid", "v", "nrm", codebook, fitSamplePct)
    // candidate lists carry codes, not vectors (the PQ memory shape)
    val cands = cells.where(col("__rk") === 1)
      .select(col("vid").as("neighbor_id") +: col("cell") +: (0 until m).map(j =>
        slice(col("v"), j * subd + 1, subd).as(s"svb_$j")): _*)
      .select(col("neighbor_id") +: col("cell") +: (0 until m).map(j =>
        bestEntry(cbs(j), col(s"svb_$j")).getField("cid").as(s"code_$j")): _*)
    // ADC in reconstruction form: the codebooks ride the PLAN as
    // array-of-array literals and each pair evaluates
    // l2sq(query_subvector, centroid[code_j]) directly — the same
    // doubles a per-query lookup table would hold, WITHOUT widening
    // the probe rows. (A first cut shipped m per-query LUT maps
    // through the cell join — m·ksub·16B ≈ 4 KB per probe row vs the
    // 512 B vector — and the probe-side shuffle inflation measured
    // 3.8× wall at the 10× scale probe. Dropped cids leave zero-
    // vector placeholder slots that no surviving code references.)
    val probes = cells.where(col("__rk") <= nProbe)
      .select(col("vid").as("query_id"), col("cell"), col("v").as("va"))
    val adc = (0 until m).map { j =>
      val maxCid = cbs(j).map(_._1).max
      val byCid = cbs(j).toMap
      val cbArr: Seq[Seq[Double]] = (0 to maxCid).map(c =>
        byCid.getOrElse(c, Seq.fill(subd)(0.0)))
      VectorMath.l2sq(slice(col("va"), j * subd + 1, subd),
        element_at(typedlit(cbArr), col(s"code_$j").cast("int") + 1))
    }.reduce(_ + _)
    val pairs = probes.join(cands, Seq("cell"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("adc_l2sq", adc)
    val wAdc = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_l2sq").asc, col("neighbor_id").asc)
    val shortlist = pairs.withColumn("__ar", row_number().over(wAdc))
      .where(col("__ar") <= shortK)
      .select(col("query_id"), col("neighbor_id"))
    // exact refine: only the shortlist's ids fetch full vectors
    val qv = emb.select(col(id).as("query_id"), toDouble(col(vec)).as("__va"))
    val nv = emb.select(col(id).as("neighbor_id"), toDouble(col(vec)).as("__vb"))
    val refined = shortlist
      .join(qv, Seq("query_id"))
      .join(nv, Seq("neighbor_id"))
      .withColumn("l2sq", VectorMath.l2sq(col("__va"), col("__vb")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("l2sq").asc, col("neighbor_id").asc)
    refined.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        round(col("l2sq"), 6).as("l2sq"), col("rank"))
  }
}
