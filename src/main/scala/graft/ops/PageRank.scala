package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-authority scoring — the graph-derived quality signal a web
  * pretraining corpus carries alongside its text signals: pages (or
  * domains) ranked by the stationary weight of the link graph, the
  * PageRank family. Curation pipelines use it exactly like the p8
  * text-quality composite — an authority floor for keep/drop and a
  * sampling weight — so it belongs in the engine as a first-class
  * operator, not an external import.
  *
  * The iteration is the standard damped power method,
  *   pr'(v) = (1−d) + d · Σ_{u→v} pr(u)/outdeg(u),
  * run entirely on the INTEGER micro grid: pr starts at 1e6 per node,
  * per-edge contributions are truncating DIVs by the out-degree, the
  * damping is (dampNum · Σ) DIV 100 plus the constant teleport term.
  * Truncation makes the fixed-iteration result exactly replayable on
  * any engine and any partitioning (integer sums are order-free) —
  * the repo's oracle discipline applied to an iterative graph kernel;
  * mass is NOT exactly conserved under truncation, which is fine
  * because the score is a deterministic formula, not a probability.
  *
  * Shape at 100 TB: each iteration is one src-keyed equi-join (ranks
  * onto edges, both hash-partitioned on the same key) + one dst-keyed
  * map-side-combined aggregation + one left join back to the node
  * spine — three keyed shuffles per iteration, no window, no
  * all-pairs anything; iterations are a small constant (authority
  * signals converge in single digits). Driver state is zero: ranks
  * stay distributed end to end. Envelope: Σ contributions ≤ N·1e6,
  * so N < 9.2e12 nodes keeps every sum in a long.
  */
object PageRank {

  /** `iters` damped integer-micro power iterations of the edge list
    * (`src`, `dst`) over the node spine. Nodes with no in-links settle
    * at the teleport constant; out-degree is computed from the edges
    * (parallel edges count — they carry proportional mass). Returns
    * (id, n_out, n_in, pr_micro).
    */
  def pageRank(nodes: DataFrame, edges: DataFrame, iters: Int,
      dampNum: Long = 85L, id: String = "doc_id"): DataFrame = {
    require(iters >= 1, s"need at least one iteration, got $iters")
    require(dampNum >= 0 && dampNum <= 100, s"damping is a percent, got $dampNum")
    val teleport = 1000000L * (100L - dampNum) / 100L
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("__deg"))
    // co-partition the degree onto the edges once; every iteration's
    // rank join then reuses the same src hash partitioning. Edges and
    // spine are materialized once — each round re-reads them, and the
    // loop must not re-derive them from source lineage every time.
    val e = edges.join(deg, Seq("src")).localCheckpoint(true)
    val spine = nodes.select(col(id)).localCheckpoint(true)
    // lineage is cut EVERY round (the ConnectedComponents.scala
    // discipline): without it the plan nests one join+agg layer per
    // iteration and analysis cost grows quadratically — fine at
    // iters=5, a cliff at the 10-20 a convergence run uses. The
    // superseded round's checkpoint blocks are dropped via
    // Checkpoints.drop (Dataset.unpersist is a no-op on a checkpointed
    // frame) as soon as the next round is materialized, so
    // block-manager footprint stays at one rank table regardless of
    // iteration count.
    var ranks = spine.withColumn("pr_micro", lit(1000000L))
      .localCheckpoint(true)
    for (_ <- 0 until iters) {
      val next = e
        .join(ranks.select(col(id).as("__src"), col("pr_micro")),
          col("src") === col("__src"))
        .groupBy(col("dst"))
        .agg(sum(expr("pr_micro DIV __deg")).as("__c"))
        .withColumnRenamed("dst", id)
        .join(spine, Seq(id), "right")
        .select(col(id),
          (lit(teleport) +
            expr(s"($dampNum * coalesce(__c, 0)) DIV 100")).as("pr_micro"))
        .localCheckpoint(true)
      graft.Checkpoints.drop(ranks)
      ranks = next
    }
    val nIn = edges.groupBy(col("dst").as(id)).agg(count(lit(1)).as("n_in"))
    // the loop's working set is out of the result's lineage (the
    // result reads only the final checkpointed ranks + edge-derived
    // degree tables), so it can go now; the final rank table itself is
    // reclaimed by the ContextCleaner when the result is dropped
    graft.Checkpoints.drop(e); graft.Checkpoints.drop(spine)
    ranks
      .join(deg.withColumnRenamed("src", id), Seq(id), "left")
      .join(nIn, Seq(id), "left")
      .select(col(id), coalesce(col("__deg"), lit(0L)).as("n_out"),
        coalesce(col("n_in"), lit(0L)).as("n_in"), col("pr_micro"))
  }
}
