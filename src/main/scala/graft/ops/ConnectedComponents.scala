package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Connected components over an undirected edge list — the step that
  * turns near-duplicate PAIRS (p2/p3/p4/p12's output) into duplicate
  * GROUPS: keep min-id per component, drop the rest. Pure
  * DataFrame iteration, no graph library.
  *
  * Algorithm: min-label propagation. Every vertex starts labeled with
  * itself; each round every vertex takes the min of its own label and
  * its neighbors' labels; fixpoint when no label changes. Rounds
  * needed = component diameter — dedup clusters are near-cliques of
  * small diameter, so this converges in 2-3 rounds where a general
  * graph might need the small-star/large-star contraction variant.
  *
  * Scale shape per round: one shuffle to join labels onto the
  * (symmetrized) edges, one shuffle for the min-aggregate — both on
  * vertex id, so AQE coalesces them; lineage is cut every round with
  * an eager localCheckpoint (same executor-loss recompute trade as
  * documented on Dedup.minhashDupPairs) — without it the plan doubles
  * per iteration. The convergence probe is one count() per round,
  * driver-scale.
  */
object ConnectedComponents {

  /** @param edges two-column frame of undirected edges (ids of any
    *   orderable type); self-loops and duplicates are fine.
    * @return (id, component) — component is the min id reachable.
    */
  def connectedComponents(edges: DataFrame, src: String = "id_a",
      dst: String = "id_b", maxIter: Int = 20): DataFrame = {
    // symmetrize once; vertices = every id appearing on either side
    val sym = edges.select(col(src).as("u"), col(dst).as("v"))
      .unionByName(edges.select(col(dst).as("u"), col(src).as("v")))
      .distinct()
      .localCheckpoint(true)
    var labels = sym.select(col("u").as("id")).distinct()
      .withColumn("component", col("id"))
      .localCheckpoint(true)
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      // neighbor labels flow along edges; min with own label
      val msgs = sym.join(labels, sym("u") === labels("id"))
        .select(col("v").as("id"), col("component"))
      val next = labels.unionByName(msgs)
        .groupBy("id").agg(min(col("component")).as("component"))
        .localCheckpoint(true)
      val changed = next.alias("n")
        .join(labels.alias("l"), col("n.id") === col("l.id"))
        .where(col("n.component") =!= col("l.component"))
        .limit(1).count()
      // superseded checkpoint blocks would otherwise pile up in the
      // block manager for the JVM lifetime (one label table per round)
      labels.unpersist()
      labels = next
      converged = changed == 0
      iter += 1
    }
    sym.unpersist()
    if (!converged) {
      labels.unpersist()
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds — " +
          "component diameter exceeds the bound; raise maxIter or use " +
          "connectedComponentsStar for long-chain graphs")
    }
    labels
  }
}
