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
    * @param maxIter propagation-round budget. A graph that has not
    *   converged after maxIter/2 rounds is not the near-clique shape
    *   this algorithm is for (label propagation needs diameter-many
    *   rounds), so the call AUTO-ROUTES to the diameter-independent
    *   [[connectedComponentsStar]] instead of burning the remaining
    *   budget one hop at a time or throwing — chain-shaped dup graphs
    *   converge through this default API.
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
    // Convergence probe: min-label propagation is MONOTONE — a
    // vertex's label only ever decreases — so the label table changed
    // iff its exact label sum changed. One map-side-combined DECIMAL
    // aggregate over the just-checkpointed table replaces the former
    // id-equi-JOIN probe (a full shuffle join of two label tables per
    // round — the only per-round shuffle that wasn't the algorithm).
    // decimal(38,0) keeps the sum exact out to ~1e38 total label mass;
    // an overflowed (null) sum compares unequal forever, so the loop
    // would merely exhaust its budget and auto-route to the star
    // variant — same output, never a wrong convergence.
    def labelSum(df: DataFrame): Option[java.math.BigDecimal] =
      Option(df.agg(sum(col("component").cast("decimal(38,0)")))
        .head().getDecimal(0))
    var prevSum = labelSum(labels)
    var iter = 0
    var converged = false
    val propagationRounds = math.max(1, maxIter / 2)
    while (iter < propagationRounds && !converged) {
      // neighbor labels flow along edges; min with own label
      val msgs = sym.join(labels, sym("u") === labels("id"))
        .select(col("v").as("id"), col("component"))
      val next = labels.unionByName(msgs)
        .groupBy("id").agg(min(col("component")).as("component"))
        .localCheckpoint(true)
      val nextSum = labelSum(next)
      val same =
        if (prevSum.isDefined && nextSum.isDefined) prevSum == nextSum
        else if (labels.isEmpty) true // empty graph: trivially converged
        else
          // non-numeric ids (sum casts to null): fall back to the join
          // probe for this round rather than silently burning the budget
          next.alias("n")
            .join(labels.alias("l"), col("n.id") === col("l.id"))
            .where(col("n.component") =!= col("l.component"))
            .limit(1).count() == 0
      // superseded checkpoint blocks would otherwise pile up in the
      // block manager for the JVM lifetime (one label table per round);
      // Dataset.unpersist is a no-op on a checkpointed frame, so drop
      // the persisted RDD itself (graft.Checkpoints)
      graft.Checkpoints.drop(labels)
      labels = next
      converged = same
      prevSum = nextSum
      iter += 1
    }
    graft.Checkpoints.drop(sym)
    if (!converged) {
      graft.Checkpoints.drop(labels)
      // diameter exceeds the propagation budget — a chain-shaped graph.
      // Star contraction is diameter-independent, so its own default
      // round bound (O(log² n) theory) applies, not the caller's
      // diameter bound. Loud, because the caller's tuned budget was
      // spent and the graph is being re-solved from scratch.
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"label propagation did not converge in $propagationRounds rounds " +
          s"(half of maxIter=$maxIter); re-routing to large-star/small-star " +
          "contraction — if this graph shape is expected, call " +
          "connectedComponentsStar directly and skip the wasted rounds")
      return connectedComponentsStar(edges, src, dst)
    }
    labels
  }

  /** Large-star/small-star contraction (the public MapReduce
    * connected-components algorithm of Kiveris et al., "Connected
    * Components in MapReduce and Beyond", SoCC'14) — the
    * diameter-INDEPENDENT variant behind the same (id, component)
    * contract: converges in O(log² n) rounds on any graph shape, where
    * [[connectedComponents]]' min-label propagation needs
    * diameter-many rounds (right for near-clique dedup groups,
    * hopeless for chain-shaped dup graphs — transcription chains,
    * near-dup sequences — which need one round per hop).
    *
    * Per round, on the canonical hi>lo edge list:
    *  - LARGE-STAR: every vertex links its strictly-larger neighbors
    *    to its minimum neighbor-or-self — long tails fold toward small
    *    ids in parallel;
    *  - SMALL-STAR: every vertex links its smaller neighbors and
    *    itself to their minimum — stars flatten.
    * Fixpoint when the edge set stops changing; the surviving edges
    * are (member, component-min) stars. Scale shape per round: two
    * groupBy-min aggregations + joins keyed on vertex id, lineage cut
    * per round with eager localCheckpoints (same executor-loss trade
    * as [[connectedComponents]]).
    */
  def connectedComponentsStar(edges: DataFrame, src: String = "id_a",
      dst: String = "id_b", maxIter: Int = 50): DataFrame = {
    val vertices = edges.select(col(src).as("id"))
      .unionByName(edges.select(col(dst).as("id")))
      .distinct().localCheckpoint(true)
    var cur = edges
      .select(greatest(col(src), col(dst)).as("hi"), least(col(src), col(dst)).as("lo"))
      .where(col("hi") =!= col("lo")) // self-loops carry no connectivity
      .distinct().localCheckpoint(true)
    var iter = 0
    var converged = cur.isEmpty
    while (iter < maxIter && !converged) {
      // large-star: from each endpoint u, every neighbor v > u gains
      // the edge (v, min(neighbors(u) ∪ {u}))
      val sym = cur.select(col("hi").as("u"), col("lo").as("v"))
        .unionByName(cur.select(col("lo").as("u"), col("hi").as("v")))
      val lmins = sym.groupBy("u").agg(min(col("v")).as("mv"))
        .select(col("u"), least(col("u"), col("mv")).as("m"))
      // materialized: `large` feeds BOTH the smins aggregation and the
      // small-star join below — left lazy, the whole large-star stage
      // (two shuffles) would recompute from `cur` for each reference
      val large = sym.join(lmins, "u")
        .where(col("v") > col("u"))
        .select(col("v").as("hi"), col("m").as("lo")) // m <= u < v: canonical
        .distinct().localCheckpoint(true)
      // small-star: each hi links its (all-smaller) neighbors and
      // itself to their minimum
      val smins = large.groupBy("hi").agg(min(col("lo")).as("m"))
      val small = large.join(smins, "hi")
        .select(col("lo").as("x"), col("m"))
        .unionByName(smins.select(col("hi").as("x"), col("m")))
        .where(col("x") =!= col("m"))
        .select(col("x").as("hi"), col("m").as("lo"))
        .distinct().localCheckpoint(true)
      graft.Checkpoints.drop(large)
      // fixpoint = identical edge set (both sides are distinct)
      val changed = small.count() != cur.count() ||
        small.except(cur).limit(1).count() > 0
      graft.Checkpoints.drop(cur)
      cur = small
      converged = !changed
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponentsStar did not converge in $maxIter rounds " +
          "(theory bound is O(log² n) — check for pathological input)")
    val childMap = cur.select(col("hi").as("id"), col("lo").as("component"))
    vertices.join(childMap, Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("component"))
  }
}
