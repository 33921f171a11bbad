package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an undirected edge list — the
  * final stage of every near-dup dedup pipeline: pair evidence (l4/l5/l8
  * candidates that survived verification) → clusters → one canonical doc
  * kept per cluster. The reference has no graph stage at all (its dedup is
  * `drop_duplicates`, codes.py:60); this is part of the §7.4 scale surface.
  *
  * Algorithm: iterative min-label propagation. Every node starts labeled
  * with itself; each round a node takes the minimum label among itself and
  * its neighbors; fixpoint = components labeled by their minimum member.
  * Each round is one shuffle join + one map-side-combinable min aggregate —
  * no driver-side graph state, nothing collected. Convergence is detected
  * with a `limit(1).count()` probe on the changed-label set, so the
  * fixpoint check is an early-exit lookup, not a full count.
  *
  * Scale posture (100 TB): propagation converges in O(diameter) rounds.
  * Near-dup graphs are overwhelmingly tiny star/clique clusters (a doc and
  * its copies), so diameter is small — single digits — and min-propagation
  * is the right trade: each round is cheap and skew-free (the min-aggregate
  * combines map-side; a hot node's messages collapse before the shuffle).
  * For adversarial long-path graphs, switch to the large-star/small-star
  * rounds of Kiveris et al., "Connected Components in MapReduce and Beyond"
  * (SOCC 2014) — same join+aggregate building blocks, O(log² n) rounds; the
  * `maxIter` cap below is where that escalation would hook in. Lineage is
  * cut every round with `localCheckpoint` — an iterated self-referential
  * plan otherwise grows exponentially and stalls the planner long before
  * the executors break a sweat.
  *
  * Input: edges (i, j) — undirected, need not be deduplicated or
  * symmetric. Output: (node, cluster) — every node that appears in some
  * edge, labeled with its component's minimum node id. Deterministic.
  */
object Graph {

  def connectedComponents(edges: DataFrame, maxIter: Int = 25): DataFrame = {
    // materialize the (symmetrized) adjacency once — every round re-reads
    // it, and upstream may be an expensive verify pipeline
    val sym = edges.select(col("i").cast("long").as("a"), col("j").cast("long").as("b"))
      .union(edges.select(col("j").cast("long").as("a"), col("i").cast("long").as("b")))
      .distinct()
      .localCheckpoint(true)

    // round 0 folded into initialization: label(a) = min(a, neighbors(a)).
    // The same single shuffle the plain `distinct` init would pay, but a
    // star/clique cluster (the near-dup norm) already converges here —
    // the loop then only runs its one confirming round instead of two.
    var labels = sym.groupBy(col("a"))
      .agg(least(col("a"), min(col("b"))).as("cluster"))
      .select(col("a").as("node"), col("cluster"))
      .localCheckpoint(true)

    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      // neighbor messages: b's current label arrives at a. Self rows ride
      // along tagged, so ONE groupBy yields both the new label and the
      // previous one (each node has exactly one self row) — the fixpoint
      // test needs no second join, and the whole round is a single
      // shuffle. The checkpoint is lazy: the convergence probe right
      // below is the action that materializes it.
      val msgs = sym.join(labels.withColumnRenamed("node", "b2"),
          col("b") === col("b2"))
        .select(col("a").as("node"), col("cluster"), lit(0).as("self"))
      val next = labels.withColumn("self", lit(1)).unionByName(msgs)
        .groupBy("node")
        .agg(min("cluster").as("cluster"),
          max(when(col("self") === 1, col("cluster"))).as("prev"))
        .localCheckpoint(false)
      converged = next.filter(col("cluster") =!= col("prev"))
        .limit(1).count() == 0L
      labels = next.select(col("node"), col("cluster"))
      it += 1
    }
    require(converged, s"connectedComponents did not converge in $maxIter rounds — " +
      "graph diameter exceeds the propagation budget; escalate to " +
      "large-star/small-star rounds")
    labels
  }
}
