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
  * All checkpoints are LAZY (`localCheckpoint(false)`): on the common
  * star/clique graph the whole call is materialized by the round-1
  * convergence probe — one traversal of the upstream pair pipeline, not
  * three separate eager jobs (sym, init, round — the r07 shape).
  *
  * Adversarial long-path graphs (diameter > `maxIter`): instead of
  * propagating O(diameter) rounds, escalate to the alternating
  * large-star/small-star rounds of Kiveris et al., "Connected Components
  * in MapReduce and Beyond" (SOCC 2014) — the same join+aggregate
  * building blocks, but each round HALVES component height, so the
  * fixpoint lands in O(log² n) rounds regardless of diameter. The
  * escalation is seeded with the labels propagation already earned
  * (label edges are shortcuts — they only ever merge-forward), so no
  * work is thrown away. Lineage is cut every round with `localCheckpoint`
  * — an iterated self-referential plan otherwise grows exponentially and
  * stalls the planner long before the executors break a sweat.
  *
  * Input: edges (i, j) — undirected, need not be deduplicated or
  * symmetric. Output: (node, cluster) — every node that appears in some
  * edge, labeled with its component's minimum node id. Deterministic.
  */
object Graph {

  def connectedComponents(edges: DataFrame, maxIter: Int = 25): DataFrame = {
    // symmetrized adjacency, checkpointed (lazily) — every round re-reads
    // it, and upstream may be an expensive verify pipeline; the first
    // convergence probe is the action that materializes it
    val sym = edges.select(col("i").cast("long").as("a"), col("j").cast("long").as("b"))
      .union(edges.select(col("j").cast("long").as("a"), col("i").cast("long").as("b")))
      .distinct()
      .localCheckpoint(false)

    // round 0 folded into initialization: label(a) = min(a, neighbors(a)).
    // The same single shuffle the plain `distinct` init would pay, but a
    // star/clique cluster (the near-dup norm) already converges here —
    // the loop then only runs its one confirming round instead of two.
    var labels = sym.groupBy(col("a"))
      .agg(least(col("a"), min(col("b"))).as("cluster"))
      .select(col("a").as("node"), col("cluster"))
      .localCheckpoint(false)

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
    if (converged) labels
    else twoPhase(sym.unionByName(
      labels.select(col("node").as("a"), col("cluster").as("b"))))
  }

  /** Kiveris et al. (SOCC 2014) alternating large-star/small-star rounds —
    * the diameter-proof fallback. Works on an edge set, not labels:
    *
    *   large-star(u): m = min(Γ(u) ∪ {u}); emit (v, m) for v ∈ Γ(u), v > u
    *   small-star(u): over edges oriented (u, v), v < u:
    *                  m = min(Γ(u) ∪ {u}); emit (v, m) for v ∈ Γ(u) ∪ {u}, v ≠ m
    *
    * Both preserve connectivity (every emitted edge stays inside u's
    * component; every node keeps a path to m) and monotonically hang
    * nodes under smaller ids; the fixpoint is a forest of stars centered
    * at each component's minimum, reached in O(log² n) rounds for ANY
    * topology. Each star op is one groupBy min + one broadcast-joinable
    * per-node min attach — the same primitives as propagation rounds, so
    * the 100 TB posture (map-side-combinable aggregates, no driver graph
    * state) carries over unchanged.
    *
    * Fixpoint detection is EXACT set equality on the canonicalized edge
    * set (|new| = |old| plus an empty `new EXCEPT old` probe — both sides
    * are distinct by construction), not a hash-sum heuristic: the
    * escalation path is rare, so two extra tiny jobs per round are the
    * right price for a sound stop condition.
    *
    * Input edges need not be symmetric or deduplicated; self-loops carry
    * no connectivity but their nodes still get (singleton) labels, so the
    * (node, cluster) contract of [[connectedComponents]] — every node
    * appearing in some edge is labeled — holds verbatim. The iteration cap
    * is a safety net far above the O(log² n) bound (n ≤ 2⁶³ ⇒ ~40
    * alternations in theory, single digits in practice). */
  private[graft] def twoPhase(edges: DataFrame, maxRounds: Int = 64): DataFrame = {
    // canonical orientation (small, large), deduped — the small-star input
    // shape, and the representation we test fixpoint on
    def canon(e: DataFrame): DataFrame =
      e.filter(col("a") =!= col("b"))
        .select(least(col("a"), col("b")).as("a"), greatest(col("a"), col("b")).as("b"))
        .distinct()

    val cast = edges.select(col("a").cast("long").as("a"), col("b").cast("long").as("b"))
    // every input endpoint — the star fixpoint loses nodes whose every
    // edge is a self-loop (no connectivity ⇒ no star edge), and they must
    // come back as their own singleton cluster
    val allNodes = cast.select(col("a").as("node"))
      .union(cast.select(col("b").as("node")))
      .distinct()

    // attach per-group min m = min(all of u's rows ∪ {u}) with one
    // map-side-combinable aggregate + an equi-join back on u (AQE turns
    // the tiny per-node min side into a broadcast at test scale; at 100 TB
    // both sides hash-partition on u — still one shuffle each)
    def withMin(adj: DataFrame): DataFrame = {
      val m = adj.groupBy("u").agg(min(col("v")).as("mv"))
        .select(col("u"), least(col("u"), col("mv")).as("m"))
      adj.join(m, "u")
    }

    var e = canon(cast).localCheckpoint(false)
    var n = e.count()
    var done = n == 0L
    var round = 0
    while (!done && round < maxRounds) {
      // large-star over the symmetrized adjacency
      val adjL = e.select(col("a").as("u"), col("b").as("v"))
        .union(e.select(col("b").as("u"), col("a").as("v")))
      val large = withMin(adjL)
        .filter(col("v") > col("u"))
        .select(col("v").as("a"), col("m").as("b"))
      // small-star over edges grouped by their LARGER endpoint; emits the
      // center edge (u, m) too, which keeps u attached
      val adjS = canon(large).select(col("b").as("u"), col("a").as("v"))
      val small = withMin(adjS)
      val next = canon(
        small.filter(col("v") =!= col("m")).select(col("v").as("a"), col("m").as("b"))
          .union(small.filter(col("u") =!= col("m")).select(col("u").as("a"), col("m").as("b"))))
        .localCheckpoint(false)
      val nNext = next.count()
      done = nNext == n && next.except(e).limit(1).count() == 0L
      e = next
      n = nNext
      round += 1
    }
    require(done, s"twoPhase did not converge in $maxRounds alternations — " +
      "this exceeds the proven O(log² n) bound and indicates a bug, not a hard graph")
    // fixpoint = stars (center = component min): label every endpoint with
    // the min it sees; centers label themselves; self-loop-only nodes
    // (absent from the star edges) come back as singletons
    val starLabels = e.select(col("a"), col("b"))
      .union(e.select(col("b"), col("a")))
      .groupBy(col("a"))
      .agg(least(col("a"), min(col("b"))).as("cluster"))
      .select(col("a").as("node"), col("cluster"))
    allNodes.join(starLabels, Seq("node"), "left")
      .select(col("node"), coalesce(col("cluster"), col("node")).as("cluster"))
  }
}
