package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a near-duplicate pair list — the step that
  * turns pairwise similarity into an actual dedup decision: each cluster
  * keeps one canonical document (min id), the rest are the delete set.
  *
  * Algorithm: iterative min-label propagation — every vertex repeatedly
  * takes the minimum component label among itself and its neighbours until
  * no label changes. Converges in O(diameter) rounds; near-dup graphs are
  * unions of small cliques-ish clusters, so diameter is tiny. Each round is
  * one shuffle join + one map-side-combinable min aggregation; the driver
  * only ever sees a change COUNT (no data collect). Lineage is truncated
  * per round (Checkpoints.truncate — localCheckpoint by default, reliable
  * checkpoint under spark.graft.checkpoint.reliable) so plans don't grow
  * unboundedly. At
  * extreme scale the same loop is upgraded to the alternating
  * large-star/small-star formulation (Kiveris et al.), which bounds rounds
  * by O(log n) on adversarial graph shapes; the API is unchanged.
  */
object Components {
  /** (id, comp) for every vertex, where comp = min vertex id reachable via
    * `edges` (columns `a_id`, `b_id`). */
  def connectedComponents(edges: DataFrame, vertices: DataFrame, idCol: String): DataFrame = {
    // Materialize the edge list ONCE before the loop: every propagation round
    // runs 2+ actions (checkpoint + change count), and without this the whole
    // upstream lineage that produced `edges` (for near-dup graphs, an entire
    // pairwise-similarity join) would re-execute per action — measured 4 s →
    // ~1.5 s on q_dedup_clusters at sf0.1, and at 100 TB the difference
    // between one similarity join and O(rounds) of them.
    val sym = edges
      .select(col("a_id").as("src"), col("b_id").as("dst"))
      .unionByName(edges.select(col("b_id").as("src"), col("a_id").as("dst")))
      .transform(Checkpoints.truncate)
    def propagate(labels: DataFrame): DataFrame =
      sym
        .join(labels, sym("dst") === labels("id"))
        .select(col("src").as("id"), col("comp"))
        .unionByName(labels)
        .groupBy("id")
        .agg(min("comp").as("comp"))
    // Convergence check: labels only ever decrease (every vertex takes a min
    // including itself), so SUM(comp) strictly decreases iff any label
    // changed. One map-side-combinable aggregation per round replaces the
    // join+filter+count a naive change detector needs — at scale that is one
    // tiny all-to-one agg vs a full shuffle join of two label sets.
    // decimal(38,0) so the sum is exact at any vertex-count × id magnitude.
    // An EMPTY label set sums to NULL → normalize to 0 so the loop sees a
    // stationary signature and exits after one round (hit by incremental
    // merges whose delta touches no component at all).
    def labelSum(df: DataFrame): java.math.BigDecimal = {
      val d = df.agg(sum(col("comp").cast("decimal(38,0)"))).head().getDecimal(0)
      if (d == null) java.math.BigDecimal.ZERO else d
    }
    var labels = Checkpoints.truncate(vertices.select(col(idCol).as("id"), col(idCol).as("comp")))
    var prevSum = labelSum(labels)
    var changed = true
    while (changed) {
      // Two propagation hops per convergence check: labels only decrease, so
      // a two-step fixpoint is a one-step fixpoint, and the per-round fixed
      // cost (checkpoint + sum job) is paid half as often.
      val next = Checkpoints.truncate(propagate(propagate(labels)))
      val nextSum = labelSum(next)
      changed = nextSum.compareTo(prevSum) != 0
      prevSum = nextSum
      labels = next
    }
    labels
  }

  /** Incremental connected components — merge a DELTA edge batch (and any
    * new vertices) into PERSISTED component labels without recomputing the
    * full graph: what a daily dedup batch actually runs at 100 TB, where
    * yesterday's labels are a stored table and today's near-dup pairs are
    * a few orders of magnitude smaller.
    *
    * Key insight: stored labels (id → comp, comp = min reachable id) are a
    * complete connectivity summary — every member of a base component is
    * reachable from every other, so the base EDGES are never needed again.
    * The merge therefore runs CC on the COMP-LEVEL graph only:
    *   1. lift each delta edge endpoint to its current label (new vertices
    *      label themselves) — delta-sized join, the big label table is
    *      only probed on the delta's keys;
    *   2. solve CC on the lifted (compA, compB) edge list — a graph whose
    *      size is O(|delta|), independent of the base graph;
    *   3. remap: labels touched by the solve rewrite via a BROADCAST join
    *      (the relabel map is delta-sized); untouched labels pass through
    *      unchanged (coalesce ≡ anti-join pass-through, one map-side pass).
    * Because base comps are already min-ids, the comp-graph minimum IS the
    * global minimum — the result is identical to a full recompute, which
    * is exactly what the q_dedup_cc_incremental oracle checks.
    *
    * `baseLabels`: (id, comp) as produced by [[connectedComponents]];
    * `deltaEdges`: (a_id, b_id) new pairs (endpoints may be old or new);
    * `newVertices`: ids first seen in this batch (single column `idCol`). */
  def incrementalComponents(
      baseLabels: DataFrame,
      deltaEdges: DataFrame,
      newVertices: DataFrame,
      idCol: String): DataFrame = {
    val labels0 = baseLabels
      .select(col("id"), col("comp"))
      .unionByName(newVertices.select(col(idCol).as("id"), col(idCol).as("comp")))
      .transform(Checkpoints.truncate)
    val la = labels0.select(col("id").as("ida"), col("comp").as("ca"))
    val lb = labels0.select(col("id").as("idb"), col("comp").as("cb"))
    val compEdges = deltaEdges
      .join(la, col("a_id") === col("ida"))
      .join(lb, col("b_id") === col("idb"))
      .select(col("ca").as("a_id"), col("cb").as("b_id"))
      .filter(col("a_id") =!= col("b_id"))
      .distinct()
    val compVerts = compEdges
      .select(col("a_id").as("v"))
      .unionByName(compEdges.select(col("b_id").as("v")))
      .distinct()
    val relabel = connectedComponents(compEdges, compVerts, "v")
      .select(col("id").as("comp"), col("comp").as("new_comp"))
    labels0
      .join(broadcast(relabel), Seq("comp"), "left")
      .select(col("id"), coalesce(col("new_comp"), col("comp")).as("comp"))
  }

  /** Same contract as [[connectedComponents]] via alternating
    * large-star/small-star contraction (Kiveris et al., "Connected
    * Components in MapReduce and Beyond") — O(log n) rounds on ANY graph
    * shape, vs O(diameter) for label propagation. The production choice for
    * adversarial diameters (chains of pairwise-similar near-dup docs).
    *
    * One round = two self-contained groupBy passes over the edge list:
    *   large-star: per node u, link every LARGER neighbor to
    *     m = min(N(u) ∪ {u});  small-star: link every not-larger neighbor
    *     (and u itself) to m. Each is one map-side-combinable min per node
    *     plus a regrouped emit — no join against a label table at all.
    * Convergence: the edge multiset's SUM(dst) is strictly decreasing until
    * the fixpoint (dst only ever moves to a smaller min), so the same
    * one-agg check as the label loop applies. At the fixpoint every edge is
    * (member → component-min), which IS the label assignment.
    */
  def connectedComponentsStar(edges: DataFrame, vertices: DataFrame, idCol: String): DataFrame = {
    // One star pass (the paper's formulation, grouped by u over the
    // symmetrized edge list): m(u) = min(N(u) ∪ {u});
    //   large-star emits (v, m(u)) for neighbors v > u,
    //   small-star emits (v, m(u)) for neighbors v <= u plus (u, m(u)).
    // No per-node neighbor-set materialization: m(u) is a
    // map-side-combinable min, joined back to the neighbor list — both
    // sides shuffle on u, so the join is co-partitioned with the agg.
    def star(e: DataFrame, large: Boolean): DataFrame = {
      val nbrs = e
        .select(col("src").as("u"), col("dst").as("v"))
        .unionByName(e.select(col("dst").as("u"), col("src").as("v")))
      val mins = nbrs
        .groupBy("u")
        .agg(min(col("v")).as("mv"))
        .select(col("u"), least(col("mv"), col("u")).as("m"))
      val emitted = nbrs
        .join(mins, "u")
        .filter(if (large) col("v") > col("u") else col("v") <= col("u"))
        .select(col("v").as("src"), col("m").as("dst"))
      val base = if (large) emitted else emitted.unionByName(mins.select(col("u").as("src"), col("m").as("dst")))
      base.filter(col("src") =!= col("dst")).distinct()
    }
    // Convergence: stop when the edge SET repeats. The production per-round
    // check is a single map-side-combinable aggregation — (count, sum(src),
    // sum(dst)) with decimal(38,0) exact sums — because dst values only ever
    // move toward component minima, so the signature is stationary only at
    // (or vanishingly near) the fixpoint. A naive set-equality detector
    // costs a full exceptAll shuffle join PER ROUND; the signature costs one
    // tiny all-to-one agg. Soundness is kept absolute by running exceptAll
    // only when the signature matches the previous round's — typically once,
    // at the true fixpoint; a pre-fixpoint signature collision (never
    // observed, but not impossible) would re-trigger it and the loop
    // continues. So the expensive check is paid ~once per run, not once per
    // round; ComponentsSpec additionally asserts full equality with the
    // label-propagation twin.
    def signature(df: DataFrame): (Long, java.math.BigDecimal, java.math.BigDecimal) = {
      val r = df.agg(
        count(lit(1)),
        sum(col("src").cast("decimal(38,0)")),
        sum(col("dst").cast("decimal(38,0)"))).head()
      (r.getLong(0), r.getDecimal(1), r.getDecimal(2))
    }
    def sigEq(a: (Long, java.math.BigDecimal, java.math.BigDecimal),
              b: (Long, java.math.BigDecimal, java.math.BigDecimal)): Boolean =
      a._1 == b._1 &&
        (a._1 == 0 || (a._2.compareTo(b._2) == 0 && a._3.compareTo(b._3) == 0))
    var cur = edges
      .select(col("a_id").as("src"), col("b_id").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .transform(Checkpoints.truncate)
    var curSig = signature(cur)
    var changed = true
    while (changed) {
      val next = Checkpoints.truncate(star(star(cur, large = true), large = false))
      val nextSig = signature(next)
      changed = !sigEq(nextSig, curSig) || next.exceptAll(cur).count() > 0
      cur = next
      curSig = nextSig
    }
    // Fixpoint edges are (member → component-min); vertices in no edge are
    // their own component.
    val labeled = cur
      .select(col("src").as("id"), col("dst").as("comp"))
      .groupBy("id")
      .agg(min("comp").as("comp"))
    vertices
      .select(col(idCol).as("id"))
      .join(labeled, Seq("id"), "left")
      .select(col("id"), coalesce(col("comp"), col("id")).as("comp"))
  }
}
