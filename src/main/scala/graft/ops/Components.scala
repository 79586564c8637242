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
  * with localCheckpoint per round so plans don't grow unboundedly. At
  * extreme scale the same loop is upgraded to the alternating
  * large-star/small-star formulation (Kiveris et al.), which bounds rounds
  * by O(log n) on adversarial graph shapes; the API is unchanged.
  */
object Components {
  /** (id, comp) for every vertex, where comp = min vertex id reachable via
    * `edges` (columns `a_id`, `b_id`). */
  def connectedComponents(edges: DataFrame, vertices: DataFrame, idCol: String): DataFrame = {
    val sym = edges
      .select(col("a_id").as("src"), col("b_id").as("dst"))
      .unionByName(edges.select(col("b_id").as("src"), col("a_id").as("dst")))
    def propagate(labels: DataFrame): DataFrame =
      sym
        .join(labels, sym("dst") === labels("id"))
        .select(col("src").as("id"), col("comp"))
        .unionByName(labels)
        .groupBy("id")
        .agg(min("comp").as("comp"))
    var labels = vertices.select(col(idCol).as("id"), col(idCol).as("comp")).localCheckpoint()
    var changed = 1L
    while (changed > 0) {
      // Two propagation hops per convergence check: labels only decrease, so
      // a two-step fixpoint is a one-step fixpoint, and the per-round fixed
      // cost (checkpoint + count job) is paid half as often.
      val next = propagate(propagate(labels)).localCheckpoint()
      changed = next
        .join(labels.withColumnRenamed("comp", "prev"), "id")
        .filter(col("comp") =!= col("prev"))
        .count()
      labels = next
    }
    labels
  }
}
