package graft

import graft.ops.{Checkpoints, Graph}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unit tests for the librarified graph kernels (ops/Graph.scala) on
  * synthetic graphs with hand-computable answers — the fixture-bound
  * q_graph_* rows stay oracle-checked; these prove the kernels on
  * arbitrary edge frames plus the determinism and memoization contracts.
  */
class GraphSpec extends SparkSuite {
  import spark.implicits._

  private def edges(pairs: (Long, Long)*): DataFrame = pairs.toDF("a", "b")

  private def countsOf(df: DataFrame): (Long, Long) = {
    val r = df.collect().head
    (r.getAs[Long]("n_edges"), r.getAs[Long]("n_triangles"))
  }

  test("triangles: hand-countable graphs") {
    // one triangle plus a pendant edge
    assert(countsOf(Graph.triangles(edges((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)))) == (4L, 1L))
    // K4 has C(4,3) = 4 triangles
    val k4 = for { a <- 1L to 4L; b <- (a + 1) to 4L } yield (a, b)
    assert(countsOf(Graph.triangles(edges(k4: _*))) == (6L, 4L))
    // a path has none
    assert(countsOf(Graph.triangles(edges((1L, 2L), (2L, 3L), (3L, 4L)))) == (3L, 0L))
  }

  test("pagerank: star center dominates, ranks are partitioning-invariant longs") {
    val star = edges((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L))
    val ranks = Graph.pagerank(star, 5).as[(Long, Long)].collect().toMap
    assert(ranks.size == 5)
    assert(ranks(0L) > ranks(1L), s"star center should outrank leaves: $ranks")
    assert(Seq(1L, 2L, 3L, 4L).map(ranks).distinct.size == 1, "leaves must tie exactly")
    // integer fixed-point ⇒ bit-identical under a different partitioning
    val ranks13 = Graph.pagerank(star.repartition(13), 5).as[(Long, Long)].collect().toMap
    assert(ranks13 == ranks, "ranks changed under repartitioning")
    // one unit of rank mass (e12-scaled) spreads over the graph; integer
    // truncation only ever LOSES sub-unit remainders
    val total = ranks.values.sum
    assert(total <= 1000000000000L && total > 1000000000000L - 1000000L,
      s"rank mass off: $total")
  }

  test("degreeDistribution and commonNeighbors on hand-checkable graphs") {
    // path 1-2-3-4: two endpoints of degree 1, two middles of degree 2
    val path = edges((1L, 2L), (2L, 3L), (3L, 4L))
    val dist = Graph
      .degreeDistribution(path)
      .as[(Long, Long)]
      .collect()
      .toMap
    assert(dist == Map(1L -> 2L, 2L -> 2L), s"path degree dist wrong: $dist")
    // common neighbors on the path: (1,3) share 2, (2,4) share 3; (1,4)
    // share nothing; existing edges are excluded
    val cn = Graph
      .commonNeighbors(path)
      .select("a", "b", "cn")
      .as[(Long, Long, Long)]
      .collect()
      .map(r => (r._1, r._2) -> r._3)
      .toMap
    assert(cn == Map((1L, 3L) -> 1L, (2L, 4L) -> 1L), s"path common neighbors wrong: $cn")
    // hub cap: a star's center exceeds the cap, so no wedges survive
    val star = edges((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L))
    assert(Graph.commonNeighbors(star, maxDegree = Some(3L)).count() == 0L,
      "capped hub still produced wedges")
    val uncapped = Graph.commonNeighbors(star).count()
    assert(uncapped == 6L, s"star should yield C(4,2)=6 leaf pairs, got $uncapped")
  }

  test("coPurchaseEdges memoizes per (session, sfDir); truncate is idempotent") {
    val w1 = Graph.coPurchaseEdgesWeighted(spark, sf001)
    val w2 = Graph.coPurchaseEdgesWeighted(spark, sf001)
    assert(w1 eq w2, "memo returned a rebuilt weighted frame for the same (session, dir)")
    // the truncated memo AND its bare column-projection view both pass
    // through truncate untouched, so the kernels' defensive truncation
    // cannot re-materialize the memo
    assert(Checkpoints.truncate(w1) eq w1, "truncate re-materialized the truncated memo")
    val view = Graph.coPurchaseEdges(spark, sf001)
    assert(Checkpoints.truncate(view) eq view,
      "truncate re-materialized a projection of the truncated memo")
  }
}
