package graft

import graft.ops.Components
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Both connected-components formulations must produce identical labels on
  * every graph shape; the star variant exists because label propagation is
  * O(diameter) rounds — a path graph is its worst case and the star
  * algorithm's O(log n) showcase.
  */
class ComponentsSpec extends SparkSuite {
  import spark.implicits._

  private def labelsOf(df: DataFrame): Map[Long, Long] =
    df.select(col("id").cast("long"), col("comp").cast("long"))
      .as[(Long, Long)].collect().toMap

  private def check(edges: Seq[(Long, Long)], vertIds: Seq[Long]): Unit = {
    val e = edges.toDF("a_id", "b_id")
    val v = vertIds.toDF("vid")
    val a = labelsOf(Components.connectedComponents(e, v, "vid"))
    val b = labelsOf(Components.connectedComponentsStar(e, v, "vid"))
    assert(a == b, s"label-prop vs star disagree:\n  prop: $a\n  star: $b")
  }

  test("star CC equals label propagation on a path graph (propagation's worst case)") {
    val n = 40L
    check((0L until n - 1).map(i => (i, i + 1)), 0L until n)
  }

  test("star CC equals label propagation on cliques + isolated vertices") {
    val clique1 = for (i <- 0L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val clique2 = for (i <- 10L to 13L; j <- (i + 1) to 13L) yield (i, j)
    val bridge = Seq((4L, 10L)) // merge the cliques through one edge
    check(clique1 ++ clique2 ++ bridge, (0L to 20L))
  }

  test("star CC equals label propagation on a random graph") {
    val rnd = new scala.util.Random(7)
    val verts = 0L until 60L
    val edges = Seq.fill(50)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong)).filter(p => p._1 != p._2)
    check(edges, verts)
  }

  /** incrementalComponents(base + delta) must equal a full recompute on
    * the union — for every structural case a daily batch hits. */
  private def checkIncremental(
      baseEdges: Seq[(Long, Long)],
      baseVerts: Seq[Long],
      deltaEdges: Seq[(Long, Long)],
      newVerts: Seq[Long]): Unit = {
    val base = Components.connectedComponents(baseEdges.toDF("a_id", "b_id"), baseVerts.toDF("vid"), "vid")
    val merged = labelsOf(
      Components.incrementalComponents(base, deltaEdges.toDF("a_id", "b_id"), newVerts.toDF("vid"), "vid"))
    val full = labelsOf(
      Components.connectedComponents(
        (baseEdges ++ deltaEdges).toDF("a_id", "b_id"),
        (baseVerts ++ newVerts).toDF("vid"),
        "vid"))
    assert(merged == full, s"incremental merge vs full recompute disagree:\n  inc:  $merged\n  full: $full")
  }

  test("incremental CC: delta bridges two OLD components (relabel cascades through comp graph)") {
    checkIncremental(
      baseEdges = Seq((0L, 1L), (1L, 2L), (10L, 11L)),
      baseVerts = Seq(0L, 1L, 2L, 10L, 11L, 20L),
      deltaEdges = Seq((2L, 10L)), // merges comp 0 and comp 10 with no new vertex at all
      newVerts = Seq.empty)
  }

  test("incremental CC: new vertices attach to old components, chain through each other, and stay isolated") {
    checkIncremental(
      baseEdges = Seq((0L, 1L), (5L, 6L)),
      baseVerts = Seq(0L, 1L, 5L, 6L, 7L),
      // 30 joins comp 0; 31-32 form a new chain that ALSO bridges comps 0
      // and 5 (new-vertex path merging two old components); 33 isolated.
      deltaEdges = Seq((1L, 30L), (0L, 31L), (31L, 32L), (32L, 5L)),
      newVerts = Seq(30L, 31L, 32L, 33L))
  }

  test("incremental CC: random base/delta split equals full recompute") {
    val rnd = new scala.util.Random(13)
    val baseVerts = 0L until 40L
    val newVerts = 40L until 55L
    val baseEdges = Seq.fill(30)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong)).filter(p => p._1 != p._2)
    val deltaEdges = Seq
      .fill(20)((rnd.nextInt(55).toLong, (40 + rnd.nextInt(15)).toLong))
      .filter(p => p._1 != p._2)
    checkIncremental(baseEdges, baseVerts, deltaEdges, newVerts)
  }

  test("incremental CC: empty delta is a no-op on the labels") {
    val baseEdges = Seq((0L, 1L), (2L, 3L))
    val baseVerts = Seq(0L, 1L, 2L, 3L, 4L)
    checkIncremental(baseEdges, baseVerts, Seq.empty, Seq(9L))
  }
}
