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
}
