package graft

import graft.ops.SimKernel
import org.apache.spark.sql.functions._

/** Native codegen'd CosineSimilarity expression: bit-exact parity with the
  * Scala kernel (and therefore with the DuckDB oracle fold), plus the
  * spark.sql surface via graft_cosine registration.
  */
class CosineExprSpec extends SparkSuite {
  import spark.implicits._

  test("expression output is bit-identical to SimKernel.cos") {
    val local = Fixtures
      .table(spark, sf001, "embeddings")
      .limit(50)
      .as[(Long, Seq[Float], Int)]
      .collect()
      .map(t => t._1 -> t._2)
      .toMap
    val df = Fixtures.table(spark, sf001, "embeddings").limit(50)
    val a = df.select(col("vec_id").as("ai"), col("embedding").as("ae"))
    val b = df.select(col("vec_id").as("bi"), col("embedding").as("be"))
    val rows = a
      .crossJoin(b)
      .select(col("ai"), col("bi"), SimKernel.cosine(col("ae"), col("be")).as("c"))
      .collect()
    assert(rows.length == 2500)
    rows.foreach { r =>
      val expect = SimKernel.cos(local(r.getLong(0)), local(r.getLong(1)))
      assert(r.getDouble(2) == expect,
        s"codegen kernel diverges for (${r.getLong(0)}, ${r.getLong(1)})")
    }
  }

  test("graft_cosine is callable from spark.sql") {
    SimKernel.register(spark)
    Fixtures.table(spark, sf001, "embeddings").limit(5).createOrReplaceTempView("emb5")
    val out = spark
      .sql("SELECT a.vec_id, b.vec_id, graft_cosine(a.embedding, b.embedding) AS c FROM emb5 a CROSS JOIN emb5 b")
      .collect()
    assert(out.length == 25)
    assert(out.forall(r => math.abs(r.getDouble(2)) <= 1.0 + 1e-12))
  }
}
