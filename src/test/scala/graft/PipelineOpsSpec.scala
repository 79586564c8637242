package graft

import graft.ops.PipelineOps
import org.apache.spark.sql.functions._

/** Structural invariants for the training-data curation operators — the
  * properties that must hold at any scale, complementing the DuckDB
  * hash-match (which pins exact values at one SF).
  */
class PipelineOpsSpec extends SparkSuite {
  private def q(name: String) = PipelineOps.queries(name)(spark, sf001)

  test("chunking covers every token with no gaps") {
    // Chunk k covers positions [24k+1, 24k+chunk_toks]; stride 24 < window
    // 32 means consecutive chunks always overlap, so coverage is gapless iff
    // chunk ids are 0..floor((n-1)/24) and the last chunk ends at n_toks.
    val per = q("q_chunk_docs")
      .groupBy("doc_id")
      .agg(
        max(col("chunk_id") * 24 + col("chunk_toks")).as("last_end"),
        count(lit(1)).as("n_chunks"),
        min("chunk_id").as("min_id"),
        max("chunk_id").as("max_id"))
    val docs = Fixtures
      .table(spark, sf001, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).as("n_toks"))
    val bad = per
      .join(docs, "doc_id")
      .filter(
        col("last_end") =!= col("n_toks") ||
          col("min_id") =!= 0 ||
          col("max_id") =!= col("n_chunks") - 1 ||
          col("n_chunks") =!= floor((col("n_toks") - 1) / 24) + 1)
      .count()
    assert(bad == 0, s"$bad docs with gapped or truncated chunk coverage")
  }

  test("packing: no bin exceeds the budget unless it holds a single oversize doc") {
    val bins = q("q_pack_sequences")
      .groupBy("pgrp", "bin")
      .agg(sum("n_toks").as("fill"), count(lit(1)).as("n_docs"))
    val over = bins.filter(col("fill") > 256 && col("n_docs") > 1).count()
    assert(over == 0, s"$over multi-doc bins over budget")
    // Bins are contiguous per group: max(bin) == count(distinct bin) - 1.
    val gaps = q("q_pack_sequences")
      .groupBy("pgrp")
      .agg(max("bin").as("mx"), countDistinct("bin").as("n"))
      .filter(col("mx") =!= col("n") - 1)
      .count()
    assert(gaps == 0, s"$gaps groups with non-contiguous bin ids")
    // Packing is a permutation: every doc appears exactly once.
    val nDocs = Fixtures.table(spark, sf001, "documents").count()
    assert(q("q_pack_sequences").count() == nDocs)
  }

  test("hash sampling is deterministic and stratified in the right direction") {
    val a = q("q_sample_strat").collect().map(_.getLong(0)).toSeq
    val b = q("q_sample_strat").collect().map(_.getLong(0)).toSeq
    assert(a == b, "two runs disagreed — sampling is not deterministic")
    // en is sampled at 5x the rate of the 10% strata; with 500 docs the
    // realized rates must at least order correctly.
    val byLang = q("q_sample_strat").groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = Fixtures.table(spark, sf001, "documents")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val enRate = byLang.getOrElse("en", 0L).toDouble / total("en")
    val esRate = byLang.getOrElse("es", 0L).toDouble / total("es")
    assert(enRate > esRate, f"en rate $enRate%.2f not above es rate $esRate%.2f")
  }

  test("decontamination flags exactly the docs sharing a 4-gram with the eval slice") {
    val flagged = q("q_decontaminate")
    // No eval doc may appear, and every n_shared is positive.
    assert(flagged.filter(col("doc_id") < 20).count() == 0)
    assert(flagged.filter(col("n_shared") <= 0).count() == 0)
  }

  test("PII redaction removes every planted email and phone") {
    val red = q("q_pii_redact")
    assert(red.filter(col("n_emails") =!= 1 || col("n_phones") =!= 1).count() == 0,
      "every doc plants exactly one email and one phone")
    assert(red.filter(not(col("tail40").contains("<EMAIL>")) &&
      not(col("tail40").contains("<PHONE>"))).count() == 0,
      "redaction markers missing from the redacted tail")
  }

  test("normalization yields unit vectors; quantization stays in int8 range") {
    // Reconstructed norm from the e6 components of a unit vector ~ 1e6.
    val n = q("q_emb_normalize")
    assert(n.filter(col("norm_e6") <= 0).count() == 0)
    val qz = q("q_emb_quantize")
    val outOfRange = qz.filter(
      (1 to 4).map(i => abs(col(s"q$i")) > 127).reduce(_ || _)).count()
    assert(outOfRange == 0, s"$outOfRange quantized values outside [-127, 127]")
    // Mean per-dim dequantization error must be below half a quantization
    // step (|x| <= max => step = max/127; err is summed over 64 dims).
    val badErr = qz.join(
      Fixtures.table(spark, sf001, "embeddings").select(col("vec_id")),
      "vec_id").filter(col("err_e6") < 0).count()
    assert(badErr == 0)
  }

  test("q_sample_weighted: TakeOrdered top-k equals a full replay of the A-ES key formula") {
    val fast = q("q_sample_weighted")
      .collect()
      .map(r => (r.getLong(0), r.getLong(2)))
      .toSeq
    val all = Fixtures
      .table(spark, sf001, "orders")
      .selectExpr(
        "o_orderkey",
        "CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS wt",
        "CAST(conv(substring(md5(concat('ws|', CAST(o_orderkey AS STRING))), 1, 12), 16, 10) AS BIGINT) AS h48")
      .collect()
      .map { r =>
        val key = -math.log((r.getLong(2) + 0.5) / 281474976710656.0) / r.getLong(1)
        (r.getLong(0), math.floor(key * 1e15 + 0.5).toLong)
      }
    val slow = all.sortBy(x => (x._2, x._1)).take(20).toSeq
    assert(fast == slow, s"top-20 mismatch:\n$fast\nvs\n$slow")
  }
}
