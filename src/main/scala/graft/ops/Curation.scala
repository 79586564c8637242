package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reusable training-data curation API over arbitrary DataFrames — the
  * library surface behind the `q_chunk_docs` / `q_pack_sequences` /
  * `q_sample_strat` / `q_decontaminate` / `q_pii_redact` /
  * `q_dedup_incremental` family (each query in PipelineOps is a thin
  * fixture binding of one of these).
  *
  * Every operator is deterministic under any partitioning: sampling and
  * dedup key off pure functions of row values, packing folds a sorted
  * per-group list, and no rand()/monotonically_increasing_id appears
  * anywhere. Scale notes per method.
  */
object Curation {
  /** Fixed-size token-window chunking with overlap: window `window` tokens,
    * stride `stride` (< window ⇒ gapless coverage). Map-only — the explode
    * runs over the cheap int start sequence, never over a computed token
    * array (which would re-evaluate per element). Output: (idCol, chunk_id,
    * chunk_text, chunk_toks). */
  def chunk(docs: DataFrame, idCol: String, textCol: String, window: Int, stride: Int): DataFrame = {
    require(stride >= 1 && window >= stride, s"need 1 <= stride <= window, got $window/$stride")
    docs
      .select(col(idCol), split(col(textCol), " ").as("toks"))
      .select(
        col(idCol),
        col("toks"),
        explode(sequence(lit(1), greatest(size(col("toks")), lit(1)), lit(stride))).as("start"))
      .select(
        col(idCol),
        ((col("start") - 1) / stride).cast("int").as("chunk_id"),
        array_join(slice(col("toks"), col("start"), lit(window)), " ").as("chunk_text"),
        size(slice(col("toks"), col("start"), lit(window))).as("chunk_toks"))
  }

  /** Greedy first-fit packing of whole docs into `budget`-token bins,
    * sharded into `groups` independent groups by `idCol % groups` — packing
    * is sequential WITHIN a group (bin state carries across items) and
    * parallel ACROSS groups, exactly how production packers shard: one
    * group per worker, group count scales with the cluster. A doc opens a
    * new bin iff it does not fit; an over-budget doc sits in a bin alone.
    * Output: (idCol, pgrp, bin, n_toks), items packed in ascending id. */
  def packSequences(docs: DataFrame, idCol: String, textCol: String, groups: Int, budget: Int): DataFrame = {
    // getAs[Number]: the id column may be any integral type (int ids are
    // common); output ids normalize to long.
    val fold = udf { items: Seq[org.apache.spark.sql.Row] =>
      var bin = 0
      var fill = 0
      var first = true
      items.map { r =>
        val id = r.getAs[Number](0).longValue()
        val n = r.getAs[Number](1).intValue()
        if (first) { first = false; fill = n }
        else if (fill + n > budget) { bin += 1; fill = n }
        else fill += n
        (id, bin, n)
      }
    }
    docs
      .select(
        col(idCol),
        pmod(col(idCol), lit(groups)).cast("int").as("pgrp"), // sign-safe for negative ids
        size(split(col(textCol), " ")).as("n"))
      .groupBy("pgrp")
      .agg(sort_array(collect_list(struct(col(idCol), col("n")))).as("items"))
      .select(col("pgrp"), explode(fold(col("items"))).as("it"))
      .select(
        col("it._1").as(idCol),
        col("pgrp"),
        col("it._2").as("bin"),
        col("it._3").as("n_toks"))
  }

  /** [[packSequences]] with the shard count DERIVED from the corpus size:
    * groups = ceil(n / targetPerGroup), so parallelism scales with the data
    * instead of capping at a constant — a fixed shard count means each
    * shard's sorted item list grows linearly with the corpus (1/32 of
    * 100 TB in one task's collect_list is an OOM); a fixed per-shard
    * TARGET keeps every shard's state constant-sized at any scale. The
    * count is one metadata-cheap action producing a model-sized scalar;
    * the derived group count lands in the plan as the pmod literal. */
  def packSequencesAuto(docs: DataFrame, idCol: String, textCol: String, targetPerGroup: Int, budget: Int): DataFrame = {
    require(targetPerGroup >= 1, s"targetPerGroup must be >= 1, got $targetPerGroup")
    val n = docs.count()
    val groups = math.max(1L, (n + targetPerGroup - 1) / targetPerGroup)
    packSequences(docs, idCol, textCol, groups.toInt, budget)
  }

  /** Deterministic hash sampling: keeps a row iff its Knuth-multiplicative
    * hash bucket (0..999) is below `permilRate` — a plain Column, so
    * per-stratum rates are a `when` chain over any column. Reproducible
    * across runs, partitionings, and engines (pure integer arithmetic),
    * unlike rand()-based sample()/sampleBy(). Adds a `bucket` column.
    * `pmod` keeps the bucket in [0,1000) for NEGATIVE keys too (`%` is
    * sign-preserving in both Spark and DuckDB, which would otherwise keep
    * every negative-key row at any rate). Engine parity note: the multiply
    * wraps silently past 2^63 in the JVM while DuckDB errors, so the oracle
    * twin is only asserted over fixture-range ids; the Spark-side bucket is
    * well-defined for the full long range. */
  def sampleByHash(df: DataFrame, keyCol: String, permilRate: Column): DataFrame =
    df.withColumn("bucket", pmod(col(keyCol) * lit(2654435761L), lit(4294967296L)) % 1000)
      .filter(col("bucket") < permilRate)

  /** Eval-set decontamination: training rows (NOT isEval) that share at
    * least one `n`-gram with the eval slice (isEval), with the count of
    * distinct shared n-grams. Inverted-index equi-join on the shingle —
    * never all-pairs — and the eval side is broadcast (small by
    * definition). Output: (idCol, n_shared). */
  def decontaminate(docs: DataFrame, idCol: String, textCol: String, isEval: Column, n: Int): DataFrame = {
    val ngrams = udf { ts: Seq[String] =>
      if (ts == null) Seq.empty[String]
      else ts.iterator.sliding(n).withPartial(false).map(_.mkString(" ")).toSeq
    }
    // Materialize the (id, is_eval, n-gram) set ONCE: without the
    // checkpoint, predicate pushdown sinks the is_eval filters below the
    // distinct and the whole shingle-explode-distinct pipeline runs twice
    // (once per branch) — measured ~2× the cost at sf0.1, and at scale the
    // explode+distinct dominates the recomputation either way.
    val sh = Checkpoints
      // narrow fan-out before the n-gram explode: an unsplittable one-file
      // corpus otherwise serializes the whole shingle build in a single
      // scan task (guide §2.5); no-op on a multi-split corpus
      .fanOut(docs.select(col(idCol), isEval.as("is_eval"), col(textCol)))
      .select(col(idCol), col("is_eval"), explode(ngrams(split(lower(col(textCol)), " "))).as("g"))
      .distinct()
      .transform(Checkpoints.truncate)
    val evalSet = sh.filter(col("is_eval")).select("g").distinct()
    sh.filter(!col("is_eval"))
      .join(broadcast(evalSet), Seq("g"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Content-hash dedup: one row per distinct content, the minimum id as
    * the canonical representative; `carryCols` survive via min (all rows in
    * a digest group share the same content, so any order-free pick is the
    * value — min keeps both engines and all partitionings agreeing).
    * Map-side partial agg on the digest — uniform shuffle key by
    * construction, no skew trap. */
  def dedupByContent(df: DataFrame, idCol: String, contentCol: String, carryCols: String*): DataFrame = {
    val aggs = Seq(min(col(idCol)).as(idCol), min(col(contentCol)).as(contentCol)) ++
      carryCols.map(c => min(col(c)).as(c))
    df.withColumn("digest", md5(col(contentCol).cast("binary")))
      .groupBy("digest")
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Incremental admission: rows of `incoming` whose content digest is not
    * present in `loaded` — the content-addressed form of "load only records
    * not already loaded". Left-anti join on the 16-byte digest. */
  def newContentOnly(incoming: DataFrame, loaded: DataFrame, contentCol: String): DataFrame =
    incoming
      .withColumn("digest", md5(col(contentCol).cast("binary")))
      .join(
        loaded.select(md5(col(contentCol).cast("binary")).as("digest")),
        Seq("digest"),
        "left_anti")
}
