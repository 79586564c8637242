package graft.ops

import graft.Fixtures
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Oracle-checked query bindings for the training-data curation surface a
  * 100-TB pretraining pipeline runs after dedup and before tokenization:
  * document chunking, sequence packing, deterministic stratified sampling,
  * eval-set decontamination, PII redaction, incremental content dedup, the
  * end-to-end pipeline composition, and embedding normalization /
  * quantization / k-means ANN. The reusable operators live in
  * [[graft.ops.Curation]] (arbitrary DataFrames); each query here binds one
  * to the fixture tables.
  *
  * Determinism engineering (SURVEY.md §2.0): no rand()/sample() anywhere —
  * sampling uses a multiplicative hash of the key, packing is a
  * per-group sequential fold over a sorted list, and every float fold
  * mirrors DuckDB's list_reduce operation order term-for-term so doubles
  * are bit-identical (same trick as SimKernel).
  */
object PipelineOps {
  private def e6(c: Column): Column = floor(c * 1e6 + lit(0.5)).cast("long")

  // PII patterns: identical RE2-compatible source on both engines. The
  // fixture text is synthetic, so each doc gets a deterministic planted
  // email + phone appended; redaction must find exactly those.
  private val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private val phoneRe = "555-[0-9]{4}"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Chunking: fixed 32-token windows at stride 24 (8-token overlap), the
    // step that turns documents into model-context-sized pieces. Map-only —
    // explode is over the cheap int sequence of starts, never over a
    // computed token array (which re-evaluates per element).
    "q_chunk_docs" -> { (s, dir) =>
      Curation
        .chunk(Fixtures.table(s, dir, "documents"), "doc_id", "text", window = 32, stride = 24)
        .orderBy("doc_id", "chunk_id")
    },
    // Sequence packing: greedy first-fit of whole docs into 256-token bins,
    // docs sharded into ceil(n/16) groups (doc_id % groups) packed
    // independently — the shard count is DERIVED from the corpus count
    // (16 docs per shard → 32 shards on this 500-doc fixture), so the
    // at-scale shape holds at any size: the expensive per-item fold is
    // sequential only within a constant-sized group, and group count (=
    // parallelism) grows with the data. The oracle derives the same count
    // from its own count(*), so the hash-match covers the derivation.
    "q_pack_sequences" -> { (s, dir) =>
      Curation
        .packSequencesAuto(Fixtures.table(s, dir, "documents"), "doc_id", "text", targetPerGroup = 16, budget = 256)
        .orderBy("doc_id")
    },
    // Deterministic stratified sampling: keep-decision is a pure function of
    // the key (Knuth multiplicative hash mod 1000 vs a per-language rate) —
    // reproducible across runs, partitionings, and engines, unlike
    // rand()/sampleBy. en 50%, de 25%, rest 10%.
    "q_sample_strat" -> { (s, dir) =>
      val rate = when(col("lang") === "en", 500).when(col("lang") === "de", 250).otherwise(100)
      Curation
        .sampleByHash(Fixtures.table(s, dir, "documents").select("doc_id", "lang"), "doc_id", rate)
        .orderBy("doc_id")
    },
    // Weighted sampling WITHOUT replacement (A-ES, Efraimidis & Spirakis
    // 2006): each row draws key = -ln(u)/w and the k smallest keys are the
    // sample — provably equivalent to sequential weighted draws, but fully
    // parallel and deterministic here because u comes from a 48-bit md5
    // prefix of the row key, not a RNG. The top-k lands on
    // TakeOrderedAndProject (per-partition heaps + driver merge of k
    // rows), so no global sort materializes at any scale. Both engines
    // share the identical float expression; (h+0.5)/2^48 keeps u in (0,1)
    // so ln never sees 0.
    "q_sample_weighted" -> { (s, dir) =>
      Fixtures
        .table(s, dir, "orders")
        .select(
          col("o_orderkey"),
          floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("wt"))
        .withColumn(
          "h48",
          expr("CAST(conv(substring(md5(concat('ws|', CAST(o_orderkey AS STRING))), 1, 12), 16, 10) AS BIGINT)"))
        .withColumn("key", expr("-ln((h48 + 0.5) / 281474976710656.0) / wt"))
        .select(
          col("o_orderkey"),
          col("wt"),
          floor(col("key") * expr("1e15") + lit(0.5)).cast("long").as("key_e15"))
        .orderBy("key_e15", "o_orderkey")
        .limit(20)
    },
    // Dataset mixing to declared target proportions — the data-mixing step
    // a pretraining pipeline runs after curation: every source is
    // downsampled toward its target share with the SAME deterministic
    // Knuth-hash gate as q_sample_strat, but here the per-source rate is
    // DERIVED (declared target_n over the MEASURED per-source count)
    // instead of being a per-row constant. The spec frame is one row per
    // source — model-sized at any corpus scale — broadcast back over the
    // scan, so the whole mix is one count aggregate plus a map-side gate;
    // no second shuffle. The weight rule (source-id mod 4, spanning rates
    // 200-800 permille) stands in for the mixture config table a real run
    // would read.
    "q_sample_mixture" -> { (s, dir) =>
      val docs = Fixtures.table(s, dir, "documents").select("doc_id", "source")
      val spec = docs
        .groupBy("source")
        .agg(count(lit(1)).as("n_src"))
        // substring(source, 4) with no length bound — the oracle's
        // substr(source, 4) is unbounded too, so both engines parse the
        // IDENTICAL text (a bounded length here would silently diverge on
        // a >10-digit source id).
        .withColumn("target_n", (expr("substring(source, 4)").cast("long") % 4 + 1) * 5)
        .withColumn("rate", least(lit(1000L), expr("target_n * 1000 div n_src")))
      docs
        .join(broadcast(spec), "source")
        .withColumn("bucket", pmod(col("doc_id") * 2654435761L, lit(4294967296L)) % 1000)
        .filter(col("bucket") < col("rate"))
        .select("source", "doc_id", "n_src", "target_n")
        .orderBy("source", "doc_id")
    },
    // Temperature-scaled source mixing — the multilingual/multi-source
    // rebalancing step of the published pretraining recipes (sample
    // sources ∝ p^α, α<1, so low-resource sources are UP-weighted
    // relative to their raw share without ever dominating): per source,
    // raw share p = n_src/N, temperature weight w ∝ p^0.7 normalized over
    // sources, and the expected document budget each source gets out of a
    // 10k-doc epoch. The whole spec is ONE count aggregate to a
    // sources-sized frame (model-sized at any corpus scale — the 100-TB
    // cost is the count, which manifest stats can even answer for free on
    // a snapshot table); the per-row sampling gate that would consume
    // these rates is q_sample_mixture's deterministic hash, unchanged.
    "q_sample_temperature" -> { (s, dir) =>
      val counts = Fixtures
        .table(s, dir, "documents")
        .groupBy("source")
        .agg(count(lit(1)).as("n_src"))
      val w = Window.partitionBy()
      counts
        .withColumn("p", col("n_src").cast("double") / sum("n_src").over(w))
        .withColumn("pw", pow(col("p"), lit(0.7)))
        .withColumn("wgt", col("pw") / sum("pw").over(w))
        .select(
          col("source"),
          col("n_src"),
          e6(col("p")).as("share_e6"),
          e6(col("wgt")).as("weight_e6"),
          floor(col("wgt") * 10000 + lit(0.5)).cast("long").as("epoch_docs"))
        .orderBy("source")
    },
    // Token-budget allocation — the planning step before a training run:
    // a 40%-of-corpus token budget fills greedily down a deterministic
    // source priority order (priority = source-id mod 5, standing in for
    // the curation-quality tier a real recipe declares); whole sources
    // fit until the boundary source, which gets a fractional sampling
    // rate, and everything past the cut gets rate 0. Per-source token
    // counts are ONE scan + one agg; the allocation itself is a window
    // running-sum over the sources-sized frame — model-sized at any
    // corpus scale (the 100-TB cost is the token count, not the plan).
    "q_sample_budget" -> { (s, dir) =>
      val bySource = Fixtures
        .table(s, dir, "documents")
        .select(col("source"), size(split(col("text"), " ")).as("toks"))
        .groupBy("source")
        .agg(sum("toks").as("tokens"))
        .withColumn("priority", expr("substring(source, 4)").cast("long") % 5)
      val w = Window.partitionBy()
      val order = Window
        .partitionBy()
        .orderBy(col("priority").desc, col("tokens").desc, col("source"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
      bySource
        .withColumn("budget", floor(sum("tokens").over(w) * 0.4).cast("long"))
        .withColumn("cum_before", coalesce(sum("tokens").over(order), lit(0L)))
        .withColumn(
          "alloc",
          greatest(lit(0L), least(col("tokens"), col("budget") - col("cum_before"))))
        .select(
          col("source"),
          col("priority"),
          col("tokens"),
          col("alloc"),
          e6(col("alloc").cast("double") / col("tokens")).as("rate_e6"))
        .orderBy("source")
    },
    // Eval-set decontamination: a training doc (doc_id >= 20) is contaminated
    // if it shares any 4-gram with the eval slice (doc_id < 20); output is
    // the contaminated ids with their distinct-shared-4-gram count. Shape at
    // 100 TB: inverted-index equi-join on the shingle (no all-pairs), eval
    // side is small by definition → broadcast.
    "q_decontaminate" -> { (s, dir) =>
      Curation
        .decontaminate(Fixtures.table(s, dir, "documents"), "doc_id", "text", col("doc_id") < 20, n = 4)
        .orderBy("doc_id")
    },
    // PII redaction: plant a deterministic email + phone per doc, then strip
    // both with regexp_replace and count what was found. Map-only scan.
    "q_pii_redact" -> { (s, dir) =>
      Fixtures
        .table(s, dir, "documents")
        .select(
          col("doc_id"),
          concat(
            col("text"),
            lit(" contact user"),
            col("doc_id").cast("string"),
            lit("@example.com or 555-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0")).as("aug"))
        .select(
          col("doc_id"),
          col("aug"),
          regexp_replace(regexp_replace(col("aug"), emailRe, "<EMAIL>"), phoneRe, "<PHONE>").as("red"))
        .select(
          col("doc_id"),
          size(regexp_extract_all(col("aug"), lit(emailRe), lit(0))).as("n_emails"),
          size(regexp_extract_all(col("aug"), lit(phoneRe), lit(0))).as("n_phones"),
          length(col("red")).as("red_len"),
          expr("right(red, 40)").as("tail40"))
        .orderBy("doc_id")
    },
    // ANN with a k-means coarse quantizer (IVF proper): fit 8 centroids with
    // 3 deterministic Lloyd iterations, bucket candidates by nearest
    // centroid, probe the 2 nearest buckets per query. Oracle-less (the
    // iterative fit has no reasonable DuckDB twin; the driver records a
    // rows-only check) — recall vs exact brute force is proven in
    // KMeansIvfSpec, and this entry keeps the fit+search cost on the bench.
    "q_sim_ann_kmeans" -> { (s, dir) =>
      val e = Fixtures.table(s, dir, "embeddings")
      val cents = graft.functions.KMeansIvf.fit(e, "vec_id", "embedding", k = 8, iters = 3)
      graft.functions.KMeansIvf
        .annTopK(e.filter(col("vec_id") < 20), e, cents, "vec_id", "embedding", topK = 3, nprobe = 2)
        .orderBy("q_id", "rn")
    },
    // IVF-PQ with asymmetric distance + exact re-rank (IVFADC-R): same
    // coarse quantizer and probing as q_sim_ann_kmeans, but the bucket join
    // carries only m=16 small codes per candidate (the memory-realistic
    // index layout — no raw vectors cross the bucket shuffle); ADC keeps a
    // 48-deep shortlist per query and only those rows fetch raw vectors for
    // the exact cosine re-rank. Oracle-less like the other iterative-fit
    // kernels; recall >= the plain-IVF row and partitioning determinism are
    // proven in ProductQuantizerSpec.
    "q_sim_ann_pq" -> { (s, dir) =>
      val e = Fixtures.table(s, dir, "embeddings")
      val cents = graft.functions.KMeansIvf.fit(e, "vec_id", "embedding", k = 8, iters = 3)
      val model = graft.functions.ProductQuantizer.fit(e, "vec_id", "embedding", m = 16, ksub = 64, iters = 3)
      graft.functions.ProductQuantizer
        .annTopK(e.filter(col("vec_id") < 20), e, cents, model, "vec_id", "embedding", topK = 3, nprobe = 2, rerank = 48)
        .orderBy("q_id", "rn")
    },
    // L2 normalization: norm is the same sequential double fold DuckDB's
    // list_reduce performs (bit-identical, see SimKernel), outputs are
    // e6-scaled scalars (never raw arrays — the driver comparator can't
    // sort collection columns).
    "q_emb_normalize" -> { (s, dir) =>
      val nrm = sqrt(aggregate(
        col("embedding"),
        lit(0.0),
        (a, x) => a + x.cast("double") * x.cast("double")))
      def d(i: Int) = e6(element_at(col("embedding"), i).cast("double") / col("nrm")).as(s"d${i}_e6")
      Fixtures
        .table(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"), nrm.as("nrm"))
        .select(col("vec_id"), e6(col("nrm")).as("norm_e6"), d(1), d(2), d(3), d(4))
        .orderBy("vec_id")
    },
    // Int8 max-abs quantization: scale = 127/max|x|, q = floor(x*scale+0.5)
    // (half-up in double math — identical on both engines, unlike round()),
    // plus the total dequantization error as a sequential double fold.
    "q_emb_quantize" -> { (s, dir) =>
      val mx = array_max(transform(col("embedding"), x => abs(x))).cast("double")
      def q(i: Int) =
        floor(element_at(col("embedding"), i).cast("double") * col("scale") + 0.5)
          .cast("long")
          .as(s"q$i")
      val err = aggregate(
        col("embedding"),
        lit(0.0),
        (a, x) =>
          a + abs(x.cast("double") - floor(x.cast("double") * col("scale") + 0.5) / col("scale")))
      Fixtures
        .table(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"), (lit(127.0) / mx).as("scale"))
        .select(col("vec_id"), e6(col("scale")).as("scale_e6"), q(1), q(2), q(3), q(4), e6(err).as("err_e6"))
        .orderBy("vec_id")
    },
    // Incremental content-hash dedup — the LLM-pipeline version of the
    // reference's "load only records not already loaded": an incoming batch
    // is admitted only if its content digest is absent from the already-
    // loaded store. Left-anti join on md5(text); at 100 TB the store side is
    // a digest-only column (16 bytes/row), and the join shuffles on the
    // digest — uniformly distributed by construction.
    "q_dedup_incremental" -> { (s, dir) =>
      val docs = Fixtures.table(s, dir, "documents")
      Curation
        .newContentOnly(docs.select("doc_id", "lang", "text"), docs.filter(col("doc_id") < 250), "text")
        .select(col("doc_id"), col("lang"), col("digest"))
        .orderBy("doc_id")
    },
    // End-to-end curation pipeline — the flagship composition: planted
    // duplicates (doc_id+10000, same text) → exact content dedup (keep the
    // min doc_id, which must eliminate every planted copy) → quality gate
    // (token-count band) → deterministic 80% hash sample → per-language
    // corpus stats. Every stage is an operator proven above; the hash-match
    // proves the COMPOSITION (dedup-before-sample ordering, gate placement).
    "q_curation_pipeline" -> { (s, dir) =>
      val docs = Fixtures.table(s, dir, "documents").select(col("doc_id"), col("lang"), col("text"))
      val corpus = docs.unionByName(
        docs.select((col("doc_id") + 10000).as("doc_id"), col("lang"), col("text")))
      val deduped = Curation.dedupByContent(corpus, "doc_id", "text", "lang")
      val gated = deduped
        .withColumn("n_toks", size(split(col("text"), " ")))
        .filter(col("n_toks").between(40, 300))
      Curation
        .sampleByHash(gated, "doc_id", lit(800))
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_docs"),
          sum("n_toks").as("total_toks"),
          min("doc_id").as("min_id"),
          max("doc_id").as("max_id"))
        .orderBy("lang")
    },
    // Deterministic train/val/test split — the assignment every training
    // pipeline must make REPRODUCIBLY across reruns, engines, and cluster
    // sizes: bucket = (doc_id · 2654435761) mod 2^32 mod 10 (Knuth
    // multiplicative hash — exact long arithmetic, no engine hash
    // function), buckets 0-7 train / 8 val / 9 test. Map-only per row
    // then one 3-group aggregate; the split column is a pure expression so
    // at 100 TB the assignment costs zero shuffles and any executor can
    // recompute membership without a lookup table.
    "q_split_train" -> { (s, dir) =>
      val bucket = expr("((doc_id * 2654435761) % 4294967296) % 10")
      Fixtures
        .table(s, dir, "documents")
        .select(
          when(bucket <= 7, "train").when(bucket === 8, "val").otherwise("test").as("split"),
          col("n_chars"))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("n_chars_tot"))
        .withColumn(
          "share_e6",
          floor(col("n_docs").cast("double") / sum("n_docs").over(Window.partitionBy()) * 1e6 + lit(0.5))
            .cast("long"))
        .orderBy("split")
    }
  )

  val oracle: Map[String, String] = Map(
    "q_chunk_docs" ->
      ("WITH t AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents), " +
        "u AS (SELECT doc_id, toks, unnest(range(1, greatest(len(toks),1)+1, 24)) AS start FROM t) " +
        "SELECT doc_id, CAST((start-1)/24 AS INT) AS chunk_id, " +
        "array_to_string(toks[start:least(start+31, len(toks))], ' ') AS chunk_text, " +
        "CAST(len(toks[start:least(start+31, len(toks))]) AS INT) AS chunk_toks " +
        "FROM u ORDER BY doc_id, chunk_id"),
    "q_pack_sequences" ->
      ("WITH RECURSIVE ng AS (SELECT CAST(greatest(1, ceil(count(*)/16.0)) AS INT) AS g FROM documents), " +
        "d AS (SELECT doc_id, CAST(doc_id % (SELECT g FROM ng) AS INT) AS pgrp, CAST(len(string_split(text,' ')) AS INT) AS n FROM documents), " +
        "o AS (SELECT doc_id, pgrp, n, CAST(row_number() OVER (PARTITION BY pgrp ORDER BY doc_id) AS INT) AS rn FROM d), " +
        "p AS (SELECT pgrp, rn, doc_id, n, 0 AS bin, n AS fill FROM o WHERE rn = 1 " +
        "UNION ALL SELECT o.pgrp, o.rn, o.doc_id, o.n, " +
        "CASE WHEN p.fill + o.n > 256 THEN p.bin + 1 ELSE p.bin END, " +
        "CASE WHEN p.fill + o.n > 256 THEN o.n ELSE p.fill + o.n END " +
        "FROM p JOIN o ON o.pgrp = p.pgrp AND o.rn = p.rn + 1) " +
        "SELECT doc_id, pgrp, CAST(bin AS INT) AS bin, n AS n_toks FROM p ORDER BY doc_id"),
    // ((x % m) + m) % m is DuckDB's spelling of Spark's pmod — identical for
    // the non-negative fixture ids, sign-safe for the library in general.
    "q_sample_strat" ->
      ("SELECT doc_id, lang, ((doc_id * 2654435761) % 4294967296 + 4294967296) % 4294967296 % 1000 AS bucket FROM documents " +
        "WHERE ((doc_id * 2654435761) % 4294967296 + 4294967296) % 4294967296 % 1000 < (CASE WHEN lang = 'en' THEN 500 WHEN lang = 'de' THEN 250 ELSE 100 END) " +
        "ORDER BY doc_id"),
    // both engines select and order by the ROUNDED e15 key so a sub-ulp
    // ln() difference can never flip the cut line
    "q_sample_weighted" ->
      ("WITH w AS (SELECT o_orderkey, CAST(floor(o_totalprice*100+0.5) AS BIGINT) AS wt, " +
        "CAST('0x' || substr(md5('ws|' || CAST(o_orderkey AS STRING)), 1, 12) AS BIGINT) AS h48 FROM orders), " +
        "k AS (SELECT o_orderkey, wt, CAST(floor(-ln((h48 + 0.5) / 281474976710656.0) / wt * 1e15 + 0.5) AS BIGINT) AS key_e15 FROM w) " +
        "SELECT o_orderkey, wt, key_e15 FROM k ORDER BY key_e15, o_orderkey LIMIT 20"),
    "q_sample_mixture" ->
      ("WITH c AS (SELECT source, count(*) AS n_src, (CAST(substr(source,4) AS BIGINT) % 4 + 1) * 5 AS target_n FROM documents GROUP BY source), " +
        "r AS (SELECT source, n_src, target_n, least(1000, target_n * 1000 // n_src) AS rate FROM c) " +
        "SELECT d.source, d.doc_id, r.n_src, r.target_n FROM documents d JOIN r USING (source) " +
        "WHERE ((d.doc_id * 2654435761) % 4294967296 + 4294967296) % 4294967296 % 1000 < r.rate " +
        "ORDER BY source, doc_id"),
    "q_sample_budget" ->
      ("WITH c AS (SELECT source, CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tokens, CAST(substr(source, 4) AS BIGINT) % 5 AS priority FROM documents GROUP BY source), " +
        "b AS (SELECT *, CAST(floor(sum(tokens) OVER () * 0.4) AS BIGINT) AS budget, " +
        "CAST(coalesce(sum(tokens) OVER (ORDER BY priority DESC, tokens DESC, source ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before FROM c), " +
        "a AS (SELECT source, priority, tokens, greatest(0, least(tokens, budget - cum_before)) AS alloc FROM b) " +
        "SELECT source, priority, tokens, alloc, CAST(floor(CAST(alloc AS DOUBLE)/tokens*1000000 + 0.5) AS BIGINT) AS rate_e6 " +
        "FROM a ORDER BY source"),
    "q_sample_temperature" ->
      ("WITH c AS (SELECT source, count(*) AS n_src FROM documents GROUP BY source), " +
        "p AS (SELECT source, n_src, CAST(n_src AS DOUBLE) / sum(n_src) OVER () AS p FROM c), " +
        "w AS (SELECT source, n_src, p, pow(p, 0.7) / sum(pow(p, 0.7)) OVER () AS wgt FROM p) " +
        "SELECT source, n_src, CAST(floor(p*1000000 + 0.5) AS BIGINT) AS share_e6, " +
        "CAST(floor(wgt*1000000 + 0.5) AS BIGINT) AS weight_e6, " +
        "CAST(floor(wgt*10000 + 0.5) AS BIGINT) AS epoch_docs " +
        "FROM w ORDER BY source"),
    "q_dedup_incremental" ->
      ("WITH loaded AS (SELECT DISTINCT md5(text) AS digest FROM documents WHERE doc_id < 250) " +
        "SELECT doc_id, lang, md5(text) AS digest FROM documents " +
        "WHERE md5(text) NOT IN (SELECT digest FROM loaded) ORDER BY doc_id"),
    "q_curation_pipeline" ->
      ("WITH corpus AS (SELECT doc_id, lang, text FROM documents UNION ALL SELECT doc_id + 10000, lang, text FROM documents), " +
        "dedup AS (SELECT md5(text) AS digest, min(doc_id) AS doc_id, min(lang) AS lang, min(text) AS text FROM corpus GROUP BY 1), " +
        "gated AS (SELECT doc_id, lang, CAST(len(string_split(text,' ')) AS INT) AS n_toks FROM dedup WHERE len(string_split(text,' ')) BETWEEN 40 AND 300), " +
        "sampled AS (SELECT * FROM gated WHERE ((doc_id * 2654435761) % 4294967296 + 4294967296) % 4294967296 % 1000 < 800) " +
        "SELECT lang, count(*) AS n_docs, CAST(sum(n_toks) AS BIGINT) AS total_toks, min(doc_id) AS min_id, max(doc_id) AS max_id " +
        "FROM sampled GROUP BY lang ORDER BY lang"),
    "q_decontaminate" ->
      ("WITH t AS (SELECT doc_id, string_split(lower(text),' ') AS toks FROM documents), " +
        "s AS (SELECT DISTINCT doc_id, g FROM (SELECT doc_id, unnest(list_transform(range(1, len(toks)-2), i -> array_to_string(toks[i:i+3], ' '))) AS g FROM t)), " +
        "ev AS (SELECT DISTINCT g FROM s WHERE doc_id < 20) " +
        "SELECT doc_id, count(*) AS n_shared FROM s JOIN ev USING (g) WHERE doc_id >= 20 GROUP BY doc_id ORDER BY doc_id"),
    "q_pii_redact" ->
      ("WITH a AS (SELECT doc_id, text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com or 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS aug FROM documents), " +
        "r AS (SELECT doc_id, aug, regexp_replace(regexp_replace(aug, '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}', '<EMAIL>', 'g'), '555-[0-9]{4}', '<PHONE>', 'g') AS red FROM a) " +
        "SELECT doc_id, CAST(len(regexp_extract_all(aug, '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}')) AS INT) AS n_emails, " +
        "CAST(len(regexp_extract_all(aug, '555-[0-9]{4}')) AS INT) AS n_phones, " +
        "CAST(length(red) AS INT) AS red_len, right(red, 40) AS tail40 FROM r ORDER BY doc_id"),
    "q_emb_normalize" ->
      ("WITH n AS (SELECT vec_id, embedding, sqrt(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)), (p,v) -> p+v)) AS nrm FROM embeddings) " +
        "SELECT vec_id, CAST(floor(nrm*1000000 + 0.5) AS BIGINT) AS norm_e6, " +
        (1 to 4).map(i => s"CAST(floor(CAST(embedding[$i] AS DOUBLE)/nrm*1000000 + 0.5) AS BIGINT) AS d${i}_e6").mkString(", ") +
        " FROM n ORDER BY vec_id"),
    "q_emb_quantize" ->
      ("WITH m AS (SELECT vec_id, embedding, CAST(127 AS DOUBLE) / CAST(list_max(list_transform(embedding, x -> abs(x))) AS DOUBLE) AS scale FROM embeddings) " +
        "SELECT vec_id, CAST(floor(scale*1000000 + 0.5) AS BIGINT) AS scale_e6, " +
        (1 to 4).map(i => s"CAST(floor(CAST(embedding[$i] AS DOUBLE)*scale + 0.5) AS BIGINT) AS q$i").mkString(", ") +
        ", CAST(floor(list_reduce(list_transform(embedding, x -> abs(CAST(x AS DOUBLE) - floor(CAST(x AS DOUBLE)*scale + 0.5)/scale)), (p,v) -> p+v)*1000000 + 0.5) AS BIGINT) AS err_e6 " +
        "FROM m ORDER BY vec_id"),
    "q_split_train" ->
      ("WITH b AS (SELECT CASE WHEN ((doc_id * 2654435761) % 4294967296) % 10 <= 7 THEN 'train' " +
        "WHEN ((doc_id * 2654435761) % 4294967296) % 10 = 8 THEN 'val' ELSE 'test' END AS split, n_chars FROM documents), " +
        "g AS (SELECT split, CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS n_chars_tot FROM b GROUP BY 1) " +
        "SELECT split, n_docs, n_chars_tot, " +
        "CAST(floor(CAST(n_docs AS DOUBLE) / sum(n_docs) OVER () * 1000000 + 0.5) AS BIGINT) AS share_e6 " +
        "FROM g ORDER BY split")
  )
}
