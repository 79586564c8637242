package graft.ops

import graft.Fixtures
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.H — dedup / similarity / text-analysis / multimodal
  * operators: the LLM-training-data-pipeline surface.
  *
  * Cosine kernel parity: DuckDB's list_cosine_similarity accumulates in
  * float32 (verified: returns FLOAT), so it CANNOT hash-match a double
  * kernel. Both sides therefore compute the same explicit sequential double
  * fold — Σ double(a_i)·double(b_i) in index order, cos = dot/sqrt(na·nb) —
  * which is bit-identical (the Scala while-loop and DuckDB's
  * list_reduce(list_transform(...)) perform the same IEEE operation
  * sequence). Scores are emitted as floor(cos*1e6+0.5) integers.
  *
  * At 100 TB the exact top-k/self-join kernels here are the verification
  * baseline; the scale path is LSH bucketing (cap_sim_lsh, test-proven).
  */
/** Shared cosine kernel: a sequential double fold, mirrored term-for-term in
  * DuckDB SQL so both engines produce bit-identical scores (see LlmOps). */
private[graft] object SimKernel {
  def cos(a: Seq[Float], b: Seq[Float]): Double = {
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < a.length) {
      val x = a(i).toDouble
      val y = b(i).toDouble
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / math.sqrt(na * nb)
  }

  /** UDF form (kept for comparison benchmarks and as the fallback path). */
  val cosineUdf = udf(cos _)

  /** Native codegen'd Catalyst expression form — the production kernel.
    * Identical operation sequence to `cos`, so results are bit-identical. */
  def cosine(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      graft.functions.CosineSimilarity(
        org.apache.spark.sql.GraftSqlBridge.expression(a),
        org.apache.spark.sql.GraftSqlBridge.expression(b)))

  /** Expose graft_cosine(a, b) on the spark.sql surface too. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    org.apache.spark.sql.GraftSqlBridge.registerFunction(
      spark,
      "graft_cosine",
      { args => graft.functions.CosineSimilarity(args(0), args(1)) })

  /** DuckDB twin of the fold inside `cosine`. */
  def cosSql(a: String, b: String): String =
    s"list_reduce(list_transform(list_zip($a, $b), x -> CAST(x[1] AS DOUBLE)*CAST(x[2] AS DOUBLE)), (p,v) -> p+v) / " +
      s"sqrt(list_reduce(list_transform($a, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)), (p,v) -> p+v) * " +
      s"list_reduce(list_transform($b, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)), (p,v) -> p+v))"
}

object LlmOps {
  import SimKernel.{cosine, cosSql}

  private def e6(c: Column): Column = floor(c * 1e6 + lit(0.5)).cast("long")

  private val stopwords = Seq("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact dedup: canonical representative (min doc_id) per sha256(text).
    // groupBy form, NOT dropDuplicates — dropDuplicates keeps an arbitrary
    // row per key (partition-order-dependent → hash-unstable).
    "q_dedup_exact" -> { (s, dir) =>
      Fixtures
        .table(s, dir, "documents")
        .groupBy(sha2(col("text"), 256).as("h"))
        .agg(min("doc_id").as("doc_id"), count(lit(1)).as("n"))
        .orderBy("doc_id")
    },
    // Keyed dedup keep-latest: one row per (user_id, event_type) at max ts,
    // ties broken by event_id — fully deterministic unlike dropDuplicates.
    "q_dedup_latest" -> { (s, dir) =>
      val w = Window
        .partitionBy("user_id", "event_type")
        .orderBy(col("ts").desc, col("event_id").desc)
      Fixtures
        .events(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("user_id", "event_type", "event_id", "ts")
        .orderBy("user_id", "event_type")
    },
    // Exact k-NN: top-5 cosine neighbours for each of the first 20 vectors.
    // Query side is tiny → broadcast nested-loop against all candidates; at
    // scale the candidate side stays partitioned and only queries ship.
    "q_sim_cosine_topk" -> { (s, dir) =>
      val e = Fixtures.table(s, dir, "embeddings")
      val q = e.filter(col("vec_id") < 20)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      val c = e.select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
      val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("c_id"))
      broadcast(q)
        .crossJoin(c)
        .filter(col("q_id") =!= col("c_id"))
        .withColumn("cos", cosine(col("q_emb"), col("c_emb")))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select(col("q_id"), col("rn").cast("int").as("rn"), col("c_id"), e6(col("cos")).as("score_e6"))
        .orderBy("q_id", "rn")
    },
    // Similarity self-join: pairs with cos ≥ 0.3 within a 100-vector slice —
    // the exact baseline that cap_sim_lsh approximates at scale.
    "q_sim_threshold" -> { (s, dir) =>
      val e = Fixtures
        .table(s, dir, "embeddings")
        .filter(col("vec_id") < 100)
      val a = e.select(col("vec_id").as("a_id"), col("embedding").as("a_emb"))
      val b = e.select(col("vec_id").as("b_id"), col("embedding").as("b_emb"))
      a.crossJoin(b)
        .filter(col("a_id") < col("b_id"))
        .withColumn("cos", cosine(col("a_emb"), col("b_emb")))
        .filter(col("cos") >= 0.3)
        .select(col("a_id"), col("b_id"), e6(col("cos")).as("score_e6"))
        .orderBy("a_id", "b_id")
    },
    // Tokenize → stopword-filter → global top-20 terms.
    "q_text_tokens" -> { (s, dir) =>
      Fixtures
        .table(s, dir, "documents")
        .select(explode(split(lower(col("text")), " ")).as("tok"))
        .filter(col("tok") =!= "" && !col("tok").isin(stopwords: _*))
        .groupBy("tok")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("tok"))
        .limit(20)
    },
    // Manual TF-IDF (no MLlib): top term per document by (n/len)·ln(N/df).
    // All inputs are exact integers; the score arithmetic is the same
    // operation sequence on both engines → identical doubles → stable argmax.
    "q_text_tfidf" -> { (s, dir) =>
      val docs = Fixtures.table(s, dir, "documents")
      val toks = docs
        .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("tok"))
        .filter(col("tok") =!= "")
      val tf = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("n"))
      val wDoc = Window.partitionBy("doc_id")
      val nDocs = docs.select(countDistinct("doc_id").as("nd"))
      // df via groupBy + join-back, NOT a tok-partitioned window: the window
      // form ships every (doc,tok) row of a hot token ("the") to one reducer
      // — a skewed-key full shuffle at scale — while groupBy collapses hot
      // tokens map-side before shuffling vocabulary-sized partials. The len
      // window runs first so the final rank window reuses its doc_id
      // exchange; AQE turns the df join into a broadcast when vocab is small.
      val dfCounts = tf.groupBy("tok").agg(count(lit(1)).as("df"))
      val scored = tf
        .withColumn("len", sum("n").over(wDoc))
        .join(dfCounts, "tok")
        .crossJoin(broadcast(nDocs))
        .withColumn("score", (col("n") / col("len")) * log(col("nd") / col("df")))
      val wRank = Window.partitionBy("doc_id").orderBy(col("score").desc, col("tok"))
      scored
        .withColumn("rn", row_number().over(wRank))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("tok"), e6(col("score")).as("score_e6"))
        .orderBy("doc_id")
    },
    // Okapi BM25 relevance of every document against a fixed query term
    // set — the retrieval scorer a training-data curation pipeline uses to
    // mine topical subsets. Same distribution discipline as TF-IDF: tf via
    // groupBy (hot tokens collapse map-side), df via groupBy + join-back
    // (never a tok-partitioned window), the corpus-level (N, avgdl) pair as
    // ONE broadcast 1-row aggregate. The BM25 expression (k1=1.2, b=0.75,
    // the Robertson-Sparck-Jones +1 idf) is a single fixed double tree
    // spelled identically in the oracle; per-doc term scores sum exactly
    // because each is e6-floored BEFORE the sum.
    "q_text_bm25" -> { (s, dir) =>
      val qterms = Seq("data", "table", "join")
      val docs = Fixtures.table(s, dir, "documents")
      val toks = docs
        .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("tok"))
        .filter(col("tok") =!= "")
      val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
      val corpus = dl.agg(count(lit(1)).as("nd"), sum("dl").as("toktot"))
      val tf = toks
        .filter(col("tok").isin(qterms: _*))
        .groupBy("doc_id", "tok")
        .agg(count(lit(1)).as("tf"))
      val dfc = tf.groupBy("tok").agg(count(lit(1)).as("df"))
      val scoreSql =
        "CAST(floor(ln(1.0 + (nd - df + 0.5)/(df + 0.5)) * " +
          "(tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / (CAST(toktot AS DOUBLE)/nd))) " +
          "* 1000000 + 0.5) AS BIGINT)"
      tf.join(broadcast(dfc), "tok")
        .join(dl, "doc_id")
        .crossJoin(broadcast(corpus))
        .select(col("doc_id"), expr(scoreSql).as("s_e6"))
        .groupBy("doc_id")
        .agg(sum("s_e6").as("bm25_e6"), count(lit(1)).as("n_terms"))
        .orderBy(col("bm25_e6").desc, col("doc_id"))
        .limit(20)
    },
    // Unigram cross-entropy per document — the perplexity-proxy quality
    // score a curation pipeline uses to rank fluency without a model:
    // H(doc) = Σ_t tf·(−ln p_corpus(t)) / dl. Corpus term probabilities
    // come from ONE groupBy (hot terms collapse map-side); each term's
    // contribution is e6-floored BEFORE the per-doc sum (exact long
    // addition, no float order), then normalized by doc length in one
    // final double step shared verbatim with the oracle. Documents with
    // high H use rare vocabulary; low H is repetitive boilerplate.
    "q_text_perplexity" -> { (s, dir) =>
      val toks = Fixtures
        .table(s, dir, "documents")
        .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("tok"))
        .filter(col("tok") =!= "")
      val tf = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      val corpusTf = tf.groupBy("tok").agg(sum("tf").as("nt"))
      val tot = corpusTf.agg(sum("nt").as("toktot"))
      val termSql = "CAST(floor(tf * (-ln(CAST(nt AS DOUBLE) / toktot)) * 1000000 + 0.5) AS BIGINT)"
      tf.join(broadcast(corpusTf), "tok")
        .crossJoin(broadcast(tot))
        .select(col("doc_id"), col("tf"), expr(termSql).as("h_e6"))
        .groupBy("doc_id")
        .agg(sum("h_e6").as("hsum_e6"), sum("tf").as("dl"))
        .select(
          col("doc_id"),
          col("dl"),
          expr("CAST(floor(CAST(hsum_e6 AS DOUBLE) / dl + 0.5) AS BIGINT)").as("xent_e6"))
        .orderBy("doc_id")
    },
    // Bigram counts via the window-lead formulation over token positions.
    "q_text_ngram" -> { (s, dir) =>
      val w = Window.partitionBy("doc_id").orderBy("pos")
      Fixtures
        .table(s, dir, "documents")
        .select(col("doc_id"), posexplode(split(lower(col("text")), " ")))
        .toDF("doc_id", "pos", "tok")
        .withColumn("nxt", lead("tok", 1).over(w))
        .filter(col("nxt").isNotNull)
        .select(concat_ws(" ", col("tok"), col("nxt")).as("bg"))
        .groupBy("bg")
        .agg(count(lit(1)).as("n"))
        .filter(col("n") >= 5)
        .orderBy("bg")
    },
    // Per-language corpus stats (exact-int averages, raw double output).
    "q_text_stats" -> { (s, dir) =>
      Fixtures
        .table(s, dir, "documents")
        .select(col("lang"), col("n_chars"), size(split(col("text"), " ")).as("n_toks"))
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_docs"),
          (sum("n_chars") / count(lit(1))).as("avg_chars"),
          (sum("n_toks") / count(lit(1))).as("avg_toks"))
        .orderBy("lang")
    },
    // Multimodal join: text metadata ⋈ vectors in one plan; per (source,
    // label) counts + average embedding norm (norm folded in double, scaled
    // e6 per row, then exact-int averaged).
    "q_multimodal" -> { (s, dir) =>
      val d = Fixtures.table(s, dir, "documents")
      val e = Fixtures.table(s, dir, "embeddings")
      d.join(e, col("doc_id") === col("vec_id"))
        .withColumn(
          "norm_e6",
          e6(sqrt(aggregate(col("embedding"), lit(0.0), (acc, x) =>
            acc + x.cast("double") * x.cast("double")))))
        .groupBy("source", "label")
        .agg(count(lit(1)).as("n"), (sum("norm_e6") / count(lit(1))).as("avg_norm_e6"))
        .orderBy("source", "label")
    }
  )

  val oracle: Map[String, String] = Map(
    "q_dedup_exact" ->
      "SELECT sha256(text) AS h, min(doc_id) AS doc_id, count(*) AS n FROM documents GROUP BY h ORDER BY doc_id",
    "q_dedup_latest" ->
      "WITH e AS (SELECT user_id, event_type, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events), r AS (SELECT *, row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn FROM e) SELECT user_id, event_type, event_id, ts FROM r WHERE rn = 1 ORDER BY user_id, event_type",
    "q_sim_cosine_topk" ->
      ("WITH q AS (SELECT vec_id AS q_id, embedding AS qe FROM embeddings WHERE vec_id < 20), c AS (SELECT vec_id AS c_id, embedding AS ce FROM embeddings), s AS (SELECT q_id, c_id, " +
        cosSql("qe", "ce") +
        " AS cos FROM q, c WHERE q_id <> c_id), r AS (SELECT q_id, c_id, cos, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS rn FROM s) SELECT q_id, CAST(rn AS INT) AS rn, c_id, CAST(floor(cos*1000000 + 0.5) AS BIGINT) AS score_e6 FROM r WHERE rn <= 5 ORDER BY q_id, rn"),
    "q_sim_threshold" ->
      ("WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 100), s AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id, " +
        cosSql("a.embedding", "b.embedding") +
        " AS cos FROM e a, e b WHERE a.vec_id < b.vec_id) SELECT a_id, b_id, CAST(floor(cos*1000000 + 0.5) AS BIGINT) AS score_e6 FROM s WHERE cos >= 0.3 ORDER BY a_id, b_id"),
    "q_text_tokens" ->
      ("SELECT tok, count(*) AS n FROM (SELECT unnest(string_split(lower(text),' ')) AS tok FROM documents) WHERE tok <> '' AND tok NOT IN (" +
        stopwords.map(w => s"'$w'").mkString(",") +
        ") GROUP BY tok ORDER BY n DESC, tok LIMIT 20"),
    "q_text_tfidf" ->
      "WITH t AS (SELECT doc_id, unnest(string_split(lower(text),' ')) AS tok FROM documents), tf AS (SELECT doc_id, tok, count(*) AS n FROM t WHERE tok <> '' GROUP BY doc_id, tok), x AS (SELECT doc_id, tok, n, sum(n) OVER (PARTITION BY doc_id) AS len, count(*) OVER (PARTITION BY tok) AS df FROM tf), nd AS (SELECT count(DISTINCT doc_id) AS nd FROM documents), s AS (SELECT doc_id, tok, (n/len)*ln(nd/df) AS score FROM x, nd), r AS (SELECT doc_id, tok, score, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, tok) AS rn FROM s) SELECT doc_id, tok, CAST(floor(score*1000000 + 0.5) AS BIGINT) AS score_e6 FROM r WHERE rn = 1 ORDER BY doc_id",
    "q_text_bm25" ->
      ("WITH t AS (SELECT doc_id, unnest(string_split(lower(text),' ')) AS tok FROM documents), " +
        "tk AS (SELECT doc_id, tok FROM t WHERE tok <> ''), " +
        "dlen AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM tk GROUP BY 1), " +
        "corpus AS (SELECT CAST(count(*) AS BIGINT) AS nd, CAST(sum(dl) AS BIGINT) AS toktot FROM dlen), " +
        "tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf FROM tk WHERE tok IN ('data', 'table', 'join') GROUP BY 1, 2), " +
        "dfc AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1), " +
        "sc AS (SELECT tf.doc_id, CAST(floor(ln(1.0 + (nd - df + 0.5)/(df + 0.5)) * " +
        "(tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / (CAST(toktot AS DOUBLE)/nd))) " +
        "* 1000000 + 0.5) AS BIGINT) AS s_e6 " +
        "FROM tf JOIN dfc ON tf.tok = dfc.tok JOIN dlen ON tf.doc_id = dlen.doc_id CROSS JOIN corpus) " +
        "SELECT doc_id, CAST(sum(s_e6) AS BIGINT) AS bm25_e6, CAST(count(*) AS BIGINT) AS n_terms " +
        "FROM sc GROUP BY 1 ORDER BY bm25_e6 DESC, doc_id LIMIT 20"),
    "q_text_perplexity" ->
      ("WITH t AS (SELECT doc_id, unnest(string_split(lower(text),' ')) AS tok FROM documents), " +
        "tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf FROM t WHERE tok <> '' GROUP BY 1, 2), " +
        "ct AS (SELECT tok, CAST(sum(tf) AS BIGINT) AS nt FROM tf GROUP BY 1), " +
        "tot AS (SELECT CAST(sum(nt) AS BIGINT) AS toktot FROM ct), " +
        "h AS (SELECT doc_id, tf, CAST(floor(tf * (-ln(CAST(nt AS DOUBLE) / toktot)) * 1000000 + 0.5) AS BIGINT) AS h_e6 " +
        "FROM tf JOIN ct ON tf.tok = ct.tok CROSS JOIN tot), " +
        "g AS (SELECT doc_id, CAST(sum(h_e6) AS BIGINT) AS hsum_e6, CAST(sum(tf) AS BIGINT) AS dl FROM h GROUP BY 1) " +
        "SELECT doc_id, dl, CAST(floor(CAST(hsum_e6 AS DOUBLE) / dl + 0.5) AS BIGINT) AS xent_e6 " +
        "FROM g ORDER BY doc_id"),
    "q_text_ngram" ->
      "SELECT bg, count(*) AS n FROM (SELECT unnest(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])) AS bg FROM (SELECT string_split(lower(text),' ') AS toks FROM documents)) GROUP BY bg HAVING count(*) >= 5 ORDER BY bg",
    "q_text_stats" ->
      "SELECT lang, count(*) AS n_docs, sum(n_chars)/count(*) AS avg_chars, sum(len(string_split(text,' ')))/count(*) AS avg_toks FROM documents GROUP BY lang ORDER BY lang",
    "q_multimodal" ->
      "WITH j AS (SELECT d.source, e.label, CAST(floor(sqrt(list_reduce(list_transform(e.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)), (p,v) -> p+v))*1000000 + 0.5) AS BIGINT) AS norm_e6 FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id) SELECT source, label, count(*) AS n, sum(norm_e6)/count(*) AS avg_norm_e6 FROM j GROUP BY source, label ORDER BY source, label"
  )
}
