package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Sparse-retrieval scoring over a document corpus — the BM25 side of
  * a training-data pipeline (mine documents relevant to a benchmark /
  * seed set, rank corpus slices for curriculum mixing, build sparse
  * retrieval baselines next to the dense ANN family in
  * [[Similarity]]).
  *
  * Reference scope: the tailsql engine exposes arbitrary SQL over
  * windows (sql/engine.go); retrieval scoring is part of the
  * LLM-pipeline extension surface, not the reference core.
  */
object Retrieval {

  /** Okapi BM25 top-k: score every document against each query (a
    * small (qid, term) table) and keep the k best per query.
    *
    * score(q, d) = Σ_{t ∈ q} idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    * with the Lucene-style non-negative idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)).
    * N and avgdl are computed over documents with ≥1 token.
    *
    * Shape at scale: the token explode is filtered to query terms
    * FIRST via a broadcast semi-join (the query vocabulary is tiny by
    * contract — queries × terms rows — so the full token stream never
    * shuffles: only matching occurrences reach the (doc, term) tf
    * aggregate). Document lengths ride a separate narrow count keyed
    * by doc; df and avgdl are scalar/term-level aggregates over
    * already-tiny frames and broadcast back. The per-(query, doc)
    * score is a DECIMAL sum of per-term contributions rounded to 6 —
    * order-independent, oracle-exact — and the top-k per query is a
    * rank window Spark executes as WindowGroupLimit (map-side top-k
    * partial, no full sort of the scored set).
    *
    * Ties after rounding rank deterministically by doc_id.
    * Output: (qid, doc_id, bm25, rank), rank 1..k per qid.
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queryTerms: DataFrame, qidCol: String, termCol: String,
               k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val toks = docs.select(col(idCol).as("id"),
        explode(split(lower(col(textCol)), "\\s+")).as("term"))
      .filter(length(col("term")) > 0)
    val dl = toks.groupBy(col("id")).agg(count(lit(1)).as("dl"))
    // N / avgdl over token-bearing docs: two exact longs -> one double
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    // query terms normalize through the SAME lowercasing as document
    // tokens (a mixed-case query term could otherwise never match),
    // and dedupe per query so "Hash" + "hash" can't double-count
    val q = queryTerms.select(col(qidCol).as("qid"),
      lower(col(termCol)).as("term")).distinct()
    val vocab = q.select(col("term")).distinct()
    // only query-term occurrences survive the broadcast semi-join;
    // everything downstream is bounded by |queries| x |corpus hits|
    val hits = toks.join(broadcast(vocab), Seq("term"), "left_semi")
    val tf = hits.groupBy(col("id"), col("term")).agg(count(lit(1)).as("tf"))
    val df_ = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    val idf = log(lit(1.0) +
      (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
        (col("df").cast("double") + lit(0.5)))
    val tfd = col("tf").cast("double")
    val norm = tfd * (lit(k1) + 1.0) /
      (tfd + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl").cast("double") / avgdl))
    val contrib = tf
      .join(broadcast(q), Seq("term"))
      .join(broadcast(df_), Seq("term"))
      .join(dl, Seq("id"))
      .crossJoin(broadcast(stats))
      .withColumn("_c", round(idf * norm, 6).cast("decimal(24,8)"))
    val scored = contrib.groupBy(col("qid"), col("id"))
      .agg(round(sum(col("_c")).cast("double"), 6).as("bm25"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("bm25").desc, col("id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("id"), col("bm25"), col("rank").cast("long").as("rank"))
  }

  /** TF-IDF top-k KEYWORD extraction per document — the classic
    * "what is this document about" signal (topic tagging, domain
    * labeling for mixture weights, index keywords): for each doc the
    * k terms maximizing (tf/dl) · ln(N/df), length-normalized term
    * frequency times inverse document frequency over token-bearing
    * docs. Stopwords die by idf (df ≈ N ⇒ ln ≈ 0) — no list needed.
    *
    * Shape at scale: the SAME lowercase-split token chain as
    * [[bm25TopK]] (the twins cannot drift); ONE (doc, term) tf
    * aggregate off the token stream, df one term-keyed aggregate
    * OVER the distinct (doc, term) frame (never the raw stream), the
    * corpus-level N a broadcast 1-row aggregate. df joins back on
    * term with the strategy left to Spark's size estimate: small
    * vocabularies fit under autoBroadcastJoinThreshold and broadcast,
    * corpus-scale ones exceed it and shuffle-join — no forced hint,
    * the adaptive choice is right at each scale.
    * Top-k per doc is a rank window Spark executes as
    * WindowGroupLimit (map-side top-k partial). Scores round to 6;
    * post-round ties rank by term for determinism.
    * Output: (id, term, tfidf, rank), rank 1..k per id.
    */
  def tfidfTerms(docs: DataFrame, idCol: String, textCol: String,
                 k: Int): DataFrame = {
    require(k >= 1, s"tfidfTerms: k $k must be >= 1")
    val toks = docs.select(col(idCol).as("id"),
        explode(split(lower(col(textCol)), "\\s+")).as("term"))
      .filter(length(col("term")) > 0)
    val tf = toks.groupBy(col("id"), col("term")).agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy(col("id")).agg(sum(col("tf")).as("dl"))
    val df_ = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = dl.agg(count(lit(1)).as("n_docs"))
    val score = (col("tf").cast("double") / col("dl").cast("double")) *
      log(col("n_docs").cast("double") / col("df").cast("double"))
    val w = Window.partitionBy(col("id"))
      .orderBy(col("tfidf").desc, col("term"))
    tf.join(df_, Seq("term"))
      .join(dl, Seq("id"))
      .crossJoin(broadcast(n))
      .withColumn("tfidf", round(score, 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("id"), col("term"), col("tfidf"),
        col("rank").cast("long").as("rank"))
  }
}
