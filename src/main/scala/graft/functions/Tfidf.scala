package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TF-IDF term weighting over a document corpus — the classic text-analysis
  * pipeline as three relational steps: explode tokens → per-(doc, term)
  * counts → join document frequencies. All shuffles are on the term column
  * (narrow strings); the corpus-size scalar rides along via a broadcast
  * cross join.
  *
  * idf = ln(N / df) — natural log, no smoothing, so the oracle SQL is the
  * plain textbook formula.
  */
object Tfidf {

  /** (doc_id, term, tf) — term counts per document. */
  def termCounts(docs: DataFrame, idCol: Column, textCol: Column): DataFrame =
    docs
      .select(idCol.as("doc_id"),
        explode(Text.tokens(Text.normalized(textCol))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))

  /** (term, df) — number of documents containing each term. */
  def docFrequencies(termCountsDf: DataFrame): DataFrame =
    termCountsDf.groupBy(col("term"))
      .agg(countDistinct(col("doc_id")).as("df"))

  /** (doc_id, term, tf, tf_idf) for the whole corpus.
    *
    * Document frequency comes from a window over the per-(doc, term) counts
    * — `tc` has exactly one row per (doc, term), so `count(*)` over the
    * term partition IS df. The alternative ([[docFrequencies]] + self-join)
    * computes the explode→aggregate subtree twice, because Spark does not
    * share common subplans across a self-join's two sides — at corpus scale
    * that is a second full pass over the text.
    */
  def tfIdf(docs: DataFrame, idCol: Column, textCol: Column): DataFrame = {
    val tc = termCounts(docs, idCol, textCol)
    val n = docs.select(idCol).distinct()
      .agg(count(lit(1)).as("n_docs"))
    tc.withColumn("df", count(lit(1)).over(Window.partitionBy(col("term"))))
      .crossJoin(broadcast(n))
      .withColumn("tf_idf",
        col("tf").cast("double") * log(col("n_docs").cast("double") / col("df").cast("double")))
      .select(col("doc_id"), col("term"), col("tf"), col("tf_idf"))
  }

  /** Top-k most characteristic terms per document (ties broken by term for
    * determinism).
    */
  def topTerms(docs: DataFrame, idCol: Column, textCol: Column, k: Int): DataFrame = {
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tf_idf").desc, col("term").asc)
    tfIdf(docs, idCol, textCol)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
  }

  /** Sparse retrieval: for each query document, the top-k corpus documents
    * by integer-scaled BM25 over the inverted index:
    *
    *   score(q, d) = Σ_t  tf_q(t) · w(t) · tfc(t, d)
    *
    * where `w = floor(1e6 / df)` is the integer idf weight and `tfc` is the
    * BM25 term-frequency saturation with k1 = 1.2, b = 0.75 held as exact
    * rationals (k1 = 6/5, b = 3/4):
    *
    *   tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    *     = 22·tf·avgdl / (10·avgdl·tf + 3·avgdl + 9·dl)
    *
    * integer-scaled ×10⁴ with a single integral division per posting, and
    * `avgdl = total_tokens DIV n_corpus`. Every intermediate is a BIGINT
    * and every division is integral, so scores are EXACT integer sums
    * (real BM25's `ln` and float accumulation are neither engine-portable
    * nor partition-order-free; the scaled-rational form keeps rare-term
    * emphasis, tf saturation AND length normalization while staying under
    * the differential oracle).
    *
    * Scale shape: the classic inverted-index probe — the corpus side
    * shuffles once on the term; the query side is tiny by construction
    * (a handful of query documents vs the corpus), so it is PINNED as the
    * broadcast side — without the pin, Spark can plan a sort-merge join
    * that shuffles the entire postings list on term. Matches aggregate per
    * (query, doc) pair and a per-query window takes top-k. (r17: see the
    * inline df note — a query-side df aggregate was tried and measured
    * slower; the plan-diamond re-execution costs more than the window.) Stopword-scale
    * terms flood the join (|q docs| × |d docs| rows per term): terms in
    * more than `maxDfFrac` of the corpus are dropped — visibly, via
    * `observe()` — which is what a real retrieval stack's stopword list
    * does. The cap is a fraction, not a count, so the same query text
    * survives a 100× corpus scale-up unchanged. The corpus-stats scalars
    * (n_corpus, total token count) ride in on 1-row broadcasts —
    * total_tokens is a scan-local `sum(size(tokens))` (no explode, no
    * shuffle), and the per-doc length `dl` rides through the term-count
    * aggregate as a functionally-dependent group key instead of costing
    * its own full-index window shuffle.
    */
  def sparseTopK(corpus: DataFrame, corpusId: Column, corpusText: Column,
                 queries: DataFrame, queryId: Column, queryText: Column,
                 k: Int, maxDfFrac: Double = 0.5): DataFrame = {
    val n = corpus.agg(count(lit(1)).as("n_corpus"))
    val corpusToks = Text.tokens(Text.normalized(corpusText))
    val tot = corpus.agg(sum(size(corpusToks)).as("total_tokens"))
    // dl MUST become an attribute BEFORE the explode select: a generator
    // select evaluates its non-generator expressions ABOVE the Generate,
    // so an inline size(tokens) would re-tokenize once per exploded TOKEN
    // (a measured 3.6x on the whole query), not once per document.
    // df via count().over(partitionBy(term)) ON the tf aggregate — a
    // DELIBERATE, measured choice (r17): the tempting alternative (df as a
    // groupBy(term) aggregate attached to the query side, killing the
    // window's term-keyed exchange) creates a plan DIAMOND — the tf
    // subtree feeds both df and the probe, and Spark re-executes shared
    // subplans rather than CSE-ing them — so the whole scan+tokenize+
    // explode+aggregate ran twice and q90/q100 measured 40-70% SLOWER at
    // sf10 in interleaved A/B. The window re-uses the single tf execution
    // in-plan; its term-keyed exchange lands in ≤|vocab| non-empty
    // partitions, which is skewed only on a degenerate vocabulary (this
    // fixture's ~40 words) and well-spread on any real corpus. At true
    // index scale the production answer is a MATERIALIZED inverted index
    // (build once, probe many), not per-query recomputation.
    val ct = corpus
      .select(corpusId.as("d"), corpusToks.as("toks"))
      .withColumn("dl", size(col("toks")))
      .select(col("d"), col("dl"), explode(col("toks")).as("term"))
      .groupBy(col("d"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf_d"))
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("term"))))
      .crossJoin(broadcast(n))
      .crossJoin(broadcast(tot))
      .observe("graft.sparse_topk",
        count(when(col("df") > col("n_corpus") * maxDfFrac, 1)).as("hot_term_rows_dropped"))
      .filter(col("df") <= col("n_corpus") * maxDfFrac)
      .withColumn("w", floor(lit(1000000L) / col("df")))
      .withColumn("avgdl", expr("total_tokens DIV n_corpus"))
      .withColumn("tfc", expr(
        "(10000 * 22 * tf_d * avgdl) DIV (10 * avgdl * tf_d + 3 * avgdl + 9 * dl)"))
    val qt = termCounts(queries, queryId, queryText)
      .withColumnRenamed("doc_id", "q").withColumnRenamed("tf", "tf_q")
    val rank = Window.partitionBy(col("q"))
      .orderBy(col("score").desc, col("d").asc)
    broadcast(qt).join(ct, Seq("term"))
      .groupBy(col("q"), col("d"))
      .agg(sum(col("tf_q") * col("w") * col("tfc")).as("score"))
      .withColumn("rnk", row_number().over(rank))
      .filter(col("rnk") <= k)
      .select(col("q"), col("d"), col("score"), col("rnk"))
  }

  /** The corpus's `vocabSize` most frequent terms (ties broken by term) —
    * the vocabulary a coverage/data-mixing pass scores against.
    */
  def vocabTopK(docs: DataFrame, idCol: Column, textCol: Column,
                vocabSize: Int): DataFrame =
    docs
      .select(explode(Text.tokens(Text.normalized(textCol))).as("term"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("term"))
      .limit(vocabSize)
      .select(col("term"))

  /** Per-document out-of-vocabulary rate against [[vocabTopK]]: token
    * instances whose term is not in the vocabulary, over all tokens. The
    * vocabulary is tiny by construction, so the membership join is a
    * broadcast — the corpus explodes once and never shuffles its text; the
    * only wide shuffle is the per-doc aggregate on doc_id.
    */
  def oovRate(docs: DataFrame, idCol: Column, textCol: Column,
              vocabSize: Int): DataFrame = {
    val toks = docs.select(idCol.as("doc_id"),
      explode(Text.tokens(Text.normalized(textCol))).as("term"))
    val vocab = vocabTopK(docs, idCol, textCol, vocabSize)
      .withColumn("in_vocab", lit(1))
    toks.join(broadcast(vocab), Seq("term"), "left_outer")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        count(when(col("in_vocab").isNull, 1)).as("n_oov"))
      .withColumn("oov_rate", col("n_oov").cast("double") / col("n_tokens"))
  }
}
