package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank-list fusion for hybrid retrieval.
  *
  * Modern retrieval stacks (and the retrieval side of training-data
  * curation — e.g. dense+sparse mining of pretraining documents for a
  * target domain) run SEVERAL rankers over the same corpus — BM25 over
  * text, cosine over embeddings — and merge their top-k lists.
  * Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009) is
  * the standard merge: each list contributes 1/(K + rank) for every item
  * it ranked, so agreement across rankers beats a single high rank, and
  * no score calibration between heterogeneous rankers is needed — only
  * ranks flow across ranker boundaries.
  *
  * Implemented with integer weights — `1_000_000 DIV (K + rank)` — so
  * the fused score is a BIGINT sum, exact and engine-portable (the same
  * discipline as the integer BM25 in [[Tfidf.sparseTopK]]): a float
  * 1/(K+r) sum would be partition-order-dependent and fall out of the
  * differential oracle. With K = 60 the weights stay distinct through
  * rank ≈ 900, far past any practical per-list k.
  *
  * Scale shape: inputs are ALREADY top-k-per-query lists (k rows per
  * query per ranker — the expensive corpus-sized work happened inside
  * each ranker, bucketed/broadcast there). The fusion itself unions
  * q·k·lists narrow (query, item, rank) rows and aggregates on
  * (query, item): nothing corpus-sized shuffles here, no text, no
  * vectors — it is the cheap tail of the pipeline by construction.
  */
object Fusion {

  /** Fuse rank lists. Each input must expose `queryCol`, `itemCol`,
    * `rankCol` (1-based rank within its query). Returns per query the
    * top `k` items by fused score with columns
    * (query, item, rrf_score, n_lists, rnk) — `n_lists` is how many
    * input lists ranked the item (the agreement signal), ties broken by
    * ascending item id.
    */
  def reciprocalRankFusion(lists: Seq[DataFrame], queryCol: String,
                           itemCol: String, rankCol: String, k: Int,
                           rrfK: Int = 60): DataFrame = {
    require(lists.nonEmpty, "at least one rank list")
    val unioned = lists.map(_.select(
        col(queryCol).as("query"), col(itemCol).as("item"),
        col(rankCol).as("rank")))
      .reduce(_.unionByName(_))
    val w = Window.partitionBy(col("query"))
      .orderBy(col("rrf_score").desc, col("item").asc)
    unioned
      .groupBy(col("query"), col("item"))
      .agg(sum(expr(s"1000000 DIV ($rrfK + rank)")).as("rrf_score"),
        count(lit(1)).as("n_lists"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
  }
}
