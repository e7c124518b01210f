package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-selection importance weighting (after DSIR — Xie et al., "Data
  * Selection for Language Models via Importance Resampling", NeurIPS
  * 2023): score every candidate document by how much its hashed-n-gram
  * feature distribution looks like a TARGET domain relative to the raw
  * corpus, then keep the highest-scoring candidates. The published method
  * uses log-ratio sums of hashed-unigram probabilities; this is the same
  * estimator in ALL-INTEGER arithmetic — per-bucket ratio
  * `tgt_count * scale DIV raw_count` summed per document occurrence —
  * so scores are exact BIGINT sums under the differential oracle (float
  * log-sums are partition-order-dependent; ln is not even guaranteed
  * correctly-rounded across engines). Ratio-sum vs log-ratio-sum changes
  * the estimator's shape, not its discriminative ordering on
  * distinguishable domains, and buys bit-exactness.
  *
  * Buckets use [[Sampling.hashBucket]]'s engine-portable md5 hash, NOT
  * xxhash64 — the weight table must be reproducible anywhere.
  *
  * Scale shape: the weight table is `buckets` rows (64-10k) — broadcast
  * to every scorer task. Tokenization and bucketing are scan-local
  * projections; the only corpus-sized shuffle is the per-document score
  * groupBy, keyed by doc id with map-side partial sums, carrying
  * (id, bucket-count) longs — text never shuffles. `scale` bounds
  * intermediate magnitude: weight ≤ scale, so a doc's score ≤
  * scale · doc_tokens, and the global sum fits BIGINT through
  * corpus-scale token counts at the default 1e6.
  */
object Importance {

  /** Per-document importance scores of NON-target documents against the
    * `isTarget` domain. Returns (id, n_toks, imp_per_tok): the summed
    * bucket ratio normalized by document length (integer division), the
    * ranking key for selection.
    */
  def importanceScores(docs: DataFrame, id: Column, text: Column,
                       isTarget: Column, buckets: Int = 64,
                       scale: Long = 1000000L): DataFrame = {
    val toks = Text.tokens(Text.normalized(text))
    val bucketed = docs
      .select(id.as("id"), isTarget.as("is_tgt"), toks.as("toks"))
      .select(col("id"), col("is_tgt"), explode(col("toks")).as("term"))
      .withColumn("b", Sampling.hashBucket(col("term"), buckets))
      .select(col("id"), col("is_tgt"), col("b"))
    val w = bucketed.groupBy(col("b"))
      .agg(count(lit(1)).as("rc"),
        count(when(col("is_tgt"), 1)).as("tc"))
      .select(col("b"), expr(s"(tc * ${scale}L) DIV rc").as("w"))
    bucketed.filter(!col("is_tgt"))
      .join(broadcast(w), "b")
      .groupBy(col("id"))
      .agg(sum(col("w")).as("imp"), count(lit(1)).as("n_toks"))
      .select(col("id"), col("n_toks"), expr("imp DIV n_toks").as("imp_per_tok"))
  }
}
