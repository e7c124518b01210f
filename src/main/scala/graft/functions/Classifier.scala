package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hashed bag-of-words linear quality classifier — the fastText-style
  * filter every modern pretraining pipeline runs (GPT-3's WebText
  * quality model, CCNet, FineWeb-Edu): learn integer token weights from
  * a labeled TRAIN split, keep only the top-K most discriminative hashed
  * features, and score every held-out document as a plain weighted
  * bag-of-words sum.
  *
  * Training is count-based, not gradient-based: the weight of hash
  * bucket `b` is `(#positive-token-occurrences − #negative-token-
  * occurrences)` over the train split — the integer "log-odds-shaped"
  * linear model a single pass of counting yields. Feature selection
  * keeps the `topK` buckets by |weight| (ties broken by bucket id), so
  * the deployed model is a FIXED-SIZE table no matter how large the
  * train corpus grows — that is what makes the scorer a broadcast join
  * at 100 TB. Everything is BIGINT, so train and inference replay
  * exactly in any engine under the differential oracle.
  *
  * Buckets use [[Sampling.hashBucket]]'s engine-portable md5 hash (NOT
  * xxhash64): the model must be reproducible anywhere.
  *
  * Scale shape: training explodes tokens scan-locally and aggregates by
  * bucket — a low-cardinality groupBy is SAFE (unlike a low-cardinality
  * window) because map-side partial aggregation collapses each task's
  * contribution to ≤ `buckets` rows before the shuffle. The top-K cut is
  * `orderBy.limit(topK)` — Spark's TakeOrdered, a per-partition partial
  * top-K then a tiny driver merge, never a single-partition sort.
  * Inference broadcasts the K-row model, joins it map-side against the
  * exploded (id, bucket) pairs, and sums per document — a groupBy keyed
  * by the high-cardinality doc id carrying only longs. Text never
  * shuffles.
  */
object Classifier {

  /** The trained model: (b, w) — hashed bucket and its integer weight,
    * the `topK` buckets most discriminative between `label` = true/false
    * token occurrences in `docs` (which should already be the train
    * split). Deterministic: ties at the |w| cut break by bucket id.
    */
  def hashedLinearModel(docs: DataFrame, text: Column, label: Column,
                        buckets: Int = 4096, topK: Int = 256): DataFrame =
    docs
      .select(label.as("y"),
        explode(Text.tokens(Text.normalized(text))).as("term"))
      .withColumn("b", Sampling.hashBucket(col("term"), buckets))
      .groupBy(col("b"))
      .agg(sum(when(col("y"), 1L).otherwise(-1L)).as("w"))
      .filter(col("w") =!= 0L)
      .orderBy(abs(col("w")).desc, col("b").asc)
      .limit(topK)

  /** Score `docs` with a trained model: returns (id, score, pred) —
    * the integer weighted bag-of-words sum over the document's tokens
    * that hit a model bucket (0 if none do — every input document gets a
    * row) and the sign prediction `score > 0`. The model is pinned as
    * the broadcast side; only (id, bucket) longs shuffle.
    */
  def scoreDocs(docs: DataFrame, id: Column, text: Column,
                model: DataFrame, buckets: Int = 4096): DataFrame = {
    val sums = docs
      .select(id.as("id"),
        explode(Text.tokens(Text.normalized(text))).as("term"))
      .withColumn("b", Sampling.hashBucket(col("term"), buckets))
      .join(broadcast(model), "b")
      .groupBy(col("id"))
      .agg(sum(col("w")).as("score"))
    docs.select(id.as("id"))
      .join(sums, Seq("id"), "left")
      .select(col("id"), coalesce(col("score"), lit(0L)).as("score"))
      .withColumn("pred", col("score") > 0L)
  }
}
