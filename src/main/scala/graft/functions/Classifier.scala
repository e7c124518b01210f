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
  * bucket `b` is the integer-scaled difference of its per-class
  * DOCUMENT-PRESENCE rates over the train split (the Bernoulli
  * naive-Bayes feature shape) — the class-balanced linear model a
  * single pass of counting yields. Feature selection
  * keeps the `topK` buckets by |weight| (ties broken by bucket id), so
  * the deployed model is a FIXED-SIZE table no matter how large the
  * train corpus grows — that is what makes the scorer a broadcast join
  * at 100 TB. Everything is BIGINT, so train and inference replay
  * exactly in any engine under the differential oracle.
  *
  * Buckets use [[Sampling.hashBucket]]'s engine-portable md5 hash (NOT
  * xxhash64): the model must be reproducible anywhere.
  *
  * Scale shape: training explodes tokens scan-locally, dedups to
  * distinct (doc, bucket) presence pairs (a shuffle keyed by the
  * high-cardinality pair, with map-side partial dedup), then aggregates
  * by bucket — a low-cardinality groupBy is SAFE (unlike a
  * low-cardinality window) because map-side partial aggregation
  * collapses each task's contribution to ≤ `buckets` rows before the
  * shuffle. The top-K cut is `orderBy.limit(topK)` — Spark's
  * TakeOrdered, a per-partition partial top-K then a tiny driver merge,
  * never a single-partition sort. Inference dedups the same way,
  * broadcasts the K-row model against the distinct (id, bucket) pairs,
  * and sums per document — a groupBy keyed by the high-cardinality doc
  * id carrying only longs. Text never shuffles.
  */
object Classifier {

  /** The trained model: (b, w) — hashed bucket and its integer weight,
    * the `topK` buckets most discriminative between `label` = true/false
    * documents in `docs` (which should already be the train split). The
    * weight is the DOCUMENT-PRESENCE rate difference, integer-scaled:
    *
    *   w(b) = docs_pos(b)·scale DIV n_pos − docs_neg(b)·scale DIV n_neg
    *
    * i.e. how much more of the positive class contains the bucket than
    * the negative class. Presence rates (not occurrence rates) for two
    * reasons: raw count differences would let the majority class swamp
    * every bucket, and occurrence rates are diluted by whatever else a
    * labeled document contains — a token in every positive and every
    * negative document cancels EXACTLY here, while a token exclusive to
    * one class scores the full ±scale. All BIGINT. Requires both classes
    * present in the train split. Deterministic: ties at the |w| cut
    * break by bucket id.
    */
  def hashedLinearModel(docs: DataFrame, id: Column, text: Column,
                        label: Column, buckets: Int = 4096, topK: Int = 256,
                        scale: Long = 1000000L): DataFrame = {
    val present = docs
      .select(id.as("id"), label.as("y"),
        explode(Text.tokens(Text.normalized(text))).as("term"))
      .withColumn("b", Sampling.hashBucket(col("term"), buckets))
      .select(col("id"), col("y"), col("b")).distinct()
    val totals = docs.agg(
      count(when(label, 1)).as("np"),
      count(when(!label, 1)).as("nn"))
    present.groupBy(col("b"))
      .agg(count(when(col("y"), 1)).as("cp"),
        count(when(!col("y"), 1)).as("cn"))
      .crossJoin(broadcast(totals))
      .select(col("b"),
        expr(s"(cp * ${scale}L) DIV np - (cn * ${scale}L) DIV nn").as("w"))
      .filter(col("w") =!= 0L)
      .orderBy(abs(col("w")).desc, col("b").asc)
      .limit(topK)
  }

  /** The scorer as ONE stateless expression over a driver-exported model
    * (bucket → weight): distinct-presence bucket weights summed with
    * array ops — [[scoreDocs]]' exact semantics without the
    * explode+aggregate, which is what a STREAMING deployment needs (a
    * per-row projection adds no state store; the 256-entry model rides as
    * a map literal in the plan, the broadcast-join analogue for a
    * micro-batch). Also the cheapest batch form when the model is already
    * on the driver, e.g. loaded from a model registry.
    */
  def scoreExpr(model: Map[Long, Long], text: Column,
                buckets: Int = 4096): Column =
    if (model.isEmpty) lit(0L)
    else {
      val m = map(model.toSeq.sortBy(_._1)
        .flatMap { case (b, w) => Seq(lit(b), lit(w)) }: _*)
      val present = array_distinct(transform(
        Text.tokens(Text.normalized(text)),
        t => Sampling.hashBucket(t, buckets)))
      aggregate(transform(present, b => coalesce(element_at(m, b), lit(0L))),
        lit(0L), _ + _)
    }

  /** Score `docs` with a trained model: returns (id, score, pred) —
    * the integer weight sum over the DISTINCT model buckets present in
    * the document (matching the model's presence semantics; 0 if none —
    * every input document gets a row) and the sign prediction
    * `score > 0`. The model is pinned as the broadcast side; only
    * distinct (id, bucket) longs shuffle.
    */
  def scoreDocs(docs: DataFrame, id: Column, text: Column,
                model: DataFrame, buckets: Int = 4096): DataFrame = {
    val sums = docs
      .select(id.as("id"),
        explode(Text.tokens(Text.normalized(text))).as("term"))
      .withColumn("b", Sampling.hashBucket(col("term"), buckets))
      .select(col("id"), col("b")).distinct()
      .join(broadcast(model), "b")
      .groupBy(col("id"))
      .agg(sum(col("w")).as("score"))
    docs.select(id.as("id"))
      .join(sums, Seq("id"), "left")
      .select(col("id"), coalesce(col("score"), lit(0L)).as("score"))
      .withColumn("pred", col("score") > 0L)
  }
}
