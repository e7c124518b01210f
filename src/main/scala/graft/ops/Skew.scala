package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers for hot keys at cluster scale.
  *
  * AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`) covers
  * sort-merge joins automatically; these helpers cover the two cases it
  * doesn't: skewed aggregations, and broadcast-ineligible joins where the
  * skew is known ahead of time (the reference's world has both: a handful of
  * topics carry most events, and run-id groupings concentrate on the latest
  * run).
  */
object Skew {

  /** Two-phase aggregation for skewed group keys: add a random salt from a
    * fixed bucket count, pre-aggregate on (key, salt) — map-side combine
    * spreads the hot key over `buckets` reducers — then finish on the key.
    *
    * `partialAggs` must be decomposable (sum/count/min/max — the algebraic
    * aggregates; avg must be expressed as sum+count by the caller).
    * `finalAggs` combines the partial columns.
    */
  def saltedAggregate(df: DataFrame, keys: Seq[Column], buckets: Int,
                      partialAggs: Seq[Column], finalAggs: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt",
      (rand(seed = 42) * buckets).cast("int"))
    salted
      .groupBy(keys :+ col("__salt"): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
      .groupBy(keys: _*)
      .agg(finalAggs.head, finalAggs.tail: _*)
  }

  /** Salted join of a skewed fact side against a dimension too large to
    * broadcast: replicate each dim row `buckets` times (one per salt), salt
    * the fact side randomly, join on (key, salt). The hot key's rows land on
    * `buckets` different reducers instead of one.
    *
    * Only fact-preserving join types are sound: the replicated dim side
    * means a `right`/`full` join would emit each UNMATCHED dim row once per
    * salt bucket (`buckets`× duplication). Such joins must salt the other
    * side instead — swap the arguments.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, buckets: Int,
                 joinType: String = "inner"): DataFrame = {
    val factPreserving =
      Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi",
        "semi", "left_anti", "leftanti", "anti")
    require(factPreserving.contains(joinType.toLowerCase.replace(" ", "")),
      s"saltedJoin: joinType '$joinType' is not fact-preserving — unmatched " +
        s"dim rows would be duplicated $buckets times (one per salt). " +
        "Swap the sides so the preserved side is the salted fact.")
    val saltedFact = fact.withColumn("__salt",
      (rand(seed = 42) * buckets).cast("int"))
    val replicatedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedFact.join(replicatedDim, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }

  /** Top-N heavy hitters per key column — the diagnostic that decides
    * whether salting is needed at all (run it on a sample at scale).
    * Ties break on the key so the cut is deterministic (a bare
    * count-ordered LIMIT returns an arbitrary subset of tied keys).
    */
  def heavyHitters(df: DataFrame, key: Column, topN: Int = 20): DataFrame =
    df.groupBy(key).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, key)
      .limit(topN)
}
