package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling / split operators for training-data pipelines.
  *
  * Everything here is a pure function of the record key — no RNG state, no
  * `rand()` — so splits are reproducible run-over-run, stable under
  * repartitioning, and incrementally consistent: a document keeps its split
  * forever as the corpus grows, which is what makes 100 TB split
  * maintenance an append-only problem instead of a global reshuffle. The
  * md5-derived bucket is plain SQL on any engine (same derivation as
  * [[graft.plans.SimHash32Md5]]'s per-token hash), so every operator runs
  * under the DuckDB differential oracle.
  */
object Sampling {

  /** Stable bucket in [0, buckets) from the md5 of the key rendered as a
    * string: first 8 hex chars read as an unsigned 32-bit int, mod buckets.
    * (`('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 8))::BIGINT % n` in
    * DuckDB.)
    */
  def hashBucket(key: Column, buckets: Int = 100): Column =
    pmod(conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long"),
      lit(buckets.toLong))

  /** Train/validation/test assignment from the stable bucket: percentages
    * are cut points in [0,100). A scan-local projection — splitting a
    * 100 TB corpus shuffles nothing.
    */
  def split(key: Column, trainPct: Int, valPct: Int): Column = {
    val b = hashBucket(key)
    when(b < trainPct, lit("train"))
      .when(b < trainPct + valPct, lit("val"))
      .otherwise(lit("test"))
  }

  /** Sequence packing for training batches: assign each record to a bin of
    * ~`budget` weight (token/char count), packing in key order by running
    * sum — bin = floor((cumulative_before) / budget), so bins are contiguous
    * runs and every bin except a shard's last holds ≥ budget once its
    * straddling record lands. Deterministic (pure function of keys +
    * weights) and plain window SQL on any engine.
    *
    * The running sum is computed per hash shard, NOT globally: a global
    * ORDER BY running sum is a single-partition window — the classic
    * scale-killer — while per-shard packing is embarrassingly parallel and
    * exactly how a 1000-executor packing job shards anyway. Returns the
    * input plus (shard, pack_bin).
    */
  def packByBudget(df: DataFrame, key: Column, weight: Column,
                   budget: Long, shards: Int): DataFrame = {
    val withShard = df.withColumn("shard", hashBucket(key, shards))
    val w = Window.partitionBy(col("shard")).orderBy(key)
    withShard
      .withColumn("pack_bin",
        floor((sum(weight).over(w) - weight) / lit(budget.toDouble)).cast("long"))
  }

  /** Deterministic per-stratum sample: the `perStratum` records of each
    * stratum that rank first in hash order (key as tiebreak). One shuffle on
    * the strata columns; equivalent to uniform sampling within each stratum
    * but reproducible and oracle-checkable, unlike `TABLESAMPLE`/`rand()`.
    * At scale prefer strata that match the table's existing partitioning so
    * the window sorts within partitions.
    */
  def stratifiedSample(df: DataFrame, strata: Seq[Column], key: Column,
                       perStratum: Int): DataFrame = {
    val w = Window.partitionBy(strata: _*)
      .orderBy(hashBucket(key, 1 << 30), key)
    df.withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= perStratum)
  }

  /** Data-mixing quota sample: draw a `total`-record mixture whose stratum
    * proportions follow `weights` (stratum value → fraction; strata absent
    * from the map get quota 0, i.e. are excluded from the mixture). Quota =
    * `floor(weight × total)`, filled by the stratum's first records in hash
    * order — so the mixture is reproducible, append-stable (a stratum's
    * members only extend, never reshuffle), and plain SQL under the oracle.
    * Same single shuffle as [[stratifiedSample]]; the weight CASE is a
    * scan-local projection.
    */
  def mixtureSample(df: DataFrame, stratum: Column, key: Column,
                    weights: Map[String, Double], total: Long): DataFrame = {
    val weightCol = weights.toSeq.sortBy(_._1).foldLeft(lit(0.0)) {
      case (acc, (s, wt)) => when(stratum === s, lit(wt)).otherwise(acc)
    }
    val quota = floor(weightCol * total).cast("long")
    val w = Window.partitionBy(stratum)
      .orderBy(hashBucket(key, 1 << 30), key)
    df.withColumn("mix_rank", row_number().over(w))
      .filter(col("mix_rank") <= quota)
  }

  /** Token-budget mixture: per stratum, admit documents in the repo-wide
    * deterministic hash order until the stratum's TOKEN budget is spent —
    * the mixture primitive when a training mix is specified in tokens
    * rather than document counts (how pretraining mixes are actually
    * stated). The running token sum is a per-stratum window cumsum over a
    * unique total order, so the admitted set is a strict prefix in hash
    * order: once the cumsum exceeds the budget every later document is out
    * too — deterministic and plain SQL under the oracle. Strata absent
    * from `budgets` get budget 0 (excluded). Same single shuffle on the
    * stratum key as [[stratifiedSample]]; the token count is a scan-local
    * projection.
    */
  def tokenBudgetSample(df: DataFrame, stratum: Column, key: Column,
                        tokenCount: Column,
                        budgets: Map[String, Long]): DataFrame = {
    val budgetCol = budgets.toSeq.sortBy(_._1).foldLeft(lit(0L)) {
      case (acc, (s, b)) => when(stratum === s, lit(b)).otherwise(acc)
    }
    val w = Window.partitionBy(stratum)
      .orderBy(hashBucket(key, 1 << 30), key)
    df.withColumn("n_tokens", tokenCount.cast("long"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= budgetCol)
  }

  /** Per-stratum quantile binning: rank by (`metric`, `tiebreak`) inside
    * each stratum and cut into `n` equal-count bins (`ntile` — SQL-standard
    * bucket sizing, so any engine agrees). The unique tiebreak makes the
    * assignment total-order deterministic. This is the quality-decile
    * labeling a mixture sampler weights by ("sample 3× more from the top
    * quality decile"): one shuffle on the stratum key, bounded per-stratum
    * sort.
    */
  def quantileBins(df: DataFrame, stratum: Column, metric: Column,
                   tiebreak: Column, n: Int): DataFrame =
    df.withColumn("bin",
      ntile(n).over(Window.partitionBy(stratum).orderBy(metric, tiebreak)))
}
