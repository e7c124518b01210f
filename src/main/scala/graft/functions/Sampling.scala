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

  /** Deterministic per-block down-sample for blocked-exact-pairs
    * operators: any `blockCols` block larger than `cap` keeps a
    * ~cap-sized hash-sample of its rows (kept iff
    * hashBucket(id)/10⁶ < cap/bn, all integers), blocks at or under the
    * cap pass through untouched — so a cap above every gate-SF block
    * size is inert at the gates while bounding the quadratic pair frame
    * at corpus scale (the q54/q123 sample-at-scale contract; their
    * oracles carry the verbatim SQL mirror of this predicate). Plan: one
    * block-size rollup broadcast back onto the scan + a scan-local
    * filter — the frame itself never shuffles here.
    */
  def capBlocks(df: DataFrame, blockCols: Seq[String], id: Column,
                cap: Long): DataFrame = {
    // Null-safe (<=>) join on the block keys: groupBy already puts
    // null-keyed rows in their own block, so a plain equi-join would
    // silently drop them from the output entirely — as a shared
    // primitive, a null block key must cap like any other block.
    val keyAliases = blockCols.map(c => s"__capk_$c")
    val sizes = df.groupBy(blockCols.map(col): _*)
      .agg(count(lit(1)).as("__bn"))
      .select(blockCols.zip(keyAliases).map {
        case (c, a) => col(c).as(a) } :+ col("__bn"): _*)
    val joinCond = blockCols.zip(keyAliases)
      .map { case (c, a) => df(c) <=> col(a) }.reduce(_ && _)
    df.join(broadcast(sizes), joinCond)
      .filter(col("__bn") <= cap ||
        hashBucket(id, 1000000) * col("__bn") < lit(cap * 1000000L))
      .drop("__bn").drop(keyAliases: _*)
  }

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

  /** The hash-order space used by every sampler below: ranks and running
    * sums are taken in `(hashBucket(key, 2^30), key)` order, a total order
    * when keys are unique.
    */
  private val HashSpace: Long = 1L << 30

  /** Default shard count for the two-phase samplers. 64 shards splits even
    * a 5-stratum corpus over 320 reducers; raise for bigger clusters (the
    * output is shard-count-invariant, so this is purely a parallelism
    * knob).
    */
  val DefaultShards: Int = 64

  /** Monotone range-shard of the hash-order key: shard boundaries are fixed
    * cuts of the hash space, so sorting by `(shard, h, key)` IS sorting by
    * `(h, key)` — which is what makes the per-shard partials below exactly
    * composable into the global per-stratum rank/cumsum.
    */
  private def hashShard(h: Column, shards: Int): Column =
    floor(h / lit(HashSpace.toDouble / shards)).cast("long")

  /** Deterministic per-stratum sample: the `perStratum` records of each
    * stratum that rank first in hash order (key as tiebreak). Equivalent to
    * uniform sampling within each stratum but reproducible and
    * oracle-checkable, unlike `TABLESAMPLE`/`rand()`.
    *
    * Scale shape (two-phase, the [[packByBudget]] discipline): a stratum is
    * low-cardinality (~5 languages), so a single
    * `Window.partitionBy(stratum)` would hand most of a 100 TB corpus to
    * one reducer. Instead the hash order is range-sharded into
    * `shards` monotone slices: (1) a tiny per-(stratum, shard) count
    * summary plus a prefix sum over shard index locates each shard's
    * starting rank (`__before`); (2) the summary broadcasts back and whole
    * shards with `__before >= perStratum` are dropped scan-locally — only
    * ~1/shards of each stratum ever reaches the rank window; (3) the
    * window partitions by (stratum, shard) — `shards`× the parallelism —
    * and the global rank is exactly `__before + local_rank` because the
    * shard cut is monotone in the hash order. Bit-identical to the
    * single-window form for any shard count.
    *
    * Pass a NARROW projection (key + strata + whatever the caller needs
    * back): every input column rides the rank shuffle, so project before
    * sampling and join survivors back by key if wide columns are needed —
    * document text must never enter a sampler window.
    */
  def stratifiedSample(df: DataFrame, strata: Seq[Column], key: Column,
                       perStratum: Int, shards: Int = DefaultShards): DataFrame = {
    val (aug, keys, sNames) = withShard(df, strata, key, shards)
    val summ = shardSummary(aug, keys, sNames, count(lit(1)))
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("__h"), key)
    aug.join(broadcast(summ), keys)
      .filter(col("__before") < perStratum)
      .withColumn("sample_rank",
        (col("__before") + row_number().over(w)).cast("int"))
      .filter(col("sample_rank") <= perStratum)
      .drop("__h" :: "__shard" :: "__before" :: sNames.toList: _*)
  }

  /** Strata materialized as named columns (`__s0`…) + the hash-order key
    * (`__h`) + its monotone range shard (`__shard`) — the join/window keys
    * every two-phase sampler shares.
    */
  private def withShard(df: DataFrame, strata: Seq[Column], key: Column,
                        shards: Int): (DataFrame, Seq[String], Seq[String]) = {
    val sNames = strata.indices.map(i => s"__s$i")
    val aug = strata.zipWithIndex
      .foldLeft(df) { case (d, (c, i)) => d.withColumn(s"__s$i", c) }
      .withColumn("__h", hashBucket(key, 1 << 30))
      .withColumn("__shard", hashShard(col("__h"), shards))
    (aug, sNames :+ "__shard", sNames)
  }

  /** Per-(stratum, shard) total of `weight` with the prefix sum over
    * preceding shards (`__before`). strata×shards rows — tiny, broadcast to
    * the scan side. The prefix window partitions by the stratum alone, but
    * over this pre-aggregated summary, not the corpus.
    */
  private def shardSummary(aug: DataFrame, keys: Seq[String],
                           sNames: Seq[String], weight: Column): DataFrame =
    aug.groupBy(keys.map(col): _*)
      .agg(weight.as("__c"))
      .withColumn("__before",
        sum(col("__c")).over(Window.partitionBy(sNames.map(col): _*)
          .orderBy(col("__shard"))) - col("__c"))
      .select(keys.map(col) :+ col("__before"): _*)

  /** Data-mixing quota sample: draw a `total`-record mixture whose stratum
    * proportions follow `weights` (stratum value → fraction; strata absent
    * from the map get quota 0, i.e. are excluded from the mixture). Quota =
    * `floor(weight × total)`, filled by the stratum's first records in hash
    * order — so the mixture is reproducible, append-stable (a stratum's
    * members only extend, never reshuffle), and plain SQL under the oracle.
    *
    * Same two-phase shape as [[stratifiedSample]] — shard summary, prefix,
    * scan-local shard pruning against the per-stratum quota (the weight
    * CASE is a scan-local projection), sharded rank window. Pass a narrow
    * projection; see [[stratifiedSample]].
    */
  def mixtureSample(df: DataFrame, stratum: Column, key: Column,
                    weights: Map[String, Double], total: Long,
                    shards: Int = DefaultShards): DataFrame = {
    val weightCol = weights.toSeq.sortBy(_._1).foldLeft(lit(0.0)) {
      case (acc, (s, wt)) => when(stratum === s, lit(wt)).otherwise(acc)
    }
    val quota = floor(weightCol * total).cast("long")
    val (aug, keys, sNames) = withShard(df, Seq(stratum), key, shards)
    val summ = shardSummary(aug, keys, sNames, count(lit(1)))
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("__h"), key)
    aug.join(broadcast(summ), keys)
      .filter(col("__before") < quota)
      .withColumn("mix_rank", (col("__before") + row_number().over(w)).cast("int"))
      .filter(col("mix_rank") <= quota)
      .drop("__h" :: "__shard" :: "__before" :: sNames.toList: _*)
  }

  /** α=½-smoothed ("temperature-scaled") mixture: the rare-stratum
    * upweighting of multilingual pretraining — sample stratum `s` in
    * proportion to `p_s^α` rather than `p_s`, here with α = 1/2 — kept
    * INTEGER-EXACT so the whole mixture sits under the differential
    * oracle: the stratum weight is `isqrt(n_s) = floor(sqrt(n_s))`
    * (deterministic for n < 2^52: correctly-rounded IEEE sqrt is exact on
    * squares and never lands on an integer for non-squares, so both
    * engines agree bit-for-bit) and `quota_s = (total · isqrt(n_s)) div
    * Σ_t isqrt(n_t)` in pure BIGINT — no floating-point SUM whose
    * association order could differ across engines (the q90 integer-BM25
    * discipline). Each stratum admits its first `quota_s` records in the
    * repo-wide hash order, so the draw is reproducible and append-biased
    * the same way as [[mixtureSample]].
    *
    * Scale shape: the stratum-count aggregate, its isqrt weights, and the
    * quota frame are strata-sized (broadcast); the single-row weight-sum
    * joins in-plan (no driver collect). Admission reuses the two-phase
    * sharded rank of [[stratifiedSample]] — no stratum-only window ever
    * sees the corpus. `total · isqrt(n_s)` stays in BIGINT up to
    * total ≈ 9e18 / isqrt(max n_s) — at 10^12 docs per stratum that is
    * total ≤ ~9·10^12, far beyond any mixture size. Pass a narrow
    * projection (see [[stratifiedSample]]).
    */
  def sqrtMixtureSample(df: DataFrame, stratum: Column, key: Column,
                        total: Long, shards: Int = DefaultShards): DataFrame = {
    val (aug, keys, sNames) = withShard(df, Seq(stratum), key, shards)
    val wts = aug.groupBy(col("__s0")).agg(count(lit(1)).as("__n"))
      .withColumn("__w", floor(sqrt(col("__n").cast("double"))).cast("long"))
    val quotas = wts
      .crossJoin(broadcast(wts.agg(sum(col("__w")).as("__wsum"))))
      .withColumn("quota", expr(s"(${total}L * __w) DIV __wsum"))
      .select(col("__s0"), col("quota"))
    val summ = shardSummary(aug, keys, sNames, count(lit(1)))
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("__h"), key)
    aug.join(broadcast(summ), keys)
      .join(broadcast(quotas), sNames)
      .filter(col("__before") < col("quota"))
      .withColumn("mix_rank", (col("__before") + row_number().over(w)).cast("int"))
      .filter(col("mix_rank") <= col("quota"))
      .drop("__h" :: "__shard" :: "__before" :: sNames.toList: _*)
  }

  /** Token-budget mixture: per stratum, admit documents in the repo-wide
    * deterministic hash order until the stratum's TOKEN budget is spent —
    * the mixture primitive when a training mix is specified in tokens
    * rather than document counts (how pretraining mixes are actually
    * stated). The running token sum is taken over a unique total order, so
    * the admitted set is a strict prefix in hash order: once the cumsum
    * exceeds the budget every later document is out too — deterministic
    * and plain SQL under the oracle. Strata absent from `budgets` get
    * budget 0 and are filtered out SCAN-LOCALLY before anything shuffles
    * (which also closes the zero-token-document loophole: a zero-budget
    * stratum is unconditionally empty, even for rows with `cum_tokens = 0`).
    *
    * Two-phase like [[stratifiedSample]], with token-sum partials instead
    * of counts: the shard summary's prefix gives each shard's starting
    * token offset; shards starting beyond the budget are dropped at the
    * scan (`<=`, not `<`, so a zero-weight row exactly AT the boundary
    * still reaches the window — bit-identical to the single-window form);
    * the sharded cumsum + the offset is the exact global cumsum. The token
    * count is a scan-local projection — compute it in a narrow select
    * before calling so text never shuffles.
    */
  def tokenBudgetSample(df: DataFrame, stratum: Column, key: Column,
                        tokenCount: Column, budgets: Map[String, Long],
                        shards: Int = DefaultShards): DataFrame = {
    val budgetCol = budgets.toSeq.sortBy(_._1).foldLeft(lit(0L)) {
      case (acc, (s, b)) => when(stratum === s, lit(b)).otherwise(acc)
    }
    val (aug, keys, sNames) =
      withShard(df.withColumn("n_tokens", tokenCount.cast("long"))
        .filter(budgetCol > 0), Seq(stratum), key, shards)
    val summ = shardSummary(aug, keys, sNames, sum(col("n_tokens")))
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("__h"), key)
    aug.join(broadcast(summ), keys)
      .filter(col("__before") <= budgetCol)
      .withColumn("cum_tokens", col("__before") + sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= budgetCol)
      .drop("__h" :: "__shard" :: "__before" :: sNames.toList: _*)
  }

  /** Weighted (probability-proportional-to-size) sample: per stratum, the
    * `k` records with the smallest priority `hash(key) / weight` — Ohlsson's
    * SEQUENTIAL POISSON SAMPLING, with the engine-portable md5 hash standing
    * in for the uniform draw. Heavier records get proportionally smaller
    * priorities, so inclusion probability grows with weight while the draw
    * stays a pure function of the key: reproducible run-over-run, and
    * append-stable in the weighted sense (a new record displaces at most
    * the current worst). Records with `weight <= 0` are excluded
    * scan-locally.
    *
    * The priority is ONE correctly-rounded IEEE division over two exact
    * BIGINTs, so both engines order identically (the repo's deterministic-
    * doubles discipline: division is exact-rounded; only transcendentals
    * and float SUMS are not portable). Ties break by key.
    *
    * Scale shape: per-stratum top-k, two-phase — a (stratum, shard) window
    * takes each shard's local top-k (narrow rows: pass a narrow
    * projection), then the stratum-only window re-ranks the ≤ k·shards
    * survivors per stratum. No stratum-only window ever sees the corpus;
    * the per-shard top-k retains every global top-k member, so the result
    * is bit-identical to the single-window form.
    */
  def sequentialPoissonSample(df: DataFrame, stratum: Column, key: Column,
                              weight: Column, k: Int,
                              shards: Int = DefaultShards): DataFrame = {
    val (aug, keys, sNames) =
      withShard(df.withColumn("__w", weight.cast("long")).filter(col("__w") > 0),
        Seq(stratum), key, shards)
    val pri = aug.withColumn("__pri",
      col("__h").cast("double") / col("__w").cast("double"))
    val wLocal = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__pri"), key)
    val wStratum = Window.partitionBy(sNames.map(col): _*)
      .orderBy(col("__pri"), key)
    pri.withColumn("__r", row_number().over(wLocal)).filter(col("__r") <= k)
      .withColumn("samp_rank", row_number().over(wStratum).cast("int"))
      .filter(col("samp_rank") <= k)
      .drop("__h" :: "__shard" :: "__pri" :: "__r" :: "__w" :: sNames.toList: _*)
  }

  /** Deterministic per-epoch training order: every record gets an exact
    * global position for each of `epochs` epochs, re-shuffled between
    * epochs by seeding the portable md5 hash with the epoch number — the
    * "reshuffle the corpus every epoch" step of a training run, as a pure
    * function of (epoch, key): reproducible, resumable mid-epoch (position
    * is a value, not an iterator state), and identical in any engine.
    *
    * Scale shape: a global ORDER BY per epoch would be a single-partition
    * sort of the corpus. Instead the hash order is range-sharded
    * ([[hashShard]] is monotone), a per-(epoch, shard) count summary +
    * prefix sum locates each shard's starting position, and the exact
    * global position is `shard_start + local_rank` from a window that
    * partitions by (epoch, shard) — `shards`× the parallelism, no
    * corpus-wide sort anywhere, bit-identical to the single-window form.
    * Pass a narrow projection (the key); join wide columns back by key.
    */
  def epochShuffle(df: DataFrame, key: Column, epochs: Int,
                   shards: Int = DefaultShards): DataFrame = {
    val aug = df
      .withColumn("epoch", explode(lit((1 to epochs).toArray)))
      .withColumn("__h", hashBucket(
        concat(col("epoch").cast("string"), lit("|"), key.cast("string")),
        1 << 30))
      .withColumn("__shard", hashShard(col("__h"), shards))
    val summ = aug.groupBy(col("epoch"), col("__shard"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__before", sum(col("__c")).over(
        Window.partitionBy(col("epoch")).orderBy(col("__shard"))) - col("__c"))
      .select(col("epoch"), col("__shard"), col("__before"))
    val w = Window.partitionBy(col("epoch"), col("__shard"))
      .orderBy(col("__h"), key)
    aug.join(broadcast(summ), Seq("epoch", "__shard"))
      .withColumn("pos", (col("__before") + row_number().over(w)).cast("long"))
      .drop("__h", "__shard", "__before", "__c")
  }

  /** Mixture EPOCH plan: how many times to repeat each stratum (source)
    * to realize a token budget under sqrt-temperature mixture weights —
    * the step that turns "mix these corpora at these weights" into the
    * per-source repeat factors a training run actually consumes (e.g.
    * "books ×2.4 epochs, web ×0.3"). Weights are `isqrt(avail_tokens)`
    * (exact for the same reason as [[sqrtMixtureSample]]); the stratum's
    * token target is `budget · w DIV Σw` and its repeat factor
    * `epochs_milli = ceil(1000 · target / avail)` — all BIGINT ceil/floor
    * rationals, so the plan replays exactly in any engine.
    *
    * Scale shape: one pass — the per-stratum aggregate is a
    * low-cardinality groupBy (map-side partials), and the weight
    * normalization runs as a window over the STRATA-SIZED summary (the
    * [[exactQuantiles]] pattern), not a second corpus scan the
    * self-join-on-aggregate form would cost.
    */
  def epochPlan(df: DataFrame, stratum: Column, tokenCount: Column,
                budget: Long): DataFrame = {
    val avail = df.groupBy(stratum.as("stratum"))
      .agg(count(lit(1)).as("n_docs"),
        sum(tokenCount.cast("long")).as("avail_tokens"))
      .withColumn("__w",
        floor(sqrt(col("avail_tokens").cast("double"))).cast("long"))
    avail
      .withColumn("__wsum", sum(col("__w")).over(Window.partitionBy()))
      .withColumn("target_tokens", expr(s"(${budget}L * __w) DIV __wsum"))
      .withColumn("epochs_milli",
        expr("(1000L * target_tokens + avail_tokens - 1) DIV avail_tokens"))
      .drop("__w", "__wsum")
  }

  /** Exact per-stratum quantiles of a DISCRETE metric (lengths, token
    * counts, scores) by histogram rank-math — the quantile column of a
    * dataset "data card", exact where `approx_percentile` is
    * engine-specific (q61's HLL lesson: estimates are never under a
    * differential oracle). For each q in `qs`, the reported value is the
    * smallest metric value whose cumulative count reaches `ceil(q·n)` —
    * the inverse-ECDF (type-1) quantile. `ceil(q·n)` is one IEEE multiply
    * + ceil on both engines: identical bit pattern in, identical integer
    * out; every sum/count is BIGINT-exact.
    *
    * Scale shape: one narrow `(strata, value)` count histogram over the
    * corpus — the same two-phase discipline as [[quantileBins]] — then
    * BOTH windows (running cum, stratum total) run over the histogram,
    * whose size is strata × distinct-values, not the corpus. No corpus
    * sort, no corpus window, nothing wide ever shuffles. One metric VALUE
    * dominating a stratum costs nothing here (it is one histogram row).
    *
    * `strata` are column NAMES (they come back as the grouping key);
    * quantile columns are named `p<round(q*100)>`.
    */
  def exactQuantiles(df: DataFrame, strata: Seq[String], metric: Column,
                     qs: Seq[Double]): DataFrame = {
    val sCols = strata.map(col)
    val hist = df.withColumn("__m", metric.cast("long"))
      .groupBy(sCols :+ col("__m"): _*).agg(count(lit(1)).as("__c"))
    val cum = hist
      .withColumn("__cum", sum(col("__c")).over(
        Window.partitionBy(sCols: _*).orderBy(col("__m"))))
      .withColumn("__n", sum(col("__c")).over(Window.partitionBy(sCols: _*)))
    val aggs = qs.map(q =>
      min(when(col("__cum") >= ceil(lit(q) * col("__n")), col("__m")))
        .as(s"p${(q * 100).round}"))
    cum.groupBy(sCols: _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Per-stratum quantile binning: rank by (`metric`, `tiebreak`) inside
    * each stratum and cut into `n` equal-count bins with SQL-standard
    * `ntile` sizing (first `total % n` buckets take one extra row), so any
    * engine agrees. The unique tiebreak makes the assignment total-order
    * deterministic. This is the quality-decile labeling a mixture sampler
    * weights by ("sample 3× more from the top quality decile").
    *
    * Scale shape — histogram two-phase, no corpus-wide sort at all: ntile
    * only needs each row's rank in (metric, tiebreak) order, and rank
    * decomposes into "rows with a smaller metric" + "tie position". (1) A
    * per-(stratum, metric-value) count histogram (narrow aggregate; small
    * because the metric is discrete — lengths, scores) gets a prefix sum →
    * each value's starting rank and the stratum total. (2) The histogram
    * broadcasts back; a value-group whose whole rank range [start,
    * start+count-1] lands in ONE bucket — the overwhelming majority —
    * takes its bin as a pure scan-local projection. (3) Only groups that
    * STRADDLE a bucket boundary (≤ n−1 per stratum) go through a tie
    * window, partitioned by (stratum, metric), to split exactly at the
    * boundary. Bit-identical to single-window `ntile`; the only residual
    * hot spot is one metric VALUE dominating a stratum, which no exact
    * tie order can shard. Pass a narrow projection (see
    * [[stratifiedSample]]).
    */
  def quantileBins(df: DataFrame, stratum: Column, metric: Column,
                   tiebreak: Column, n: Int): DataFrame = {
    val aug = df.withColumn("__st", stratum).withColumn("__m", metric)
    val wPrefix = Window.partitionBy(col("__st")).orderBy(col("__m"))
    val summ = aug.groupBy(col("__st"), col("__m"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__before", sum(col("__c")).over(wPrefix) - col("__c"))
      .withColumn("__total",
        sum(col("__c")).over(Window.partitionBy(col("__st"))))
    // ntile bucket of global rank r: first (total % n) buckets hold
    // floor(total/n)+1 rows, the rest floor(total/n). The otherwise-branch
    // division is guarded: when base = 0 (fewer rows than buckets) every
    // rank satisfies the first branch, so base is never a zero divisor.
    def bucketOf(r: Column, total: Column): Column = {
      val base = floor(total / lit(n)).cast("long")
      val rem = total % lit(n)
      val capFirst = rem * (base + 1)
      when(r <= capFirst, floor((r - 1) / (base + 1)).cast("long") + 1)
        .otherwise(rem + floor((r - capFirst - 1) / base).cast("long") + 1)
    }
    val joined = aug.join(broadcast(summ), Seq("__st", "__m"))
      .withColumn("__lo", bucketOf(col("__before") + 1, col("__total")))
      .withColumn("__hi", bucketOf(col("__before") + col("__c"), col("__total")))
    val internal = Seq("__st", "__m", "__c", "__before", "__total", "__lo", "__hi")
    val whole = joined.filter(col("__lo") === col("__hi"))
      .withColumn("bin", col("__lo").cast("int"))
      .drop(internal: _*)
    val tieW = Window.partitionBy(col("__st"), col("__m")).orderBy(tiebreak)
    val straddling = joined.filter(col("__lo") =!= col("__hi"))
      .withColumn("bin",
        bucketOf(col("__before") + row_number().over(tieW), col("__total"))
          .cast("int"))
      .drop(internal: _*)
    whole.unionByName(straddling)
  }
}
