package graft.functions

import graft.plans.VectorExpressions.dot_product
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vector-similarity operators over an embedding column (`array<float>`).
  *
  * Brute-force cosine top-k is the exact baseline (one broadcast of the query
  * vectors, one windowed top-k — no all-pairs shuffle). The scale path is
  * random-hyperplane LSH bucketing: probe only the bucket(s) a query hashes
  * to, turning 100 TB × q into (100 TB / 2^bits) × q.
  *
  * The per-pair inner loop is [[graft.plans.DotProduct]] — a codegen'd
  * Catalyst expression (interpreted higher-order-function lambdas are ~50×
  * slower on an all-pairs scan). Norms are projected once per *row* below the
  * join, so each candidate pair costs exactly one dot product.
  */
object Similarity {

  /** Deterministic dot product (ascending-index summation, double math). */
  def dot(a: Column, b: Column): Column = dot_product(a, b)

  def norm(a: Column): Column = sqrt(dot_product(a, a))

  /** Cosine from a single pair — for one-off use; the scan operators below
    * precompute norms per side instead of recomputing per pair.
    */
  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d === 0, lit(0.0)).otherwise(dot(a, b) / d)
  }

  private def cosineFromParts(dotAB: Column, normA: Column, normB: Column): Column = {
    val d = normA * normB
    when(d === 0, lit(0.0)).otherwise(dotAB / d)
  }

  /** ColBERT-style late-interaction (MaxSim) scores: for every (group,
    * query) pair, the maximum cosine between the query vector and any
    * corpus vector of that group. A multi-vector retrieval model scores a
    * document as Σ_q max_v cos(q, v) over its token/chunk vectors — this
    * is that inner max, grouped so the caller sums over a FIXED query set
    * (fixed-order addition keeps the double sum deterministic).
    *
    * Scale shape: the query set is small and broadcast (same contract as
    * [[bruteForceTopK]]); corpus vectors stream through ONCE with their
    * norm computed once per row, and `max` is order-independent, so the
    * groups×queries result is exact on any partitioning. The shuffle
    * carries only (group, qid, sim) — vectors never leave the scan.
    */
  def maxSim(corpus: DataFrame, groupCol: Column, corpusVec: Column,
             queries: DataFrame, queryId: Column, queryVec: Column): DataFrame = {
    val c = corpus.select(groupCol.as("grp"), corpusVec.as("cv"))
      .withColumn("cn", norm(col("cv")))
    val q = queries.select(queryId.as("qid"), queryVec.as("qv"))
      .withColumn("qn", norm(col("qv")))
    c.crossJoin(broadcast(q))
      .select(col("grp"), col("qid"),
        cosineFromParts(dot(col("cv"), col("qv")), col("cn"), col("qn")).as("sim"))
      .groupBy(col("grp"), col("qid"))
      .agg(max(col("sim")).as("max_sim"))
  }

  /** Exact brute-force top-k cosine neighbors for each query vector.
    *
    * `queries` must be small (it is broadcast); `corpus` can be arbitrarily
    * large — the plan is broadcast-nested-loop → per-query window top-k, so
    * corpus rows stream through once and norms are computed once per row,
    * not once per pair. Ties broken by corpus id for determinism.
    */
  def bruteForceTopK(corpus: DataFrame, corpusId: Column, corpusVec: Column,
                     queries: DataFrame, queryId: Column, queryVec: Column,
                     k: Int): DataFrame = {
    val c = corpus.select(corpusId.as("corpus_id"), corpusVec.as("cv"))
      .withColumn("cn", norm(col("cv")))
    val q = queries.select(queryId.as("query_id"), queryVec.as("qv"))
      .withColumn("qn", norm(col("qv")))
    val scored = c.crossJoin(broadcast(q))
      .select(col("query_id"), col("corpus_id"),
        cosineFromParts(dot(col("cv"), col("qv")), col("cn"), col("qn")).as("cosine"))
      .filter(col("query_id") =!= col("corpus_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Random-hyperplane signature: `bits` sign bits of projections onto
    * deterministic pseudo-random hyperplanes (SplitMix64-seeded coefficients
    * uniform in [-1,1]). Native single-pass expression — see
    * [[graft.plans.HyperplaneSignature]]. Cosine-similar vectors collide
    * with probability (1 - θ/π)^bits.
    */
  def hyperplaneSignature(vec: Column, dim: Int, bits: Int, seed: Long = 42L): Column =
    graft.plans.VectorExpressions.hyperplane_signature(vec, dim, bits, seed)

  /** IVF/LSH-bucketed approximate top-k: bucket corpus and queries by
    * hyperplane signature, join on bucket, rank within. Recall is tunable via
    * `bits`; at scale the bucketed join shuffles only matching buckets
    * instead of broadcasting every query against every corpus row.
    */
  def lshTopK(corpus: DataFrame, corpusId: Column, corpusVec: Column,
              queries: DataFrame, queryId: Column, queryVec: Column,
              k: Int, dim: Int, bits: Int = 8): DataFrame = {
    val c = corpus.select(corpusId.as("corpus_id"), corpusVec.as("cv"),
      hyperplaneSignature(corpusVec, dim, bits).as("bucket"))
      .withColumn("cn", norm(col("cv")))
    val q = queries.select(queryId.as("query_id"), queryVec.as("qv"),
      hyperplaneSignature(queryVec, dim, bits).as("bucket"))
      .withColumn("qn", norm(col("qv")))
    val scored = c.join(broadcast(q), "bucket")
      .filter(col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"),
        cosineFromParts(dot(col("cv"), col("qv")), col("cn"), col("qn")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Margin-based parallel-pair mining (the Artetxe & Schwenk bitext
    * criterion): score each (anchor, target) pair not by raw cosine but by
    * cosine normalized against BOTH endpoints' local neighborhood density —
    * margin = 2·cos(x,y) / (Σ top-k cos(x,·) + Σ top-k cos(·,y)) — so a hub
    * vector that is "near everything" stops winning every pairing, the
    * failure mode of raw-cosine mining. Returns the top `topM` targets per
    * anchor by margin, rank-only.
    *
    * Scale shape: anchors are the bounded broadcast side (the
    * [[bruteForceTopK]] contract); targets stream through ONCE with norms
    * projected per row. The per-ANCHOR neighborhood sums would be a
    * low-cardinality window over the whole pair frame — that is exactly
    * the hot-reducer shape this repo bans, so both the neighborhood cut
    * and the final margin cut run through
    * [[graft.ops.Relational.groupTopK]]'s sharded two-phase form; the
    * per-TARGET neighborhood partitions by the high-cardinality target id
    * and parallelizes freely. Neighborhood sums are FIXED-ORDER
    * (rank-pivoted, left-associated, q142's discipline), so every double —
    * and therefore every margin comparison — replays bit-for-bit.
    */
  def marginMining(targets: DataFrame, targetId: Column, targetVec: Column,
                   targetTag: Column, anchors: DataFrame, anchorId: Column,
                   anchorVec: Column, k: Int = 4, topM: Int = 3): DataFrame = {
    import graft.ops.Relational
    val a = anchors.select(anchorId.as("aid"), anchorVec.as("av"))
      .withColumn("an", norm(col("av")))
    val tt = targets.select(targetId.as("tid"), targetVec.as("tv"),
      targetTag.as("ttag")).withColumn("tn", norm(col("tv")))
    val sims = tt.crossJoin(broadcast(a))
      .select(col("aid"), col("tid"), col("ttag"),
        cosineFromParts(dot(col("tv"), col("av")), col("tn"), col("an")).as("sim"))
    def rankPivotSum(df: DataFrame, key: String): DataFrame =
      df.groupBy(col(key)).agg(
        (1 to k).map(i => coalesce(max(when(col("rn") === i, col("sim"))), lit(0.0)))
          .reduceLeft(_ + _).as(s"${key}_nsum"))
    val aSum = rankPivotSum(
      Relational.groupTopK(sims.select(col("aid"), col("tid"), col("sim")),
          Seq(col("aid")), Seq(col("sim").desc, col("tid")), col("tid"), k)
        .withColumnRenamed("rank", "rn"), "aid")
    val tSum = rankPivotSum(
      sims.withColumn("rn", row_number().over(
          Window.partitionBy(col("tid")).orderBy(col("sim").desc, col("aid"))))
        .filter(col("rn") <= k), "tid")
    // Zero-denominator guard (cosineFromParts' discipline): if every top-k
    // cosine is 0 (degenerate/zero vectors), 0/0 would be NaN and NaN
    // ordering in the rank window is engine-dependent — emit 0.0 instead
    // so degenerate inputs stay deterministic.
    val denom = col("aid_nsum") + col("tid_nsum")
    val margins = sims.join(aSum, "aid").join(tSum, "tid")
      .select(col("aid"), col("tid"), col("ttag"),
        when(denom === 0.0, 0.0)
          .otherwise((col("sim") + col("sim")) / denom).as("margin"))
    Relational.groupTopK(margins, Seq(col("aid")),
        Seq(col("margin").desc, col("tid")), col("tid"), topM)
      .select(col("aid").as("anchor_id"), col("rank").cast("long").as("rnk"),
        col("tid").as("target_id"), col("ttag").as("target_lang"))
      .orderBy(col("anchor_id"), col("rnk"))
  }

  /** IVF (inverted-file) approximate top-k: partition the corpus into
    * `nCentroids` Voronoi cells and probe only the `nProbe` cells nearest
    * each query. Unlike LSH's data-independent hyperplanes, the cells adapt
    * to the data distribution — the standard trade when buckets come out
    * skewed.
    *
    * Centroids are a deterministic hash-ordered sample (md5-bucket order on
    * the id, same derivation as [[Sampling.hashBucket]]) rather than k-means
    * iterations: at corpus scale, sampled centroids are the standard
    * first-stage compromise, and k-means refinement would change only how
    * the centroid table is produced — the plan shape stays one centroid
    * broadcast + one argmax pass over the corpus (cells assignment never
    * shuffles the corpus) + an equi-join on cell id for the probe. Hash
    * order (not id-prefix order) keeps the sample distribution-agnostic even
    * when ids correlate with content, and is plain SQL on any engine.
    */
  def ivfTopK(corpus: DataFrame, corpusId: Column, corpusVec: Column,
              queries: DataFrame, queryId: Column, queryVec: Column,
              k: Int, nCentroids: Int, nProbe: Int): DataFrame = {
    val (assigned, probes) = ivfParts(corpus, corpusId, corpusVec,
      queries, queryId, queryVec, nCentroids, nProbe)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id").asc)
    assigned.join(broadcast(probes.drop("qr")), "cell_id")
      .filter(col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"),
        cosineFromParts(dot(col("cv"), col("qv")), col("cn"), col("qn")).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** IVF index capacity audit: per-cell posting-list population, corpus
    * share, load factor vs the ideal |corpus|/nCentroids cell (load_ppm =
    * 1e6 means perfectly balanced; a 20e6 cell is a 20× hot spot that will
    * dominate every probe that touches it), and mean winning cosine
    * (cell coherence — how tight the Voronoi cell is). This is the table
    * that decides whether q53's index needs more centroids, k-means
    * refinement, or cell splitting BEFORE a 100 TB build; dead cells
    * surface as n_vecs = 0 rows (the centroid table left-joins the
    * assignment, so the report is dense over cells).
    *
    * Scale shape: same centroid derivation as [[ivfTopK]] (hash-ordered
    * sample, broadcast); the corpus argmax here is a groupBy
    * max(struct(cos, -cell)) AGGREGATION, not a row_number window — it
    * map-side-combines, so the only shuffle is corpus-cardinality
    * (corpus_id, winner) partials and no sort of the ×nCentroids frame
    * ever happens. Cosines integerize as floor(cos·1e6) before any sum,
    * so the per-cell means replay exactly; means use sign-explicit
    * truncating division (q140's discipline) so Spark DIV and DuckDB //
    * agree on negative sums.
    */
  def ivfBalance(corpus: DataFrame, corpusId: Column, corpusVec: Column,
                 nCentroids: Int): DataFrame = {
    val cents = corpus
      .select(corpusId.as("cell_id"), corpusVec.as("cent"))
      .orderBy(Sampling.hashBucket(col("cell_id"), 1 << 30), col("cell_id"))
      .limit(nCentroids)
      .withColumn("cent_n", norm(col("cent")))
    val winners = corpus.select(corpusId.as("corpus_id"), corpusVec.as("cv"))
      .withColumn("cn", norm(col("cv")))
      .crossJoin(broadcast(cents))
      .select(col("corpus_id"),
        struct(
          cosineFromParts(dot(col("cv"), col("cent")), col("cn"), col("cent_n"))
            .as("cos"),
          (-col("cell_id")).as("neg_cell")).as("cand"))
      .groupBy(col("corpus_id")).agg(max(col("cand")).as("w"))
      .select((-col("w.neg_cell")).as("cell_id"),
        expr("cast(floor(w.cos * 1000000) as long)").as("cos_micro"))
    val perCell = winners.groupBy(col("cell_id"))
      .agg(count(lit(1)).as("n_vecs"), sum(col("cos_micro")).as("cs"))
    val total = winners.agg(count(lit(1)).as("tot"))
    cents.select(col("cell_id")).join(perCell, Seq("cell_id"), "left")
      .crossJoin(broadcast(total))
      .selectExpr("cell_id",
        "coalesce(n_vecs, 0L) AS n_vecs",
        "(coalesce(n_vecs, 0L) * 1000000L) DIV tot AS share_ppm",
        s"(coalesce(n_vecs, 0L) * ${nCentroids}L * 1000000L) DIV tot AS load_ppm",
        "CASE WHEN n_vecs IS NULL THEN 0L WHEN cs >= 0 THEN cs DIV n_vecs " +
          "ELSE -((-cs) DIV n_vecs) END AS mean_cos_micro")
      .orderBy(col("cell_id"))
  }

  /** The two IVF legs shared by [[ivfTopK]] and [[ivfRecallCurve]]:
    * cell-assigned corpus rows (one streaming pass, centroids broadcast)
    * and each query's `maxProbe` nearest cells with their probe rank `qr`.
    */
  private def ivfParts(corpus: DataFrame, corpusId: Column, corpusVec: Column,
                       queries: DataFrame, queryId: Column, queryVec: Column,
                       nCentroids: Int, maxProbe: Int): (DataFrame, DataFrame) = {
    val cents = corpus
      .select(corpusId.as("cell_id"), corpusVec.as("cent"))
      .orderBy(Sampling.hashBucket(col("cell_id"), 1 << 30), col("cell_id"))
      .limit(nCentroids)
      .withColumn("cent_n", norm(col("cent")))
    // corpus → nearest cell (argmax cosine), one streaming pass
    val cw = Window.partitionBy(col("corpus_id"))
      .orderBy(col("cell_cos").desc, col("cell_id").asc)
    val assigned = corpus.select(corpusId.as("corpus_id"), corpusVec.as("cv"))
      .withColumn("cn", norm(col("cv")))
      .crossJoin(broadcast(cents))
      .withColumn("cell_cos",
        cosineFromParts(dot(col("cv"), col("cent")), col("cn"), col("cent_n")))
      .withColumn("cr", row_number().over(cw))
      .filter(col("cr") === 1)
      .select(col("cell_id"), col("corpus_id"), col("cv"), col("cn"))
    // query → maxProbe nearest cells, probe rank kept
    val qw = Window.partitionBy(col("query_id"))
      .orderBy(col("cell_cos").desc, col("cell_id").asc)
    val probes = queries.select(queryId.as("query_id"), queryVec.as("qv"))
      .withColumn("qn", norm(col("qv")))
      .crossJoin(broadcast(cents))
      .withColumn("cell_cos",
        cosineFromParts(dot(col("qv"), col("cent")), col("qn"), col("cent_n")))
      .withColumn("qr", row_number().over(qw))
      .filter(col("qr") <= maxProbe)
      .select(col("cell_id"), col("query_id"), col("qv"), col("qn"), col("qr"))
    (assigned, probes)
  }

  /** Recall curve of the IVF path against the exact baseline, as a table:
    * for each probe budget in `probeSettings`, how many of the true top-k
    * neighbors the probed cells actually contain. The tuning artifact
    * behind every nProbe choice — q53 picks one point on this curve.
    *
    * One corpus assignment pass serves EVERY setting: candidates keep the
    * probe rank `qr` of the cell they came from, a 4-row settings frame
    * joins on `qr <= nprobe`, and the per-(query, setting) top-k window
    * runs over candidate-sized input. Ground truth is one brute-force
    * pass — at 100 TB the audit runs over a bounded query sample by
    * design (the truth pass is the cost LSH/IVF exist to avoid, paid
    * here once to calibrate them).
    */
  def ivfRecallCurve(corpus: DataFrame, corpusId: Column, corpusVec: Column,
                     queries: DataFrame, queryId: Column, queryVec: Column,
                     k: Int, nCentroids: Int,
                     probeSettings: Seq[Int]): DataFrame = {
    val (assigned, probes) = ivfParts(corpus, corpusId, corpusVec,
      queries, queryId, queryVec, nCentroids, probeSettings.max)
    val cand = assigned.join(broadcast(probes), "cell_id")
      .filter(col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"), col("qr"),
        cosineFromParts(dot(col("cv"), col("qv")), col("cn"), col("qn")).as("cosine"))
    val settings = corpus.sparkSession.createDataFrame(
      probeSettings.map(Tuple1(_))).toDF("nprobe")
    val w = Window.partitionBy(col("query_id"), col("nprobe"))
      .orderBy(col("cosine").desc, col("corpus_id").asc)
    val approx = cand.join(broadcast(settings), col("qr") <= col("nprobe"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
    val exact = bruteForceTopK(corpus, corpusId, corpusVec,
        queries, queryId, queryVec, k)
      .select(col("query_id"), col("corpus_id"), lit(1L).as("hit"))
    val truthCount = exact.agg(count(lit(1)).as("n_truth"))
    approx.join(broadcast(exact), Seq("query_id", "corpus_id"), "left")
      .groupBy(col("nprobe"))
      .agg(countDistinct(col("query_id")).as("n_queries"),
        count(lit(1)).as("n_retrieved"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
      .crossJoin(broadcast(truthCount))
      .withColumn("recall_ppm", expr("(n_hits * 1000000L) DIV n_truth"))
      .orderBy(col("nprobe"))
  }

  /** Recall of the IVF path against the exact baseline (same contract as
    * [[lshRecall]] — the nProbe/nCentroids tuning loop).
    */
  def ivfRecall(corpus: DataFrame, idCol: Column, vecCol: Column,
                queries: DataFrame, qIdCol: Column, qVecCol: Column,
                k: Int, nCentroids: Int, nProbe: Int): Double = {
    val exact = bruteForceTopK(corpus, idCol, vecCol, queries, qIdCol, qVecCol, k)
      .select(col("query_id"), col("corpus_id"))
    val approx = ivfTopK(corpus, idCol, vecCol, queries, qIdCol, qVecCol,
      k, nCentroids, nProbe)
      .select(col("query_id"), col("corpus_id"))
    val hits = exact.intersect(approx).count().toDouble
    val total = exact.count().toDouble
    if (total == 0) 1.0 else hits / total
  }

  /** Exact all-pairs near-duplicates over a (bounded) corpus slice: cosine ≥
    * threshold, one codegen'd dot per pair, norms precomputed per row.
    * O(n²/2) — use for verification slices; [[embeddingNearDups]] is the
    * LSH-bucketed scale path.
    */
  def bruteForceNearDups(corpus: DataFrame, idCol: Column, vecCol: Column,
                         threshold: Double): DataFrame = {
    val e = corpus.select(idCol.as("id"), vecCol.as("v"))
      .withColumn("n", norm(col("v")))
    val l = e.select(col("id").as("id_a"), col("v").as("v_a"), col("n").as("n_a"))
    val r = e.select(col("id").as("id_b"), col("v").as("v_b"), col("n").as("n_b"))
    l.crossJoin(r)
      .filter(col("id_a") < col("id_b"))
      .filter(cosineFromParts(dot(col("v_a"), col("v_b")), col("n_a"), col("n_b"))
        >= threshold)
      .select(col("id_a"), col("id_b"))
  }

  /** Recall of the LSH path against the exact baseline for the same
    * queries: |lsh∩exact| / |exact| per query, averaged. The tuning loop
    * for `bits` — measure on a sample, then fix bits for the full corpus.
    */
  def lshRecall(corpus: DataFrame, idCol: Column, vecCol: Column,
                queries: DataFrame, qIdCol: Column, qVecCol: Column,
                k: Int, dim: Int, bits: Int): Double = {
    val exact = bruteForceTopK(corpus, idCol, vecCol, queries, qIdCol, qVecCol, k)
      .select(col("query_id"), col("corpus_id"))
    val approx = lshTopK(corpus, idCol, vecCol, queries, qIdCol, qVecCol, k, dim, bits)
      .select(col("query_id"), col("corpus_id"))
    val hits = exact.intersect(approx).count().toDouble
    val total = exact.count().toDouble
    if (total == 0) 1.0 else hits / total
  }

  /** SemDedup — semantic deduplication by k-means blocking (Abbas et al.
    * 2023, "SemDeDup: Data-efficient learning at web-scale through semantic
    * deduplication"): assign every vector to its nearest centroid, compare
    * cosine only WITHIN a cluster, and drop any vector that has a
    * lower-id near-duplicate (cosine ≥ `threshold`) in its cluster — the
    * min-id keeper discipline of the exact-dedup family, applied in
    * embedding space. Returns one row per input vector:
    * (vec_id, cluster, kept).
    *
    * Scale shape: assignment is a pure projection (the k×dim centroid
    * table rides inside [[graft.plans.NearestCentroid]] as an expression
    * constant — no join, the corpus never shuffles for assignment); the
    * pair join is one equi-shuffle on the cluster id, and pair expansion
    * is quadratic only in the CLUSTER size — k is chosen so corpus/k fits
    * a reducer (the SemDedup paper's trick, same role as the LSH bucket
    * caps). Norms are projected once per row below the join, one codegen'd
    * dot per surviving pair. The assignment frame feeds three consumers
    * (both pair sides + the final survivor join), so it is persisted —
    * without it the projection and norm run three times.
    *
    * `maxClusterSize` is the [[Dedup.DefaultMaxBucketSize]] discipline
    * applied to k-means blocks: one degenerate cluster (e.g. near-zero
    * embeddings all landing on the same centroid) would go quadratic at
    * 100 TB. Oversized clusters contribute NO drop pairs — their members
    * are all kept, and the skip is observable via the "graft.semdedup"
    * CollectMetrics node (dropped_clusters / max_cluster_size). Raise the
    * cap above the corpus size when exact parity with the uncapped form
    * is required.
    */
  def semDedupFlags(corpus: DataFrame, idCol: Column, vecCol: Column,
                    model: Kmeans.Model, threshold: Double,
                    maxClusterSize: Int = 10000): DataFrame = {
    val v = vecCol.cast("array<double>")
    val assigned = corpus.select(idCol.as("vec_id"), v.as("v"),
        graft.plans.KmeansExpressions.nearest_centroid(v, model.cents)
          .getField("cluster").as("cluster"))
      .withColumn("n", norm(col("v")))
      .persist()
    val okClusters = assigned.groupBy(col("cluster"))
      .agg(count(lit(1)).as("__csize"))
      .observe("graft.semdedup",
        count(when(col("__csize") > maxClusterSize, true)).as("dropped_clusters"),
        max(col("__csize")).as("max_cluster_size"))
      .filter(col("__csize") <= maxClusterSize)
      .select(col("cluster"))
    val capped = assigned.join(broadcast(okClusters), "cluster")
    val l = capped.select(col("cluster"), col("vec_id").as("id_a"),
      col("v").as("v_a"), col("n").as("n_a"))
    val r = capped.select(col("cluster"), col("vec_id").as("id_b"),
      col("v").as("v_b"), col("n").as("n_b"))
    val drops = l.join(r, "cluster")
      .filter(col("id_a") < col("id_b"))
      .filter(cosineFromParts(dot(col("v_a"), col("v_b")), col("n_a"), col("n_b"))
        >= threshold)
      .select(col("id_b").as("vec_id")).distinct()
    assigned
      .join(drops.withColumn("__drop", lit(1)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster"), col("__drop").isNull.as("kept"))
  }

  /** Embedding-cosine near-duplicate pairs at scale: candidate pairs through
    * LSH buckets (exact within-bucket check, so precision is exact; recall
    * governed by `bits`).
    *
    * With only 2^bits buckets (64 at bits=6), one hot hyperplane bucket
    * goes quadratic at corpus scale, so buckets above `maxBucketSize` are
    * skipped — same cap-and-observe discipline as
    * [[graft.functions.Dedup.minHashCandidates]]; skips are visible via
    * the "graft.embdup" CollectMetrics node. Raise the cap above the
    * corpus size for exact parity with the uncapped enumeration.
    */
  def embeddingNearDups(corpus: DataFrame, idCol: Column, vecCol: Column,
                        dim: Int, threshold: Double, bits: Int = 6,
                        maxBucketSize: Int = 10000): DataFrame = {
    val c = corpus.select(idCol.as("id"), vecCol.as("v"),
      hyperplaneSignature(vecCol, dim, bits).as("bucket"))
      .withColumn("n", norm(col("v")))
    val okBuckets = c.groupBy(col("bucket"))
      .agg(count(lit(1)).as("__bsize"))
      .observe("graft.embdup",
        count(when(col("__bsize") > maxBucketSize, true)).as("dropped_buckets"),
        max(col("__bsize")).as("max_bucket_size"))
      .filter(col("__bsize") <= maxBucketSize)
      .select(col("bucket"))
    val capped = c.join(broadcast(okBuckets), "bucket")
    val l = capped.select(col("bucket"), col("id").as("id_a"), col("v").as("v_a"), col("n").as("n_a"))
    val r = capped.select(col("bucket"), col("id").as("id_b"), col("v").as("v_b"), col("n").as("n_b"))
    l.join(r, "bucket")
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        cosineFromParts(dot(col("v_a"), col("v_b")), col("n_a"), col("n_b")).as("cosine"))
      .filter(col("cosine") >= threshold)
      .distinct()
  }
}
