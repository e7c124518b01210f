package graft

import graft.functions.{Dedup, Domains, Quant, Sampling, Similarity, Text}
import graft.ops.{Events, Relational}
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Vector operators over `embeddings`: brute/LSH/IVF ANN, PQ,
  * k-means/PCA diagnostics, recall scorecards and embedding health.
  *
  * One thematic slice of the [[Queries]] catalog (r13 split — the object
  * grew past 8k lines); `Queries.all` remains the assembly point. Members
  * self-type against `Queries.type` so cross-theme builders and shared
  * fragments resolve exactly as before the split.
  */
private[graft] trait QueriesVector { this: Queries.type =>


  /** Brute-force exact cosine top-10 for query vectors (ANN baseline). */
  def annBruteForce(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "embeddings")
    Similarity.bruteForceTopK(e, col("vec_id"), col("embedding"),
        e.filter(col("vec_id") < 5), col("vec_id"), col("embedding"), k = 10)
      .select(col("query_id"), col("corpus_id"), col("rank").as("rnk"))
      .orderBy(col("query_id"), col("rnk"))
  }


  /** Embedding-cosine near-duplicate pairs (exact, on an id-bounded slice —
    * the LSH-bucketed variant below is the scale path).
    */
  def embeddingNearDups(spark: SparkSession, dir: String): DataFrame =
    Similarity.bruteForceNearDups(
        t(spark, dir, "embeddings").filter(col("vec_id") < 2000),
        col("vec_id"), col("embedding"), threshold = 0.45)
      .orderBy(col("id_a"), col("id_b"))


  /** LSH-bucketed approximate top-k (scale path). Under the real DuckDB
    * oracle: the SplitMix64 hyperplane coefficients are embedded in the
    * oracle SQL as literals, so both engines bucket identically.
    */
  def annLsh(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "embeddings")
    Similarity.lshTopK(e, col("vec_id"), col("embedding"),
        e.filter(col("vec_id") < 5), col("vec_id"), col("embedding"),
        k = 10, dim = 64, bits = 6)
      .select(col("query_id"), col("corpus_id"), col("rank").as("rnk"))
      .orderBy(col("query_id"), col("rnk"))
  }


  /** IVF-bucketed approximate top-k (scale path, data-adaptive cells;
    * q30 is the exact baseline). Under the real DuckDB oracle: the
    * hash-ordered centroid sample and the probe ranking are plain SQL.
    */
  def annIvf(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "embeddings")
    Similarity.ivfTopK(e, col("vec_id"), col("embedding"),
        e.filter(col("vec_id") < 5), col("vec_id"), col("embedding"),
        k = 10, nCentroids = 32, nProbe = 8)
      .select(col("query_id"), col("corpus_id"), col("rank").as("rnk"))
      .orderBy(col("query_id"), col("rnk"))
  }


  /** The PQ codebook every PQ query shares: 8 subvectors × 16 centroids
    * over the 64-dim embeddings, fit from the deterministic hash-ordered
    * sample (reproduced verbatim in the oracle SQL).
    */
  private[graft] def pqCodebook(spark: SparkSession, dir: String): graft.functions.Pq.Codebook =
    graft.functions.Pq.fit(t(spark, dir, "embeddings"),
      col("vec_id"), col("embedding"), m = 8, k = 16)


  /** Product-quantization codes: each embedding compressed to one packed
    * BIGINT (8 × 4-bit centroid ids) — 32× narrower than the raw vector.
    */
  def pqCodes(spark: SparkSession, dir: String): DataFrame = {
    val cb = pqCodebook(spark, dir)
    t(spark, dir, "embeddings")
      .select(col("vec_id"), graft.functions.Pq.encode(col("embedding"), cb).as("pq_code"))
      .orderBy(col("vec_id"))
  }


  /** ADC top-10 per query over the PQ codes (the compressed-domain
    * candidate scan; q30 is the uncompressed exact baseline).
    */
  def pqAdcTopK(spark: SparkSession, dir: String): DataFrame = {
    val cb = pqCodebook(spark, dir)
    val e = t(spark, dir, "embeddings")
    graft.functions.Pq.adcTopK(e, col("vec_id"), col("embedding"),
        e.filter(col("vec_id") < 5), col("vec_id"), col("embedding"), cb, k = 10)
      .select(col("query_id"), col("corpus_id"), col("rank").as("rnk"))
      .orderBy(col("query_id"), col("rnk"))
  }


  /** IVF + PQ two-stage index (coarse cells → ADC rank on codes; q30 is
    * the exact baseline, q67 the unfiltered ADC scan).
    */
  def ivfPqQuery(spark: SparkSession, dir: String): DataFrame = {
    val cb = pqCodebook(spark, dir)
    val e = t(spark, dir, "embeddings")
    graft.functions.Pq.ivfPqTopK(e, col("vec_id"), col("embedding"),
        e.filter(col("vec_id") < 5), col("vec_id"), col("embedding"),
        cb, k = 10, nCentroids = 32, nProbe = 8)
      .select(col("query_id"), col("corpus_id"), col("rank").as("rnk"))
      .orderBy(col("query_id"), col("rnk"))
  }


  /** The k-means model q72/q75 share: 8 clusters, 2 Lloyd iterations over
    * the 64-dim embeddings — hash-ordered init and fixed-point means
    * ([[graft.functions.Kmeans]]), so the oracle's iteration-CTE chain
    * reproduces the fit bit-for-bit.
    */
  private[graft] def kmeansModel(spark: SparkSession, dir: String): graft.functions.Kmeans.Model =
    graft.functions.Kmeans.fit(t(spark, dir, "embeddings"),
      col("vec_id"), col("embedding"), k = 8, iters = 2)


  /** Distributed k-means (semantic clustering for curation): cluster sizes
    * + fixed-point inertia after two Lloyd iterations. Each iteration is
    * one corpus scan — assignment is a pure projection (centroids ride
    * inside the expression), the mean update a k×dim-row aggregate.
    */
  def kmeansClusters(spark: SparkSession, dir: String): DataFrame =
    graft.functions.Kmeans.clusterProfile(t(spark, dir, "embeddings"),
        col("vec_id"), col("embedding"), kmeansModel(spark, dir))
      .select(col("cluster").cast("long").as("cluster"), col("n_vecs"), col("inertia"))
      .orderBy(col("cluster"))


  /** Majority-label purity per k-means cluster — do the clusters track the
    * label facet (topic balancing / cluster-sampling diagnostic).
    */
  def clusterPurity(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "embeddings")
    val assigned = graft.functions.Kmeans.assign(e, col("vec_id"), col("embedding"),
      kmeansModel(spark, dir))
    graft.functions.Kmeans.purity(assigned,
        e.select(col("vec_id"), col("label")), col("label"))
      .select(col("cluster").cast("long").as("cluster"), col("n_vecs"),
        col("top_label").cast("long").as("top_label"), col("top_n"))
      .orderBy(col("cluster"))
  }


  /** Int8 scalar quantization of the embeddings with per-label
    * reconstruction-error rollup ([[graft.functions.Quant]]): the 4×
    * embedding-storage compression next to PQ's 32× (q66).
    */
  def int8Quant(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "embeddings")
    val scale = graft.functions.Quant.fitScale(e, col("embedding"))
    e.select(col("label").cast("long").as("label"),
        graft.functions.Quant.reconstructionError(col("embedding"), scale).as("err"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        (sum(floor(col("err") * lit(1e12)).cast(DecimalType(38, 0)))
          .cast("double") / lit(1e12)).as("total_err"),
        max(col("err")).as("max_err"))
      .orderBy(col("label"))
  }


  /** SemDedup ([[graft.functions.Similarity.semDedupFlags]]): the q72
    * k-means model blocks the embedding space; within each cluster any
    * vector with a lower-id cosine-0.45 near-duplicate is dropped — the
    * embedding-space twin of exact dedup's min-id keeper. DuckDB replays
    * the full chain: the q72 centroid iteration CTEs, within-cluster
    * cosine pairs, and the survivor flags.
    */
  def semDedup(spark: SparkSession, dir: String): DataFrame =
    graft.functions.Similarity.semDedupFlags(t(spark, dir, "embeddings"),
        col("vec_id"), col("embedding"), kmeansModel(spark, dir), threshold = 0.45)
      .select(col("vec_id"), col("cluster").cast("long").as("cluster"), col("kept"))
      .orderBy(col("vec_id"))


  /** Cluster-balanced diversity sample: the q72 k-means model assigns
    * every vector (pure projection — centroids ride inside the
    * expression), then a per-cluster hash-ordered top-10 take
    * ([[graft.functions.Sampling.stratifiedSample]]) — the
    * diversity-preserving downsampling a topic-balanced mixture runs
    * (uniform per semantic cluster rather than per corpus), append-stable
    * like every sampler here. Vectors never shuffle: only
    * (vec_id, cluster) enters the sampling window.
    */
  def clusterSample(spark: SparkSession, dir: String): DataFrame = {
    val assigned = graft.functions.Kmeans.assign(t(spark, dir, "embeddings"),
        col("vec_id"), col("embedding"), kmeansModel(spark, dir))
      .select(col("vec_id"), col("cluster").cast("long").as("cluster"))
    Sampling.stratifiedSample(assigned, Seq(col("cluster")),
        col("vec_id"), perStratum = 10)
      .select(col("vec_id"), col("cluster"), col("sample_rank"))
      .orderBy(col("cluster"), col("sample_rank"))
  }


  /** Hybrid retrieval ([[graft.functions.Fusion.reciprocalRankFusion]]):
    * the same 5 query documents ranked by BOTH the integer-BM25 inverted
    * index (q90's ranker) and brute-force embedding cosine (q30's ranker,
    * ids aligned doc_id = vec_id), merged by reciprocal-rank fusion with
    * integer 1e6 DIV (60+rank) weights. Only the two top-10 rank lists —
    * never text or vectors — cross the fusion boundary.
    */
  def hybridRetrieval(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val emb = t(spark, dir, "embeddings")
    // r18: the sparse leg probes the MATERIALIZED index (build-once/
    // probe-many, fingerprint-cached) instead of recomputing q90's full
    // tokenize→explode→df-window pass — at sf100 that recomputation made
    // this query a p90 tail outlier; the warm probe is a 4-column scan.
    // On a JDBC-backed layer (no source files to fingerprint) the index
    // builds in-plan — same answer, keeping Tables.load's contract that
    // every builder runs against either storage.
    val idx = graft.sources.Tables.parquetLocation(dir, "documents") match {
      case Some(src) => graft.functions.Tfidf.cachedIndex(docs, col("doc_id"),
        col("text"), maxDfFrac = 0.78, sourceDir = src)
      case None => graft.functions.Tfidf.buildIndex(docs, col("doc_id"),
        col("text"), maxDfFrac = 0.78)
    }
    val sparse = graft.functions.Tfidf.sparseTopKIndexed(idx,
        docs.filter(col("doc_id") < 5), col("doc_id"), col("text"), k = 10)
      .select(col("q").as("query"), col("d").as("item"), col("rnk").as("rank"))
    val dense = Similarity.bruteForceTopK(emb, col("vec_id"), col("embedding"),
        emb.filter(col("vec_id") < 5), col("vec_id"), col("embedding"), k = 10)
      .select(col("query_id").as("query"), col("corpus_id").as("item"),
        col("rank"))
    graft.functions.Fusion.reciprocalRankFusion(
        Seq(sparse, dense), "query", "item", "rank", k = 10)
      .orderBy(col("query"), col("rnk"))
  }


  /** kNN label propagation — the semi-supervised labeling step of a
    * quality-classifier bootstrap: each held-out vector takes the majority
    * label of its k nearest labeled neighbors (exact cosine). First use of
    * the embeddings table's `label` column as a *training signal* rather
    * than an evaluation facet (q75 measures clustering against it; here it
    * propagates). Scale shape is q30's: the labeled corpus streams ONCE
    * through a broadcast-nested-loop scan (held-out side broadcast, norms
    * computed per row not per pair), and everything downstream of the
    * per-query top-k window is q×k rows — votes, the winner window, and
    * both label joins are broadcast-sized at any corpus scale. Ties break
    * deterministically: vote count desc, then min label.
    */
  def knnLabelPropagation(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "embeddings")
    val held = e.filter(col("vec_id") < 50)
    val labeled = e.filter(col("vec_id") >= 50)
    val nb = Similarity.bruteForceTopK(labeled, col("vec_id"), col("embedding"),
      held, col("vec_id"), col("embedding"), k = 10)
      .select(col("query_id"), col("corpus_id"))
    val votes = labeled.select(col("vec_id").as("corpus_id"), col("label"))
      .join(broadcast(nb), "corpus_id")
      .groupBy(col("query_id"), col("label"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("n").desc, col("label").asc)
    val pred = votes.withColumn("r", row_number().over(w)).filter(col("r") === 1)
      .select(col("query_id"), col("label").as("predicted_label"))
    pred
      .join(broadcast(held.select(col("vec_id").as("query_id"),
        col("label").as("true_label"))), "query_id")
      .select(col("query_id"),
        col("predicted_label").cast("int").as("predicted_label"),
        col("true_label").cast("int").as("true_label"),
        when(col("predicted_label") === col("true_label"), 1).otherwise(0)
          .cast("int").as("correct"))
      .orderBy(col("query_id"))
  }


  /** IVF recall curve: recall@10 of the q53 index per probe budget
    * (nprobe ∈ 1,2,4,8) against the exact brute-force truth — the
    * embedding-space twin of q123's minhash S-curve, and the table that
    * picks q53's operating point. One corpus assignment pass serves all
    * four settings (candidates carry their probe rank; a 4-row settings
    * frame joins on `qr <= nprobe`); ground truth is one brute pass over
    * a bounded query sample — the calibration cost paid once.
    */
  def annRecallCurve(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "embeddings")
    Similarity.ivfRecallCurve(e, col("vec_id"), col("embedding"),
        e.filter(col("vec_id") < 20), col("vec_id"), col("embedding"),
        k = 10, nCentroids = 32, probeSettings = Seq(1, 2, 4, 8))
      .select(col("nprobe").cast("int").as("nprobe"), col("n_queries"),
        col("n_retrieved"), col("n_hits"), col("n_truth"), col("recall_ppm"))
  }


  /** Hard-negative mining: for each anchor vector, the 5 most-similar
    * vectors carrying a DIFFERENT label — the contrastive-training batch
    * builder (high-similarity, wrong-class examples are what move an
    * embedding model; random negatives are free but useless). Same scan
    * shape as q30: anchors broadcast into one corpus pass, the label
    * inequality filters before the per-anchor top-k window, and everything
    * downstream is anchors×k rows. The cosine ranks replay in the oracle
    * (q30's precedent); ties break on the candidate id.
    */
  def hardNegatives(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "embeddings")
    val c = e.select(col("vec_id").as("negative_id"),
        col("embedding").as("cv"), col("label").as("negative_label"))
      .withColumn("cn", Similarity.norm(col("cv")))
    val q = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("anchor_id"), col("embedding").as("qv"),
        col("label").as("anchor_label"))
      .withColumn("qn", Similarity.norm(col("qv")))
    // label mismatch filters BEFORE the rank window: same-class rows never
    // reach the per-anchor top-k state
    val scored = c.crossJoin(broadcast(q))
      .filter(col("negative_label") =!= col("anchor_label"))
      .select(col("anchor_id"), col("anchor_label"), col("negative_id"),
        col("negative_label"),
        when(col("cn") * col("qn") === 0, lit(0.0))
          .otherwise(Similarity.dot(col("cv"), col("qv")) / (col("cn") * col("qn")))
          .as("cosine"))
    val w = Window.partitionBy(col("anchor_id"))
      .orderBy(col("cosine").desc, col("negative_id").asc)
    scored.withColumn("neg_rank", row_number().over(w))
      .filter(col("neg_rank") <= 5)
      .select(col("anchor_id"), col("anchor_label").cast("int").as("anchor_label"),
        col("neg_rank").cast("long").as("neg_rank"), col("negative_id"),
        col("negative_label").cast("int").as("negative_label"))
      .orderBy(col("anchor_id"), col("neg_rank"))
  }


  /** Per-label centroid geometry of the embedding space, exactly: the
    * inter-class structure report (which classes collide, which are
    * separable) a labeled embedding table feeds into eval design and
    * hard-negative policy (q136). Cosine between centroids is
    * scale-invariant, so the centroids never materialize as floats:
    * vectors are int8-quantized ([[graft.functions.Quant]], the q74
    * model), per-label per-dimension INTEGER sums stand in for the mean,
    * and the pairwise dot/norm matrix runs in DECIMAL(38,0)/HUGEINT —
    * bit-exact in both engines, unlike a float centroid whose sum order
    * differs per partition. Scale shape: the corpus is touched once by a
    * map-side-combined (label, dim) sum of int8 codes — labels×dim rows
    * shuffle, never vectors — and every join after runs on labels×dim or
    * labels² rows. sim2_ppm is the signed squared-cosine in ppm (sign of
    * the dot, magnitude dot²/(|a|²|b|²)), a sqrt-free similarity both
    * engines compute in integers.
    */
  def labelCentroids(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "embeddings")
    val scale = Quant.fitScale(e, col("embedding"))
    val codes = e.select(col("label").cast("long").as("label"),
      posexplode(Quant.encode(col("embedding"), scale)).as(Seq("pos", "c")))
    val sums = codes.groupBy(col("label"), col("pos"))
      .agg(sum(col("c")).as("s"))
    val counts = e.groupBy(col("label").cast("long").as("label"))
      .agg(count(lit(1)).as("n_vecs"))
    val dots = sums.select(col("label").as("label_a"), col("pos"), col("s").as("sa"))
      .join(sums.select(col("label").as("label_b"), col("pos"), col("s").as("sb")),
        "pos")
      .filter(col("label_a") < col("label_b"))
      .groupBy(col("label_a"), col("label_b"))
      .agg(sum(expr("CAST(sa AS DECIMAL(19,0)) * CAST(sb AS DECIMAL(19,0))"))
        .as("dot_d"))
    val norms = sums.groupBy(col("label"))
      .agg(sum(expr("CAST(s AS DECIMAL(19,0)) * CAST(s AS DECIMAL(19,0))"))
        .as("norm2_d"))
    dots
      .join(norms.select(col("label").as("label_a"), col("norm2_d").as("na2")), "label_a")
      .join(norms.select(col("label").as("label_b"), col("norm2_d").as("nb2")), "label_b")
      .join(counts.select(col("label").as("label_a"), col("n_vecs").as("n_a")), "label_a")
      .join(counts.select(col("label").as("label_b"), col("n_vecs").as("n_b")), "label_b")
      .select(col("label_a"), col("label_b"), col("n_a"), col("n_b"),
        col("dot_d").cast("long").as("dot"),
        col("na2").cast("long").as("norm2_a"),
        col("nb2").cast("long").as("norm2_b"),
        expr("""CAST(CASE WHEN na2 * nb2 = 0 THEN 0
               | WHEN dot_d < 0 THEN -((dot_d * dot_d * 1000000) DIV (na2 * nb2))
               | ELSE (dot_d * dot_d * 1000000) DIV (na2 * nb2)
               |END AS BIGINT)""".stripMargin).as("sim2_ppm"))
      .orderBy(col("label_a"), col("label_b"))
  }


  /** Late-interaction (MaxSim) retrieval over label groups
    * ([[graft.functions.Similarity.maxSim]]): each label's vector set is
    * scored against a 4-vector query set as Σ_q max_v cos(q, v) — the
    * ColBERT scoring rule, where a document is many vectors and a query
    * matches if EACH of its vectors finds some strong match (single-vector
    * ANN (q30) averages that structure away). The per-query maxes pivot
    * into fixed columns and sum in fixed order, so the double arithmetic
    * is identical in both engines; the corpus streams once through the
    * broadcast query set and only (label, qid, sim) doubles shuffle.
    */
  def maxSimRetrieval(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "embeddings")
    val perQuery = Similarity.maxSim(
      e.filter(col("vec_id") >= 4), col("label").cast("long"), col("embedding"),
      e.filter(col("vec_id") < 4), col("vec_id"), col("embedding"))
    perQuery.groupBy(col("grp").as("label"))
      .agg(max(when(col("qid") === 0, col("max_sim"))).as("m0"),
        max(when(col("qid") === 1, col("max_sim"))).as("m1"),
        max(when(col("qid") === 2, col("max_sim"))).as("m2"),
        max(when(col("qid") === 3, col("max_sim"))).as("m3"))
      .select(col("label"), col("m0"), col("m1"), col("m2"), col("m3"),
        (col("m0") + col("m1") + col("m2") + col("m3")).as("maxsim_score"))
      .orderBy(col("label"))
  }


  /** Cross-lingual parallel-pair mining ([[Similarity.marginMining]]): for
    * each English anchor document, the 3 best non-English candidates by the
    * margin criterion — cosine normalized by both endpoints' top-4
    * neighborhood density — the curation op that builds aligned-pair
    * training sets and that raw cosine gets wrong wherever a hub vector
    * sits near everything. Anchors are the bounded broadcast side (q30's
    * contract); the per-anchor neighborhood and final margin cuts run
    * sharded (no low-cardinality window over the pair frame); all doubles
    * are fixed-order so ranks replay exactly. Output is rank-only — ids
    * and languages, no floats in the artifact.
    */
  def bitextMargin(spark: SparkSession, dir: String): DataFrame = {
    val j = t(spark, dir, "embeddings")
      .join(t(spark, dir, "documents"), col("vec_id") === col("doc_id"))
      .select(col("vec_id").as("id"), col("embedding").as("v"), col("lang"))
    val anchors = j.filter(col("lang") === "en" && col("id") < 50)
    val targets = j.filter(col("lang") =!= "en")
    Similarity.marginMining(
      targets, col("id"), col("v"), col("lang"),
      anchors, col("id"), col("v"), k = 4, topM = 3)
  }


  /** IVF posting-list balance + coherence audit ([[Similarity.ivfBalance]]):
    * dense per-cell population/share/load-factor/mean-cosine over the same
    * 32 hash-sampled centroids q53 probes — the capacity-planning table
    * that decides centroid count and refinement before an index build.
    */
  def ivfBalanceAudit(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "embeddings")
    Similarity.ivfBalance(e, col("vec_id"), col("embedding"), nCentroids = 32)
  }


  /** Embedding dimension-health audit: per dimension, the micro-quantized
    * component mean, the exactly-zero count (dead-dimension detector), and
    * the dimension's share of total squared mass in ppm (anisotropy — a
    * healthy 64-dim space sits near 15625 ppm per dim; one dimension
    * hoarding energy means cosine is secretly a 1-D comparison, the
    * known rogue-dimension failure of embedding models). This is the
    * pre-flight check for every consumer downstream — q30's cosine, q66's
    * PQ codebooks, q74's int8 ranges all assume the space isn't
    * degenerate. Scale shape: one posexplode + map-side-combined groupBy
    * over dim-cardinality keys; components integerize as floor(x·1e6)
    * BEFORE any sum, squared mass accumulates in DECIMAL(38,0) (q133's
    * overflow discipline), means use sign-explicit truncating division;
    * the total is an in-plan broadcast scalar. Vectors never shuffle —
    * only (dim, partial-aggregate) rows do.
    */
  def dimHealth(spark: SparkSession, dir: String): DataFrame = {
    val comps = t(spark, dir, "embeddings")
      .select(posexplode(col("embedding")).as(Seq("dim_idx", "x")))
      .select(col("dim_idx").cast("long").as("dim_idx"),
        expr("cast(floor(cast(x as double) * 1000000) as long)").as("xm"))
    val per = comps.groupBy(col("dim_idx")).agg(
      count(lit(1)).as("n"),
      sum(when(col("xm") === 0L, 1L).otherwise(0L)).as("n_zero"),
      sum(col("xm")).as("sm"),
      sum(col("xm").cast(DecimalType(38, 0)) * col("xm").cast(DecimalType(38, 0)))
        .as("de"))
    val tot = per.agg(sum(col("de")).as("te"))
    per.crossJoin(broadcast(tot))
      .selectExpr("dim_idx", "n_zero",
        "CASE WHEN sm >= 0 THEN sm DIV n ELSE -((-sm) DIV n) END AS mean_micro",
        "CAST((de * 1000000) DIV te AS BIGINT) AS energy_ppm")
      .orderBy(col("dim_idx"))
  }


  /** Retrieval-index scorecard: recall@10 and MRR for every ANN method in
    * the repo — LSH (q32's buckets) and IVF (q53's cells) — against the
    * brute-force truth (q30), on the same query set, in ONE table. q126
    * charts one index's probe-budget curve; this is the cross-method
    * decision row ("which index, at today's data") an embedding platform
    * publishes with each corpus release. The grid is DENSE over methods ×
    * queries, so a query an index returns nothing for (empty LSH bucket)
    * still drags its recall down instead of silently vanishing. MRR stays
    * integer: per query 1e6 DIV first-hit-rank, averaged by DIV — exact
    * in both engines. Scale shape: each method is its own already-audited
    * plan (broadcast queries, bucketed/celled probes); the scorecard adds
    * only joins on (query, corpus-id) pairs of k-bounded results and a
    * methods×queries rollup.
    */
  def retrievalScorecard(spark: SparkSession, dir: String): DataFrame = {
    // ONE k feeds every topK call AND the recall denominator below — a k
    // changed in one place but not the other silently skews recall_ppm
    // (mirror any change in the q160 oracle SQL's `* 10L`).
    val k = 10
    val e = t(spark, dir, "embeddings")
    val q = e.filter(col("vec_id") < 5)
    def asResult(df: DataFrame, m: String): DataFrame =
      df.select(lit(m).as("method"), col("query_id"), col("corpus_id"), col("rank"))
    val truth = Similarity.bruteForceTopK(e, col("vec_id"), col("embedding"),
      q, col("vec_id"), col("embedding"), k = k)
    val results = asResult(truth, "brute")
      .unionByName(asResult(Similarity.lshTopK(e, col("vec_id"), col("embedding"),
        q, col("vec_id"), col("embedding"), k = k, dim = 64, bits = 6), "lsh"))
      .unionByName(asResult(Similarity.ivfTopK(e, col("vec_id"), col("embedding"),
        q, col("vec_id"), col("embedding"), k = k, nCentroids = 32, nProbe = 8), "ivf"))
    val truthSet = truth.select(col("query_id"), col("corpus_id"), lit(1).as("hit"))
    val perQ = results
      .join(truthSet, Seq("query_id", "corpus_id"), "left")
      .groupBy(col("method"), col("query_id"))
      .agg(sum(coalesce(col("hit"), lit(0))).cast("long").as("hits"),
        min(when(col("hit").isNotNull, col("rank"))).as("first_hit"))
    val grid = q.select(col("vec_id").as("query_id"))
      .crossJoin(spark.sql("SELECT explode(array('brute', 'lsh', 'ivf')) AS method"))
    grid.join(perQ, Seq("method", "query_id"), "left")
      .groupBy(col("method"))
      .agg(count(lit(1)).as("n_queries"),
        coalesce(sum(col("hits")), lit(0L)).as("n_hits"),
        sum(when(col("first_hit").isNull, 0L)
          .otherwise(expr("1000000L DIV first_hit"))).as("rr_sum"))
      .selectExpr("method", "n_queries", "n_hits",
        s"(n_hits * 1000000L) DIV (n_queries * ${k}L) AS recall_ppm",
        "rr_sum DIV n_queries AS mrr_micro")
      .orderBy(col("method"))
  }


  /** Cross-release centroid drift: for each label, the cosine² (signed,
    * exact ppm) between its centroid in release A and release B —
    * "did this class MOVE between embedding runs", the geometric drift
    * monitor that catches a silently retrained or re-normalized encoder
    * before any downstream index (q53's cells, q66's codebooks, q136's
    * negatives) quietly degrades. Releases are deterministic id-hash
    * halves; q141's integer-centroid discipline carries over verbatim:
    * int8-quantized per-dim INTEGER sums stand in for centroids (cosine
    * is scale-invariant), products in DECIMAL/HUGEINT, sign-explicit
    * squared cosine so no sqrt enters either engine. 1e6 means the class
    * did not rotate; drift_ppm = 1e6 − sim2 is the alarm column. One
    * map-side-combined (label, release, dim) sum pass; vectors never
    * shuffle — labels × 2 × dim integer rows do.
    */
  def centroidDrift(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "embeddings")
    val scale = Quant.fitScale(e, col("embedding"))
    val rel = e.withColumn("release",
      when(Sampling.hashBucket(col("vec_id"), 100) < 50, "a").otherwise("b"))
    val sums = rel
      .select(col("label").cast("long").as("label"), col("release"),
        posexplode(Quant.encode(col("embedding"), scale)).as(Seq("pos", "c")))
      .groupBy(col("label"), col("release"), col("pos"))
      .agg(sum(col("c")).as("s"))
    val a = sums.filter(col("release") === "a")
      .select(col("label"), col("pos"), col("s").as("sa"))
    val b = sums.filter(col("release") === "b")
      .select(col("label"), col("pos"), col("s").as("sb"))
    val geo = a.join(b, Seq("label", "pos"))
      .groupBy(col("label"))
      .agg(
        sum(expr("CAST(sa AS DECIMAL(19,0)) * CAST(sb AS DECIMAL(19,0))")).as("dot_d"),
        sum(expr("CAST(sa AS DECIMAL(19,0)) * CAST(sa AS DECIMAL(19,0))")).as("na2"),
        sum(expr("CAST(sb AS DECIMAL(19,0)) * CAST(sb AS DECIMAL(19,0))")).as("nb2"))
    val counts = rel.groupBy(col("label").cast("long").as("label"))
      .agg(sum(when(col("release") === "a", 1L).otherwise(0L)).as("n_a"),
        sum(when(col("release") === "b", 1L).otherwise(0L)).as("n_b"))
    geo.join(counts, "label")
      .filter(col("n_a") > 0 && col("n_b") > 0)
      .select(col("label"), col("n_a"), col("n_b"),
        expr("""CAST(CASE WHEN na2 * nb2 = 0 THEN 0
               | WHEN dot_d < 0 THEN -((dot_d * dot_d * 1000000) DIV (na2 * nb2))
               | ELSE (dot_d * dot_d * 1000000) DIV (na2 * nb2)
               |END AS BIGINT)""".stripMargin).as("sim2_ppm"))
      .withColumn("drift_ppm", lit(1000000L) - col("sim2_ppm"))
      .orderBy(col("label"))
  }


  /** Exact integer covariance matrix of the embedding dimensions (upper
    * triangle, dim·(dim+1)/2 rows) — the input every PCA / whitening /
    * decorrelation step needs, and the cross-dimension completion of
    * q155's per-dim moments (a rogue PAIR of correlated dims is invisible
    * to marginals). Scaled covariance cov_micro2 = (n·Σxy − Σx·Σy) DIV n²
    * in micro² units, all from integer sums (q133's discipline at matrix
    * scale). Scale shape — no self-join: the (p, q, x_p·x_q) pair stream
    * is generated MAP-SIDE by one nested-transform explode per row (the
    * ×dim²/2 amplification is scan-stage CPU, and map-side combine means
    * the shuffle carries only partitions × 2080 partial rows); Σx_p comes
    * from the dim-level pass, never the pair stream; n is an in-plan
    * broadcast scalar. [[graft.functions.Pca.topComponent]] consumes this
    * matrix driver-side (64×64 — a model-fit decision point, like the
    * k-means codebooks) for the principal direction.
    */
  def dimCovariance(spark: SparkSession, dir: String): DataFrame = {
    // r20: the dim-pair explode is ×2080 per row of expression CPU — fan
    // the (small) vector table to cores (see Tables.fanOutSmallInput).
    val withXm = graft.sources.Tables.fanOutSmallInput(t(spark, dir, "embeddings"))
      .withColumn("xm",
        expr("transform(embedding, x -> cast(floor(cast(x as double) * 1000000) as long))"))
    val pairs = withXm
      .select(explode(expr(
        """flatten(transform(sequence(0, 63), p ->
          |  transform(sequence(p, 63), q ->
          |    struct(p AS p, q AS q, xm[p] * xm[q] AS xy))))""".stripMargin)).as("s"))
      .select(col("s.p").cast("long").as("p"), col("s.q").cast("long").as("q"),
        col("s.xy"))
      .groupBy(col("p"), col("q"))
      .agg(sum(col("xy").cast(DecimalType(38, 0))).as("sxy"))
    val dims = withXm
      .select(posexplode(col("xm")).as(Seq("d", "x")))
      .groupBy(col("d").cast("long").as("d"))
      .agg(sum(col("x")).as("sx"))
    val n = withXm.agg(count(lit(1)).as("n"))
    pairs
      .join(broadcast(dims.select(col("d").as("p"), col("sx").as("sp"))), "p")
      .join(broadcast(dims.select(col("d").as("q"), col("sx").as("sq"))), "q")
      .crossJoin(broadcast(n))
      .selectExpr("p", "q",
        """CAST(CASE WHEN CAST(n AS DECIMAL(38,0)) * sxy - CAST(sp AS DECIMAL(38,0)) * sq >= 0
          |  THEN (CAST(n AS DECIMAL(38,0)) * sxy - CAST(sp AS DECIMAL(38,0)) * sq) DIV (CAST(n AS DECIMAL(38,0)) * n)
          |  ELSE -((-(CAST(n AS DECIMAL(38,0)) * sxy - CAST(sp AS DECIMAL(38,0)) * sq)) DIV (CAST(n AS DECIMAL(38,0)) * n))
          |END AS BIGINT) AS cov_micro2""".stripMargin.replaceAll("\n", " "))
      .orderBy(col("p"), col("q"))
  }


  /** Cross-modal coverage audit: referential integrity between the text
    * corpus and its embedding table — documents with no vector (the
    * encoder skipped or crashed on them), vectors with no document
    * (stale embeddings surviving a corpus re-release), and per-language
    * coverage ppm. This is q16's null-audit discipline applied ACROSS
    * modalities, and the gate every embedding consumer (q30/q53/q91/
    * q136) silently assumes passed — a biased skip pattern (e.g. the
    * encoder failing on one language's long documents) poisons every
    * downstream similarity result while each table looks healthy alone.
    * Two anti-join counts plus a per-language left-join rollup; ids only
    * shuffle.
    */
  def modalCoverage(spark: SparkSession, dir: String): DataFrame = {
    val d = t(spark, dir, "documents").select(col("doc_id"), col("lang"))
    val e = t(spark, dir, "embeddings").select(col("vec_id"))
    val covered = d.join(e, col("doc_id") === col("vec_id"), "left")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("vec_id").isNotNull, 1L).otherwise(0L)).as("n_embedded"))
      .selectExpr("lang", "n_docs", "n_embedded",
        "(n_embedded * 1000000L) DIV n_docs AS coverage_ppm")
    val orphanVecs = e.join(d, col("vec_id") === col("doc_id"), "left_anti")
      .agg(count(lit(1)).as("n"))
    covered.crossJoin(broadcast(orphanVecs.selectExpr("n AS orphan_vectors")))
      .orderBy(col("lang"))
  }


  /** The q32 LSH bucket as portable SQL: the SplitMix64 hyperplane
    * coefficients the native expression derives (shared via
    * [[graft.plans.HyperplaneSignature.coefficients]]) embedded as
    * `DOUBLE[]` literals, sign bits via `list_inner_product` on the
    * double-cast embedding — the same ascending-index double math as
    * the expression's loop. `Double.toString` round-trips and DuckDB's
    * decimal parser is correctly rounded, so the literals reconstruct
    * bit-identical doubles.
    */
  private[graft] lazy val LshBucketSql: String =
    graft.plans.HyperplaneSignature.coefficients(dim = 64, bits = 6, seed = 42L)
      .zipWithIndex.map { case (row, b) =>
        val arr = row.map(java.lang.Double.toString).mkString(",")
        s"(CASE WHEN list_inner_product(v, [$arr]) > 0.0 THEN ${1L << b} ELSE 0 END)"
      }.mkString("\n    + ")


  /** The q53 IVF centroid sample as portable SQL — the same md5
    * hash-bucket order [[graft.functions.Similarity.ivfTopK]] uses.
    */
  private[graft] val IvfCentroidOrderSql: String =
    "('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT % 1073741824, vec_id"


  /** Shared PQ oracle CTEs: the hash-ordered 16-vector codebook, subvector
    * index table, and per-vector packed argmin codes — the
    * [[graft.functions.Pq.fit]] + [[graft.plans.PqEncode]] derivation in
    * plain SQL. All distances are sequential `list_inner_product` over the
    * same doubles the native expressions loop over, so codes and rankings
    * are bit-identical.
    */
  private[graft] val PqCodesSql: String =
    """e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |cb AS (SELECT cidx, cv FROM (
      |        SELECT row_number() OVER (ORDER BY
      |                 ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT % 1073741824,
      |                 vec_id) - 1 AS cidx,
      |               v AS cv FROM e) WHERE cidx < 16),
      |js AS (SELECT unnest(range(0, 8)) AS j),
      |sub AS (SELECT e.vec_id, js.j, cb.cidx,
      |          list_inner_product(
      |            list_transform(range(1, 9), d -> e.v[js.j*8+d] - cb.cv[js.j*8+d]),
      |            list_transform(range(1, 9), d -> e.v[js.j*8+d] - cb.cv[js.j*8+d])) AS dist
      |        FROM e CROSS JOIN js CROSS JOIN cb),
      |best AS (SELECT vec_id, j, cidx FROM (
      |          SELECT vec_id, j, cidx,
      |                 row_number() OVER (PARTITION BY vec_id, j ORDER BY dist, cidx) AS r
      |          FROM sub) WHERE r = 1),
      |codes AS (SELECT vec_id, CAST(sum(cidx << (4*j)) AS BIGINT) AS pq_code
      |          FROM best GROUP BY vec_id)""".stripMargin


  /** PQ reconstruction CTEs (decode the packed code back to centroid
    * slices, concatenated in subvector order) — shared by q67 and q68.
    */
  private[graft] val PqRecSql: String =
    """dec AS (SELECT codes.vec_id, js.j, ((codes.pq_code >> (4*js.j)) & 15) AS cidx
      |        FROM codes CROSS JOIN js),
      |slices AS (SELECT dec.vec_id, dec.j, cb.cv[dec.j*8+1 : dec.j*8+8] AS sl
      |           FROM dec JOIN cb USING (cidx)),
      |rec AS (SELECT vec_id, flatten(list(sl ORDER BY j)) AS r FROM slices GROUP BY vec_id)""".stripMargin


  /** Sequential squared-L2 in SQL: `list_inner_product(diff, diff)` —
    * the same ascending accumulation as the native L2/ADC expressions.
    */
  private[graft] def l2Sql(a: String, b: String, dim: Int): String =
    s"""list_inner_product(list_transform(range(1, ${dim + 1}), i -> $a[i] - $b[i]),
       |                   list_transform(range(1, ${dim + 1}), i -> $a[i] - $b[i]))""".stripMargin


  /** The q72/q75 k-means chain in portable SQL — the
    * [[graft.functions.Kmeans.fit]] derivation verbatim: hash-ordered seed
    * (cb0), then per Lloyd iteration an argmin assignment (aN) and the
    * fixed-point mean update (mN → cbN; the COALESCE keeps a starved
    * cluster's previous centroid, mirroring the Scala clone-then-update).
    * `floor(x·1e9)` sums are exact integers, so the distributed partial
    * aggregation and DuckDB's single-threaded sum agree bit-for-bit; the
    * chain ends in the final-assignment CTE `af(vec_id, cluster, dist)`.
    */
  private[graft] lazy val KmeansBody: String = {
    val k = 8; val iters = 2; val dim = 64
    def assignCte(name: String, cb: String): String =
      s"""$name AS (SELECT vec_id, v, cidx AS cluster, d AS dist FROM (
         |  SELECT vec_id, v, cidx, d,
         |         row_number() OVER (PARTITION BY vec_id ORDER BY d, cidx) AS r
         |  FROM (SELECT e.vec_id, e.v, $cb.cidx,
         |          ${l2Sql("e.v", s"$cb.cv", dim)} AS d
         |        FROM e CROSS JOIN $cb)) WHERE r = 1)""".stripMargin
    val steps = (1 to iters).map { i =>
      s"""${assignCte(s"a$i", s"cb${i - 1}")},
         |m$i AS (SELECT cluster, j,
         |          sum(CAST(floor(v[j+1] * 1e9) AS DECIMAL(38,0))) AS s,
         |          count(*) AS n
         |        FROM a$i CROSS JOIN (SELECT unnest(range(0, $dim)) AS j) js
         |        GROUP BY cluster, j),
         |cb$i AS (SELECT cb${i - 1}.cidx, COALESCE(u.cv, cb${i - 1}.cv) AS cv
         |         FROM cb${i - 1} LEFT JOIN (
         |           SELECT cluster AS cidx,
         |                  list(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 1e9 ORDER BY j) AS cv
         |           FROM m$i GROUP BY cluster) u USING (cidx))""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |cb0 AS (SELECT cidx, cv FROM (
       |        SELECT row_number() OVER (ORDER BY $IvfCentroidOrderSql) - 1 AS cidx,
       |               v AS cv FROM e) WHERE cidx < $k),
       |$steps,
       |${assignCte("af", s"cb$iters")}""".stripMargin
  }

  /** Int8-quantization retrieval audit: recall@10 of ranking by the
    * all-integer sign-aware squared cosine over q74's int8 codes, against
    * the float cosine truth (the q30 contract) — does 8-bit compression
    * change what you retrieve, measured, not assumed. The integer proxy
    * `sign(dot)·dot²·10⁶ DIV (|a|²·|b|²)` replays bit-for-bit in DuckDB
    * (no float enters the RANKING; the float truth side reuses q30's
    * already-oracled form). Same scale shape as q30: a 5-query bounded
    * broadcast against one corpus scan (adjudicated BNLJ), per-query
    * windows, k-bounded joins after.
    */
  def int8Recall(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "embeddings")
    val scale = Quant.fitScale(e, col("embedding"))
    val codes = e.select(col("vec_id"), Quant.encode(col("embedding"), scale).as("c"))
    val truth = Similarity.bruteForceTopK(e, col("vec_id"), col("embedding"),
        e.filter(col("vec_id") < 5), col("vec_id"), col("embedding"), k = 10)
      .select(col("query_id"), col("corpus_id"))
    val q = codes.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("c").as("qc"))
    val scored = codes.select(col("vec_id").as("cid"), col("c").as("cc"))
      .crossJoin(broadcast(q))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        expr("aggregate(zip_with(qc, cc, (x, y) -> CAST(x AS BIGINT) * y), 0L, (a, x) -> a + x)")
          .as("dot"),
        expr("aggregate(qc, 0L, (a, x) -> a + CAST(x AS BIGINT) * x)").as("nq"),
        expr("aggregate(cc, 0L, (a, x) -> a + CAST(x AS BIGINT) * x)").as("nc"))
      .select(col("qid"), col("cid"),
        expr("CASE WHEN dot >= 0 THEN dot * dot * 1000000 DIV greatest(nq * nc, 1L) " +
          "ELSE -(dot * dot * 1000000 DIV greatest(nq * nc, 1L)) END").as("sim2_ppm"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("sim2_ppm").desc, col("cid"))
    val approx = scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 10)
      .select(col("qid"), col("cid"))
    // DENSE over the query set (the q160 discipline): a query whose int8
    // list shares NOTHING with the truth must report recall 0, not vanish
    val hits = approx
      .join(truth, col("qid") === col("query_id") && col("cid") === col("corpus_id"),
        "left_semi")
      .groupBy(col("qid"))
      .agg(count(lit(1)).as("h"))
    q.select(col("qid"))
      .join(hits, Seq("qid"), "left")
      .select(col("qid").as("query_id"),
        coalesce(col("h"), lit(0L)).as("n_hits"),
        (coalesce(col("h"), lit(0L)) * 100000).as("recall_ppm"))
      .orderBy(col("query_id"))
  }

  /** Matryoshka (prefix-dimension) recall curve: recall@10 of cosine
    * ranking over the first 8/16/32/64 dims against the full-dim truth —
    * the "how few dimensions can retrieval afford" audit behind
    * MRL-truncated embedding serving, the dimension analog of q207's
    * int8 precision cut. ONE corpus pass computes all four prefix
    * similarities (the slices share the scan), stack unpivots to
    * (dim, sim), one window family ranks per (dim, query), and the
    * 64-dim branch IS the truth — recall is a semi-join against it,
    * dense over the dims×queries grid so a collapsed prefix reports 0
    * rather than vanishing. Query set is a bounded broadcast
    * (adjudicated BNLJ, the q30/q207 pattern).
    */
  def matryoshkaRecall(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "embeddings")
    val dims = Seq(8, 16, 32, 64)
    // The scan-operator discipline (Similarity.scala): prefix norms are
    // projected ONCE per row on each side below the join, so every
    // candidate pair costs exactly one dot product per prefix — never a
    // per-pair norm recomputation on the all-pairs hot path.
    def withNorms(v: Column, p: String): Seq[Column] =
      dims.map(d => Similarity.norm(slice(v, 1, d)).as(s"$p$d"))
    // broadcast-hint ONLY at the crossJoin below: hinting this shared val
    // would ride into the tail's left join (where the 20-row side is the
    // LEFT of a left-outer — unbuildable) and spam HintErrorLogger WARNs
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid") +: col("embedding").as("qv") +:
        withNorms(col("embedding"), "qn"): _*)
    val sims = dims.map { d =>
      val den = col(s"cn$d") * col(s"qn$d")
      when(den === 0, lit(0.0))
        .otherwise(Similarity.dot(slice(col("cv"), 1, d), slice(col("qv"), 1, d)) / den)
        .as(s"sim$d")
    }
    val scored = e.select(col("vec_id").as("cid") +: col("embedding").as("cv") +:
        withNorms(col("embedding"), "cn"): _*)
      .crossJoin(broadcast(q))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid") +: col("cid") +: sims: _*)
    val stacked = scored.selectExpr("qid", "cid",
      "stack(4, 8L, sim8, 16L, sim16, 32L, sim32, 64L, sim64) AS (dim_prefix, sim)")
    val w = Window.partitionBy(col("dim_prefix"), col("qid"))
      .orderBy(col("sim").desc, col("cid"))
    val top = stacked.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 10)
      .select(col("dim_prefix"), col("qid"), col("cid"))
    val truth = top.filter(col("dim_prefix") === 64L)
      .select(col("qid").as("tq"), col("cid").as("tc"))
    val hits = top
      .join(truth, col("qid") === col("tq") && col("cid") === col("tc"), "left_semi")
      .groupBy(col("dim_prefix"), col("qid"))
      .agg(count(lit(1)).as("h"))
    q.select(col("qid"))
      .withColumn("dim_prefix", explode(array(dims.map(d => lit(d.toLong)): _*)))
      .join(hits, Seq("dim_prefix", "qid"), "left")
      .select(col("dim_prefix"), col("qid").as("query_id"),
        coalesce(col("h"), lit(0L)).as("n_hits"),
        (coalesce(col("h"), lit(0L)) * 100000).as("recall_ppm"))
      .orderBy(col("dim_prefix"), col("query_id"))
  }


  /** Hubness audit (k-occurrence distribution): how often each corpus
    * vector lands in other vectors' exact top-10 cosine lists, rolled up
    * as a histogram of that occurrence count — the standard
    * high-dimensional hubness diagnostic (a heavy right tail means hub
    * vectors dominate retrieval and skew ANN ground truth; a mass near
    * the probe mean means the space is well-behaved). The probe set is
    * a fixed 64-query deterministic sample (`vec_id < 64`), so the
    * scored frame is 64×corpus — linear in corpus, never all-pairs —
    * while the corpus side is never sampled: every vector's occurrence
    * count is exact for this probe set. Reuses the
    * [[Similarity.bruteForceTopK]] broadcast→window path; after it, two
    * bounded rollups (corpus-keyed count, then a ≤640-cell histogram).
    * Vectors that never appear in any list carry occ=0 implicitly and
    * are not emitted.
    */
  def hubnessAudit(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "embeddings")
    Similarity.bruteForceTopK(e, col("vec_id"), col("embedding"),
        e.filter(col("vec_id") < 64), col("vec_id"), col("embedding"), k = 10)
      .groupBy(col("corpus_id")).agg(count(lit(1)).as("occ"))
      .groupBy(col("occ")).agg(count(lit(1)).as("n_vectors"))
      .orderBy(col("occ"))
  }


  protected lazy val vectorOracle: Map[String, String] = Map(
    "q230_hubness" ->
      """WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
        |           FROM embeddings WHERE vec_id < 64),
        |c AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
        |s AS (SELECT qid, cid, list_cosine_similarity(cv, qv) AS sim
        |      FROM c CROSS JOIN q WHERE qid <> cid),
        |r AS (SELECT qid, cid,
        |        row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rnk
        |      FROM s),
        |occ AS (SELECT cid, CAST(count(*) AS BIGINT) AS occ
        |        FROM r WHERE rnk <= 10 GROUP BY 1)
        |SELECT occ, CAST(count(*) AS BIGINT) AS n_vectors
        |FROM occ GROUP BY 1 ORDER BY occ""".stripMargin,
    "q228_matryoshka_recall" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 5),
        |dims AS (SELECT * FROM (VALUES (8), (16), (32), (64)) AS d(dp)),
        |s AS (SELECT dp, qid, e.vec_id AS cid,
        |        list_cosine_similarity(list_slice(e.v, 1, dp), list_slice(qv, 1, dp)) AS sim
        |      FROM e CROSS JOIN q CROSS JOIN dims WHERE e.vec_id <> qid),
        |r AS (SELECT dp, qid, cid,
        |        row_number() OVER (PARTITION BY dp, qid ORDER BY sim DESC, cid) AS rnk
        |      FROM s),
        |top AS (SELECT dp, qid, cid FROM r WHERE rnk <= 10),
        |truth AS (SELECT qid, cid FROM top WHERE dp = 64),
        |h AS (SELECT t.dp, t.qid, CAST(count(*) AS BIGINT) AS h
        |      FROM top t JOIN truth u ON t.qid = u.qid AND t.cid = u.cid
        |      GROUP BY 1, 2)
        |SELECT CAST(d.dp AS BIGINT) AS dim_prefix, q.qid AS query_id,
        |  CAST(coalesce(h.h, 0) AS BIGINT) AS n_hits,
        |  CAST(coalesce(h.h, 0) * 100000 AS BIGINT) AS recall_ppm
        |FROM q CROSS JOIN dims d
        |LEFT JOIN h ON h.dp = d.dp AND h.qid = q.qid
        |ORDER BY dim_prefix, query_id""".stripMargin,
    "q207_int8_recall" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |s AS (SELECT max(list_max(list_transform(v, x -> abs(x)))) AS sc FROM e),
        |codes AS (SELECT vec_id,
        |            list_transform(v, x -> CAST(floor(x / sc * 127.0 + 0.5) AS BIGINT)) AS c
        |          FROM e CROSS JOIN s),
        |truth AS (SELECT qid AS query_id, cid AS corpus_id FROM (
        |  SELECT q.vec_id AS qid, c.vec_id AS cid,
        |         row_number() OVER (PARTITION BY q.vec_id
        |           ORDER BY list_cosine_similarity(c.v, q.v) DESC, c.vec_id) AS rnk
        |  FROM e c CROSS JOIN (SELECT * FROM e WHERE vec_id < 5) q
        |  WHERE q.vec_id <> c.vec_id) WHERE rnk <= 10),
        |sc2 AS (SELECT q.vec_id AS qid, c.vec_id AS cid,
        |          CAST(list_inner_product(q.c, c.c) AS BIGINT) AS dot,
        |          CAST(list_inner_product(q.c, q.c) AS BIGINT) AS nq,
        |          CAST(list_inner_product(c.c, c.c) AS BIGINT) AS nc
        |        FROM codes c CROSS JOIN (SELECT * FROM codes WHERE vec_id < 5) q
        |        WHERE q.vec_id <> c.vec_id),
        |pp AS (SELECT qid, cid,
        |         CASE WHEN dot >= 0 THEN dot * dot * 1000000 // greatest(nq * nc, 1)
        |              ELSE -(dot * dot * 1000000 // greatest(nq * nc, 1)) END AS sim2_ppm
        |       FROM sc2),
        |ap AS (SELECT qid, cid FROM (
        |         SELECT qid, cid, row_number() OVER (PARTITION BY qid
        |                  ORDER BY sim2_ppm DESC, cid) AS rnk FROM pp)
        |       WHERE rnk <= 10),
        |h AS (SELECT ap.qid, CAST(count(*) AS BIGINT) AS h
        |      FROM ap JOIN truth ON ap.qid = truth.query_id AND ap.cid = truth.corpus_id
        |      GROUP BY 1),
        |qs AS (SELECT DISTINCT vec_id AS qid FROM codes WHERE vec_id < 5)
        |SELECT qs.qid AS query_id, coalesce(h.h, 0) AS n_hits,
        |  CAST(coalesce(h.h, 0) * 100000 AS BIGINT) AS recall_ppm
        |FROM qs LEFT JOIN h USING (qid) ORDER BY query_id""".stripMargin,
    "q66_pq_codes" ->
      s"""WITH $PqCodesSql
         |SELECT vec_id, pq_code FROM codes ORDER BY vec_id""".stripMargin,
    "q67_pq_adc" ->
      s"""WITH $PqCodesSql,
         |$PqRecSql,
         |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 5),
         |s AS (SELECT qid, rec.vec_id AS corpus_id,
         |        ${l2Sql("qv", "r", 64)} AS adist
         |      FROM rec CROSS JOIN q WHERE qid <> rec.vec_id),
         |rk AS (SELECT qid AS query_id, corpus_id,
         |         row_number() OVER (PARTITION BY qid ORDER BY adist, corpus_id) AS rnk FROM s)
         |SELECT query_id, corpus_id, rnk FROM rk WHERE rnk <= 10 ORDER BY query_id, rnk""".stripMargin,
    "q68_ivf_pq" ->
      s"""WITH $PqCodesSql,
         |$PqRecSql,
         |cents AS (SELECT vec_id AS cell_id, v AS cent FROM e
         |          ORDER BY ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT % 1073741824, vec_id
         |          LIMIT 32),
         |asg AS (SELECT corpus_id, cell_id FROM (
         |          SELECT e.vec_id AS corpus_id, cents.cell_id,
         |                 row_number() OVER (PARTITION BY e.vec_id ORDER BY
         |                   ${l2Sql("e.v", "cents.cent", 64)},
         |                   cents.cell_id) AS cr
         |          FROM e CROSS JOIN cents) WHERE cr = 1),
         |probes AS (SELECT qid, qv, cell_id FROM (
         |          SELECT e.vec_id AS qid, e.v AS qv, cents.cell_id,
         |                 row_number() OVER (PARTITION BY e.vec_id ORDER BY
         |                   ${l2Sql("e.v", "cents.cent", 64)},
         |                   cents.cell_id) AS qr
         |          FROM e CROSS JOIN cents WHERE e.vec_id < 5) WHERE qr <= 8),
         |s AS (SELECT probes.qid, asg.corpus_id,
         |        ${l2Sql("probes.qv", "rec.r", 64)} AS adist
         |      FROM asg JOIN probes USING (cell_id)
         |      JOIN rec ON rec.vec_id = asg.corpus_id
         |      WHERE probes.qid <> asg.corpus_id),
         |rk AS (SELECT qid AS query_id, corpus_id,
         |         row_number() OVER (PARTITION BY qid ORDER BY adist, corpus_id) AS rnk FROM s)
         |SELECT query_id, corpus_id, rnk FROM rk WHERE rnk <= 10 ORDER BY query_id, rnk""".stripMargin,
    "q30_ann_brute" ->
      """WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id < 5),
        |c AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
        |s AS (SELECT qid, cid, list_cosine_similarity(cv, qv) AS sim FROM c CROSS JOIN q WHERE qid <> cid),
        |r AS (SELECT qid AS query_id, cid AS corpus_id,
        |        row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rnk
        |      FROM s)
        |SELECT query_id, corpus_id, rnk FROM r WHERE rnk <= 10 ORDER BY query_id, rnk""".stripMargin,
    "q31_embed_neardup" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |FROM embeddings a CROSS JOIN embeddings b
        |WHERE a.vec_id < b.vec_id AND a.vec_id < 2000 AND b.vec_id < 2000
        |  AND list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) >= 0.45
        |ORDER BY id_a, id_b""".stripMargin,
    "q32_ann_lsh" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |sg AS (SELECT vec_id, v, $LshBucketSql AS bucket FROM e),
         |q AS (SELECT vec_id AS qid, v AS qv, bucket FROM sg WHERE vec_id < 5),
         |c AS (SELECT vec_id AS cid, v AS cv, bucket FROM sg),
         |s AS (SELECT qid, cid, list_cosine_similarity(cv, qv) AS sim
         |      FROM c JOIN q USING (bucket) WHERE qid <> cid),
         |r AS (SELECT qid AS query_id, cid AS corpus_id,
         |        row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rnk FROM s)
         |SELECT query_id, corpus_id, rnk FROM r WHERE rnk <= 10 ORDER BY query_id, rnk""".stripMargin,
    "q53_ann_ivf" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |cents AS (SELECT vec_id AS cell_id, v AS cent FROM e
         |          ORDER BY $IvfCentroidOrderSql
         |          LIMIT 32),
         |asg AS (SELECT corpus_id, cv, cell_id FROM (
         |          SELECT e.vec_id AS corpus_id, e.v AS cv, cents.cell_id,
         |                 row_number() OVER (PARTITION BY e.vec_id
         |                   ORDER BY list_cosine_similarity(e.v, cents.cent) DESC, cents.cell_id) AS cr
         |          FROM e CROSS JOIN cents)
         |        WHERE cr = 1),
         |probes AS (SELECT qid, qv, cell_id FROM (
         |          SELECT e.vec_id AS qid, e.v AS qv, cents.cell_id,
         |                 row_number() OVER (PARTITION BY e.vec_id
         |                   ORDER BY list_cosine_similarity(e.v, cents.cent) DESC, cents.cell_id) AS qr
         |          FROM e CROSS JOIN cents WHERE e.vec_id < 5)
         |        WHERE qr <= 8),
         |s AS (SELECT qid, corpus_id, list_cosine_similarity(cv, qv) AS sim
         |      FROM asg JOIN probes USING (cell_id) WHERE qid <> corpus_id),
         |r AS (SELECT qid AS query_id, corpus_id,
         |        row_number() OVER (PARTITION BY qid ORDER BY sim DESC, corpus_id) AS rnk FROM s)
         |SELECT query_id, corpus_id, rnk FROM r WHERE rnk <= 10 ORDER BY query_id, rnk""".stripMargin,
    "q72_kmeans" ->
      s"""$KmeansBody
         |SELECT cluster, count(*) AS n_vecs,
         |       CAST(sum(CAST(floor(dist * 1e9) AS DECIMAL(38,0))) AS DOUBLE) / 1e9 AS inertia
         |FROM af GROUP BY cluster ORDER BY cluster""".stripMargin,
    "q75_cluster_purity" ->
      s"""$KmeansBody,
         |lab AS (SELECT vec_id, CAST(label AS BIGINT) AS label FROM embeddings),
         |cnt AS (SELECT cluster, label, count(*) AS top_n
         |        FROM af JOIN lab USING (vec_id) GROUP BY cluster, label)
         |SELECT cluster, n_vecs, label AS top_label, top_n FROM (
         |  SELECT cluster, label, top_n,
         |         CAST(sum(top_n) OVER (PARTITION BY cluster) AS BIGINT) AS n_vecs,
         |         row_number() OVER (PARTITION BY cluster ORDER BY top_n DESC, label) AS r
         |  FROM cnt) WHERE r = 1 ORDER BY cluster""".stripMargin,
    "q74_int8_quant" ->
      s"""WITH e AS (SELECT CAST(label AS BIGINT) AS label,
         |             CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |s AS (SELECT max(list_max(list_transform(v, x -> abs(x)))) AS sc FROM e),
         |r0 AS (SELECT label, v,
         |         list_transform(v, x -> CAST(floor(x / sc * 127.0 + 0.5) AS DOUBLE) * sc / 127.0) AS rec
         |       FROM e CROSS JOIN s),
         |r AS (SELECT label, ${l2Sql("v", "rec", 64)} AS err FROM r0)
         |SELECT label, count(*) AS n_vecs,
         |       CAST(sum(CAST(floor(err * 1e12) AS DECIMAL(38,0))) AS DOUBLE) / 1e12 AS total_err,
         |       max(err) AS max_err
         |FROM r GROUP BY label ORDER BY label""".stripMargin,
    "q91_semdedup" ->
      s"""$KmeansBody,
         |drops AS (SELECT DISTINCT b.vec_id AS dv
         |          FROM af a JOIN af b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
         |          WHERE list_cosine_similarity(a.v, b.v) >= 0.45)
         |SELECT af.vec_id, CAST(af.cluster AS BIGINT) AS cluster,
         |       (drops.dv IS NULL) AS kept
         |FROM af LEFT JOIN drops ON af.vec_id = drops.dv
         |ORDER BY af.vec_id""".stripMargin,
    "q92_cluster_sample" ->
      s"""$KmeansBody,
         |r AS (SELECT vec_id, CAST(cluster AS BIGINT) AS cluster,
         |        row_number() OVER (PARTITION BY cluster ORDER BY
         |          ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT % 1073741824,
         |          vec_id) AS sample_rank
         |      FROM af)
         |SELECT vec_id, cluster, sample_rank FROM r WHERE sample_rank <= 10
         |ORDER BY cluster, sample_rank""".stripMargin,
    "q100_hybrid_rrf" ->
      s"""WITH toks AS (SELECT doc_id, unnest($DNTOKS) AS term FROM documents),
         |ct AS (SELECT doc_id AS d, term, count(*) AS tf_d FROM toks GROUP BY 1, 2),
         |st AS (SELECT (SELECT count(*) FROM documents) AS n_corpus,
         |              (SELECT sum(tf_d) FROM ct) AS total_tokens),
         |dld AS (SELECT *, sum(tf_d) OVER (PARTITION BY d) AS dl,
         |               count(*) OVER (PARTITION BY term) AS df FROM ct),
         |wt AS (SELECT d, term, tf_d, dl,
         |         CAST(floor(1000000 / df) AS BIGINT) AS w,
         |         (10000 * 22 * tf_d * (total_tokens // n_corpus)) //
         |           (10 * (total_tokens // n_corpus) * tf_d
         |            + 3 * (total_tokens // n_corpus) + 9 * dl) AS tfc
         |       FROM dld, st
         |       WHERE df <= n_corpus * 0.78),
         |qt AS (SELECT d AS q, term, tf_d AS tf_q FROM ct WHERE d < 5),
         |sc AS (SELECT q, d, CAST(sum(tf_q * w * tfc) AS BIGINT) AS score
         |       FROM qt JOIN wt USING (term) GROUP BY 1, 2),
         |sp AS (SELECT q AS query, d AS item,
         |         row_number() OVER (PARTITION BY q ORDER BY score DESC, d) AS rank
         |       FROM sc QUALIFY rank <= 10),
         |qe AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
         |       FROM embeddings WHERE vec_id < 5),
         |ce AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
         |de AS (SELECT qid AS query, cid AS item,
         |         row_number() OVER (PARTITION BY qid
         |           ORDER BY list_cosine_similarity(cv, qv) DESC, cid) AS rank
         |       FROM ce CROSS JOIN qe WHERE qid <> cid QUALIFY rank <= 10),
         |u AS (SELECT * FROM sp UNION ALL SELECT * FROM de),
         |f AS (SELECT query, item,
         |        CAST(sum(1000000 // (60 + rank)) AS BIGINT) AS rrf_score,
         |        count(*) AS n_lists FROM u GROUP BY 1, 2),
         |rr AS (SELECT *, row_number() OVER (PARTITION BY query
         |         ORDER BY rrf_score DESC, item) AS rnk FROM f)
         |SELECT query, item, rrf_score, n_lists, rnk
         |FROM rr WHERE rnk <= 10 ORDER BY query, rnk""".stripMargin,
    "q122_knn_label" ->
      """WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv, label AS tl
        |           FROM embeddings WHERE vec_id < 50),
        |c AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv, label
        |      FROM embeddings WHERE vec_id >= 50),
        |s AS (SELECT qid, cid, label, list_cosine_similarity(cv, qv) AS sim
        |      FROM c CROSS JOIN q),
        |r AS (SELECT qid, label FROM s
        |      QUALIFY row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) <= 10),
        |v AS (SELECT qid, label, count(*) AS n FROM r GROUP BY qid, label),
        |p AS (SELECT qid, label AS predicted_label FROM v
        |      QUALIFY row_number() OVER (PARTITION BY qid ORDER BY n DESC, label) = 1)
        |SELECT p.qid AS query_id, CAST(p.predicted_label AS INT) AS predicted_label,
        |       CAST(q.tl AS INT) AS true_label,
        |       CAST(CASE WHEN p.predicted_label = q.tl THEN 1 ELSE 0 END AS INT) AS correct
        |FROM p JOIN q ON p.qid = q.qid ORDER BY query_id""".stripMargin,
    "q141_label_centroids" ->
      """WITH e AS (SELECT CAST(label AS BIGINT) AS label,
        |             CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |sc AS (SELECT max(list_max(list_transform(v, x -> abs(x)))) AS s FROM e),
        |codes AS (SELECT label, i AS pos,
        |            CAST(floor(v[i] / s * 127.0 + 0.5) AS BIGINT) AS c
        |          FROM e CROSS JOIN sc CROSS JOIN range(1, 65) AS r(i)),
        |sums AS (SELECT label, pos, CAST(sum(c) AS BIGINT) AS sm
        |         FROM codes GROUP BY 1, 2),
        |cnt AS (SELECT label, CAST(count(*) AS BIGINT) AS n_vecs FROM e GROUP BY 1),
        |dots AS (SELECT a.label AS label_a, b.label AS label_b,
        |           sum(CAST(a.sm AS HUGEINT) * CAST(b.sm AS HUGEINT)) AS dot_h
        |         FROM sums a JOIN sums b USING (pos)
        |         WHERE a.label < b.label GROUP BY 1, 2),
        |norms AS (SELECT label, sum(CAST(sm AS HUGEINT) * CAST(sm AS HUGEINT)) AS n2
        |          FROM sums GROUP BY 1)
        |SELECT label_a, label_b, ca.n_vecs AS n_a, cb.n_vecs AS n_b,
        |       CAST(dot_h AS BIGINT) AS dot,
        |       CAST(na.n2 AS BIGINT) AS norm2_a,
        |       CAST(nb.n2 AS BIGINT) AS norm2_b,
        |       CAST(CASE WHEN na.n2 * nb.n2 = 0 THEN 0
        |         WHEN dot_h < 0 THEN -((dot_h * dot_h * 1000000) // (na.n2 * nb.n2))
        |         ELSE (dot_h * dot_h * 1000000) // (na.n2 * nb.n2)
        |       END AS BIGINT) AS sim2_ppm
        |FROM dots
        |JOIN norms na ON na.label = dots.label_a
        |JOIN norms nb ON nb.label = dots.label_b
        |JOIN cnt ca ON ca.label = dots.label_a
        |JOIN cnt cb ON cb.label = dots.label_b
        |ORDER BY label_a, label_b""".stripMargin,
    "q142_maxsim" ->
      """WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
        |           FROM embeddings WHERE vec_id < 4),
        |c AS (SELECT CAST(label AS BIGINT) AS label, CAST(embedding AS DOUBLE[]) AS cv
        |      FROM embeddings WHERE vec_id >= 4),
        |s AS (SELECT label, qid, list_cosine_similarity(cv, qv) AS sim
        |      FROM c CROSS JOIN q),
        |m AS (SELECT label, qid, max(sim) AS ms FROM s GROUP BY 1, 2),
        |p AS (SELECT label,
        |        max(CASE WHEN qid = 0 THEN ms END) AS m0,
        |        max(CASE WHEN qid = 1 THEN ms END) AS m1,
        |        max(CASE WHEN qid = 2 THEN ms END) AS m2,
        |        max(CASE WHEN qid = 3 THEN ms END) AS m3
        |      FROM m GROUP BY label)
        |SELECT label, m0, m1, m2, m3,
        |       ((m0 + m1) + m2) + m3 AS maxsim_score
        |FROM p ORDER BY label""".stripMargin,
    "q136_hard_negatives" ->
      """WITH c AS (SELECT vec_id AS negative_id, CAST(embedding AS DOUBLE[]) AS cv,
        |                  label AS negative_label FROM embeddings),
        |q AS (SELECT vec_id AS anchor_id, CAST(embedding AS DOUBLE[]) AS qv,
        |             label AS anchor_label FROM embeddings WHERE vec_id < 20),
        |s AS (SELECT anchor_id, anchor_label, negative_id, negative_label,
        |        list_cosine_similarity(cv, qv) AS sim
        |      FROM c CROSS JOIN q WHERE negative_label <> anchor_label),
        |r AS (SELECT anchor_id, anchor_label, negative_id, negative_label,
        |        row_number() OVER (PARTITION BY anchor_id
        |          ORDER BY sim DESC, negative_id) AS neg_rank
        |      FROM s)
        |SELECT anchor_id, CAST(anchor_label AS INT) AS anchor_label,
        |       CAST(neg_rank AS BIGINT) AS neg_rank, negative_id,
        |       CAST(negative_label AS INT) AS negative_label
        |FROM r WHERE neg_rank <= 5 ORDER BY anchor_id, neg_rank""".stripMargin,
    "q126_ann_recall" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |cents AS (SELECT vec_id AS cell_id, v AS cent FROM e
         |          ORDER BY $IvfCentroidOrderSql
         |          LIMIT 32),
         |asg AS (SELECT corpus_id, cv, cell_id FROM (
         |          SELECT e.vec_id AS corpus_id, e.v AS cv, cents.cell_id,
         |                 row_number() OVER (PARTITION BY e.vec_id
         |                   ORDER BY list_cosine_similarity(e.v, cents.cent) DESC, cents.cell_id) AS cr
         |          FROM e CROSS JOIN cents)
         |        WHERE cr = 1),
         |probes AS (SELECT qid, qv, cell_id, qr FROM (
         |          SELECT e.vec_id AS qid, e.v AS qv, cents.cell_id,
         |                 row_number() OVER (PARTITION BY e.vec_id
         |                   ORDER BY list_cosine_similarity(e.v, cents.cent) DESC, cents.cell_id) AS qr
         |          FROM e CROSS JOIN cents WHERE e.vec_id < 20)
         |        WHERE qr <= 8),
         |np AS (SELECT unnest([1, 2, 4, 8]) AS nprobe),
         |s AS (SELECT qid, corpus_id, qr, list_cosine_similarity(cv, qv) AS sim
         |      FROM asg JOIN probes USING (cell_id) WHERE qid <> corpus_id),
         |r AS (SELECT np.nprobe, s.qid, s.corpus_id,
         |        row_number() OVER (PARTITION BY np.nprobe, s.qid
         |          ORDER BY s.sim DESC, s.corpus_id) AS rnk
         |      FROM s JOIN np ON s.qr <= np.nprobe),
         |ap AS (SELECT nprobe, qid, corpus_id FROM r WHERE rnk <= 10),
         |ex AS (SELECT qid, cid FROM (
         |        SELECT q.qid, c.cid,
         |               row_number() OVER (PARTITION BY q.qid
         |                 ORDER BY list_cosine_similarity(c.cv, q.qv) DESC, c.cid) AS rnk
         |        FROM (SELECT vec_id AS cid, v AS cv FROM e) c
         |        CROSS JOIN (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 20) q
         |        WHERE qid <> cid) WHERE rnk <= 10),
         |tc AS (SELECT CAST(count(*) AS BIGINT) AS n_truth FROM ex),
         |j AS (SELECT ap.nprobe, ap.qid,
         |        CASE WHEN ex.qid IS NOT NULL THEN 1 ELSE 0 END AS hit
         |      FROM ap LEFT JOIN ex ON ap.qid = ex.qid AND ap.corpus_id = ex.cid)
         |SELECT CAST(nprobe AS INT) AS nprobe,
         |       CAST(count(DISTINCT qid) AS BIGINT) AS n_queries,
         |       CAST(count(*) AS BIGINT) AS n_retrieved,
         |       CAST(sum(hit) AS BIGINT) AS n_hits,
         |       (SELECT n_truth FROM tc) AS n_truth,
         |       CAST(sum(hit) * 1000000 // (SELECT n_truth FROM tc) AS BIGINT) AS recall_ppm
         |FROM j GROUP BY nprobe ORDER BY nprobe""".stripMargin,
    "q150_bitext_margin" ->
      """WITH j AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v, lang
        |           FROM embeddings JOIN documents ON vec_id = doc_id),
        |a AS (SELECT id AS aid, v AS av FROM j WHERE lang = 'en' AND id < 50),
        |t AS (SELECT id AS tid, v AS tv, lang AS tlang FROM j WHERE lang <> 'en'),
        |s AS (SELECT aid, tid, tlang, list_cosine_similarity(tv, av) AS sim
        |      FROM t CROSS JOIN a),
        |ar AS (SELECT aid, sim, row_number() OVER (PARTITION BY aid ORDER BY sim DESC, tid) AS rn FROM s),
        |asum AS (SELECT aid,
        |           ((coalesce(max(CASE WHEN rn = 1 THEN sim END), 0.0)
        |             + coalesce(max(CASE WHEN rn = 2 THEN sim END), 0.0))
        |             + coalesce(max(CASE WHEN rn = 3 THEN sim END), 0.0))
        |             + coalesce(max(CASE WHEN rn = 4 THEN sim END), 0.0) AS asm
        |         FROM ar WHERE rn <= 4 GROUP BY aid),
        |tr AS (SELECT tid, sim, row_number() OVER (PARTITION BY tid ORDER BY sim DESC, aid) AS rn FROM s),
        |tsum AS (SELECT tid,
        |           ((coalesce(max(CASE WHEN rn = 1 THEN sim END), 0.0)
        |             + coalesce(max(CASE WHEN rn = 2 THEN sim END), 0.0))
        |             + coalesce(max(CASE WHEN rn = 3 THEN sim END), 0.0))
        |             + coalesce(max(CASE WHEN rn = 4 THEN sim END), 0.0) AS tsm
        |         FROM tr WHERE rn <= 4 GROUP BY tid),
        |m AS (SELECT s.aid, s.tid, s.tlang,
        |        CASE WHEN asm + tsm = 0.0 THEN 0.0
        |             ELSE (sim + sim) / (asm + tsm) END AS margin
        |      FROM s JOIN asum USING (aid) JOIN tsum USING (tid)),
        |r AS (SELECT aid AS anchor_id, tid AS target_id, tlang AS target_lang,
        |        row_number() OVER (PARTITION BY aid ORDER BY margin DESC, tid) AS rnk
        |      FROM m)
        |SELECT anchor_id, CAST(rnk AS BIGINT) AS rnk, target_id, target_lang
        |FROM r WHERE rnk <= 3 ORDER BY anchor_id, rnk""".stripMargin,
    "q152_ivf_balance" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |cents AS (SELECT vec_id AS cell_id, v AS cent FROM e
         |          ORDER BY $IvfCentroidOrderSql
         |          LIMIT 32),
         |asg AS (SELECT cell_id, CAST(floor(cell_cos * 1000000) AS BIGINT) AS cos_micro FROM (
         |          SELECT cents.cell_id,
         |                 list_cosine_similarity(e.v, cents.cent) AS cell_cos,
         |                 row_number() OVER (PARTITION BY e.vec_id
         |                   ORDER BY list_cosine_similarity(e.v, cents.cent) DESC, cents.cell_id) AS cr
         |          FROM e CROSS JOIN cents)
         |        WHERE cr = 1),
         |pc AS (SELECT cell_id, CAST(count(*) AS BIGINT) AS n_vecs,
         |         CAST(sum(cos_micro) AS BIGINT) AS cs FROM asg GROUP BY cell_id),
         |t AS (SELECT CAST(count(*) AS BIGINT) AS tot FROM asg)
         |SELECT cents.cell_id,
         |  coalesce(pc.n_vecs, 0) AS n_vecs,
         |  CAST(coalesce(pc.n_vecs, 0) * 1000000 // t.tot AS BIGINT) AS share_ppm,
         |  CAST(coalesce(pc.n_vecs, 0) * 32 * 1000000 // t.tot AS BIGINT) AS load_ppm,
         |  CAST(CASE WHEN pc.n_vecs IS NULL THEN 0
         |            WHEN cs >= 0 THEN cs // pc.n_vecs
         |            ELSE -((-cs) // pc.n_vecs) END AS BIGINT) AS mean_cos_micro
         |FROM cents LEFT JOIN pc USING (cell_id) CROSS JOIN t
         |ORDER BY cell_id""".stripMargin,
    "q155_dim_health" ->
      """WITH e AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |c AS (SELECT i - 1 AS dim_idx, CAST(floor(v[i] * 1000000) AS BIGINT) AS xm
        |      FROM e, unnest(range(1, len(v) + 1)) AS t(i)),
        |p AS (SELECT dim_idx, CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(CASE WHEN xm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
        |        CAST(sum(xm) AS BIGINT) AS sm,
        |        sum(CAST(xm AS HUGEINT) * xm) AS de
        |      FROM c GROUP BY dim_idx),
        |t2 AS (SELECT sum(de) AS te FROM p)
        |SELECT CAST(dim_idx AS BIGINT) AS dim_idx, n_zero,
        |  CAST(CASE WHEN sm >= 0 THEN sm // n ELSE -((-sm) // n) END AS BIGINT) AS mean_micro,
        |  CAST((de * 1000000) // te AS BIGINT) AS energy_ppm
        |FROM p, t2 ORDER BY dim_idx""".stripMargin,
    // the sharded three-phase cut must be indistinguishable from the naive
    // global running sum — so its oracle IS the naive global running sum,
    "q160_ann_scorecard" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |tq AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 5),
         |ts AS (SELECT qid, vec_id AS cid, list_cosine_similarity(v, qv) AS sim
         |       FROM e CROSS JOIN tq WHERE qid <> vec_id),
         |truth AS (SELECT qid, cid,
         |            row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rnk
         |          FROM ts QUALIFY rnk <= 10),
         |sg AS (SELECT vec_id, v, $LshBucketSql AS bucket FROM e),
         |lq AS (SELECT vec_id AS qid, v AS qv, bucket FROM sg WHERE vec_id < 5),
         |ls AS (SELECT qid, vec_id AS cid, list_cosine_similarity(sg.v, qv) AS sim
         |       FROM sg JOIN lq USING (bucket) WHERE qid <> vec_id),
         |lsh AS (SELECT qid, cid,
         |          row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rnk
         |        FROM ls QUALIFY rnk <= 10),
         |cents AS (SELECT vec_id AS cell_id, v AS cent FROM e
         |          ORDER BY $IvfCentroidOrderSql
         |          LIMIT 32),
         |asg AS (SELECT corpus_id, cv, cell_id FROM (
         |          SELECT e.vec_id AS corpus_id, e.v AS cv, cents.cell_id,
         |                 row_number() OVER (PARTITION BY e.vec_id
         |                   ORDER BY list_cosine_similarity(e.v, cents.cent) DESC, cents.cell_id) AS cr
         |          FROM e CROSS JOIN cents)
         |        WHERE cr = 1),
         |probes AS (SELECT qid, qv, cell_id FROM (
         |          SELECT e.vec_id AS qid, e.v AS qv, cents.cell_id,
         |                 row_number() OVER (PARTITION BY e.vec_id
         |                   ORDER BY list_cosine_similarity(e.v, cents.cent) DESC, cents.cell_id) AS qr
         |          FROM e CROSS JOIN cents WHERE e.vec_id < 5)
         |        WHERE qr <= 8),
         |ivs AS (SELECT qid, corpus_id AS cid, list_cosine_similarity(cv, qv) AS sim
         |        FROM asg JOIN probes USING (cell_id) WHERE qid <> corpus_id),
         |ivf AS (SELECT qid, cid,
         |          row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rnk
         |        FROM ivs QUALIFY rnk <= 10),
         |allr AS (SELECT 'brute' AS method, * FROM truth
         |         UNION ALL SELECT 'lsh', * FROM lsh
         |         UNION ALL SELECT 'ivf', * FROM ivf),
         |h AS (SELECT allr.method, allr.qid, allr.rnk, t.cid IS NOT NULL AS hit
         |      FROM allr LEFT JOIN truth t ON allr.qid = t.qid AND allr.cid = t.cid),
         |perq AS (SELECT method, qid,
         |           CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS hits,
         |           min(CASE WHEN hit THEN rnk END) AS first_hit
         |         FROM h GROUP BY 1, 2),
         |grid AS (SELECT m.method, tq.qid
         |         FROM (SELECT unnest(['brute', 'lsh', 'ivf']) AS method) m CROSS JOIN tq),
         |dense AS (SELECT g.method, g.qid, coalesce(p.hits, 0) AS hits, p.first_hit
         |          FROM grid g LEFT JOIN perq p ON g.method = p.method AND g.qid = p.qid)
         |SELECT method, CAST(count(*) AS BIGINT) AS n_queries,
         |       CAST(sum(hits) AS BIGINT) AS n_hits,
         |       CAST(sum(hits) * 1000000 // (count(*) * 10) AS BIGINT) AS recall_ppm,
         |       CAST(sum(CASE WHEN first_hit IS NULL THEN 0 ELSE 1000000 // first_hit END)
         |            // count(*) AS BIGINT) AS mrr_micro
         |FROM dense GROUP BY method ORDER BY method""".stripMargin,
    "q165_centroid_drift" ->
      """WITH e AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
        |             CAST(embedding AS DOUBLE[]) AS v,
        |             CASE WHEN ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 50
        |                  THEN 'a' ELSE 'b' END AS release
        |           FROM embeddings),
        |sc AS (SELECT max(list_max(list_transform(v, x -> abs(x)))) AS s FROM e),
        |codes AS (SELECT label, release, i AS pos,
        |            CAST(floor(v[i] / s * 127.0 + 0.5) AS BIGINT) AS c
        |          FROM e CROSS JOIN sc CROSS JOIN range(1, 65) AS r(i)),
        |sums AS (SELECT label, release, pos, CAST(sum(c) AS BIGINT) AS sm
        |         FROM codes GROUP BY 1, 2, 3),
        |geo AS (SELECT a.label,
        |          sum(CAST(a.sm AS HUGEINT) * CAST(b.sm AS HUGEINT)) AS dot_h,
        |          sum(CAST(a.sm AS HUGEINT) * CAST(a.sm AS HUGEINT)) AS na2,
        |          sum(CAST(b.sm AS HUGEINT) * CAST(b.sm AS HUGEINT)) AS nb2
        |        FROM (SELECT * FROM sums WHERE release = 'a') a
        |        JOIN (SELECT * FROM sums WHERE release = 'b') b
        |          ON a.label = b.label AND a.pos = b.pos
        |        GROUP BY 1),
        |cnt AS (SELECT label,
        |          CAST(sum(CASE WHEN release = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |          CAST(sum(CASE WHEN release = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS n_b
        |        FROM e GROUP BY 1)
        |SELECT geo.label, n_a, n_b,
        |  CAST(CASE WHEN na2 * nb2 = 0 THEN 0
        |            WHEN dot_h < 0 THEN -((dot_h * dot_h * 1000000) // (na2 * nb2))
        |            ELSE (dot_h * dot_h * 1000000) // (na2 * nb2)
        |       END AS BIGINT) AS sim2_ppm,
        |  CAST(1000000 - CASE WHEN na2 * nb2 = 0 THEN 0
        |            WHEN dot_h < 0 THEN -((dot_h * dot_h * 1000000) // (na2 * nb2))
        |            ELSE (dot_h * dot_h * 1000000) // (na2 * nb2)
        |       END AS BIGINT) AS drift_ppm
        |FROM geo JOIN cnt USING (label)
        |WHERE n_a > 0 AND n_b > 0
        |ORDER BY label""".stripMargin,
    "q166_dim_covariance" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |c AS (SELECT vec_id, i - 1 AS p, CAST(floor(v[i] * 1000000) AS BIGINT) AS x
        |      FROM e, unnest(range(1, len(v) + 1)) AS t(i)),
        |pr AS (SELECT a.p AS p, b.p AS q, sum(CAST(a.x AS HUGEINT) * b.x) AS sxy
        |       FROM c a JOIN c b ON a.vec_id = b.vec_id AND a.p <= b.p
        |       GROUP BY 1, 2),
        |d AS (SELECT p, CAST(sum(x) AS BIGINT) AS sx FROM c GROUP BY 1),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM e)
        |SELECT CAST(pr.p AS BIGINT) AS p, CAST(pr.q AS BIGINT) AS q,
        |  CAST(CASE WHEN CAST(n AS HUGEINT) * sxy - CAST(dp.sx AS HUGEINT) * dq.sx >= 0
        |    THEN (CAST(n AS HUGEINT) * sxy - CAST(dp.sx AS HUGEINT) * dq.sx) // (CAST(n AS HUGEINT) * n)
        |    ELSE -((-(CAST(n AS HUGEINT) * sxy - CAST(dp.sx AS HUGEINT) * dq.sx)) // (CAST(n AS HUGEINT) * n))
        |  END AS BIGINT) AS cov_micro2
        |FROM pr JOIN d dp ON pr.p = dp.p JOIN d dq ON pr.q = dq.p CROSS JOIN nn
        |ORDER BY p, q""".stripMargin,
    "q178_modal_coverage" ->
      """WITH d AS (SELECT doc_id, lang FROM documents),
        |e AS (SELECT vec_id FROM embeddings),
        |cov AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |          CAST(sum(CASE WHEN e.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_embedded
        |        FROM d LEFT JOIN e ON d.doc_id = e.vec_id GROUP BY 1),
        |orph AS (SELECT CAST(count(*) AS BIGINT) AS orphan_vectors
        |         FROM e WHERE NOT EXISTS (SELECT 1 FROM d WHERE d.doc_id = e.vec_id))
        |SELECT lang, n_docs, n_embedded,
        |  CAST(n_embedded * 1000000 // n_docs AS BIGINT) AS coverage_ppm,
        |  orphan_vectors
        |FROM cov CROSS JOIN orph ORDER BY lang""".stripMargin)
}
