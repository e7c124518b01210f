package graft.functions

import graft.plans.PqExpressions.{pq_adc_distance, pq_encode}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization over an embedding column — the vector-memory scale
  * path of the ANN stack (q30/q32/q53 trade recall for candidate count; PQ
  * trades precision for bytes): each vector becomes one packed BIGINT of
  * per-subvector centroid ids, 32× narrower than a 64-dim float vector, so
  * candidate scans and shuffles move codes instead of embeddings.
  *
  * The codebook is fit from a deterministic hash-ordered sample (the same
  * discipline as IVF centroids and the sampling operators: md5-bucket
  * order, so the sample is distribution-agnostic, append-stable, and
  * reproducible in plain SQL for the differential oracle). K-means
  * refinement would only change how `Codebook.cents` is produced; every
  * plan shape downstream stays identical.
  */
object Pq {

  /** [m][k][subDim] centroids plus the shape that derived them. */
  final case class Codebook(m: Int, subDim: Int, k: Int,
                            cents: Array[Array[Array[Double]]])

  /** Fit a codebook: the first `k` corpus vectors in md5 hash order, each
    * sliced into `m` subvectors. One tiny collect (k rows); the corpus
    * itself never moves.
    */
  def fit(corpus: DataFrame, idCol: Column, vecCol: Column,
          m: Int, k: Int): Codebook = {
    require(k >= 1 && k <= 16, s"k must be in [1,16] (4-bit codes), got $k")
    require(m >= 1 && m <= 15, s"m must be in [1,15] (BIGINT packing), got $m")
    val rows = corpus
      .select(idCol.as("__pq_id"), vecCol.cast("array<double>").as("v"))
      .orderBy(Sampling.hashBucket(col("__pq_id"), 1 << 30), col("__pq_id"))
      .limit(k)
      .select(col("v"))
      .collect()
      .map(_.getSeq[Double](0).toArray)
    require(rows.length == k, s"corpus has only ${rows.length} rows, need $k")
    val dim = rows.head.length
    require(dim % m == 0, s"dim $dim not divisible into $m subvectors")
    val subDim = dim / m
    val cents = Array.tabulate(m, k, subDim)((j, c, d) => rows(c)(j * subDim + d))
    Codebook(m, subDim, k, cents)
  }

  /** Packed PQ code column (native single-pass expression). */
  def encode(vec: Column, cb: Codebook): Column = pq_encode(vec, cb.cents)

  /** Squared-L2 ADC distance between a packed code and a raw query vector. */
  def adcDistance(code: Column, query: Column, cb: Codebook): Column =
    pq_adc_distance(code, query, cb.cents)

  /** Top-k nearest corpus vectors per query by ADC distance: the corpus is
    * scanned as codes (one BIGINT per row), queries broadcast raw. This is
    * the memory-bound candidate pass of a PQ index — at 100 TB the scan
    * reads ~3% of the bytes the raw-vector scan (q30) reads.
    */
  def adcTopK(corpus: DataFrame, corpusId: Column, corpusVec: Column,
              queries: DataFrame, queryId: Column, queryVec: Column,
              cb: Codebook, k: Int): DataFrame = {
    val codes = corpus.select(corpusId.as("corpus_id"),
      encode(corpusVec, cb).as("code"))
    val q = queries.select(queryId.as("query_id"), queryVec.as("qv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adist").asc, col("corpus_id").asc)
    codes.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"),
        adcDistance(col("code"), col("qv"), cb).as("adist"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** IVF + PQ — the standard two-stage vector index, composed from the two
    * proven primitives: a coarse quantizer (hash-sampled cells, L2 argmin
    * assignment — one centroid broadcast, the corpus never shuffles) limits
    * each query to its `nProbe` nearest cells, and ADC over the packed
    * codes ranks the surviving candidates. At scale the candidate scan
    * reads codes from `nProbe/nCentroids` of the corpus — the bytes
    * touched drop by both factors multiplied (≈ 32 × centroids/probes vs
    * the exact scan).
    */
  def ivfPqTopK(corpus: DataFrame, corpusId: Column, corpusVec: Column,
                queries: DataFrame, queryId: Column, queryVec: Column,
                cb: Codebook, k: Int, nCentroids: Int, nProbe: Int): DataFrame = {
    import graft.plans.VectorExpressions.l2_distance
    val cents = corpus
      .select(corpusId.as("cell_id"), corpusVec.as("cent"))
      .orderBy(Sampling.hashBucket(col("cell_id"), 1 << 30), col("cell_id"))
      .limit(nCentroids)
    val cw = Window.partitionBy(col("corpus_id"))
      .orderBy(col("cd").asc, col("cell_id").asc)
    val assigned = corpus.select(corpusId.as("corpus_id"), corpusVec.as("cv"))
      .crossJoin(broadcast(cents))
      .withColumn("cd", l2_distance(col("cv"), col("cent")))
      .withColumn("cr", row_number().over(cw))
      .filter(col("cr") === 1)
      .select(col("cell_id"), col("corpus_id"), encode(col("cv"), cb).as("code"))
    val qw = Window.partitionBy(col("query_id"))
      .orderBy(col("cd").asc, col("cell_id").asc)
    val probes = queries.select(queryId.as("query_id"), queryVec.as("qv"))
      .crossJoin(broadcast(cents))
      .withColumn("cd", l2_distance(col("qv"), col("cent")))
      .withColumn("qr", row_number().over(qw))
      .filter(col("qr") <= nProbe)
      .select(col("cell_id"), col("query_id"), col("qv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adist").asc, col("corpus_id").asc)
    assigned.join(broadcast(probes), "cell_id")
      .filter(col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"),
        adcDistance(col("code"), col("qv"), cb).as("adist"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Mean squared quantization error over the corpus — the fit-quality
    * metric (ADC distance of each vector to its own code). One aggregate.
    */
  def quantizationError(corpus: DataFrame, vecCol: Column, cb: Codebook): Double =
    corpus
      .select(adcDistance(encode(vecCol, cb), vecCol, cb).as("e"))
      .agg(avg(col("e")))
      .head().getDouble(0)

  /** Recall of the ADC path against the exact *L2* top-k over the raw
    * vectors (ADC approximates L2, so the baseline must be L2 — comparing
    * to the cosine baseline would conflate metric and quantization error).
    * The m/k tuning loop, same contract as `Similarity.lshRecall`.
    */
  def adcRecall(corpus: DataFrame, idCol: Column, vecCol: Column,
                queries: DataFrame, qIdCol: Column, qVecCol: Column,
                cb: Codebook, k: Int): Double = {
    import graft.plans.VectorExpressions.dot_product
    val c = corpus.select(idCol.as("corpus_id"), vecCol.as("cv"))
    val q = queries.select(qIdCol.as("query_id"), qVecCol.as("qv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("d2").asc, col("corpus_id").asc)
    val exact = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"),
        (dot_product(col("cv"), col("cv"))
          - lit(2.0) * dot_product(col("cv"), col("qv"))
          + dot_product(col("qv"), col("qv"))).as("d2"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("corpus_id"))
    val approx = adcTopK(corpus, idCol, vecCol, queries, qIdCol, qVecCol, cb, k)
      .select(col("query_id"), col("corpus_id"))
    val hits = exact.intersect(approx).count().toDouble
    val total = exact.count().toDouble
    if (total == 0) 1.0 else hits / total
  }
}
