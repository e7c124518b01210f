package graft

import graft.functions.Similarity
import graft.plans.VectorExpressions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("DotProduct expression: known values, float and double arrays") {
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f))).toDF("a", "b")
    assert(df.select(VectorExpressions.dot_product(col("a"), col("b")))
      .head().getDouble(0) == 32.0)
    val dd = Seq((Seq(0.5, 0.5), Seq(2.0, 2.0))).toDF("a", "b")
    assert(dd.select(VectorExpressions.dot_product(col("a"), col("b")))
      .head().getDouble(0) == 2.0)
  }

  test("DotProduct matches the interpreted HOF fold bit-for-bit") {
    val vecs = (0 until 50).map { i =>
      (Seq.tabulate(64)(d => ((i * 31 + d * 7) % 100) / 99.0f - 0.5f),
        Seq.tabulate(64)(d => ((i * 17 + d * 3) % 100) / 99.0f - 0.5f))
    }.toDF("a", "b")
    val hof = aggregate(zip_with(col("a"), col("b"),
      (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (acc, v) => acc + v)
    val diffs = vecs.select(
      VectorExpressions.dot_product(col("a"), col("b")).as("native"), hof.as("hof"))
      .filter(col("native") =!= col("hof")).count()
    assert(diffs == 0)
  }

  test("cosine of identical vectors is 1, orthogonal is 0") {
    val df = Seq(
      (Seq(1.0f, 0.0f), Seq(1.0f, 0.0f)),
      (Seq(1.0f, 0.0f), Seq(0.0f, 1.0f))).toDF("a", "b")
    val vals = df.select(Similarity.cosine(col("a"), col("b"))).collect().map(_.getDouble(0))
    assert(math.abs(vals(0) - 1.0) < 1e-12 && math.abs(vals(1)) < 1e-12)
    val zero = Seq((Seq(0.0f, 0.0f), Seq(1.0f, 1.0f))).toDF("a", "b")
    assert(zero.select(Similarity.cosine(col("a"), col("b"))).head().getDouble(0) == 0.0)
  }

  test("ivfTopK: full probe equals exact top-k; partial probe stays within contract") {
    val corpus = (0L to 60L)
      .map(i => (i, Seq.tabulate(16)(d => ((i * 13 + d * 5) % 97).toFloat / 97f - 0.5f)))
      .toDF("id", "v")
    val queries = corpus.filter(col("id") < 3)
    // probing every cell degenerates to the exact scan
    val exact = Similarity.bruteForceTopK(corpus, col("id"), col("v"),
        queries, col("id"), col("v"), k = 5)
      .select(col("query_id"), col("corpus_id"), col("rank")).collect().toSet
    val full = Similarity.ivfTopK(corpus, col("id"), col("v"),
        queries, col("id"), col("v"), k = 5, nCentroids = 8, nProbe = 8)
      .select(col("query_id"), col("corpus_id"), col("rank")).collect().toSet
    assert(full == exact)
    // partial probe: ≤ k per query, recall in (0, 1]
    val partial = Similarity.ivfTopK(corpus, col("id"), col("v"),
      queries, col("id"), col("v"), k = 5, nCentroids = 8, nProbe = 2)
    val perQuery = partial.groupBy(col("query_id")).count().collect()
    assert(perQuery.forall(_.getLong(1) <= 5))
    val recall = Similarity.ivfRecall(corpus, col("id"), col("v"),
      queries, col("id"), col("v"), k = 5, nCentroids = 8, nProbe = 2)
    assert(recall > 0.0 && recall <= 1.0)
  }

  test("ivfRecallCurve: monotone in nprobe, and the all-cells budget hits 10^6 ppm exactly") {
    val corpus = (0L to 60L)
      .map(i => (i, Seq.tabulate(16)(d => ((i * 13 + d * 5) % 97).toFloat / 97f - 0.5f)))
      .toDF("id", "v")
    val queries = corpus.filter(col("id") < 3)
    val curve = Similarity.ivfRecallCurve(corpus, col("id"), col("v"),
        queries, col("id"), col("v"), k = 5, nCentroids = 8,
        probeSettings = Seq(1, 4, 8))
      .collect().map(r => (r.getInt(0), r.getLong(r.fieldIndex("n_hits")),
        r.getLong(r.fieldIndex("recall_ppm"))))
      .sortBy(_._1)
    assert(curve.map(_._1).toSeq == Seq(1, 4, 8))
    curve.map(_._2).toSeq.sliding(2).foreach {
      case Seq(a, b) => assert(a <= b, "hits must be monotone in nprobe")
      case _ =>
    }
    // probing all 8 cells covers the whole corpus: the candidate set IS the
    // exact scan, so recall must be exactly 1.0 — not approximately
    assert(curve.last._3 == 1000000L, curve.mkString(","))
  }

  test("ivfTopK centroids are distribution-agnostic under id-content correlation") {
    // ids 0..29 cluster around +1, ids 30..59 around -1: an id-prefix
    // centroid sample (the old orderBy(id).limit(n)) would sit entirely in
    // the first cluster; the md5 hash-ordered sample spans both, so a
    // second-cluster query keeps its neighbors reachable at low nProbe.
    val corpus = (0L until 60L).map { i =>
      val base = if (i < 30) 1.0f else -1.0f
      (i, Seq.tabulate(16)(d => base + ((i * 13 + d * 5) % 17).toFloat / 170f))
    }.toDF("id", "v")
    val queries = corpus.filter(col("id") === 45L)
    val recall = Similarity.ivfRecall(corpus, col("id"), col("v"),
      queries, col("id"), col("v"), k = 5, nCentroids = 8, nProbe = 2)
    assert(recall >= 0.8, s"skewed-id recall $recall")
  }

  test("bruteForceTopK finds the planted nearest neighbor first") {
    val base = Seq.tabulate(64)(_.toFloat / 64f)
    val near = base.updated(0, base.head + 0.001f)
    val corpus = (Seq((0L, base), (1L, near)) ++
      (2L to 20L).map(i => (i, Seq.tabulate(64)(d => ((i * 13 + d * 5) % 97).toFloat / 97f - 0.5f))))
      .toDF("id", "v")
    val out = Similarity.bruteForceTopK(corpus, col("id"), col("v"),
      corpus.filter(col("id") === 0L), col("id"), col("v"), k = 3)
      .orderBy(col("rank")).collect()
    assert(out.head.getAs[Long]("corpus_id") == 1L)
    assert(out.length == 3)
  }

  test("lshTopK returns a subset consistent with brute force ordering") {
    val corpus = (0L to 40L).map(i =>
      (i, Seq.tabulate(16)(d => ((i * 13 + d * 5) % 97).toFloat / 97f - 0.5f))).toDF("id", "v")
    val q = corpus.filter(col("id") === 7L)
    val lsh = Similarity.lshTopK(corpus, col("id"), col("v"), q, col("id"), col("v"),
      k = 5, dim = 16, bits = 2).collect()
    assert(lsh.nonEmpty)
    // every LSH hit shares the query's bucket by construction; ranks ascend
    assert(lsh.map(_.getAs[Int]("rank")).toSeq.sorted == lsh.map(_.getAs[Int]("rank")).toSeq)
  }

  test("bruteForceNearDups finds only pairs above threshold") {
    val base = Seq.tabulate(32)(d => (d + 1).toFloat)
    val dup = base.updated(0, 1.0001f)
    val far = Seq.tabulate(32)(d => if (d % 2 == 0) 1f else -1f)
    val df = Seq((1L, base), (2L, dup), (3L, far)).toDF("id", "v")
    val pairs = Similarity.bruteForceNearDups(df, col("id"), col("v"), 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("embeddingNearDups (LSH path) recovers the exact duplicate") {
    val base = Seq.tabulate(16)(d => (d + 1).toFloat)
    val df = (Seq((1L, base), (2L, base)) ++
      (3L to 30L).map(i => (i, Seq.tabulate(16)(d => ((i * 29 + d * 11) % 89).toFloat / 89f - 0.5f))))
      .toDF("id", "v")
    val pairs = Similarity.embeddingNearDups(df, col("id"), col("v"),
      dim = 16, threshold = 0.999, bits = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("semDedupFlags drops the higher id of each within-cluster near-dup pair") {
    // Two clusters around the axes; 2 is 1's near-dup (cluster 0), 4 is 3's
    // (cluster 1); 5 sits in cluster 0 but far from everything.
    val model = graft.functions.Kmeans.Model(k = 2, dim = 2, iters = 0,
      cents = Array(Array(1.0, 0.0), Array(0.0, 1.0)))
    val df = Seq(
      (1L, Seq(1.00f, 0.00f)),
      (2L, Seq(0.99f, 0.01f)),
      (3L, Seq(0.00f, 1.00f)),
      (4L, Seq(0.01f, 0.98f)),
      (5L, Seq(0.70f, -0.70f))).toDF("id", "v")
    val out = Similarity.semDedupFlags(df, col("id"), col("v"), model, threshold = 0.9)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getBoolean(2))).toMap
    assert(out(1L)._2 && !out(2L)._2, s"pair (1,2): $out")
    assert(out(3L)._2 && !out(4L)._2, s"pair (3,4): $out")
    assert(out(5L)._2, s"loner 5 must survive: $out")
    assert(out(1L)._1 == 0 && out(3L)._1 == 1)
  }

  /** Batch CollectMetrics rows land on QueryExecutionListener
    * asynchronously; runs `body`, then waits for the named metric row.
    */
  private def withObservedMetric(name: String)(body: => Unit): org.apache.spark.sql.Row = {
    import org.apache.spark.sql.execution.QueryExecution
    import org.apache.spark.sql.util.QueryExecutionListener
    val seen = new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.Row]()
    val listener = new QueryExecutionListener {
      override def onSuccess(f: String, qe: QueryExecution, d: Long): Unit =
        qe.observedMetrics.foreach { case (k, v) => seen.put(k, v) }
      override def onFailure(f: String, qe: QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      body
      val deadline = System.currentTimeMillis() + 10000
      while (!seen.containsKey(name) && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      val row = seen.get(name)
      assert(row != null, s"observed metric '$name' never arrived")
      row
    } finally spark.listenerManager.unregister(listener)
  }

  test("semDedupFlags: an oversized cluster is skipped whole (all kept) and the drop metric fires") {
    val model = graft.functions.Kmeans.Model(k = 2, dim = 2, iters = 0,
      cents = Array(Array(1.0, 0.0), Array(0.0, 1.0)))
    // 6 mutual near-dups land in cluster 0 (over the cap of 5); a 2-vector
    // near-dup pair lands in cluster 1 (under the cap)
    val df = ((1L to 6L).map(i => (i, Seq(1.0f, i * 1e-4f))) ++
      Seq((10L, Seq(0.0f, 1.0f)), (11L, Seq(0.001f, 1.0f)))).toDF("id", "v")
    val m = withObservedMetric("graft.semdedup") {
      val out = Similarity.semDedupFlags(df, col("id"), col("v"), model,
        threshold = 0.9, maxClusterSize = 5)
        .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
      // the mega-cluster contributes NO pairs: every member survives
      (1L to 6L).foreach(i => assert(out(i), s"$i must be kept: $out"))
      // the within-cap cluster still dedups normally
      assert(out(10L) && !out(11L), out.toString)
    }
    assert(m.getAs[Long]("dropped_clusters") == 1L, m.toString)
    assert(m.getAs[Long]("max_cluster_size") == 6L, m.toString)
  }

  test("embeddingNearDups: a hot LSH bucket is skipped and the drop metric fires") {
    // 8 identical vectors share one bucket (over the cap of 5); an
    // orthogonal near-dup pair hashes to its own bucket (under the cap)
    val df = ((1L to 8L).map(i => (i, Seq(1.0f, 0.0f, 0.0f, 0.0f))) ++
      Seq((10L, Seq(0.0f, 1.0f, 0.0f, 0.0f)), (11L, Seq(0.0f, 1.0f, 0.001f, 0.0f))))
      .toDF("id", "v")
    val m = withObservedMetric("graft.embdup") {
      val pairs = Similarity.embeddingNearDups(df, col("id"), col("v"),
        dim = 4, threshold = 0.99, bits = 4, maxBucketSize = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // no pair from the hot bucket; the small bucket's pair survives
      assert(pairs == Set((10L, 11L)), pairs.toString)
    }
    assert(m.getAs[Long]("dropped_buckets") == 1L, m.toString)
    assert(m.getAs[Long]("max_bucket_size") == 8L, m.toString)
  }

  test("lshRecall improves as bits decrease (bigger buckets, more candidates)") {
    val corpus = (0L to 200L).map(i =>
      (i, Seq.tabulate(16)(d => ((i * 13 + d * 5) % 97).toFloat / 97f - 0.5f))).toDF("id", "v")
    val q = corpus.filter(col("id") < 3L)
    val coarse = Similarity.lshRecall(corpus, col("id"), col("v"),
      q, col("id"), col("v"), k = 5, dim = 16, bits = 1)
    val fine = Similarity.lshRecall(corpus, col("id"), col("v"),
      q, col("id"), col("v"), k = 5, dim = 16, bits = 6)
    assert(coarse >= fine) // fewer bits → bigger buckets → recall no worse
    assert(coarse > 0.5)   // 2 buckets cover most neighbors
  }

  test("marginMining demotes the hub vector raw cosine would pick") {
    // hub sits at ~0.707 cosine to BOTH anchors; t1/t2 are 0.6 to exactly
    // one anchor each. Raw cosine ranks the hub first for every anchor;
    // the margin criterion normalizes by neighborhood density and picks
    // the exclusive match instead.
    val anchors = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f)),
      (2L, Seq(0.0f, 1.0f, 0.0f))).toDF("id", "v")
    val targets = Seq(
      (10L, Seq(0.95f, 0.95f, 0.0f), "xx"),  // hub
      (11L, Seq(0.6f, 0.0f, 0.8f), "fr"),    // exclusive to anchor 1
      (12L, Seq(0.0f, 0.6f, 0.8f), "de"))    // exclusive to anchor 2
      .toDF("id", "v", "lang")
    val out = Similarity.marginMining(targets, col("id"), col("v"), col("lang"),
        anchors, col("id"), col("v"), k = 2, topM = 1)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
    assert(out(1L) == ((11L, "fr")), s"anchor 1 picked ${out(1L)}")
    assert(out(2L) == ((12L, "de")), s"anchor 2 picked ${out(2L)}")
    // sanity: raw cosine really does prefer the hub (guards the fixture)
    val raw = Similarity.bruteForceTopK(targets, col("id"), col("v"),
        anchors, col("id"), col("v"), k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(raw(1L) == 10L && raw(2L) == 10L, s"fixture lost its hub: $raw")
  }

  test("marginMining: all-zero vectors stay deterministic (margin 0, never NaN)") {
    // every cosine is 0 (zero-vector guard), so each neighborhood sum is 0
    // and 0/0 would be NaN — whose ordering inside the rank window is
    // engine-dependent. The denominator guard pins margin to 0.0 and the
    // tiebreak (tid) alone decides the ranks, bit-for-bit.
    val anchors = Seq((1L, Seq(0.0f, 0.0f))).toDF("id", "v")
    val targets = Seq(
      (10L, Seq(0.0f, 0.0f), "aa"),
      (11L, Seq(0.0f, 0.0f), "bb")).toDF("id", "v", "lang")
    val out = Similarity.marginMining(targets, col("id"), col("v"), col("lang"),
        anchors, col("id"), col("v"), k = 2, topM = 2)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 10L), (2L, 11L)), out.mkString(","))
  }
}
