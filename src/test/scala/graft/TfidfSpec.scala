package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Tfidf

/** Sparse retrieval (inverted-index top-k) semantics on a corpus small
  * enough to score by hand.
  */
class TfidfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus = Seq(
    (1L, "apple zebra"),
    (2L, "apple cherry"),
    (3L, "banana cherry"),
    (4L, "apple banana cherry")).toDF("doc_id", "text")

  test("sparseTopK ranks the query document itself first") {
    val out = Tfidf.sparseTopK(corpus, col("doc_id"), col("text"),
        corpus.filter(col("doc_id") === 1), col("doc_id"), col("text"),
        k = 10, maxDfFrac = 1.0)
      .orderBy(col("rnk"))
      .collect()
    // doc 1 shares both terms with itself; zebra (df=1) dominates.
    assert(out.head.getAs[Long]("d") == 1L && out.head.getAs[Int]("rnk") == 1)
    // apple appears in docs 1, 2, 4 — all must be retrieved.
    assert(out.map(_.getAs[Long]("d")).toSet == Set(1L, 2L, 4L))
    // scores strictly follow rank order (ties broken by d, none here).
    val scores = out.map(_.getAs[Long]("score"))
    assert(scores.sameElements(scores.sorted(Ordering[Long].reverse)))
  }

  test("sparseTopK maxDfFrac drops stopword-scale terms from the index") {
    // apple and cherry have df=3 > 0.5·4: only zebra (df=1) and banana
    // (df=2) survive, so query 1's only match is the self-match via zebra.
    val out = Tfidf.sparseTopK(corpus, col("doc_id"), col("text"),
        corpus.filter(col("doc_id") === 1), col("doc_id"), col("text"),
        k = 10, maxDfFrac = 0.5)
      .collect()
    assert(out.map(r => (r.getAs[Long]("q"), r.getAs[Long]("d"))).toSet ==
      Set((1L, 1L)))
    // BM25 by hand: zebra idf weight floor(1e6/1) = 1_000_000. Doc 1 is
    // exactly average length (dl = 2, avgdl = 9 DIV 4 = 2) with tf_d = 1,
    // so the k1/b saturation is exactly 1.0 → tfc = 10_000 (the ×1e4
    // scale): (10000·22·1·2) DIV (10·2·1 + 3·2 + 9·2) = 440000 DIV 44.
    // score = tf_q(1) · w · tfc = 1e6 · 1e4.
    assert(out.head.getAs[Long]("score") == 1000000L * 10000L)
  }

  test("sparseTopK caps results at k per query") {
    val out = Tfidf.sparseTopK(corpus, col("doc_id"), col("text"),
        corpus.filter(col("doc_id") === 4), col("doc_id"), col("text"),
        k = 2, maxDfFrac = 1.0)
      .collect()
    assert(out.length == 2)
    assert(out.map(_.getAs[Int]("rnk")).toSet == Set(1, 2))
  }
}
