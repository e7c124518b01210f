package graft

import graft.functions.Pq
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PqSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // 40 vectors of dim 16, two well-separated clusters.
  private def fixture = (0L until 40L).map { i =>
    val base = if (i % 2 == 0) 2.0f else -2.0f
    (i, Seq.tabulate(16)(d => base + ((i * 7 + d * 3) % 11).toFloat / 110f))
  }.toDF("id", "v")

  test("fit derives the codebook shape and encode packs within 4-bit lanes") {
    val cb = Pq.fit(fixture, col("id"), col("v"), m = 4, k = 8)
    assert(cb.m == 4 && cb.subDim == 4 && cb.k == 8)
    assert(cb.cents.length == 4 && cb.cents(0).length == 8 && cb.cents(0)(0).length == 4)
    val codes = fixture.select(Pq.encode(col("v"), cb).as("c")).collect().map(_.getLong(0))
    // 4 lanes × 3 bits used (k=8) → every code fits in 16 bits
    assert(codes.forall(c => c >= 0L && c < (1L << 16)))
  }

  test("encode matches a plain-Scala argmin over the same codebook") {
    val cb = Pq.fit(fixture, col("id"), col("v"), m = 4, k = 8)
    val got = fixture.select(col("id"), Pq.encode(col("v"), cb).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val vecs = fixture.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    for ((id, v) <- vecs) {
      var expected = 0L
      for (j <- 0 until cb.m) {
        val best = (0 until cb.k).minBy { c =>
          val d = (0 until cb.subDim).map { d0 =>
            val diff = v(j * cb.subDim + d0) - cb.cents(j)(c)(d0)
            diff * diff
          }.sum
          (d, c)
        }
        expected |= best.toLong << (4 * j)
      }
      assert(got(id) == expected, s"id=$id")
    }
  }

  test("quantization error is small for in-sample vectors and bounded overall") {
    val cb = Pq.fit(fixture, col("id"), col("v"), m = 4, k = 16)
    val err = Pq.quantizationError(fixture, col("v"), cb)
    // 16 centroids over 40 two-cluster vectors: error well under the
    // inter-cluster squared distance (16 dims × 4² = 256).
    assert(err >= 0.0 && err < 16.0, s"mse=$err")
  }

  test("ivfPqTopK at full probe equals the unfiltered ADC scan") {
    val cb = Pq.fit(fixture, col("id"), col("v"), m = 4, k = 16)
    val queries = fixture.filter(col("id") < 3L)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("query_id"), col("corpus_id"), col("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val full = rows(Pq.ivfPqTopK(fixture, col("id"), col("v"),
      queries, col("id"), col("v"), cb, k = 5, nCentroids = 8, nProbe = 8))
    val adc = rows(Pq.adcTopK(fixture, col("id"), col("v"),
      queries, col("id"), col("v"), cb, k = 5))
    assert(full == adc) // probing every cell = no candidate is ever filtered
    // narrow probe still returns k rows per query (cells cover the space)
    val narrow = Pq.ivfPqTopK(fixture, col("id"), col("v"),
      queries, col("id"), col("v"), cb, k = 5, nCentroids = 8, nProbe = 2)
    assert(narrow.groupBy(col("query_id")).count().collect().forall(_.getLong(1) <= 5))
  }

  test("adcTopK finds the planted nearest neighbor within top-3") {
    val cb = Pq.fit(fixture, col("id"), col("v"), m = 4, k = 16)
    // query = vector 6's cluster; its nearest raw neighbors share its cluster
    val queries = fixture.filter(col("id") === 6L)
    val top = Pq.adcTopK(fixture, col("id"), col("v"),
        queries, col("id"), col("v"), cb, k = 5)
      .collect().map(r => r.getAs[Long]("corpus_id"))
    // every ADC hit stays in the query's cluster (even ids)
    assert(top.forall(_ % 2 == 0), top.mkString(","))
    val recall = Pq.adcRecall(fixture, col("id"), col("v"),
      queries, col("id"), col("v"), cb, k = 5)
    assert(recall >= 0.6, s"recall=$recall")
  }
}
