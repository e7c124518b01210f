package graft

import graft.functions.Kmeans
import graft.plans.KmeansExpressions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class KmeansSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def blobs(n: Int, centers: Seq[Seq[Double]], spread: Double) = {
    val dim = centers.head.length
    (0 until n).map { i =>
      val c = centers(i % centers.length)
      // deterministic pseudo-noise around the blob center
      val v = Seq.tabulate(dim)(d =>
        (c(d) + spread * (((i * 31 + d * 7) % 13) - 6) / 6.0).toFloat)
      (i.toLong, v, i % centers.length)
    }.toDF("vec_id", "embedding", "true_blob")
  }

  test("NearestCentroid: argmin with lowest-index tie-break") {
    val cents = Array(Array(0.0, 0.0), Array(1.0, 0.0), Array(0.0, 0.0))
    val df = Seq(Tuple1(Seq(0.9f, 0.0f)), Tuple1(Seq(0.1f, 0.0f)),
        Tuple1(Seq(0.5f, 0.0f)))
      .toDF("v")
    val out = df.select(
        KmeansExpressions.nearest_centroid(col("v"), cents).as("nc"))
      .select(col("nc.cluster"), col("nc.dist"))
      .collect()
    // 0.9f widens to 0.899999976…, so the squared distance is only ~1e-8 close
    assert(out(0).getInt(0) == 1 && math.abs(out(0).getDouble(1) - 0.01) < 1e-7)
    assert(out(1).getInt(0) == 0) // never 2: equal dist ties to the lower index
    assert(out(2).getInt(0) == 0) // exact midpoint ties to the lower index
  }

  test("fit separates well-spaced blobs and assignment matches the blob") {
    val df = blobs(300, Seq(Seq(5.0, 5.0, 0.0), Seq(-5.0, 0.0, 5.0), Seq(0.0, -5.0, -5.0)),
      spread = 0.3)
    val m = Kmeans.fit(df, col("vec_id"), col("embedding"), k = 3, iters = 3)
    val assigned = Kmeans.assign(df, col("vec_id"), col("embedding"), m)
      .join(df.select(col("vec_id"), col("true_blob")), "vec_id")
    // every k-means cluster maps 1:1 onto one generating blob
    val confusion = assigned.groupBy(col("cluster"))
      .agg(countDistinct(col("true_blob")).as("n_blobs"))
      .collect()
    assert(confusion.length == 3 && confusion.forall(_.getLong(1) == 1))
  }

  test("an iteration strictly reduces inertia on separable data") {
    val df = blobs(200, Seq(Seq(4.0, 0.0), Seq(-4.0, 0.0)), spread = 0.5)
    def inertia(iters: Int): Double = {
      val m = Kmeans.fit(df, col("vec_id"), col("embedding"), k = 2, iters = iters)
      Kmeans.clusterProfile(df, col("vec_id"), col("embedding"), m)
        .agg(sum(col("inertia"))).head().getDouble(0)
    }
    val i1 = inertia(1)
    val i2 = inertia(2)
    assert(i2 <= i1, s"inertia rose: $i1 -> $i2")
  }

  test("a starved cluster keeps its previous centroid") {
    // two far blobs, k=3: one seed necessarily captures no points once the
    // other two absorb the blobs — fit must not NaN or drop the centroid.
    val df = blobs(60, Seq(Seq(9.0, 9.0), Seq(-9.0, -9.0)), spread = 0.1)
    val m = Kmeans.fit(df, col("vec_id"), col("embedding"), k = 3, iters = 3)
    assert(m.cents.length == 3)
    assert(m.cents.forall(_.forall(d => !d.isNaN && !d.isInfinite)))
    val sizes = Kmeans.clusterProfile(df, col("vec_id"), col("embedding"), m)
      .select(col("n_vecs")).collect().map(_.getLong(0))
    assert(sizes.sum == 60)
  }

  test("purity: majority label per cluster with deterministic tie-break") {
    val assigned = Seq((1L, 0), (2L, 0), (3L, 0), (4L, 1), (5L, 1), (6L, 1))
      .toDF("vec_id", "cluster")
    val labeled = Seq((1L, 7), (2L, 7), (3L, 9), (4L, 5), (5L, 3), (6L, 3))
      .toDF("vec_id", "label")
    val out = Kmeans.purity(assigned, labeled, col("label"))
      .orderBy(col("cluster")).collect()
    assert(out(0).getAs[Int]("top_label") == 7 && out(0).getAs[Long]("top_n") == 2)
    assert(out(1).getAs[Int]("top_label") == 3 && out(1).getAs[Long]("top_n") == 2)
    assert(out.forall(_.getAs[Long]("n_vecs") == 3))
  }

  test("fit is deterministic: same data, same model") {
    val df = blobs(120, Seq(Seq(2.0, -1.0), Seq(-2.0, 1.0)), spread = 0.4)
    val a = Kmeans.fit(df, col("vec_id"), col("embedding"), k = 2, iters = 2)
    val b = Kmeans.fit(df, col("vec_id"), col("embedding"), k = 2, iters = 2)
    assert(a.cents.flatten.toSeq == b.cents.flatten.toSeq)
  }
}
