package graft

import graft.tools.ScaleGen
import org.scalatest.funsuite.AnyFunSuite

/** The affine embedding-replica family's contract: every member is a
  * genuine permutation (same multiset of components), intra-replica
  * geometry is preserved exactly (fixed permutation applied uniformly),
  * and all dim·φ(dim) members produce pairwise-distinct layouts — the
  * property whose violation shipped 36% byte-identical sf10 vectors in
  * r13 (rotation-only family wrapping at i = dim).
  */
class ScaleGenSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("dimension primary keys are unique in the fixtures — the assumption " +
    "q06's PK-aware join elimination rests on") {
    // dimEnrich (QueriesCommerce) drops the reference query's unreferenced
    // supplier/part LEFT OUTER legs, which is row-multiplicity-preserving
    // ONLY while s_suppkey/p_partkey stay unique. Guard the assumption
    // where the data lives: a future generator/fixture with duplicate dim
    // keys must fail HERE, not silently change q06's semantics vs the
    // reference. (ScaleGen preserves it by construction — key-shifted
    // replicas are disjoint ranges — so checking the source fixture
    // covers every derived scale.)
    val dir = "/root/testdata/sf0.001"
    Seq("supplier.parquet" -> "s_suppkey", "part.parquet" -> "p_partkey",
      "customer.parquet" -> "c_custkey", "nation.parquet" -> "n_nationkey",
      "region.parquet" -> "r_regionkey").foreach { case (table, pk) =>
      val df = spark.read.parquet(s"$dir/$table")
      val total = df.count()
      val distinct = df.select(pk).distinct().count()
      assert(total == distinct, s"$table.$pk must be unique: $distinct of $total")
    }
  }

  test("affine family: permutation, exact intra-replica geometry, pairwise-distinct layouts") {
    val dim = 8
    val kMax = dim * ScaleGen.coprimesTo(dim).size // 8 * |{1,3,5,7}| = 32
    assert(kMax == 32)
    val v1 = Vector.tabulate(dim)(j => (j + 1).toFloat) // injective layout probe
    val v2 = Vector.tabulate(dim)(j => ((j * 5) % dim).toFloat + 0.5f)
    val df = Seq((1L, v1), (2L, v2)).toDF("vec_id", "embedding")
    val reps = (0 until kMax).map { i =>
      df.withColumn("embedding", ScaleGen.affinePermutation(dim, i))
        .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toVector).toMap
    }
    assert(reps.head(1L) == v1, "replica 0 must be the identity")
    reps.foreach { m =>
      assert(m(1L).sorted == v1.sorted, "each replica must permute, not alter")
      assert(m(2L).sorted == v2.sorted)
    }
    assert(reps.map(_(1L)).distinct.size == kMax,
      "all dim*phi(dim) members must be pairwise-distinct layouts")
    // exact geometry: permuting both vectors identically preserves the
    // component-pair multiset, so the dot product is the same sum
    // reordered (compare as a multiset of products to stay FP-exact)
    val pairs0 = v1.zip(v2).map { case (x, y) => x * y }.sorted
    reps.foreach { m =>
      assert(m(1L).zip(m(2L)).map { case (x, y) => x * y }.sorted == pairs0,
        "intra-replica pairwise products must be preserved exactly")
    }
  }

  test("affine family guard arithmetic: coprime pools are correct at edge dims") {
    assert(ScaleGen.coprimesTo(1) == IndexedSeq(1))  // identity only
    assert(ScaleGen.coprimesTo(2) == IndexedSeq(1))  // k <= 2
    assert(ScaleGen.coprimesTo(6) == IndexedSeq(1, 5))
    assert(ScaleGen.coprimesTo(64).size == 32)       // k <= 2048 at dim 64
  }
}
