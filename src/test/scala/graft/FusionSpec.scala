package graft

import graft.functions.Fusion
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FusionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // query 7: sparse ranks items 1,2,3; dense ranks items 3,2,9.
  private lazy val sparse = Seq((7L, 1L, 1), (7L, 2L, 2), (7L, 3L, 3))
    .toDF("query", "item", "rank")
  private lazy val dense = Seq((7L, 3L, 1), (7L, 2L, 2), (7L, 9L, 3))
    .toDF("query", "item", "rank")

  test("RRF favors cross-list agreement over a single top rank") {
    val out = Fusion.reciprocalRankFusion(Seq(sparse, dense),
        "query", "item", "rank", k = 10)
      .orderBy(col("rnk")).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)))
    // weights: 1e6 DIV 61 = 16393, DIV 62 = 16129, DIV 63 = 15873
    // item 2: both lists rank 2 → 32258; item 3: ranks 3+1 → 32266;
    // items 1 and 9: single lists → 16393, 15873. Agreeing items beat
    // single-list ones even when one list put them lower.
    assert(out.map(t => (t._1, t._2, t._3)).toSeq == Seq(
      (3L, 32266L, 2L), (2L, 32258L, 2L), (1L, 16393L, 1L), (9L, 15873L, 1L)))
    assert(out.map(_._4).toSeq == Seq(1, 2, 3, 4))
  }

  test("ties on fused score break by ascending item id; k truncates") {
    // two items each ranked 1 by exactly one list → equal scores
    val a = Seq((1L, 50L, 1)).toDF("query", "item", "rank")
    val b = Seq((1L, 40L, 1)).toDF("query", "item", "rank")
    val out = Fusion.reciprocalRankFusion(Seq(a, b), "query", "item", "rank",
        k = 1).collect()
    assert(out.length == 1 && out(0).getLong(1) == 40L)
  }
}
