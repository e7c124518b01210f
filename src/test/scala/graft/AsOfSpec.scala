package graft

import graft.ops.AsOf
import org.scalatest.funsuite.AnyFunSuite

class AsOfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("joinAsOf matches the latest right row at or before each left time") {
    val left = Seq(
      (1L, 100L, "c1"), (1L, 250L, "c2"), (1L, 50L, "c0"), (2L, 10L, "c3")
    ).toDF("k", "lt", "payload")
    val right = Seq(
      (1L, 100L, "s@100"), (1L, 200L, "s@200"), (2L, 500L, "s@500")
    ).toDF("k", "rt", "state")
    val out = AsOf.joinAsOf(left, right, "k", "lt", "rt", Seq("state"))
      .collect().map(r => (r.getAs[String]("payload"), r.getAs[String]("asof_state"))).toMap
    assert(out("c0") == null)      // before any state
    assert(out("c1") == "s@100")   // inclusive match at equal time
    assert(out("c2") == "s@200")   // latest prior state
    assert(out("c3") == null)      // right exists only later
  }

  test("joinAsOf preserves left cardinality") {
    val left = (1L to 100L).map(i => (i % 5, i, s"p$i")).toDF("k", "lt", "payload")
    val right = Seq((0L, 10L, "x"), (1L, 20L, "y")).toDF("k", "rt", "state")
    assert(AsOf.joinAsOf(left, right, "k", "lt", "rt", Seq("state")).count() == 100)
  }
}
