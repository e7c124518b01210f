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

  test("joinAsOf carries all right columns from the SAME matched row (no splice across versions)") {
    // The matched (latest ≤ t) right row has a NULL payload column; a
    // per-column last(ignoreNulls) carry would splice the older row's value
    // into that column. The struct carry must surface the matched row's
    // null as-is.
    val left = Seq((1L, 300L, "probe")).toDF("k", "lt", "payload")
    val right = Seq(
      (1L, 100L, Some("old_a"), Some("old_b")),
      (1L, 200L, None, Some("new_b"))
    ).toDF("k", "rt", "a", "b")
    val row = AsOf.joinAsOf(left, right, "k", "lt", "rt", Seq("a", "b")).head()
    assert(row.getAs[String]("asof_a") == null, "null in matched row must not be backfilled")
    assert(row.getAs[String]("asof_b") == "new_b")
  }

  test("joinAsOf preserves left cardinality") {
    val left = (1L to 100L).map(i => (i % 5, i, s"p$i")).toDF("k", "lt", "payload")
    val right = Seq((0L, 10L, "x"), (1L, 20L, "y")).toDF("k", "rt", "state")
    assert(AsOf.joinAsOf(left, right, "k", "lt", "rt", Seq("state")).count() == 100)
  }

  test("joinRange matches exactly the pairs within the window") {
    import graft.ops.RangeJoin
    val left = Seq((1L, 1000L, "p1"), (1L, 5000L, "p2"), (2L, 100L, "p3"))
      .toDF("k", "lt", "tag")
    val right = Seq(
      (1L, 999L), (1L, 1000L), (1L, 500L), (1L, 4000L), (1L, 5501L), (2L, 99L)
    ).toDF("k", "rt")
    val out = RangeJoin.joinRange(left, right, "k", "lt", "rt", window = 500L)
      .collect().map(r => (r.getAs[String]("tag"), r.getAs[Long]("rt"))).toSet
    // p1@1000 window [500,1000] -> 999, 1000, 500; p2@5000 -> none (4000 too old, 5501 future)
    assert(out == Set(("p1", 999L), ("p1", 1000L), ("p1", 500L), ("p3", 99L)))
  }
}
