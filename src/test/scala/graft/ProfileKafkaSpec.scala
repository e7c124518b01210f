package graft

import graft.dq.Profile
import graft.model.OffsetRange
import graft.sources.KafkaSource
import org.scalatest.funsuite.AnyFunSuite

class ProfileKafkaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("profile reports rows/nulls/distinct/min/max per column in one pass") {
    val df = Seq(
      (Some(1), Some("a")), (Some(2), None), (Some(2), Some("c")), (None, Some("a"))
    ).toDF("k", "v")
    val p = Profile.profile(df, exact = true).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(p("k").getLong(1) == 4 && p("k").getLong(2) == 1 && p("k").getLong(3) == 2)
    assert(p("v").getLong(2) == 1 && p("v").getLong(3) == 2)
    assert(p("k").getString(4) == "1" && p("k").getString(5) == "2")
  }

  test("numericSummary covers numeric columns only") {
    val df = Seq((1, "x", 2.5), (3, "y", 4.5)).toDF("a", "s", "d")
    val rows = Profile.numericSummary(df).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(rows.keySet == Set("a", "d"))
    assert(rows("a") == ((1.0, 3.0, 4.0)))
    assert(rows("d") == ((2.5, 4.5, 7.0)))
  }

  test("kafka offset JSON matches the connector's expected shape") {
    val json = KafkaSource.offsetsJson(Seq(("t1", 1, 50L), ("t1", 0, 100L), ("t2", 0, 7L)))
    assert(json == """{"t1":{"0":100,"1":50},"t2":{"0":7}}""")
  }

  test("replayOptions builds [from, until) windows from ledger rows") {
    val opts = KafkaSource.replayOptions(Seq(
      OffsetRange("t", 0, 1L, 10L, 20L), OffsetRange("t", 1, 1L, 0L, 5L)))
    assert(opts("startingOffsets") == """{"t":{"0":10,"1":0}}""")
    assert(opts("endingOffsets") == """{"t":{"0":20,"1":5}}""")
  }
}
