package graft

import graft.functions.LmScore
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LmScoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bigramModel counts transitions and prefix totals over normalized text") {
    val docs = Seq("abab", "ABBA").toDF("txt") // normalized: "abab", "abba"
    val m = LmScore.bigramModel(docs, col("txt"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // bigrams: abab → ab,ba,ab; abba → ab,bb,ba
    assert(m("ab") == ((3L, 3L))) // 'a' prefix total = ab(3)
    assert(m("ba") == ((2L, 3L))) // 'b' prefix total = ba(2)+bb(1)
    assert(m("bb") == ((1L, 3L)))
  }

  test("score sums integer-scaled conditional frequencies exactly") {
    val docs = Seq((1L, "abab"), (2L, "abba")).toDF("id", "txt")
    val model = LmScore.bigramModel(docs, col("txt"))
    val s = LmScore.score(docs, col("id"), col("txt"), model)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // p(ab)=3/3 → 1000000, p(ba)=2/3 → 666666, p(bb)=1/3 → 333333
    assert(s(1L) == ((3L, 1000000L + 666666L + 1000000L)))
    assert(s(2L) == ((3L, 1000000L + 333333L + 666666L)))
    // a doc scored against a model missing its bigrams contributes 0, not null
    val other = Seq((9L, "zzzz")).toDF("id", "txt")
    val o = LmScore.score(other, col("id"), col("txt"), model).head()
    assert(o.getLong(1) == 3L && o.getLong(2) == 0L)
  }
}
