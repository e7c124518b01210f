package graft

import graft.functions.Importance
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ImportanceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("candidates sharing the target vocabulary outscore off-domain ones") {
    // target domain speaks {alpha beta}; candidate 1 speaks it too,
    // candidate 2 speaks {gamma delta}, candidate 3 is mixed.
    val docs = Seq(
      (0L, "alpha beta alpha beta", true),
      (1L, "beta alpha beta alpha", true),
      (2L, "alpha beta beta alpha", false),
      (3L, "gamma delta gamma delta", false),
      (4L, "alpha delta beta gamma", false)
    ).toDF("id", "text", "tgt")
    val out = Importance.importanceScores(docs, col("id"), col("text"),
        col("tgt")).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out.keySet == Set(2L, 3L, 4L)) // targets score the pool only
    assert(out(2L) > out(4L) && out(4L) > out(3L), out.toString)
    // exact weights: alpha/beta buckets are 8 target of 14 total
    // occurrences -> 8e6 DIV 14; gamma/delta 0 target of 6 -> 0.
    // (alpha, beta, gamma, delta hash to 4 distinct md5 buckets of 64.)
    assert(out(2L) == 8L * 1000000L / 14L)
    assert(out(3L) == 0L)
    assert(out(4L) == (2L * (8L * 1000000L / 14L)) / 4L)
  }
}
