package graft

import graft.functions.Classifier
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ClassifierSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("weights are presence-rate differences; class-universal tokens cancel exactly") {
    // "common" is in every doc of BOTH classes (3 pos vs 1 neg — the
    // imbalance that swamps raw-count weights) and must weigh 0;
    // repeating a token inside one doc must not change its weight.
    val train = Seq(
      (0L, "common alpha alpha", true),
      (1L, "common beta", true),
      (2L, "common alpha beta", true),
      (3L, "common clean", false)
    ).toDF("id", "text", "y")
    val model = Classifier.hashedLinearModel(train, col("id"), col("text"),
        col("y"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // alpha: 2 of 3 pos docs -> 666666; beta: 666666; clean: -1000000;
    // common: 1e6 DIV 1 - 1e6 DIV 1 ... rates 3/3 vs 1/1 -> 0, dropped.
    assert(model.values.toList.sorted == List(-1000000L, 666666L, 666666L),
      model.toString)
  }

  test("scoring sums distinct-presence weights; unmatched docs keep a zero row") {
    val train = Seq(
      (0L, "good fine", true),
      (1L, "fine good", true),
      (2L, "spam junk", false),
      (3L, "junk spam", false)
    ).toDF("id", "text", "y")
    val model = Classifier.hashedLinearModel(train, col("id"), col("text"),
      col("y"))
    val held = Seq(
      (10L, "good fine good fine day"), // repeats must not double-count
      (11L, "spam junk offer"),
      (12L, "nothing matches here")
    ).toDF("id", "text")
    val scored = Classifier.scoreDocs(held, col("id"), col("text"), model)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(scored(10L) == ((2000000L, true)))
    assert(scored(11L) == ((-2000000L, false)))
    assert(scored(12L) == ((0L, false)))
  }

  test("scoreExpr (exported-model form) matches scoreDocs exactly") {
    val train = Seq(
      (0L, "good fine", true), (1L, "fine good extra", true),
      (2L, "spam junk", false), (3L, "junk spam", false)
    ).toDF("id", "text", "y")
    val model = Classifier.hashedLinearModel(train, col("id"), col("text"),
      col("y"))
    val exported = model.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val held = Seq((10L, "good fine good"), (11L, "spam extra"),
      (12L, "unrelated words"), (13L, "")).toDF("id", "text")
    val viaDocs = Classifier.scoreDocs(held, col("id"), col("text"), model)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaExpr = held.select(col("id"),
        Classifier.scoreExpr(exported, col("text")).as("score"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaExpr == viaDocs, s"expr=$viaExpr docs=$viaDocs")
    // empty model scores everything 0
    val zero = held.select(Classifier.scoreExpr(Map.empty, col("text")))
      .collect().map(_.getLong(0))
    assert(zero.forall(_ == 0L))
  }

  test("topK cut keeps the most discriminative buckets with a deterministic tie-break") {
    // pos-exclusive aa/bb (+1e6), half-rate cc (+500000), neg-exclusive
    // zz (-1e6): topK = 3 must keep aa, bb, zz and cut cc.
    val train = Seq(
      (0L, "aa bb cc", true),
      (1L, "aa bb", true),
      (2L, "zz", false)
    ).toDF("id", "text", "y")
    val m = Classifier.hashedLinearModel(train, col("id"), col("text"),
        col("y"), topK = 3)
      .collect().map(_.getLong(1)).sorted
    assert(m.toList == List(-1000000L, 1000000L, 1000000L), m.toList.toString)
  }
}
