package graft

import graft.functions.Classifier
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ClassifierSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("weights are pos-minus-neg occurrence counts; scoring separates the classes") {
    // positive class speaks {good fine}, negative speaks {spam junk};
    // "both" appears once on each side and must cancel out of the model.
    val train = Seq(
      (0L, "good fine good both", true),
      (1L, "fine good fine", true),
      (2L, "spam junk spam both", false),
      (3L, "junk spam junk", false)
    ).toDF("id", "text", "y")
    val model = Classifier.hashedLinearModel(train, col("text"), col("y"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // good: +3, fine: +3, spam: -3, junk: -3, both: 0 (dropped).
    assert(model.values.toSet == Set(3L, -3L), model.toString)
    assert(model.size == 4)

    val held = Seq(
      (10L, "good fine day"),
      (11L, "spam junk offer"),
      (12L, "nothing matches here")
    ).toDF("id", "text")
    val scored = Classifier.scoreDocs(held, col("id"), col("text"),
        Classifier.hashedLinearModel(train, col("text"), col("y")))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(scored(10L) == ((6L, true)))
    assert(scored(11L) == ((-6L, false)))
    // no model token at all -> score 0, negative prediction, row kept
    assert(scored(12L) == ((0L, false)))
  }

  test("topK cut keeps the most discriminative buckets with a deterministic tie-break") {
    // 3 tokens with |w| = 2 and 2 tokens with |w| = 1; topK = 3 must keep
    // exactly the |w|=2 buckets regardless of input order.
    val train = Seq(
      (0L, "aa aa bb bb cc cc dd ee", true),
      (1L, "", false)
    ).toDF("id", "text", "y")
    val m = Classifier.hashedLinearModel(train, col("text"), col("y"), topK = 3)
      .collect().map(_.getLong(1))
    assert(m.length == 3 && m.forall(_ == 2L), m.toList.toString)
  }
}
