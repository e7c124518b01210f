package graft

import graft.functions.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("syntheticMedia has the binary+metadata schema") {
    val m = Multimodal.syntheticMedia(spark, 30)
    val sch = m.schema.fields.map(f => f.name -> f.dataType.typeName).toMap
    assert(sch("bytes") == "binary")
    assert(sch("media_id") == "long")
    assert(m.count() == 30)
    assert(m.toDF().select(col("kind")).distinct().count() == 3)
  }

  test("extractFeatures is deterministic, fixed-dim, unit-norm, drops bytes") {
    val m = Multimodal.syntheticMedia(spark, 12)
    val f1 = Multimodal.extractFeatures(m, Multimodal.FakeCodec, dim = 16)
    assert(!f1.columns.contains("bytes")) // blobs never cross the shuffle
    val rows = f1.collect().sortBy(_.media_id)
    assert(rows.forall(_.feature.length == 16))
    val norm = math.sqrt(rows.head.feature.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
    val f2 = Multimodal.extractFeatures(m, Multimodal.FakeCodec, dim = 16)
      .collect().sortBy(_.media_id)
    assert(rows.zip(f2).forall { case (a, b) => a.feature.sameElements(b.feature) })
  }

  test("resizePlan preserves aspect ratio and caps the long side") {
    val m = Multimodal.syntheticMedia(spark, 30).toDF()
    val plan = Multimodal.resizePlan(m, maxSide = 32).collect()
    assert(plan.nonEmpty)
    plan.foreach { r =>
      val (tw, th) = (r.getAs[Int]("target_width"), r.getAs[Int]("target_height"))
      assert(tw <= 32 + 1 && th <= 32 + 1) // ceil rounding
      assert(tw > 0 && th > 0)
    }
  }

  test("frameSamplePlan yields one row per sampled frame for videos only") {
    val m = Multimodal.syntheticMedia(spark, 30).toDF()
    val frames = Multimodal.frameSamplePlan(m, everyMs = 500)
    assert(frames.select(col("kind")).distinct().collect().map(_.getString(0)).toSeq == Seq("video"))
    val one = frames.filter(col("media_id") === 2L)
    val dur = m.filter(col("media_id") === 2L).select(col("duration_ms")).head().getInt(0)
    assert(one.count() == (dur + 499) / 500)
  }
}
