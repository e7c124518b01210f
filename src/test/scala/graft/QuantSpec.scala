package graft

import graft.functions.Quant
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class QuantSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val vecs = (0 until 100).map { i =>
    (i.toLong, Seq.tabulate(16)(d => (((i * 31 + d * 7) % 200) - 100) / 100.0f))
  }.toDF("vec_id", "embedding")

  test("fitScale is the corpus max |component|") {
    val s = Quant.fitScale(vecs, col("embedding"))
    val expected = vecs.select(explode(col("embedding")).as("x"))
      .agg(max(abs(col("x").cast("double")))).head().getDouble(0)
    assert(s == expected && s > 0.0)
  }

  test("codes stay within [-127, 127] and round-trip error is bounded") {
    val s = Quant.fitScale(vecs, col("embedding"))
    val codeBounds = vecs
      .select(explode(Quant.encode(col("embedding"), s)).as("c"))
      .agg(min(col("c")), max(col("c"))).head()
    assert(codeBounds.getInt(0) >= -127 && codeBounds.getInt(1) <= 127)
    // per-component error ≤ (s/127/2)² per dim → 16 dims bound
    val step = s / 127.0
    val maxErr = vecs
      .select(Quant.reconstructionError(col("embedding"), s).as("e"))
      .agg(max(col("e"))).head().getDouble(0)
    assert(maxErr <= 16 * (step / 2) * (step / 2) * (1 + 1e-9), s"err $maxErr")
  }

  test("exact code-grid values reconstruct exactly") {
    // components already on the code grid (k·s/127) quantize with zero error
    val s = 1.27
    val grid = Seq((1L, Seq.tabulate(8)(d => (d - 4) * (1.27 / 127.0)).map(_.toFloat)))
      .toDF("vec_id", "embedding")
    // float storage perturbs the grid by < 6e-8 per component; error is
    // that perturbation squared, far below one quantization step
    val e = grid.select(Quant.reconstructionError(col("embedding"), s).as("e"))
      .head().getDouble(0)
    assert(e < 1e-12)
  }
}
