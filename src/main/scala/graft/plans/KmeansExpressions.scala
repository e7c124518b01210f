package graft.plans

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Centroid-assignment kernel for the clustering stack (k-means, IVF-style
  * coarse quantizers): given a vector and a driver-side centroid table (a
  * few KiB — k × dim doubles carried inside the expression, the same
  * discipline as [[PqEncode]]'s codebook), emit the index of the L2-nearest
  * centroid and the squared distance to it in one pass.
  *
  * This is the shape that scales: assignment is a pure projection — no
  * join, no shuffle, no window — so a Lloyd iteration over a 100 TB corpus
  * is one scan plus a k×dim-row aggregate. The join+row_number alternative
  * ([[graft.functions.Similarity.ivfTopK]]'s probe ranking) shuffles the
  * corpus per iteration.
  *
  * Distances accumulate diff² in ascending index order (the same sequence
  * as [[L2Distance]]), so the DuckDB differential oracle reproduces them
  * bit-for-bit with sequential `list_inner_product` over the same doubles;
  * ties keep the lowest centroid index (strict `<`), matching
  * `row_number() OVER (ORDER BY dist, cidx)`.
  */
case class NearestCentroid(child: Expression, cents: Array[Array[Double]])
    extends UnaryExpression with CodegenFallback {

  private def k: Int = cents.length
  private def dim: Int = cents.head.length

  override def dataType: DataType = StructType(Seq(
    StructField("cluster", IntegerType, nullable = false),
    StructField("dist", DoubleType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid requires array<float>/array<double>, got ${other.catalogString}")
  }

  @transient private lazy val isFloatArr = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val v = new Array[Double](dim)
    val n = math.min(arr.numElements(), dim)
    var i = 0
    while (i < n) {
      v(i) = if (isFloatArr) arr.getFloat(i).toDouble else arr.getDouble(i)
      i += 1
    }
    var best = 0
    var bestDist = Double.MaxValue
    var c = 0
    while (c < k) {
      val cent = cents(c)
      var dist = 0.0
      var d = 0
      while (d < dim) {
        val diff = v(d) - cent(d)
        dist += diff * diff
        d += 1
      }
      if (dist < bestDist) { bestDist = dist; best = c } // strict < keeps lowest index on ties
      c += 1
    }
    new GenericInternalRow(Array[Any](best, bestDist))
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

object KmeansExpressions {
  /** struct(cluster INT, dist DOUBLE) of the L2-nearest centroid. */
  def nearest_centroid(vec: Column, cents: Array[Array[Double]]): Column =
    GraftBridge.toColumn(NearestCentroid(GraftBridge.toExpression(vec), cents))
}
