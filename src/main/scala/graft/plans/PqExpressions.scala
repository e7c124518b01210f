package graft.plans

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Product-quantization kernels for the embedding stack.
  *
  * PQ is the scale path for vector memory: a 64-dim float vector is 256
  * bytes; its PQ code (m subvector centroid ids, 4 bits each at k=16) packs
  * into one BIGINT. An ADC scan then reads the code column — 32× narrower
  * than the raw vectors — which is the difference between an in-memory and
  * a spilling candidate scan at corpus scale.
  *
  * The codebook is a driver-side constant (m × k × subDim doubles — a few
  * KiB fit from a deterministic hash-ordered sample) carried inside the
  * expression, so per-row work is one tight primitive loop with zero joins.
  * Both kernels accumulate in ascending index order so the DuckDB
  * differential oracle (sequential `list_inner_product` over the same
  * doubles) reproduces them bit-for-bit.
  */
private[plans] trait PqCodebookParams {
  def cents: Array[Array[Array[Double]]] // [m][k][subDim]
  final def m: Int = cents.length
  final def k: Int = cents.head.length
  final def subDim: Int = cents.head.head.length
  /** Bits per code: fixed 4 (k ≤ 16 enforced at fit time) so m ≤ 15 packs
    * into a positive BIGINT with headroom.
    */
  final def codeBits: Int = 4
}

/** Packed PQ code word of a vector: for each subvector j, the index of the
  * L2-nearest centroid (ties → lowest index), packed as `Σ idx_j << 4j`.
  */
case class PqEncode(child: Expression, cents: Array[Array[Array[Double]]])
    extends UnaryExpression with CodegenFallback with PqCodebookParams {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode requires array<float>/array<double>, got ${other.catalogString}")
  }

  @transient private lazy val isFloatArr = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val dim = m * subDim
    val v = new Array[Double](dim)
    val n = math.min(arr.numElements(), dim)
    var i = 0
    while (i < n) {
      v(i) = if (isFloatArr) arr.getFloat(i).toDouble else arr.getDouble(i)
      i += 1
    }
    var code = 0L
    var j = 0
    while (j < m) {
      val base = j * subDim
      var best = 0
      var bestDist = Double.MaxValue
      var c = 0
      while (c < k) {
        val cent = cents(j)(c)
        var dist = 0.0
        var d = 0
        while (d < subDim) {
          val diff = v(base + d) - cent(d)
          dist += diff * diff
          d += 1
        }
        if (dist < bestDist) { bestDist = dist; best = c } // strict < keeps lowest index on ties
        c += 1
      }
      code |= best.toLong << (codeBits * j)
      j += 1
    }
    code
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** Asymmetric-distance computation: squared L2 between a raw query vector
  * and the reconstruction of a packed code word. The accumulation runs over
  * the full vector in ascending index order (subvectors in order, dims in
  * order) — the same sequence as one sequential pass over the
  * concatenated reconstruction, which is what the oracle computes.
  */
case class PqAdcDistance(left: Expression, right: Expression,
                         cents: Array[Array[Array[Double]]])
    extends BinaryExpression with CodegenFallback with PqCodebookParams {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    val codeOk = left.dataType == LongType
    val vecOk = right.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (codeOk && vecOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"pq_adc_distance requires (bigint code, array<float/double> query), " +
        s"got ${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  @transient private lazy val isFloatArr = right.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(codeAny: Any, qAny: Any): Any = {
    val code = codeAny.asInstanceOf[Long]
    val arr = qAny.asInstanceOf[ArrayData]
    val dim = m * subDim
    val q = new Array[Double](dim)
    val n = math.min(arr.numElements(), dim)
    var i = 0
    while (i < n) {
      q(i) = if (isFloatArr) arr.getFloat(i).toDouble else arr.getDouble(i)
      i += 1
    }
    val mask = (1L << codeBits) - 1L
    var dist = 0.0
    var j = 0
    while (j < m) {
      val cent = cents(j)(((code >> (codeBits * j)) & mask).toInt)
      val base = j * subDim
      var d = 0
      while (d < subDim) {
        val diff = q(base + d) - cent(d)
        dist += diff * diff
        d += 1
      }
      j += 1
    }
    dist
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcDistance =
    copy(left = newLeft, right = newRight)
}

object PqExpressions {
  def pq_encode(vec: Column, cents: Array[Array[Array[Double]]]): Column =
    GraftBridge.toColumn(PqEncode(GraftBridge.toExpression(vec), cents))

  def pq_adc_distance(code: Column, query: Column,
                      cents: Array[Array[Array[Double]]]): Column =
    GraftBridge.toColumn(PqAdcDistance(
      GraftBridge.toExpression(code), GraftBridge.toExpression(query), cents))
}
