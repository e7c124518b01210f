package graft.plans

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for the vector-similarity hot path.
  *
  * The composable form (`aggregate(zip_with(a, b, _*_), 0d, _+_)`) is
  * correct but interpreted: higher-order-function lambdas are excluded from
  * whole-stage codegen, and an all-pairs similarity scan evaluates the lambda
  * O(pairs × dim) times with boxed doubles. This expression generates a tight
  * primitive loop instead (and participates in whole-stage codegen), which is
  * the difference between minutes and seconds on a 10⁶-pair scan — and
  * proportionally more at cluster scale.
  *
  * Summation order is ascending index, identical to the sequential
  * `aggregate` fold it replaces, so results are bit-for-bit the same.
  *
  * Null handling: a null array on either side yields null (standard
  * BinaryExpression null-intolerance); null *elements* contribute 0, which
  * callers must not rely on (embedding vectors are dense).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dot_product requires array<float>/array<double> inputs, " +
          s"got ${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = isFloat(left); val rf = isFloat(right)
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (isFloat(left)) "getFloat" else "getDouble"
    val rGet = if (isFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ((double) $a.$lGet($i)) * ((double) $b.$rGet($i));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Squared L2 distance — same codegen'd tight-loop rationale as
  * [[DotProduct]], same ascending-index double accumulation, so the oracle's
  * sequential `list_inner_product(diff, diff)` reproduces it bit-for-bit.
  * (Computing it as `aa - 2ab + bb` from dot products would be cheaper per
  * pair with precomputed norms but sums in a different order — not
  * oracle-reproducible and numerically worse for near-identical vectors.)
  */
case class L2Distance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"l2_distance requires array<float>/array<double> inputs, " +
          s"got ${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = isFloat(left); val rf = isFloat(right)
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      val d = xv - yv
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (isFloat(left)) "getFloat" else "getDouble"
    val rGet = if (isFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = ((double) $a.$lGet($i)) - ((double) $b.$rGet($i));
         |  $s += $d * $d;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2Distance =
    copy(left = newLeft, right = newRight)
}

/** Random-hyperplane LSH signature: `bits` sign bits of projections onto
  * pseudo-random hyperplanes. The hyperplane coefficient matrix (bits × dim,
  * uniform in [-1,1]) is derived deterministically from `seed` via
  * SplitMix64 at expression construction — so the per-row work is just
  * `bits` dot products in one tight loop, instead of a bits×dim-term
  * expression tree whose codegen alone dominates small scans.
  *
  * Cosine-similar vectors collide with probability (1 - θ/π)^bits.
  * Vectors shorter than `dim` treat missing tail dims as 0.
  */
case class HyperplaneSignature(child: Expression, dim: Int, bits: Int, seed: Long)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(bits >= 1 && bits <= 63, s"bits must be in [1,63], got $bits")

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"hyperplane_signature requires array<float>/array<double>, got ${other.catalogString}")
  }

  @transient private lazy val isFloatArr = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** coefs(b)(d) ∈ [-1,1], SplitMix64-derived — stable across JVMs. */
  @transient private lazy val coefs: Array[Array[Double]] =
    HyperplaneSignature.coefficients(dim, bits, seed)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = math.min(arr.numElements(), dim)
    val v = new Array[Double](n)
    var i = 0
    while (i < n) {
      v(i) = if (isFloatArr) arr.getFloat(i).toDouble else arr.getDouble(i)
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < bits) {
      val row = coefs(b)
      var proj = 0.0
      i = 0
      while (i < n) { proj += v(i) * row(i); i += 1 }
      if (proj > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSignature =
    copy(child = newChild)
}

object HyperplaneSignature {
  /** The hyperplane coefficient matrix: coefs(b)(d) ∈ [-1,1], derived
    * deterministically from (seed, b, d) via SplitMix64. Shared between the
    * expression and the DuckDB differential oracle, which embeds these
    * values as `DOUBLE[]` literals (`Double.toString` round-trips, and
    * DuckDB's decimal parser is correctly rounded, so the literals
    * reconstruct the exact same doubles).
    */
  def coefficients(dim: Int, bits: Int, seed: Long): Array[Array[Double]] = {
    def splitmix(x0: Long): Long = {
      var z = x0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    Array.tabulate(bits, dim) { (b, d) =>
      splitmix(seed * 0x100000001b3L + b.toLong * 0x1000193L + d.toLong).toDouble /
        Long.MaxValue.toDouble
    }
  }
}

object VectorExpressions {
  /** Column-level dot product backed by the codegen'd [[DotProduct]]. */
  def dot_product(a: Column, b: Column): Column =
    GraftBridge.toColumn(
      DotProduct(GraftBridge.toExpression(a), GraftBridge.toExpression(b)))

  /** Squared L2 distance backed by the codegen'd [[L2Distance]]. */
  def l2_distance(a: Column, b: Column): Column =
    GraftBridge.toColumn(
      L2Distance(GraftBridge.toExpression(a), GraftBridge.toExpression(b)))

  /** Random-hyperplane LSH signature (native single-pass evaluation). */
  def hyperplane_signature(vec: Column, dim: Int, bits: Int, seed: Long = 42L): Column =
    GraftBridge.toColumn(
      HyperplaneSignature(GraftBridge.toExpression(vec), dim, bits, seed))
}
