package graft.functions

import graft.plans.VectorExpressions.l2_distance
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Symmetric int8 scalar quantization of an embedding column — the
  * embedding-storage scale path next to PQ ([[Pq]]): where PQ trades recall
  * for a 32× compression, int8 keeps per-dimension resolution at 4× (one
  * byte per dimension) and distances stay computable on the codes. At
  * 100 TB of vector data the quantized table is what downstream similarity
  * scans read; the float vectors are written once and cold.
  *
  * Determinism + cross-engine parity: the scale is the corpus max |x|
  * (max is order-independent, so the distributed aggregate is exact);
  * rounding is `floor(x/s·127 + 0.5)` — round-half-up, identical IEEE op
  * sequence in both engines (DuckDB/Spark `round` disagree on ties, floor
  * does not); reconstruction error is the sequential diff² accumulation of
  * [[graft.plans.L2Distance]], reproduced by `list_inner_product` in SQL.
  */
object Quant {

  /** Corpus-wide symmetric scale: max |component|. One aggregate; the
    * single scalar is legitimately driver-side (it is the model).
    */
  def fitScale(corpus: DataFrame, vecCol: Column): Double =
    corpus
      .select(array_max(transform(vecCol.cast("array<double>"),
        x => abs(x))).as("m"))
      .agg(max(col("m")))
      .head().getDouble(0)

  /** Int8 code array: floor(x/s·127 + 0.5) per component. |x| ≤ s puts
    * codes in [-127, 127] with no clamp (floor(-127 + 0.5) = -127).
    */
  def encode(vecCol: Column, scale: Double): Column =
    transform(vecCol.cast("array<double>"),
      x => floor(x / lit(scale) * lit(127.0) + lit(0.5)).cast("int"))

  /** Dequantized vector: c·s/127 per component, as array<double>. */
  def decode(codesCol: Column, scale: Double): Column =
    transform(codesCol, c => c.cast("double") * lit(scale) / lit(127.0))

  /** Squared-L2 reconstruction error of a vector against its own
    * quantize→dequantize round trip (ascending-index accumulation).
    */
  def reconstructionError(vecCol: Column, scale: Double): Column =
    l2_distance(vecCol.cast("array<double>"),
      decode(encode(vecCol, scale), scale))
}
