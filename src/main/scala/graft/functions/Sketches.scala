package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Mergeable sketch aggregators — the typed-`Aggregator` (UDAF) member of
  * the sketch suite. q147 builds KMV sketches with a sharded top-k; this is
  * the same sketch as ONE custom aggregate: partial sketches form on every
  * input partition (map-side combine), `merge` unions them, and the result
  * column drops straight into batch groupBy OR a watermarked streaming
  * window — the form an always-on distinct-rate monitor actually deploys
  * (per-key distinct state bounded at k longs per group, never a distinct
  * set).
  *
  * The hash space is 48-bit md5 prefixes (callers hash with
  * [[kmvHash48]]), identical to q147, so estimates replay in plain SQL:
  * D̂ = (k−1)·2⁴⁸ DIV h_k for a full sketch, and a sketch with fewer than
  * k values IS its exact distinct set.
  */
object Sketches {

  val DefaultK = 64

  /** 48-bit md5-prefix hash of any key — the engine-portable hash family
    * every KMV sketch in this repo uses (12 hex chars ↔ DuckDB
    * `('0x' || substr(md5(x), 1, 12))::BIGINT`).
    */
  def kmvHash48(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 12), 16, 10).cast("long")

  /** Bottom-k distinct sketch: the buffer is the sorted ascending list of
    * the at-most-k smallest distinct hashes seen. `reduce` is O(k) per row
    * against a k≤256 buffer (the common-case rejection — value above the
    * current kth — is one comparison); `merge` is a sorted-distinct union
    * capped at k. Commutative + idempotent on duplicates, so the result is
    * partitioning-invariant (PropertySpec pins this).
    */
  class KmvAggregator(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]]
      with Serializable {
    override def zero: Seq[Long] = Vector.empty

    override def reduce(b: Seq[Long], h: Long): Seq[Long] =
      if (b.length >= k && h >= b.last) b
      else if (b.contains(h)) b
      else {
        val m = (b :+ h).sorted
        if (m.length > k) m.take(k) else m
      }

    override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] = {
      val m = (a ++ b).distinct.sorted
      if (m.length > k) m.take(k) else m
    }

    override def finish(r: Seq[Long]): Seq[Long] = r
    override def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
  }

  /** The sketch as an aggregate column over pre-hashed 48-bit values. */
  def kmvSketch(hash48: Column, k: Int = DefaultK): Column =
    udaf(new KmvAggregator(k)).apply(hash48)

  /** Distinct estimate from a sketch column (array<long>, ascending), by
    * NAME (integer DIV arithmetic needs the SQL form). Exact below k.
    */
  def kmvEstimate(sketchCol: String, k: Int = DefaultK): Column = {
    val num = (k - 1).toLong * (1L << 48)
    expr(s"CASE WHEN size($sketchCol) < $k THEN cast(size($sketchCol) as long) " +
      s"ELSE ${num}L DIV greatest(try_element_at($sketchCol, $k), 1L) END")
  }
}
