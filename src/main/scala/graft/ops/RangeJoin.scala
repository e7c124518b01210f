package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded range join: pairs (l, r) in the same key group with
  * `r.time ∈ [l.time - window, l.time]`.
  *
  * A naive inequality join plans as a nested-loop (O(n·m) per key — fatal
  * at stream volumes). Binning both sides into `window`-sized buckets and
  * exploding the left row into its two candidate buckets turns it into an
  * equi-join on (key, bucket) + an exact residual filter: every matching
  * pair shares a bucket (r.time lies in the same or previous bucket of
  * l.time), so the result is exact while the shuffle is a plain hash
  * exchange. Cost: 2× left row replication, O(per-bucket product) local
  * work.
  */
object RangeJoin {

  /** @param left      probe rows (each output row descends from one left row)
    * @param right     candidate rows
    * @param key       equi-key column on both sides
    * @param leftTime  numeric time column on left
    * @param rightTime numeric time column on right
    * @param window    inclusive lookback: match when 0 <= lt - rt <= window
    */
  def joinRange(left: DataFrame, right: DataFrame, key: String,
                leftTime: String, rightTime: String, window: Long): DataFrame = {
    require(window > 0, "window must be positive")
    // integer `div` (not `/`): double division loses exactness on epoch-nano
    // magnitudes, which would misbucket boundary rows
    val lb = left.withColumn("__bucket",
      explode(array(expr(s"$leftTime div $window") - 1, expr(s"$leftTime div $window"))))
    val rb = right.withColumn("__bucket", expr(s"$rightTime div $window"))
    lb.join(rb, Seq(key, "__bucket"))
      .filter((col(leftTime) - col(rightTime)).between(0, window))
      .drop("__bucket")
  }
}
