package graft.functions

import graft.plans.KmeansExpressions.nearest_centroid
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distributed Lloyd k-means over an embedding column — the semantic
  * clustering primitive of the curation stack (topic balancing, cluster
  * sampling, semantic dedup blocking, IVF centroid refinement all consume
  * it). Reference analogue: the config-driven grouping/profiling stages
  * the harness validates per table (`Fact_Dagg_automation.sh:25-43` groups
  * and reconciles per-dimension aggregates); the clustering itself is the
  * engine-side extension the LLM-data pipeline needs.
  *
  * Shape at scale: each Lloyd iteration is ONE corpus scan. Assignment is
  * a pure projection ([[graft.plans.NearestCentroid]] carries the k×dim
  * centroid table as an expression constant — no join, no shuffle of the
  * corpus), and the mean update aggregates k×dim partial rows per
  * partition (map-side combine; the shuffle moves k·dim·partitions tiny
  * rows, never vectors). The corpus is never collected, never
  * re-partitioned, and read column-pruned (id + vector only).
  *
  * Determinism + cross-engine parity: initial centroids are the first k
  * vectors in md5 hash-bucket order (the repo-wide sampling discipline —
  * append-stable, distribution-agnostic, plain SQL); mean updates
  * accumulate `floor(x·1e9)` as DECIMAL — exact integer sums are
  * order-independent, so the distributed partial aggregation is
  * reproducible bit-for-bit by any engine, unlike a floating sum whose
  * value depends on accumulation order. The 1e-9 quantum costs nothing at
  * embedding magnitude (~1e-2) and buys a differential oracle for the
  * whole iteration chain. Distances are sequential diff² accumulation
  * (ascending index), ties to the lowest centroid index.
  */
object Kmeans {

  /** Fixed-point quantum for order-independent mean accumulation. */
  val Scale = 1e9

  final case class Model(k: Int, dim: Int, iters: Int, cents: Array[Array[Double]])

  /** One Lloyd mean update is reconstructed from (cluster, j) → (Σ
    * floor(x·1e9), n) exactly as the SQL oracle does:
    * `CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 1e9`.
    */
  private def meanOf(s: java.math.BigDecimal, n: Long): Double =
    s.doubleValue() / n.toDouble / Scale

  /** Fit `k` centroids with `iters` Lloyd iterations. The only driver-side
    * data is the model itself (k×dim doubles) and the k×dim-row mean
    * update — both O(k·dim), independent of corpus size. Clusters that
    * receive no points keep their previous centroid (mirrored by the
    * oracle's COALESCE).
    */
  def fit(corpus: DataFrame, idCol: Column, vecCol: Column,
          k: Int, iters: Int): Model = {
    val v = vecCol.cast("array<double>")
    val seed = corpus
      .select(idCol.as("__km_id"), v.as("v"))
      .orderBy(Sampling.hashBucket(col("__km_id"), 1 << 30), col("__km_id"))
      .limit(k)
      .select(col("v"))
      .collect()
      .map(_.getSeq[Double](0).toArray)
    require(seed.length == k, s"corpus has only ${seed.length} rows, need $k")
    val dim = seed.head.length
    var cents = seed
    for (_ <- 1 to iters) {
      // Two projections so the assignment expression runs once per ROW in
      // the project below the Generate, not once per exploded element.
      val updates = corpus
        .select(nearest_centroid(v, cents).getField("cluster").as("cluster"),
          v.as("__v"))
        .select(col("cluster"), posexplode(col("__v")).as(Seq("j", "x")))
        .groupBy(col("cluster"), col("j"))
        .agg(sum(floor(col("x") * lit(Scale)).cast(DecimalType(38, 0))).as("s"),
          count(lit(1)).as("n"))
        .collect()
      val next = cents.map(_.clone())
      updates.foreach { r =>
        next(r.getInt(0))(r.getInt(1)) = meanOf(r.getDecimal(2), r.getLong(3))
      }
      cents = next
    }
    Model(k, dim, iters, cents)
  }

  /** Per-row assignment under a fitted model: (vec_id, cluster, dist) —
    * a pure projection, composable with any downstream grouping.
    */
  def assign(df: DataFrame, idCol: Column, vecCol: Column, model: Model): DataFrame =
    df.select(idCol.as("vec_id"),
        nearest_centroid(vecCol.cast("array<double>"), model.cents).as("nc"))
      .select(col("vec_id"),
        col("nc").getField("cluster").as("cluster"),
        col("nc").getField("dist").as("dist"))

  /** Cluster sizes + inertia (Σ dist² to the own centroid), inertia
    * accumulated through the same fixed-point quantum so it is
    * order-independent and oracle-reproducible.
    */
  def clusterProfile(df: DataFrame, idCol: Column, vecCol: Column,
                     model: Model): DataFrame =
    assign(df, idCol, vecCol, model)
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_vecs"),
        (sum(floor(col("dist") * lit(Scale)).cast(DecimalType(38, 0)))
          .cast("double") / lit(Scale)).as("inertia"))

  /** Majority-label purity per cluster — the label-agreement diagnostic a
    * curation pipeline runs when clusters should track a known facet
    * (language, source, topic). Ties break to the lowest label.
    */
  def purity(assigned: DataFrame, labeled: DataFrame, labelCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = assigned.join(labeled, "vec_id")
      .groupBy(col("cluster"), labelCol.as("label"))
      .agg(count(lit(1)).as("top_n"))
    val w = Window.partitionBy(col("cluster"))
    counts
      .withColumn("n_vecs", sum(col("top_n")).over(w))
      .withColumn("r", row_number().over(
        w.orderBy(col("top_n").desc, col("label").asc)))
      .filter(col("r") === 1)
      .select(col("cluster"), col("n_vecs"), col("label").as("top_label"),
        col("top_n"))
  }
}
