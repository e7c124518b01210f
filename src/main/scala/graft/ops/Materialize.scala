package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Stage-boundary materialization primitives (r20).
  *
  * The engine's iterative operators (connected components, k-core,
  * PageRank) and multi-consumer stage boundaries all need "compute this
  * frame ONCE, truncate lineage, let N consumers read it". The original
  * mechanism — `Dataset.checkpoint(eager = true)` against a reliable
  * checkpoint dir — computes every frame TWICE: the eager count
  * materializes the lineage, then `ReliableRDDCheckpointData` re-runs the
  * same lineage in a second job to write the files. A parquet write +
  * read-back computes once, truncates lineage just the same, and is
  * exactly as restart-/executor-loss-safe when the directory is shared
  * storage (the cluster configuration); and because the write is a SQL
  * action, an `observe()` on the frame rides the SAME job — iterative
  * convergence probes stop being their own driver round-trips.
  *
  * File lifetime: every target lives under a per-call UUID directory
  * registered with the filesystem's delete-on-exit hook; loop callers
  * additionally [[Seam.drop]] rounds as they stop being referenced. This
  * matches the old checkpoint files' GC-scoped lifetime (they too lived
  * until the ContextCleaner collected them).
  */
object Materialize {

  /** One materialization scope (≈ one operator invocation): a UUID dir
    * under `checkpointDir` (or the JVM tmpdir when None, the local-mode
    * fast path — note even then parquet is used, not `localCheckpoint`:
    * single-compute and observable beat executor-block storage on every
    * measured shape).
    */
  final class Seam(spark: SparkSession, checkpointDir: Option[String]) {
    private val runDir =
      s"${checkpointDir.getOrElse(sys.props("java.io.tmpdir"))}/" +
        s"graft-seam-${java.util.UUID.randomUUID().toString.take(12)}"
    private val hPath = new org.apache.hadoop.fs.Path(runDir)
    private val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.deleteOnExit(hPath)

    /** Materialize `df` (one job), return the lineage-cut read-back. */
    def mat(df: DataFrame, step: String): DataFrame = {
      val p = s"$runDir/$step"
      df.write.mode("overwrite").parquet(p)
      spark.read.parquet(p)
    }

    /** [[mat]] plus one aggregate metric collected ON the write job via
      * `observe` — no separate probe action. `metric` must be an
      * aggregate expression over the frame (e.g. `count(when(...))`).
      */
    def matCounted(df: DataFrame, metric: Column, step: String): (DataFrame, Long) = {
      val obs = org.apache.spark.sql.Observation()
      val p = s"$runDir/$step"
      df.observe(obs, metric.as("m")).write.mode("overwrite").parquet(p)
      (spark.read.parquet(p), obs.get("m").asInstanceOf[Long])
    }

    /** Free a step whose files no longer feed anything live. */
    def drop(step: String): Unit =
      fs.delete(new org.apache.hadoop.fs.Path(s"$runDir/$step"), true)
  }

  def seam(spark: SparkSession, checkpointDir: Option[String]): Seam =
    new Seam(spark, checkpointDir)

  /** Single-shot materialization: compute once, truncate lineage.
    * Reliable when `checkpointDir` is shared storage; tmpdir otherwise.
    */
  def once(df: DataFrame, checkpointDir: Option[String]): DataFrame =
    seam(df.sparkSession, checkpointDir).mat(df, "m")
}
