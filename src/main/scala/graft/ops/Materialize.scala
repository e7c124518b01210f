package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Stage-boundary materialization primitives (r20).
  *
  * The engine's iterative operators (connected components, k-core,
  * PageRank) and multi-consumer stage boundaries all need "compute this
  * frame ONCE, truncate lineage, let N consumers read it". Two mechanisms,
  * with MEASURED domains (r20 interleaved A/Bs):
  *
  *  - [[Seam.mat]] — parquet write + read-back. `checkpoint(eager=true)`
  *    against a reliable dir computes its frame TWICE (the eager count
  *    materializes the lineage, then ReliableRDDCheckpointData re-runs it
  *    to write the files), so for an EXPENSIVE derived pipeline (LM
  *    scoring, tokenize+minhash, shingling) the round-trip — one compute,
  *    ~0.2 s flat write-job overhead (SeamProbe) — wins at every scale.
  *    Because the write is a SQL action, `observe()` rides the same job
  *    for free counts.
  *  - [[Seam.cut]] — eager checkpoint. A LOOP ROUND's lineage is cheap by
  *    construction (it reads the previous round's materialized frame), so
  *    the double-compute costs ~nothing while parquet's flat write
  *    overhead would be paid every round: at sf0.1 the checkpoint leg of
  *    the interleaved A/B beat the parquet leg across the whole CC/kCore/
  *    PageRank family (e.g. q60 1.40 s vs 1.71 s, q199 2.8–3.5 s vs
  *    3.9–4.1 s).
  *
  * `spark.graft.seam.impl=parquet|checkpoint` force-overrides both
  * directions — the bisection/scale-rehearsal knob (a 100 TB round whose
  * re-compute is no longer cheap can flip cuts to parquet without a code
  * change).
  *
  * File lifetime (parquet side): targets live under a per-call UUID dir
  * registered with the filesystem's delete-on-exit hook; loop callers
  * additionally [[Seam.drop]] rounds as they stop being referenced. This
  * matches the old checkpoint files' GC-scoped lifetime.
  */
object Materialize {

  final class Seam(spark: SparkSession, checkpointDir: Option[String]) {
    private val runDir =
      s"${checkpointDir.getOrElse(sys.props("java.io.tmpdir"))}/" +
        s"graft-seam-${java.util.UUID.randomUUID().toString.take(12)}"
    private val hPath = new org.apache.hadoop.fs.Path(runDir)
    private val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.deleteOnExit(hPath)
    private val impl = spark.conf.getOption("spark.graft.seam.impl")
    private def forceCheckpoint = impl.contains("checkpoint")
    private def forceParquet = impl.contains("parquet")

    private def ckpt(df: DataFrame): DataFrame = {
      checkpointDir.foreach { dir =>
        val sc = spark.sparkContext
        if (!sc.getCheckpointDir.exists(_.contains(dir))) sc.setCheckpointDir(dir)
      }
      if (checkpointDir.isDefined) df.checkpoint(eager = true)
      else df.localCheckpoint(eager = true)
    }

    private def pq(df: DataFrame, step: String): DataFrame = {
      val p = s"$runDir/$step"
      df.write.mode("overwrite").parquet(p)
      spark.read.parquet(p)
    }

    /** Materialize an EXPENSIVE-lineage frame once (parquet round-trip;
      * see class doc for the measured rationale).
      */
    def mat(df: DataFrame, step: String): DataFrame =
      if (forceCheckpoint) ckpt(df) else pq(df, step)

    /** [[mat]] plus one aggregate metric riding the write job via
      * `observe`. `metric` must be an aggregate over the frame.
      */
    def matCounted(df: DataFrame, metric: Column, step: String): (DataFrame, Long) =
      if (forceCheckpoint) {
        val cut = ckpt(df)
        (cut, cut.agg(metric.as("m")).head().getLong(0))
      } else {
        val obs = org.apache.spark.sql.Observation()
        val p = s"$runDir/$step"
        df.observe(obs, metric.as("m")).write.mode("overwrite").parquet(p)
        (spark.read.parquet(p), obs.get("m").asInstanceOf[Long])
      }

    /** Cut a LOOP-ROUND frame (cheap lineage — eager checkpoint; see
      * class doc).
      */
    def cut(df: DataFrame, step: String): DataFrame =
      if (forceParquet) pq(df, step) else ckpt(df)

    /** [[cut]] plus an aggregate metric (one probe job on the cut frame
      * in checkpoint mode; free via observe in parquet mode).
      */
    def cutCounted(df: DataFrame, metric: Column, step: String): (DataFrame, Long) =
      if (forceParquet) matCounted(df, metric, step)
      else {
        val c = ckpt(df)
        (c, c.agg(metric.as("m")).head().getLong(0))
      }

    /** Free a parquet step whose files no longer feed anything live
      * (no-op for checkpoint-mode steps — the ContextCleaner owns those).
      */
    def drop(step: String): Unit =
      fs.delete(new org.apache.hadoop.fs.Path(s"$runDir/$step"), true)
  }

  def seam(spark: SparkSession, checkpointDir: Option[String]): Seam =
    new Seam(spark, checkpointDir)

  /** Single-shot materialization of an expensive-lineage frame: compute
    * once, truncate lineage. Reliable when `checkpointDir` is shared
    * storage; tmpdir otherwise.
    */
  def once(df: DataFrame, checkpointDir: Option[String]): DataFrame =
    seam(df.sparkSession, checkpointDir).mat(df, "m")
}
