package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off r20 profiling probe for the connected-components family:
  * times the minhash candidate pipeline and each CC phase separately at
  * the bench scale, and reports the round count actually run.
  * Usage: `runMain graft.tools.CcProbe [sfDir]`.
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.graft.checkpoint.dir",
        s"${sys.props("java.io.tmpdir")}/graft-ckpt-bench")
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Logs.quietBoundedWindowWarnings()
    val ckpt = spark.conf.getOption("spark.graft.checkpoint.dir")
    def time[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime(); val r = body
      println(f"  $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    (1 to 3).foreach { rep =>
      println(s"== rep $rep")
      val docs = graft.sources.Tables.load(spark, sfDir, "documents")
      val pairs = time("minHashCandidates build+mat") {
        val p = graft.functions.Dedup.minHashCandidates(
          docs, col("doc_id"), col("text"), shingleK = 3, bands = 2, rowsPerBand = 2)
        p.write.format("noop").mode("overwrite").save(); p
      }
      val (labels, rounds) = time("connectedComponentsIterated") {
        graft.functions.Dedup.connectedComponentsIterated(pairs, 10, ckpt)
      }
      time("labels noop") {
        labels.write.format("noop").mode("overwrite").save()
      }
      println(s"  rounds=$rounds")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    spark.stop()
  }
}
