package graft.pipeline

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Parquet-backed run-control state table — the reference's
  * `JOB_PROCESS_CONTROL` (FIXTURES.md §A): one row per run with status and
  * reprocess flag, plus the UPDATE operations the harness performs against
  * it (`rerunnability.sh:84-89` `SET REPROCESS_FLAG=1`,
  * job-status gating `KafkaDemo.sh:160-171`).
  *
  * Updates are read → transform → write-to-temp → atomic-ish swap: the
  * control table is metadata-sized (rows = runs, not data volume), so a full
  * rewrite per update is cheap at any scale; the swap keeps readers from
  * seeing a half-written table. (On a real deployment this table is the
  * first candidate for an ACID format with MERGE/UPDATE — the call sites
  * here are format-agnostic.)
  */
object RunControl {

  private val schemaCols = Seq("jobRunId", "jobId", "jobRunStatus",
    "reprocessFlag", "jobStartDateTime", "jobEndDateTime", "targetObjectId")

  def registerRun(spark: SparkSession, path: String, runId: Long, jobId: Long,
                  targetObjectId: Long): Unit = {
    import spark.implicits._
    Seq((runId, jobId, 0, 0, new java.sql.Timestamp(System.currentTimeMillis()),
        null.asInstanceOf[java.sql.Timestamp], targetObjectId))
      .toDF(schemaCols: _*)
      .write.mode(SaveMode.Append).parquet(path)
  }

  /** Job-status gating update: mark a run finished (1=success, 2=failed). */
  def markStatus(spark: SparkSession, path: String, runId: Long, status: Int): Unit =
    rewrite(spark, path) { df =>
      df.withColumn("jobRunStatus",
          when(col("jobRunId") === runId, lit(status)).otherwise(col("jobRunStatus")))
        .withColumn("jobEndDateTime",
          when(col("jobRunId") === runId, current_timestamp()).otherwise(col("jobEndDateTime")))
    }

  /** The rerunnability trigger: UPDATE ... SET REPROCESS_FLAG=1. */
  def flagReprocess(spark: SparkSession, path: String, runId: Long): Unit =
    rewrite(spark, path) { df =>
      df.withColumn("reprocessFlag",
        when(col("jobRunId") === runId, lit(1)).otherwise(col("reprocessFlag")))
    }

  /** Latest successful run per job — the ROW_NUMBER rank-latest pattern
    * (`KafkaDemo.sh:64-71`).
    */
  def latestSuccessfulRun(spark: SparkSession, path: String, jobId: Long): Option[Long] = {
    val w = Window.partitionBy(col("jobId"))
      .orderBy(col("jobEndDateTime").desc, col("jobRunId").desc)
    spark.read.parquet(path)
      .filter(col("jobId") === jobId && col("jobRunStatus") === 1)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("jobRunId"))
      .collect().headOption.map(_.getLong(0))
  }

  def runsToReprocess(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).filter(col("reprocessFlag") === 1)

  private def rewrite(spark: SparkSession, path: String)(f: DataFrame => DataFrame): Unit = {
    val tmp = path + ".tmp"
    f(spark.read.parquet(path)).write.mode(SaveMode.Overwrite).parquet(tmp)
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dst = new Path(path)
    val bak = new Path(path + ".bak")
    fs.rename(dst, bak)
    fs.rename(new Path(tmp), dst)
    fs.delete(bak, true)
  }
}
