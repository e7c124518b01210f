package graft

import java.nio.file.Files

import graft.pipeline.RunControl
import graft.sources.Bucketing
import org.scalatest.funsuite.AnyFunSuite

class RunControlBucketingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("run-control lifecycle: register → success → reprocess flag → latest") {
    val path = Files.createTempDirectory("graft_ctl").toString + "/control"
    RunControl.registerRun(spark, path, runId = 1L, jobId = 10L, targetObjectId = 7L)
    RunControl.markStatus(spark, path, 1L, status = 1)
    RunControl.registerRun(spark, path, runId = 2L, jobId = 10L, targetObjectId = 7L)
    RunControl.markStatus(spark, path, 2L, status = 1)
    RunControl.registerRun(spark, path, runId = 3L, jobId = 10L, targetObjectId = 7L)
    // run 3 still status 0 → not a candidate
    assert(RunControl.latestSuccessfulRun(spark, path, 10L).contains(2L))
    RunControl.flagReprocess(spark, path, 1L)
    val rep = RunControl.runsToReprocess(spark, path).collect()
    assert(rep.length == 1 && rep.head.getAs[Long]("jobRunId") == 1L)
    // other rows untouched by the in-place updates
    val all = spark.read.parquet(path)
    assert(all.count() == 3)
    assert(all.filter($"jobRunStatus" === 1).count() == 2)
  }

  test("bucketed join on the bucket key plans without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS b_fact")
    spark.sql("DROP TABLE IF EXISTS b_dim")
    // the derby metastore is per-JVM but warehouse dirs persist across
    // forked runs — clear stale locations or saveAsTable refuses
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    Seq("b_fact", "b_dim").foreach { t =>
      fs.delete(new org.apache.hadoop.fs.Path(s"spark-warehouse/$t"), true)
    }
    val fact = (1L to 1000L).map(i => (i % 50, s"p$i")).toDF("k", "payload")
    val other = (1L to 500L).map(i => (i % 50, i)).toDF("k", "v")
    Bucketing.writeBucketed(fact, "b_fact", "k", numBuckets = 8, sortCol = Some("k"))
    Bucketing.writeBucketed(other, "b_dim", "k", numBuckets = 8, sortCol = Some("k"))
    val joined = Bucketing.table(spark, "b_fact")
      .join(Bucketing.table(spark, "b_dim"), "k")
    assert(Bucketing.isShuffleFree(joined),
      s"expected no Exchange:\n${joined.queryExecution.sparkPlan}")
    // and the join result is correct
    assert(joined.count() == 1000L * 10) // each k has 20 fact × 10 dim rows / 50 keys
  }
}
