package graft

import java.nio.file.Files

import graft.dq.Checks
import graft.model.{ScdType, StageJob, ValidationResult, Watermark}
import graft.pipeline.{Pipeline, StageRunner}
import graft.streaming.ArrivalJob
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Full EP1 trace (SURVEY §3): Kafka-shaped stream → Arrival (run-
  * partitioned files + offset ledger) → Conform (date/source layout) →
  * Staging (stored-SQL StageRunner with the four checks) → DWDD (SCD Type 1
  * dimension merge) — with the audit log accumulating PASS rows across
  * stages, exactly the reference's validation shape end-to-end.
  */
class EndToEndPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._


  test("arrival → conform → staging → dim, all checks green") {
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("graft_e2e").toString
    val (data, ledger, ckpt, conform, audit) =
      (s"$root/arrival", s"$root/ledger", s"$root/ckpt", s"$root/conform", s"$root/audit")

    // ---- Arrival: two micro-batches of "orders" events ----
    val stream = MemoryStream[KRec]
    stream.addData((0L until 40L).map(o =>
      KRec("orders_topic", (o % 2).toInt, o / 2, s"order_$o|${o % 7}")))
    val q = ArrivalJob.start(stream.toDF(), data, ledger, ckpt)
    q.processAllAvailable(); q.stop()

    val ledgerDf = spark.read.parquet(ledger)
    assert(Checks.offsetContinuity(ledgerDf, "orders_topic").testResult == ValidationResult.PASSED)
    assert(Checks.offsetCountMatch(ledgerDf, 40L, "orders_topic").testResult == ValidationResult.PASSED)

    // ---- Conform: promote run 0 with date/source layout ----
    ArrivalJob.conformRuns(spark, data, conform, Seq(0L))
    val conformed = spark.read.parquet(conform)
    assert(conformed.count() == 40)

    // ---- Staging: stored-SQL job over the conformed layer ----
    // Run ids are 1-based downstream (batchId 0 → run 1): the reference's
    // (0,0) watermark sentinel means "no new data", so 0 is not a run id.
    conformed
      .withColumn("order_id", split(col("value"), "\\|").getItem(0))
      .withColumn("cust_bucket", split(col("value"), "\\|").getItem(1).cast("long"))
      .withColumn("update_job_run_id", col("job_run_id") + 1)
      .createOrReplaceTempView("conform_layer")
    // staging write (what the wrapper job would produce)
    val stagingPath = s"$root/staging"
    Pipeline.writeRun(
      spark.table("conform_layer").select(col("order_id"), col("cust_bucket")),
      stagingPath, runId = 1L)
    spark.read.parquet(stagingPath).createOrReplaceTempView("staging_layer")

    val job = StageJob(1, "conform_to_staging", "staging_layer", "STAGING",
      sourceQuery = "SELECT order_id, cust_bucket FROM conform_layer WHERE update_job_run_id BETWEEN :min_run_id AND :max_run_id",
      targetQuery = "SELECT order_id, cust_bucket FROM staging_layer WHERE create_job_run_id BETWEEN :min_run_id AND :max_run_id",
      nullQuery = Some("SELECT * FROM staging_layer WHERE order_id IS NULL"))
    assert(StageRunner.runJob(spark, job, Watermark(0L, 0L)).skipped)
    val outcome = StageRunner.runJob(spark, job, Watermark(1L, 1L))
    assert(!outcome.skipped)
    assert(outcome.results.forall(_.testResult == ValidationResult.PASSED))
    Seq(outcome).flatMap(_.results).toDS().write.mode("append").parquet(audit)

    // ---- DWDD: Type-1 dimension merge from staging ----
    val current = Seq(("order_0", 99L)).toDF("order_id", "cust_bucket")
    val incoming = spark.table("staging_layer").select(col("order_id"), col("cust_bucket"))
    val dim = Pipeline.applyScd(ScdType.Type1, current, incoming, Seq("order_id"))
    assert(dim.count() == 40) // order_0 upserted, not duplicated
    assert(dim.filter(col("order_id") === "order_0").head().getLong(1) != 99L)

    // ---- audit log accumulated ----
    val logged = spark.read.parquet(audit)
    assert(logged.count() == 5)
    assert(logged.filter(col("testResult") === "PASSED").count() == 5)
  }
}
