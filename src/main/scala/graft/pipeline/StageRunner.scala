package graft.pipeline

import graft.dq.Checks
import graft.model.{StageJob, ValidationResult, Watermark}
import graft.ops.Relational
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Metadata-driven stage executor — the reference's central loop
  * (`KafkaScript_ConformToStaging.sh:59-324`: fetch job config → compute
  * watermark → skip if empty → bind + run source query → run job → bind +
  * run target query → 4 validations → audit log), re-expressed as one
  * DataFrame program per job.
  *
  * Queries are *data* (the reference stores them as CLOBs in
  * TESTING_QUERIES; `incremental.sh:63-67`): source/target arrive as SQL
  * text executed via `spark.sql` with named parameters standing in for the
  * sed-substituted `$MIN_RUN_ID_CURRENT`-style template variables
  * (`KafkaScript_ConformToStaging.sh:135-139`).
  */
object StageRunner {

  final case class StageOutcome(
      job: StageJob,
      skipped: Boolean,
      watermark: Watermark,
      results: Seq[ValidationResult])

  /** Compute the incremental watermark for a job from the run-control table
    * (`KafkaScript_ConformToStaging.sh:76-121`): new successful runs above
    * the last consumed run id.
    */
  def watermarkFor(control: DataFrame, lastConsumed: Long): Watermark = {
    val row = Relational.watermarkBounds(control, col("jobRunId"),
      lit(lastConsumed), col("jobRunStatus") === 1).head()
    Watermark(row.getLong(0), row.getLong(1))
  }

  /** Run one stage job end-to-end:
    *  1. bind watermark parameters into the stored source/target SQL;
    *  2. skip when the watermark window is empty (`Kafka_3NF.sh:118-121`);
    *  3. execute both queries;
    *  4. run the four standard checks (count / data / duplicate / null) and
    *     optionally the stored NULL_QUERY;
    *  5. return audit rows for an append-mode write (the *_TEST_LOG sinks).
    */
  def runJob(spark: SparkSession, job: StageJob, wm: Watermark): StageOutcome = {
    if (wm.isEmpty)
      return StageOutcome(job, skipped = true, wm, Seq(
        ValidationResult.of(job.jobName, job.stage, "watermark", "skip_if_empty",
          passed = true, "no new data — skipped")))

    val params = Map[String, Any](
      "min_run_id" -> wm.minRunId, "max_run_id" -> wm.maxRunId)
    // Stored texts may be Oracle-dialect verbatim (the reference's CLOBs).
    // Dialect dispatch is TRY-SPARK-FIRST: a text Spark parses and
    // analyzes runs untouched — so a Spark query whose columns happen to
    // be named `sysdate`/`rownum` is never rewritten out from under it —
    // and only a text Spark REJECTS goes through the Oracle shim
    // (dbms_lob.*, SYSDATE, TO_DATE masks, trailing ROWNUM). Migration is
    // drop-in either way, and never lossy for valid Spark SQL.
    // EXCEPTION — pre-scan, not try-first: an Oracle TO_DATE format mask
    // (e.g. 'YYYY-MM-DD') parses AND analyzes fine and fails only at
    // execution (java.time rejects week-based 'Y'), which try-first can
    // never catch; hasOracleDateMask's gate is conservative enough
    // (all-caps + Oracle-distinctive token) that no valid Spark mask
    // trips it.
    def runStored(q0: String): DataFrame = {
      val q = if (OracleDialect.hasOracleDateMask(q0))
        OracleDialect.toSparkSql(q0) else q0
      try spark.sql(q, params)
      catch {
        case e @ (_: org.apache.spark.sql.catalyst.parser.ParseException |
                  _: org.apache.spark.sql.AnalysisException) =>
          val rewritten = OracleDialect.toSparkSql(q)
          if (rewritten == q) throw e // shim had nothing to offer
          spark.sql(rewritten, params)
      }
    }
    val source = runStored(job.sourceQuery)
    val target = runStored(job.targetQuery)

    val standard = Checks.standardStageChecks(spark, source, target,
      job.jobName, job.stage).collect().toSeq

    val nullExtra = job.nullQuery.map { nq =>
      val offenders = runStored(nq).limit(1).count()
      ValidationResult.of(job.jobName, job.stage, "stored_null_query",
        "null_query_probe", offenders == 0,
        if (offenders == 0) "no null offenders" else "stored null query returned rows")
    }

    StageOutcome(job, skipped = false, wm, standard ++ nullExtra)
  }

  /** Run a sequence of jobs (the `;`-split multi-table zip of
    * `Kafka_MultipleTables.sh:167-194`), appending all audit rows to
    * `auditPath` the way every check site inserts into its *_TEST_LOG.
    */
  def runAll(spark: SparkSession, jobs: Seq[StageJob], control: DataFrame,
             lastConsumed: Long, auditPath: Option[String] = None): Seq[StageOutcome] = {
    import spark.implicits._
    val outcomes = jobs.map { j =>
      runJob(spark, j, watermarkFor(control, lastConsumed))
    }
    auditPath.foreach { p =>
      val rows: Dataset[ValidationResult] = outcomes.flatMap(_.results).toDS()
      rows.write.mode("append").parquet(p)
    }
    outcomes
  }

  /** Load stage jobs from the file-based registry format
    * (`query.txt`'s `JOB:SOURCE:TARGET:NULL` rows, read at
    * `FACT_AUTOMATION_FILE.sh:116-132`; `:`-separated, 3rd/4th optional).
    */
  def jobsFromConfig(spark: SparkSession, path: String, stage: String): Seq[StageJob] = {
    spark.read.option("sep", ":").csv(path).collect().toSeq.zipWithIndex.map {
      case (row, i) =>
        StageJob(
          seqNo = i + 1,
          jobName = row.getString(0),
          tableName = row.getString(0),
          stage = stage,
          sourceQuery = row.getString(1),
          targetQuery = row.getString(2),
          nullQuery = if (row.length > 3 && !row.isNullAt(3)) Some(row.getString(3)) else None)
    }
  }
}
