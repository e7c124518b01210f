package graft.model

import java.sql.Timestamp

/** Core metadata model of the engine — the reference drives everything from
  * Oracle control tables (FIXTURES.md §A); here they are case classes backed
  * by small DataFrames/parquet so the same metadata-programmed behavior is
  * expressible without a database.
  */

/** One micro-batch run — unit of lineage. Reference: `JOB_PROCESS_CONTROL`
  * rows keyed by JOB_RUN_ID with status/reprocess flags
  * (`KafkaScript_ConformToStaging.sh:77-103`, `rerunnability.sh:84-89`).
  */
final case class JobRun(
    jobRunId: Long,
    jobId: Long,
    jobRunStatus: Int, // 1 = success
    reprocessFlag: Int,
    jobStartDateTime: Timestamp,
    jobEndDateTime: Timestamp,
    targetObjectId: Long)

/** Reference: `JOB_MASTER` (`KafkaDemo.sh:50-54`). */
final case class JobSpec(jobId: Long, jobName: String, jobType: String)

/** Kafka offset ledger row — one per (topic, partition, run).
  * Reference: `kafka_event` (`KafkaDemo.sh:78-84, :202-208`).
  */
final case class OffsetRange(
    topicName: String,
    partition: Int,
    jobRunId: Long,
    fromOffset: Long,
    untilOffset: Long) {
  def recordCount: Long = untilOffset - fromOffset
}

/** Watermark window for incremental extraction: the half-open run-id range
  * not yet consumed downstream. (minRunId, maxRunId) == (0, 0) means "no new
  * data — skip" (`Kafka_3NF.sh:118-121`, `FACT_AUTOMATION.sh:99-101`).
  */
final case class Watermark(minRunId: Long, maxRunId: Long) {
  def isEmpty: Boolean = minRunId == 0L && maxRunId == 0L
}

/** SCD classification per dimension table, from `DIM_mapping_summary.csv`
  * ("Table Type", `rerunnability.sh:47-50`); drives the rerun/merge strategy
  * dispatch (`rerunnability.sh:64-77`).
  */
sealed trait ScdType
object ScdType {
  case object Static extends ScdType
  case object Type1 extends ScdType
  case object Type2 extends ScdType
  case object Fact extends ScdType
  case object DailyAggregate extends ScdType

  def parse(s: String): ScdType = s.trim.toLowerCase match {
    case "static"          => Static
    case "type 1" | "type1" => Type1
    case "type 2" | "type2" => Type2
    case "fact"            => Fact
    case "dagg" | "daily aggregate" => DailyAggregate
    case other => throw new IllegalArgumentException(s"unknown SCD type: $other")
  }
}

/** Audit-log row appended by every validation — mirrors the three *_TEST_LOG
  * sinks (`KafkaDemo.sh:133-143` HADOOP_TOPIC_TEST_LOG,
  * `KafkaScript_ConformToStaging.sh:155-159` process_owner_test_log,
  * `Fact_Dagg_automation_table.sh:104-107` DIM_FACTS_TEST_LOG).
  */
final case class ValidationResult(
    sourceName: String,
    stage: String,
    testCase: String,
    stepName: String,
    testResult: String, // PASSED | FAILED | INFO
    comments: String,
    executeDate: Timestamp)

object ValidationResult {
  val PASSED = "PASSED"
  val FAILED = "FAILED"
  val INFO = "INFO"

  def of(source: String, stage: String, testCase: String, step: String,
         passed: Boolean, comments: String): ValidationResult =
    ValidationResult(source, stage, testCase, step,
      if (passed) PASSED else FAILED, comments,
      new Timestamp(System.currentTimeMillis()))
}

/** Per-stage job config — flattened from TESTING_CONFIG / TESTING_JOBS /
  * TESTING_QUERIES (FIXTURES.md §A): queries are *data*; source/target are
  * either SQL text (run via spark.sql) or named DataFrame builders.
  */
final case class StageJob(
    seqNo: Int,
    jobName: String,
    tableName: String,
    stage: String, // PROCESS | CONFORM | STAGING | 3NF | DWDD
    sourceQuery: String,
    targetQuery: String,
    nullQuery: Option[String])

/** The data-loss seam-kind vocabulary shared by the connectors that EMIT
  * seams (the stub broker today; a real connector's WARN-log parser on a
  * cluster) and the audits that CONSUME them
  * ([[graft.dq.Checks.offsetContinuityWithSeams]]) — in the model layer
  * so the production check never depends on a test double for its
  * contract. Broker-side kinds describe records the broker really dropped
  * and may explain a ledger gap; caller-side kinds describe a
  * mis-specified read window (`until` past the high-water mark, or a
  * start past the end — the latter also covers topic-recreated, which an
  * emitter cannot distinguish from a caller bug at record time, so it is
  * classified conservatively: a recreated topic's gap stays an audit FAIL
  * rather than being laundered into a PASS).
  */
object SeamKinds {
  val TrimmedHead = "trimmed_head"
  val EndBeyondLatest = "end_beyond_latest"
  val StartBeyondEnd = "start_beyond_end"
  val DeletedPartition = "deleted_partition"
  val brokerSideKinds: Set[String] = Set(TrimmedHead, DeletedPartition)
  val callerSideKinds: Set[String] = Set(EndBeyondLatest, StartBeyondEnd)
}
