package graft.pipeline

import graft.model.{ScdType, Watermark}
import graft.ops.AsOf
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Stage orchestration: Arrival → Conform → Staging → 3NF → DWDD as
  * sequential DataFrame writes with run-id lineage, replacing the reference's
  * shell driver (`Insights_Kafka_ArrivalTo3NF.sh`) and its per-stage wrapper
  * spawns.
  *
  * Layer tables are parquet directories partitioned by `create_job_run_id`,
  * which makes three things cheap at 100 TB:
  *  - incremental reads: the watermark filter becomes partition pruning
  *    (zero data read outside the run window);
  *  - rerunnability: reprocessing a run is a dynamic partition overwrite of
  *    exactly that run's partition (`rerunnability.sh:97-131`'s
  *    delete-before-insert, without a delete);
  *  - audit: `create_job_run_id`/`update_job_run_id` stamps reproduce the
  *    reference's lineage columns (`query.txt:2`).
  */
object Pipeline {

  val RunIdCol = "create_job_run_id"
  val UpdateRunIdCol = "update_job_run_id"

  /** Stamp lineage columns on a batch (`rerunnability.sh:101, :110`). */
  def withRunId(df: DataFrame, runId: Long): DataFrame =
    df.withColumn(RunIdCol, lit(runId))
      .withColumn(UpdateRunIdCol, lit(runId))
      .withColumn("create_date_time", current_timestamp())

  /** Incremental read of a layer table for a watermark window — partition
    * pruning does the work when the table is partitioned by run id.
    */
  def readIncrement(spark: SparkSession, path: String, wm: Watermark): DataFrame = {
    val df = spark.read.parquet(path)
    if (wm.isEmpty) df.limit(0)
    else df.filter(col(UpdateRunIdCol).between(wm.minRunId, wm.maxRunId))
  }

  /** Write one run's output. Dynamic partition overwrite on the run-id
    * partition = idempotent reprocess: writing runId twice leaves exactly
    * one copy (the reference's REPROCESS_FLAG + delete-then-insert,
    * `rerunnability.sh:84-131`).
    */
  def writeRun(df: DataFrame, path: String, runId: Long): Unit =
    withRunId(df, runId)
      .write
      .mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(RunIdCol)
      .parquet(path)

  /** SCD-typed dimension merge, dispatched per table type the way
    * `rerunnability.sh:64-77` dispatches on `DIM_mapping_summary.csv`:
    *
    *  - Static: target untouched unless empty (initial load only);
    *  - Type 1: upsert — latest incoming row per business key overwrites;
    *  - Type 2: history — close the current row (record_status '0') and
    *    append the new version with record_status '1';
    *  - Fact / DailyAggregate: append-only by run partition (rerun handled by
    *    partition overwrite in [[writeRun]]).
    *
    * Pure DataFrame→DataFrame so it is testable without a table format;
    * `applyScd(current, incoming)` returns the new full state of the
    * dimension. At scale the same logic runs as a MERGE against an ACID
    * table format; the plan shape (join on business key) is identical.
    */
  def applyScd(scd: ScdType, current: DataFrame, incoming: DataFrame,
               businessKey: Seq[String]): DataFrame = scd match {
    case ScdType.Static =>
      if (current.isEmpty) incoming else current
    case ScdType.Type1 =>
      // Overwrite matched keys, keep unmatched current rows.
      val keyCols = businessKey.map(col)
      current.join(incoming.select(keyCols: _*), businessKey, "left_anti")
        .unionByName(incoming)
    case ScdType.Type2 =>
      val matched = current
        .join(incoming.select(businessKey.map(col): _*), businessKey, "left_semi")
        .withColumn("record_status", lit("0"))
      val unmatched = current
        .join(incoming.select(businessKey.map(col): _*), businessKey, "left_anti")
      unmatched.unionByName(matched)
        .unionByName(incoming.withColumn("record_status", lit("1")))
    case ScdType.Fact | ScdType.DailyAggregate =>
      current.unionByName(incoming)
  }

  /** Stamp a first-load batch with SCD2 validity columns: open version,
    * effective from `effectiveAt`, no end date (the reference dims carry
    * `PRODUCT_OFFERING_START_DATE`/`END_DATE` — `query.txt:1`).
    */
  def scd2Init(incoming: DataFrame, effectiveAt: Column): DataFrame =
    incoming
      .withColumn("record_status", lit("1"))
      .withColumn("effective_from", effectiveAt)
      .withColumn("effective_to", lit(null).cast("timestamp"))

  /** SCD Type 2 merge WITH effective dates: close the open version of each
    * matched business key (record_status '0', effective_to = `effectiveAt`)
    * and append the incoming rows as the new open version (effective_from =
    * `effectiveAt`). Historical (already-closed) rows pass through
    * untouched, so the full version chain supports point-in-time reads via
    * [[lookupAsOf]].
    *
    * `current` must carry the validity columns (first load via [[scd2Init]]).
    * Pass a literal timestamp for `effectiveAt` to keep reruns deterministic
    * (the run's watermark time, not current_timestamp()).
    */
  def applyScd2Dated(current: DataFrame, incoming: DataFrame,
                     businessKey: Seq[String], effectiveAt: Column): DataFrame = {
    val incomingKeys = incoming.select(businessKey.map(col): _*).distinct()
    val open = current.filter(col("record_status") === "1")
    val history = current.filter(col("record_status") =!= "1")
    val closedNow = open.join(incomingKeys, businessKey, "left_semi")
      .withColumn("record_status", lit("0"))
      .withColumn("effective_to", effectiveAt)
    val stillOpen = open.join(incomingKeys, businessKey, "left_anti")
    history
      .unionByName(closedNow)
      .unionByName(stillOpen)
      .unionByName(scd2Init(incoming, effectiveAt))
  }

  /** Point-in-time dimension read: each fact row enriched with the dim
    * version in effect at the fact's event time — the as-of join on
    * `effective_from` over the full version chain (closed versions
    * included), composing [[graft.ops.AsOf.joinAsOf]]. `factTime` and
    * `effective_from` must share a type (both timestamp or both epoch).
    */
  def lookupAsOf(facts: DataFrame, dim: DataFrame, businessKey: String,
                 factTime: String, dimCols: Seq[String]): DataFrame =
    AsOf.joinAsOf(
      facts,
      dim.select((businessKey +: "effective_from" +: dimCols).map(col): _*),
      businessKey, factTime, "effective_from", dimCols)

  /** Post-rerun invariant: no surviving rows carry the reprocessed run id
    * outside the fresh write (`rerunnability.sh:101-131` asserts the old
    * create/update_job_run_id rows are gone). True ⇔ the partition overwrite
    * replaced everything.
    */
  def rerunClean(spark: SparkSession, path: String, oldRunId: Long,
                 expectedCount: Long): Boolean = {
    val cnt = spark.read.parquet(path)
      .filter(col(RunIdCol) === oldRunId).count()
    cnt == expectedCount
  }
}
