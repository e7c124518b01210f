package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The streaming "Arrival" leg: Kafka-shaped stream → per-run file layout +
  * queryable offset ledger, replacing the reference's per-partition Spark
  * Streaming wrapper jobs (`KafkaDemo.sh:45-92`) and their
  * `<topic>_<partition>_<job_run_id>` HDFS dirs (`KafkaDemo.sh:308-334`).
  *
  * Input contract (what `spark.readStream.format("kafka")` produces, and
  * what MemoryStream supplies in tests): columns
  * `topic: string, partition: int, offset: long, value: string`.
  *
  * Each micro-batch:
  *  - stamps `job_run_id` = batchId (the reference's run lineage);
  *  - appends data files Hive-partitioned by (topic, partition, job_run_id)
  *    — the same layout as the reference's arrival dirs, so the
  *    per-run/per-partition counts it validates are partition-pruned scans;
  *  - appends a `kafka_event`-style ledger row per (topic, partition) with
  *    [fromOffset, untilOffset) — `KafkaDemo.sh:78-84` — making offset
  *    continuity (`graft.dq.Checks.offsetGaps`) and expected-count
  *    (`offsetCountMatch`) auditable from data at rest, not just from
  *    checkpoint internals.
  *
  * At scale: the writes are append-only and partition-aligned with the
  * Kafka partitioning, so there is no shuffle in the hot path; the ledger
  * write is one tiny row per (topic, partition) per batch.
  */
object ArrivalJob {

  def start(input: DataFrame, dataPath: String, ledgerPath: String,
            checkpoint: String,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    input.writeStream
      .queryName("graft_arrival")
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeBatch(batch, batchId, dataPath, ledgerPath)
      }
      .start()

  /** Exposed for direct batch testing (same code path foreachBatch runs).
    *
    * Exactly-once: foreachBatch delivers at-least-once (a crash between the
    * data write and checkpoint commit re-runs the epoch), so both writes
    * use DYNAMIC partition overwrite scoped to this run's own partitions —
    * a retried batch replaces exactly what its first attempt wrote, other
    * runs untouched. With the run id in the partition path this makes the
    * whole arrival leg idempotent without a transaction log.
    */
  def writeBatch(batch: DataFrame, batchId: Long, dataPath: String,
                 ledgerPath: String): Unit = {
    writeData(batch, batchId, dataPath)
    writeLedger(batch, batchId, ledgerPath)
  }

  /** The data-file half of [[writeBatch]] (public so the crash-restart
    * rehearsal can tear a batch exactly between the two writes — data
    * present, ledger row missing, checkpoint uncommitted — the worst-case
    * partial state a real executor loss leaves behind).
    */
  def writeData(batch: DataFrame, batchId: Long, dataPath: String): Unit =
    batch.withColumn("job_run_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("topic", "partition", "job_run_id")
      .parquet(dataPath)

  /** Ledger row per (topic, partition): offsets are [from, until). */
  def writeLedger(batch: DataFrame, batchId: Long, ledgerPath: String): Unit =
    batch.groupBy(col("topic").as("topicName"), col("partition"))
      .agg(min(col("offset")).as("fromOffset"),
        (max(col("offset")) + 1).as("untilOffset"))
      .withColumn("jobRunId", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("jobRunId")
      .parquet(ledgerPath)

  /** Arrival → Conform: promote a run window into the conformed layer,
    * partitioned by create_date + source file the way the reference lays out
    * its avro conform dir (`Kafka_ArrivalToConform.sh:536-540`). Reading by
    * `job_run_id` prunes to exactly the new partitions.
    *
    * The reference conform layer is AVRO; `format` is the knob. The
    * default stays parquet (the engine's columnar layer), and
    * `format = "avro"` routes through [[graft.sources.AvroIo]]'s own
    * container-file sink — this environment ships no spark-avro
    * DataSource jar, and the conform layout must not stay an untested
    * path because of it. Any other format name resolves through the
    * normal DataSource lookup (orc ships built-in; spark-avro would
    * too, by name, on a cluster that carries it).
    */
  def conformRuns(spark: SparkSession, dataPath: String, conformPath: String,
                  runIds: Seq[Long], format: String = "parquet"): Unit = {
    val arrival = spark.read.parquet(dataPath)
      .filter(col("job_run_id").isin(runIds: _*))
    val conformed = arrival
      .withColumn("create_date", date_format(current_timestamp(), "yyyyMMdd"))
      .withColumn("source_file_name",
        concat_ws("_", col("topic"), col("partition"), col("job_run_id")))
    if (format == "avro")
      graft.sources.AvroIo.writeAvro(conformed, conformPath,
        Seq("create_date", "source_file_name"))
    else
      conformed.write.mode("append")
        .partitionBy("create_date", "source_file_name")
        .format(format)
        .save(conformPath)
  }
}
