package graft.sources

import graft.model.OffsetRange
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Kafka source builders for the ingest leg.
  *
  * The reference reads explicit offset windows per (topic, partition, run)
  * from its `kafka_event` ledger (`KafkaDemo.sh:78-84, :202-208`) and spawns
  * one job per partition; Spark's Kafka source takes the same windows as
  * `startingOffsets`/`endingOffsets` JSON and parallelizes per partition
  * natively. This object builds those option maps from [[OffsetRange]] rows
  * so a batch replay of any historical run window is a one-liner.
  *
  * NOTE: the `spark-sql-kafka-0-10` connector jar is not on this
  * environment's classpath (no broker either) — against a deployment the
  * default `format = "kafka"` is the production call. The CODE PATHS here
  * execute end-to-end in this sandbox through [[GraftKafkaStubProvider]]
  * (`format = "graft-kafka-stub"`), a DataSource V2 that consumes the same
  * `subscribe`/`startingOffsets`/`endingOffsets` options with the same
  * semantics (KafkaStubSpec drives both readBatch and readStream through
  * it and asserts the option maps arrive verbatim); the offset-JSON
  * construction and the downstream pipeline (ArrivalJob's kafka-shaped
  * contract `topic/partition/offset/value`) are additionally exercised by
  * MemoryStream tests.
  *
  * Resolution ATTEMPTED (r14; re-attempted r15, identical failure): adding
  * `"org.apache.spark" %% "spark-sql-kafka-0-10" % "4.1.2"` fails with
  * `sbt.librarymanagement.ResolveException: Error downloading
  * org.apache.spark:spark-sql-kafka-0-10_2.13:4.1.2 — Not found` —
  * the environment is zero-egress (COURSIER_MODE=offline) and the
  * pre-warmed local cache carries only scalatest/scalacheck; no
  * kafka-clients, connector, or embedded-kafka jar exists anywhere under
  * the coursier/ivy caches or /opt/spark/jars, so neither a broker-backed
  * test nor even connector classloading is possible here. On a real
  * deployment the connector ships with `--packages
  * org.apache.spark:spark-sql-kafka-0-10_2.13:<spark version>` and every
  * option map this object builds is consumed as-is.
  */
object KafkaSource {

  /** {"topic":{"0":123,"1":456}} — the Kafka source offset JSON shape. */
  def offsetsJson(offsets: Seq[(String, Int, Long)]): String =
    offsets.groupBy(_._1).toSeq.sortBy(_._1).map { case (topic, parts) =>
      val inner = parts.sortBy(_._2)
        .map { case (_, p, o) => s""""$p":$o""" }.mkString(",")
      s""""$topic":{$inner}"""
    }.mkString("{", ",", "}")

  /** Option maps replaying exactly one ledger window: starting = from,
    * ending = until (Kafka endingOffsets are exclusive, matching the
    * ledger's [from, until) convention).
    */
  def replayOptions(ranges: Seq[OffsetRange]): Map[String, String] = Map(
    "startingOffsets" -> offsetsJson(ranges.map(r => (r.topicName, r.partition, r.fromOffset))),
    "endingOffsets" -> offsetsJson(ranges.map(r => (r.topicName, r.partition, r.untilOffset))))

  /** Batch read of an explicit offset window. `format` defaults to the real
    * connector; tests inject `"graft-kafka-stub"` — everything else
    * (options built, normalization) is identical on both paths.
    */
  def readBatch(spark: SparkSession, bootstrap: String, ranges: Seq[OffsetRange],
                format: String = "kafka",
                failOnDataLoss: Boolean = true): DataFrame = {
    val topics = ranges.map(_.topicName).distinct.mkString(",")
    var reader = spark.read.format(format)
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topics)
    if (!failOnDataLoss) reader = reader.option("failOnDataLoss", "false")
    replayOptions(ranges).foreach { case (k, v) => reader = reader.option(k, v) }
    normalize(reader.load())
  }

  /** Streaming read. `minPartitions` lets one busy Kafka partition fan out
    * over several Spark tasks — the scale knob the reference approximates
    * with its per-partition wrapper jobs. `maxOffsetsPerTrigger` caps rows
    * per micro-batch (split proportionally to per-partition lag, the
    * connector's rate limit) — the knob the reference's
    * `EVENT_CONTROL_CONFIG.BATCH_DURATION` expectations tune against
    * (`Kafka_ArrivalToConform.sh:154-181`). `failOnDataLoss=false` is the
    * connector's warn-and-continue mode when retention already trimmed
    * offsets the checkpoint still references.
    */
  def readStream(spark: SparkSession, bootstrap: String, topics: Seq[String],
                 minPartitions: Option[Int] = None,
                 format: String = "kafka",
                 maxOffsetsPerTrigger: Option[Long] = None,
                 failOnDataLoss: Boolean = true,
                 startingOffsets: String = "latest",
                 startingTimestamp: Option[Long] = None): DataFrame = {
    var reader = spark.readStream.format(format)
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topics.mkString(","))
      .option("startingOffsets", startingOffsets)
    minPartitions.foreach(n => reader = reader.option("minPartitions", n.toString))
    maxOffsetsPerTrigger.foreach(n =>
      reader = reader.option("maxOffsetsPerTrigger", n.toString))
    if (!failOnDataLoss) reader = reader.option("failOnDataLoss", "false")
    // takes precedence over startingOffsets at the source, the connector's
    // documented option priority
    startingTimestamp.foreach(ts =>
      reader = reader.option("startingTimestamp", ts.toString))
    normalize(reader.load())
  }

  /** Kafka's raw output → ArrivalJob's kafka-shaped contract. */
  def normalize(kafka: DataFrame): DataFrame =
    kafka.select(
      col("topic"),
      col("partition"),
      col("offset"),
      col("value").cast("string").as("value"))
}
