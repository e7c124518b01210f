package graft.sources

import java.util

import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadAllAvailable, ReadLimit, ReadMaxRows, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** In-JVM stand-in broker for the Kafka stub source: per-(topic, partition)
  * append-only logs with an adjustable earliest offset (modeling retention).
  *
  * The real `spark-sql-kafka-0-10` connector jar is unresolvable in this
  * zero-egress environment (KafkaSource.scala:16-35 documents the attempts),
  * which left `KafkaSource.readBatch`/`readStream` documentation-only. This
  * stub exists so those production call paths EXECUTE: a DataSource V2
  * (`format("graft-kafka-stub")`) that consumes `subscribe` /
  * `startingOffsets` / `endingOffsets` exactly as the connector does —
  * same option keys, same offset-JSON shape `{"topic":{"0":123}}`, same
  * `-1`(latest)/`-2`(earliest) per-partition sentinels, same exclusive
  * `endingOffsets`, same out-of-range failure, same `maxOffsetsPerTrigger`
  * proportional rate limit, `startingTimestamp` (+
  * `startingOffsetsByTimestampStrategy`) offset-for-times resolution,
  * and `failOnDataLoss=false` warn-and-continue —
  * backed by this registry instead of a broker. Reference:
  * `KafkaDemo.sh:78-84` (the `kafka_event` ledger whose [from, until)
  * windows these options replay) and `Kafka_ArrivalToConform.sh:154-181`
  * (the BATCH_DURATION expectations that tune the trigger cap).
  */
object KafkaStubBroker {
  /** `control=true` models a transaction marker (commit/abort control
    * batch): it OCCUPIES its offset — the high-water mark and every
    * clamp/seam computation count it — but is never delivered to a read,
    * exactly like the real consumer under `isolation.level=read_committed`.
    * Compaction leaves the same shape (surviving offsets non-contiguous),
    * so one flag covers both sources of offset gaps.
    */
  final case class StubRecord(key: Array[Byte], value: Array[Byte], tsMs: Long,
                              control: Boolean = false)

  // (topic, partition) -> (earliestOffset, log). Offsets are
  // earliestOffset + index; the high-water mark is earliest + log.size.
  private val logs = TrieMap.empty[(String, Int), (Long, Vector[StubRecord])]

  /** Options maps the provider actually received, captured per read path so
    * specs can assert KafkaSource passes them through VERBATIM.
    */
  @volatile var lastBatchOptions: Map[String, String] = Map.empty
  @volatile var lastStreamOptions: Map[String, String] = Map.empty

  /** Data-loss warnings emitted by `failOnDataLoss=false` reads (the real
    * connector logs these at WARN and advances past the trimmed head; the
    * arrival audit then sees the skipped window as an offset-continuity
    * seam). Kept queryable so specs/audits can record the loss explicitly.
    */
  @volatile var dataLossEvents: Vector[String] = Vector.empty

  /** Structured twin of [[dataLossEvents]]: the lost window itself, typed,
    * so the arrival audit can JOIN it against the offset ledger instead of
    * parsing warning strings. `kind` is one of the named constants on the
    * [[DataLossSeam]] companion — {trimmed_head, end_beyond_latest,
    * start_beyond_end, deleted_partition} — shared with
    * [[graft.dq.Checks.offsetContinuityWithSeams]] so the emitting and
    * consuming sides can never drift on the vocabulary; [lostFrom,
    * lostUntil) is the requested-but-unread window (empty for a deleted
    * partition probed with an empty window — the deletion itself is the
    * seam).
    */
  final case class DataLossSeam(topic: String, partition: Int,
                                lostFrom: Long, lostUntil: Long, kind: String)

  /** The seam-kind vocabulary — aliases of [[graft.model.SeamKinds]], the
    * model-layer contract both the emitting connectors and the consuming
    * audits ([[graft.dq.Checks.offsetContinuityWithSeams]]) depend on
    * (the check must never depend on this test double for its contract).
    * Txn control batches ([[publishControl]]) are deliberately NOT a seam
    * kind: no records were lost and no ledger gap appears — only the
    * count contract changes, handled by Checks.offsetCountMatchWithControl.
    */
  object DataLossSeam {
    val TrimmedHead: String = graft.model.SeamKinds.TrimmedHead
    val EndBeyondLatest: String = graft.model.SeamKinds.EndBeyondLatest
    val StartBeyondEnd: String = graft.model.SeamKinds.StartBeyondEnd
    val DeletedPartition: String = graft.model.SeamKinds.DeletedPartition
    val brokerSideKinds: Set[String] = graft.model.SeamKinds.brokerSideKinds
    val callerSideKinds: Set[String] = graft.model.SeamKinds.callerSideKinds
  }

  @volatile var dataLossSeams: Vector[DataLossSeam] = Vector.empty

  /** [[dataLossSeams]] as a DataFrame in the ledger's column vocabulary
    * (topicName/partition/lostFrom/lostUntil/kind) — the shape
    * [[graft.dq.Checks.offsetContinuityWithSeams]] consumes. On a real
    * cluster the same rows would come from the connector's WARN log or the
    * streaming-query progress events; the stub makes them queryable
    * directly.
    */
  def seamsDf(spark: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    dataLossSeams
      .map(s => (s.topic, s.partition, s.lostFrom, s.lostUntil, s.kind))
      .toDF("topicName", "partition", "lostFrom", "lostUntil", "kind")
  }

  def clear(): Unit = logs.synchronized {
    logs.clear(); lastBatchOptions = Map.empty; lastStreamOptions = Map.empty
    dataLossEvents = Vector.empty; dataLossSeams = Vector.empty
  }

  /** Create an empty partition whose earliest offset is `first` (a log head
    * trimmed by retention — reads below it must fail like the connector's
    * data-loss check).
    */
  def createPartition(topic: String, partition: Int, first: Long = 0L): Unit =
    // Same monitor as publish: an unsynchronized putIfAbsent could race a
    // concurrent publish's read-modify-write and silently reset a
    // just-created partition's non-zero retention head back to 0.
    logs.synchronized { logs.putIfAbsent((topic, partition), (first, Vector.empty)); () }

  /** Append one record; returns its assigned offset. */
  def publish(topic: String, partition: Int, value: String,
              key: String = null, tsMs: Long = 0L): Long =
    logs.synchronized {
      val (first, log) = logs.getOrElse((topic, partition), (0L, Vector.empty))
      val rec = StubRecord(Option(key).map(_.getBytes("UTF-8")).orNull,
        value.getBytes("UTF-8"), tsMs)
      logs((topic, partition)) = (first, log :+ rec)
      first + log.size
    }

  /** Append one TRANSACTION CONTROL MARKER (commit/abort control batch —
    * the broker-internal record a transactional producer's commit writes).
    * It consumes one offset but no read ever returns it: after this call
    * the partition's offsets are NON-CONTIGUOUS from a consumer's view,
    * which is precisely the real `read_committed` shape that breaks the
    * reference's `sum(until_offset − from_offset)` count contract
    * (`KafkaDemo.sh:202-214` assumes every offset is a record). Audits on
    * transactional topics must use
    * [[graft.dq.Checks.offsetCountMatchWithControl]] with
    * [[controlOffsetsDf]] instead of the raw arithmetic.
    */
  def publishControl(topic: String, partition: Int, tsMs: Long = 0L): Long =
    logs.synchronized {
      val (first, log) = logs.getOrElse((topic, partition), (0L, Vector.empty))
      logs((topic, partition)) =
        (first, log :+ StubRecord(null, null, tsMs, control = true))
      first + log.size
    }

  /** Every control-marker offset still in the log, queryable in the
    * ledger's column vocabulary — the broker-side metadata an audit joins
    * against its offset ledger to correct `sum(until − from)` on
    * transactional topics. (A real deployment gets the same information
    * from consumer-side bookkeeping — e.g. per-batch `numInputRows` in the
    * streaming progress — or from reading the topic with
    * `read_uncommitted` admin tooling; the stub makes it a table.)
    */
  def controlOffsetsDf(spark: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    logs.synchronized {
      logs.toSeq.flatMap { case ((t, p), (first, log)) =>
        log.zipWithIndex.collect {
          case (r, i) if r.control => (t, p, first + i)
        }
      }
    }.toDF("topicName", "partition", "offset")
  }

  def earliest(tp: (String, Int)): Long = logs.get(tp).map(_._1).getOrElse(0L)
  def latest(tp: (String, Int)): Long =
    logs.get(tp).map { case (f, l) => f + l.size }.getOrElse(0L)

  def partitionsOf(topics: Seq[String]): Seq[(String, Int)] =
    logs.keys.filter(k => topics.contains(k._1)).toSeq.sorted

  /** Delete a topic-partition (topic deletion / partition reassignment in
    * broker terms). A checkpointed stream that still references it hits the
    * connector's data-loss path on its next fetch: fail when
    * `failOnDataLoss=true`, warn-and-skip when `false`.
    */
  def deletePartition(topic: String, partition: Int): Unit =
    logs.synchronized { logs.remove((topic, partition)); () }

  private def recordLoss(msg: String, seams: Seq[DataLossSeam]): Unit = {
    logs.synchronized { dataLossEvents :+= msg; dataLossSeams ++= seams }
    System.err.println(s"WARN KafkaStubBroker: $msg")
  }

  /** [from, until) slice with connector-shaped range validation.
    *
    * `failOnDataLoss=true` (the connector default): any window outside the
    * surviving log — or a topic-partition that no longer exists — fails the
    * read. `false`: the connector's warn-and-continue contract — clamp to
    * the surviving [earliest, high) window (or skip a deleted partition
    * entirely), emit the loss as a WARN plus a queryable [[dataLossEvents]]
    * entry, and return what survives (possibly nothing).
    *
    * The recorded message names WHICH contract was violated — a head
    * trimmed by retention (`trimmed head`), a deleted/unknown partition
    * (`deleted topic-partition`), or an `until` past the high-water mark
    * (`end beyond latest`, a mis-specified caller window rather than
    * retention loss) — so audits reading [[dataLossEvents]] don't
    * misattribute a caller bug to broker-side retention.
    */
  def fetch(tp: (String, Int), from: Long, until: Long,
            failOnDataLoss: Boolean = true): Vector[(Long, StubRecord)] = {
    logs.get(tp) match {
      case None =>
        if (failOnDataLoss)
          throw new IllegalArgumentException(s"unknown topic-partition $tp " +
            "(the real connector fails this read as data loss)")
        recordLoss(s"data loss on $tp: deleted topic-partition — requested " +
          s"[$from, $until) but the partition no longer exists; skipping it " +
          "and continuing (failOnDataLoss=false)",
          Seq(DataLossSeam(tp._1, tp._2, from, until, DataLossSeam.DeletedPartition)))
        Vector.empty
      case Some((first, log)) if from > until =>
        // Offsets moved backwards: a checkpointed start past the current
        // end (topic deleted+recreated, or an AvailableNow bound pinned
        // below a stale checkpoint). The real connector clamps the fetch
        // to EMPTY and logs data loss under failOnDataLoss=false
        // (KafkaSourceRDD's fromOffset > untilOffset warn path); true
        // fails the read.
        if (failOnDataLoss)
          throw new IllegalArgumentException(
            s"inverted window [$from, $until) for $tp " +
              "(offsets moved backwards — the real connector fails this read as data loss)")
        recordLoss(s"data loss on $tp: start beyond end — requested [$from, $until) " +
          "(offsets moved backwards: topic recreated, or the end bound sits below " +
          "a checkpointed start); reading nothing and continuing (failOnDataLoss=false)",
          Seq(DataLossSeam(tp._1, tp._2, until, from, DataLossSeam.StartBeyondEnd)))
        Vector.empty
      case Some((first, log)) =>
        val high = first + log.size
        if (failOnDataLoss)
          require(from >= first && until <= high,
            s"offsets [$from, $until) out of available range [$first, $high) for $tp " +
              "(the real connector fails this read as data loss)")
        val cf = math.min(math.max(from, first), high)
        val cu = math.max(math.min(until, high), cf)
        if (cf != from || cu != until) {
          val causes = Seq(
            if (from < first) Some(s"trimmed head (retention moved earliest to $first)")
            else None,
            if (until > high) Some(s"end beyond latest (requested until $until past " +
              s"high-water mark $high — a mis-specified window, not retention loss)")
            else None).flatten.mkString(" and ")
          val seams =
            (if (from < first) Seq(DataLossSeam(tp._1, tp._2, from, cf, DataLossSeam.TrimmedHead))
             else Nil) ++
            (if (until > high) Seq(DataLossSeam(tp._1, tp._2, cu, until, DataLossSeam.EndBeyondLatest))
             else Nil)
          recordLoss(s"data loss on $tp: $causes — requested [$from, $until) but " +
            s"available [$first, $high); reading [$cf, $cu) and continuing " +
            "(failOnDataLoss=false)", seams)
        }
        // Control markers occupy offsets (clamping above counted them) but
        // are never delivered — the read_committed consumer contract. The
        // returned offsets are therefore non-contiguous on transactional
        // topics, and fewer rows than (cu − cf) is NORMAL, not data loss.
        ((cf until cu).map(o => o -> log((o - first).toInt)))
          .filterNot(_._2.control).toVector
    }
  }

  /** The real connector's 7-column output schema, field for field. */
  val schema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  private val topicBlockRe = """"([^"]+)"\s*:\s*\{([^}]*)\}""".r
  private val partEntryRe = """"(-?\d+)"\s*:\s*(-?\d+)""".r

  /** Parse the connector's offset JSON `{"topic":{"0":123,"1":-1}}` into
    * per-partition longs, resolving the `-1`/`-2` sentinels against the
    * registry exactly as the connector resolves them against the broker.
    */
  def parseOffsets(json: String): Map[(String, Int), Long] =
    topicBlockRe.findAllMatchIn(json).flatMap { m =>
      val topic = m.group(1)
      partEntryRe.findAllMatchIn(m.group(2)).map { e =>
        val tp = (topic, e.group(1).toInt)
        val raw = e.group(2).toLong
        tp -> (raw match {
          case -1L => latest(tp)
          case -2L => earliest(tp)
          case o => o
        })
      }
    }.toMap

  /** startingOffsets/endingOffsets option value -> per-partition offsets for
    * the subscribed topics ("earliest"/"latest" keywords or explicit JSON).
    */
  def resolve(optValue: String, topics: Seq[String]): Map[(String, Int), Long] =
    optValue.trim match {
      case "earliest" => partitionsOf(topics).map(tp => tp -> earliest(tp)).toMap
      case "latest" => partitionsOf(topics).map(tp => tp -> latest(tp)).toMap
      case json =>
        val parsed = parseOffsets(json)
        val bad = parsed.keys.filterNot(tp => topics.contains(tp._1))
        require(bad.isEmpty, s"offset JSON names unsubscribed topic-partitions: $bad")
        // the real connector rejects a PARTIAL offset map (an assertion in
        // KafkaOffsetReader): explicit JSON must cover every partition of
        // every subscribed topic
        val missing = partitionsOf(topics).filterNot(parsed.contains)
        require(missing.isEmpty,
          s"offset JSON must specify ALL partitions of subscribed topics; missing $missing")
        parsed
    }

  /** `startingTimestamp` resolution — the connector's documented contract
    * (Structured Streaming Kafka guide): per partition, the EARLIEST
    * offset whose record timestamp is >= the given epoch-ms value (Kafka's
    * `offsetsForTimes`); when NO record matches, the behavior follows
    * `startingOffsetsByTimestampStrategy` — "error" (the connector
    * default: fail the query rather than read unintended data) or
    * "latest" (start at the high-water mark, seeing only later
    * publishes). Control markers never match: like `read_committed`
    * consumers, a transaction marker is not user data to start from.
    */
  def resolveByTimestamp(tsMs: Long, topics: Seq[String],
                         strategy: String = "error"): Map[(String, Int), Long] =
    partitionsOf(topics).map { tp =>
      val (first, log) = logs.synchronized(logs((tp._1, tp._2)))
      val idx = log.indexWhere(r => !r.control && r.tsMs >= tsMs)
      tp -> (if (idx >= 0) first + idx
      else strategy match {
        case "latest" => latest(tp)
        case "error" => throw new IllegalStateException(
          s"no offset matched startingTimestamp=$tsMs for $tp and " +
            "startingOffsetsByTimestampStrategy=error (the connector default)")
        case other => throw new IllegalArgumentException(
          s"unknown startingOffsetsByTimestampStrategy: $other")
      })
    }.toMap
}

/** `format("graft-kafka-stub")` — see [[KafkaStubBroker]]. Registered via
  * META-INF/services so the short name resolves like the real connector's.
  */
class GraftKafkaStubProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-kafka-stub"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KafkaStubBroker.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new KafkaStubTable
}

private final class KafkaStubTable extends Table with SupportsRead {
  override def name(): String = "graft-kafka-stub"
  override def schema(): StructType = KafkaStubBroker.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new KafkaStubScan(options.asScala.toMap)
    }
}

private final class KafkaStubScan(options: Map[String, String]) extends Scan {
  // The contract the spec asserts: every option KafkaSource built arrives
  // here unmodified (Spark lower-cases keys; values are verbatim).
  private def topics: Seq[String] = options.getOrElse("subscribe",
    throw new IllegalArgumentException("subscribe is required"))
    .split(",").map(_.trim).filter(_.nonEmpty).toSeq
  private def failOnDataLoss: Boolean =
    options.getOrElse("failondataloss", "true").toBoolean

  override def readSchema(): StructType = KafkaStubBroker.schema

  // startingTimestamp takes PRECEDENCE over startingOffsets (the
  // connector's documented option priority); strategy only applies to the
  // no-match case.
  private def resolveStart(defaultOffsets: String): Map[(String, Int), Long] =
    options.get("startingtimestamp") match {
      case Some(ts) => KafkaStubBroker.resolveByTimestamp(ts.toLong, topics,
        options.getOrElse("startingoffsetsbytimestampstrategy", "error"))
      case None => KafkaStubBroker.resolve(
        options.getOrElse("startingoffsets", defaultOffsets), topics)
    }

  override def toBatch: Batch = {
    KafkaStubBroker.lastBatchOptions = options
    val starts = resolveStart("earliest")
    val ends = KafkaStubBroker.resolve(
      options.getOrElse("endingoffsets", "latest"), topics)
    val fodl = failOnDataLoss
    new Batch {
      override def planInputPartitions(): Array[InputPartition] =
        KafkaStubBroker.partitionsOf(topics).map { tp =>
          val from = starts.getOrElse(tp, KafkaStubBroker.earliest(tp))
          val until = ends.getOrElse(tp, KafkaStubBroker.latest(tp))
          KafkaStubInputPartition(tp._1, tp._2,
            KafkaStubBroker.fetch(tp, from, until, fodl))
        }.toArray
      override def createReaderFactory(): PartitionReaderFactory =
        new KafkaStubReaderFactory
    }
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream = {
    KafkaStubBroker.lastStreamOptions = options
    new KafkaStubMicroBatchStream(topics,
      () => resolveStart("latest"),
      options.get("maxoffsetspertrigger").map(_.toLong),
      failOnDataLoss)
  }
}

/** Offset = per-(topic, partition) next-offset map, serialized in the same
  * `{"topic":{"0":123}}` shape the connector logs (deterministic key order).
  */
private final case class KafkaStubStreamOffset(offsets: Map[(String, Int), Long])
  extends Offset {
  override def json(): String =
    KafkaSource.offsetsJson(offsets.toSeq.map { case ((t, p), o) => (t, p, o) })
}

/** Micro-batch stream with the real connector's admission-control surface:
  *
  *  - `maxOffsetsPerTrigger` → [[ReadMaxRows]]: when the available lag
  *    exceeds the cap, each partition advances by its PROPORTIONAL share
  *    (`limit · lag/totalLag`, ceil below 1 so a starved partition still
  *    moves — the exact prorate shape of the connector's `rateLimit`),
  *    so one run drains in several equal-ish batches instead of one.
  *  - `Trigger.AvailableNow` → [[SupportsTriggerAvailableNow]]: the end
  *    bound is pinned ONCE at `prepareForTriggerAvailableNow`, so a
  *    rate-limited run terminates at the subscription-time high-water mark
  *    even if publishes keep landing (the connector's semantics).
  *  - `failOnDataLoss=false` → a checkpointed start below the surviving
  *    head clamps forward with a recorded warning instead of failing
  *    ([[KafkaStubBroker.fetch]]).
  */
private final class KafkaStubMicroBatchStream(
    topics: Seq[String], starting: () => Map[(String, Int), Long],
    maxOffsetsPerTrigger: Option[Long], failOnDataLoss: Boolean)
  extends MicroBatchStream with SupportsTriggerAvailableNow {
  // End bound captured by prepareForTriggerAvailableNow (AvailableNow runs).
  @volatile private var availableNowBound: Option[Map[(String, Int), Long]] = None

  private def trueLatest: Map[(String, Int), Long] =
    KafkaStubBroker.partitionsOf(topics)
      .map(tp => tp -> KafkaStubBroker.latest(tp)).toMap

  override def initialOffset(): Offset = KafkaStubStreamOffset(starting())

  override def getDefaultReadLimit: ReadLimit =
    maxOffsetsPerTrigger.map(ReadLimit.maxRows).getOrElse(ReadLimit.allAvailable())

  // With SupportsAdmissionControl Spark always calls the 2-arg form; the
  // real connector throws here too.
  override def latestOffset(): Offset = throw new UnsupportedOperationException(
    "latestOffset(Offset, ReadLimit) should be called instead of this method")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[KafkaStubStreamOffset].offsets
    val bound = availableNowBound.getOrElse(trueLatest)
    val capped = limit match {
      case _: ReadAllAvailable => bound
      case r: ReadMaxRows => rateLimit(r.maxRows(), s, bound)
      case other => throw new UnsupportedOperationException(
        s"read limit $other not supported by graft-kafka-stub")
    }
    KafkaStubStreamOffset(capped)
  }

  override def reportLatestOffset(): Offset = KafkaStubStreamOffset(trueLatest)

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowBound = Some(trueLatest)

  /** The connector's prorate split: each partition advances by
    * `limit · lag/totalLag` (floor; ceil when the share is under one row so
    * slow partitions are never starved), clamped to its own lag.
    */
  private def rateLimit(limit: Long, start: Map[(String, Int), Long],
                        end: Map[(String, Int), Long]): Map[(String, Int), Long] = {
    val begins = end.map { case (tp, _) =>
      tp -> start.getOrElse(tp, KafkaStubBroker.earliest(tp)) }
    val lags = end.map { case (tp, e) => tp -> math.max(0L, e - begins(tp)) }
    val total = lags.values.sum
    if (total <= limit) end
    else end.map { case (tp, e) =>
      val lag = lags(tp)
      val prorate = limit.toDouble * lag / total
      val take = if (prorate < 1) math.ceil(prorate).toLong
                 else math.floor(prorate).toLong
      tp -> math.min(begins(tp) + take, e)
    }
  }

  override def deserializeOffset(json: String): Offset =
    KafkaStubStreamOffset(KafkaStubBroker.parseOffsets(json))
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[KafkaStubStreamOffset].offsets
    val e = end.asInstanceOf[KafkaStubStreamOffset].offsets
    // Union of start and end keys: a partition DELETED mid-stream is still
    // in the checkpointed start but absent from the new latest — iterating
    // end alone would drop it silently, with no data-loss seam recorded.
    // Routing it through fetch (empty window) hits the broker's
    // deleted-partition path: throw under failOnDataLoss=true, a recorded
    // dataLossEvents seam + empty read under false — the connector contract.
    (s.keySet ++ e.keySet).toSeq.sorted.map { tp =>
      val from = s.getOrElse(tp, KafkaStubBroker.earliest(tp))
      val until = e.getOrElse(tp, from)
      KafkaStubInputPartition(tp._1, tp._2,
        KafkaStubBroker.fetch(tp, from, until, failOnDataLoss))
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new KafkaStubReaderFactory
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** Rows are resolved at PLANNING time and embedded in the partition — one
  * InputPartition per Kafka partition, mirroring the connector's native
  * per-partition parallelism (the semantics the reference approximated with
  * one wrapper job per partition, `KafkaDemo.sh:45-92`).
  */
private final case class KafkaStubInputPartition(
    topic: String, partition: Int,
    rows: Vector[(Long, KafkaStubBroker.StubRecord)]) extends InputPartition

private final class KafkaStubReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[KafkaStubInputPartition]
    new PartitionReader[InternalRow] {
      private val it = p.rows.iterator
      private var cur: (Long, KafkaStubBroker.StubRecord) = _
      override def next(): Boolean = { val h = it.hasNext; if (h) cur = it.next(); h }
      override def get(): InternalRow = new GenericInternalRow(Array[Any](
        cur._2.key, cur._2.value, UTF8String.fromString(p.topic), p.partition,
        cur._1, cur._2.tsMs * 1000L /* micros */, 0 /* CreateTime */))
      override def close(): Unit = ()
    }
  }
}
