package graft

import graft.model.OffsetRange
import graft.sources.{KafkaSource, KafkaStubBroker}
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** Drives KafkaSource.readBatch / readStream end-to-end through the
  * graft-kafka-stub DataSource V2 — the production call paths that were
  * documentation-only while the real connector jar is environment-blocked
  * (KafkaSource.scala:16-35). Asserts (a) the option maps KafkaSource builds
  * are consumed VERBATIM by the source, (b) rows match the ledger window
  * exactly, (c) connector semantics the downstream relies on: exclusive
  * endingOffsets, -1/-2 sentinels, out-of-range reads fail (data loss),
  * one InputPartition per Kafka partition, and a latest-start stream that
  * only sees post-start publishes.
  */
class KafkaStubSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def fixture(): Seq[OffsetRange] = {
    KafkaStubBroker.clear()
    // partition 0 models retention: earliest surviving offset is 5
    KafkaStubBroker.createPartition("events_raw", 0, first = 5L)
    KafkaStubBroker.createPartition("events_raw", 1)
    (0 until 12).foreach(i =>
      KafkaStubBroker.publish("events_raw", 0, s"p0-m$i", key = s"k$i", tsMs = 1700000000000L + i))
    (0 until 8).foreach(i =>
      KafkaStubBroker.publish("events_raw", 1, s"p1-m$i", tsMs = 1700000000000L + i))
    // the kafka_event ledger rows for one run: [7, 15) on p0, [2, 8) on p1
    Seq(OffsetRange("events_raw", 0, 42L, 7L, 15L),
      OffsetRange("events_raw", 1, 42L, 2L, 8L))
  }

  test("readBatch through the stub returns exactly the ledger window, options verbatim") {
    val ranges = fixture()
    val df = KafkaSource.readBatch(spark, "stub:9092", ranges, format = "graft-kafka-stub")
    val rows = df.collect().map(r => (r.getAs[String]("topic"), r.getAs[Int]("partition"),
      r.getAs[Long]("offset"), r.getAs[String]("value"))).toSet
    val expected =
      (7L until 15L).map(o => ("events_raw", 0, o, s"p0-m${o - 5}")).toSet ++
        (2L until 8L).map(o => ("events_raw", 1, o, s"p1-m$o")).toSet
    assert(rows == expected, rows.toSeq.sorted.mkString("\n"))
    // the option map KafkaSource built arrived at the source unmodified
    // (DSv2 lower-cases keys; values must be byte-identical)
    val opts = KafkaStubBroker.lastBatchOptions
    val built = KafkaSource.replayOptions(ranges)
    assert(opts("subscribe") == "events_raw")
    assert(opts("kafka.bootstrap.servers") == "stub:9092")
    assert(opts("startingoffsets") == built("startingOffsets"), opts.toString)
    assert(opts("endingoffsets") == built("endingOffsets"), opts.toString)
    assert(built("startingOffsets") == """{"events_raw":{"0":7,"1":2}}""")
    assert(built("endingOffsets") == """{"events_raw":{"0":15,"1":8}}""")
  }

  test("one InputPartition per Kafka partition — the connector's native parallelism") {
    val ranges = fixture()
    val df = KafkaSource.readBatch(spark, "stub:9092", ranges, format = "graft-kafka-stub")
    assert(df.rdd.getNumPartitions == 2)
    // per-partition counts match the per-ledger-row record counts
    val perPart = df.groupBy("partition").count().collect()
      .map(r => r.getAs[Int]("partition") -> r.getAs[Long]("count")).toMap
    assert(perPart == Map(0 -> 8L, 1 -> 6L))
    assert(ranges.map(r => r.partition -> r.recordCount).toMap == perPart.map { case (k, v) => (k, v) })
  }

  test("a window below the earliest surviving offset fails like the connector's data-loss check") {
    fixture()
    // p1's window is valid — the failure must be p0's trimmed head (the
    // offset JSON must still cover every partition, or the partial-map
    // rejection fires first)
    val bad = Seq(OffsetRange("events_raw", 0, 43L, 2L, 6L), // earliest is 5
      OffsetRange("events_raw", 1, 43L, 0L, 1L))
    val e = intercept[Exception] {
      KafkaSource.readBatch(spark, "stub:9092", bad, format = "graft-kafka-stub").collect()
    }
    // Pin the out-of-range semantics specifically — a typo'd topic or an
    // analysis error must NOT pass this test. Spark may wrap the planning
    // failure, so search the cause chain.
    val messages = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse("")).toSeq
    assert(messages.exists(_.contains("out of available range")),
      s"expected the connector-shaped data-loss message, got: $messages")
  }

  test("-2/-1 per-partition sentinels resolve to earliest/latest") {
    fixture()
    val df = spark.read.format("graft-kafka-stub")
      .option("subscribe", "events_raw")
      .option("startingOffsets", """{"events_raw":{"0":-2,"1":-2}}""")
      .option("endingOffsets", """{"events_raw":{"0":-1,"1":-1}}""")
      .load()
    val n = df.groupBy("partition").count().collect()
      .map(r => r.getAs[Int]("partition") -> r.getAs[Long]("count")).toMap
    assert(n == Map(0 -> 12L, 1 -> 8L)) // full surviving logs
  }

  test("multi-topic ledger replay: one readBatch spans topics, offsets JSON groups per topic") {
    KafkaStubBroker.clear()
    KafkaStubBroker.createPartition("orders_raw", 0)
    KafkaStubBroker.createPartition("events_raw", 0)
    (0 until 5).foreach(i => KafkaStubBroker.publish("orders_raw", 0, s"o$i"))
    (0 until 5).foreach(i => KafkaStubBroker.publish("events_raw", 0, s"e$i"))
    val ranges = Seq(
      graft.model.OffsetRange("events_raw", 0, 9L, 1L, 4L),
      graft.model.OffsetRange("orders_raw", 0, 9L, 0L, 2L))
    val built = KafkaSource.replayOptions(ranges)
    // per-topic grouping, topics sorted — the connector's exact JSON shape
    assert(built("startingOffsets") == """{"events_raw":{"0":1},"orders_raw":{"0":0}}""")
    val rows = KafkaSource.readBatch(spark, "stub:9092", ranges, format = "graft-kafka-stub")
      .collect().map(r => (r.getAs[String]("topic"), r.getAs[Long]("offset"),
        r.getAs[String]("value"))).toSet
    assert(rows == Set(("events_raw", 1L, "e1"), ("events_raw", 2L, "e2"),
      ("events_raw", 3L, "e3"), ("orders_raw", 0L, "o0"), ("orders_raw", 1L, "o1")))
    assert(KafkaStubBroker.lastBatchOptions("subscribe").split(",").toSet ==
      Set("events_raw", "orders_raw"))
  }

  test("kafka -> arrival end-to-end through the stub: checkpointed resume picks up " +
    "post-subscription publishes and the ledger mirrors broker offsets") {
    import graft.streaming.ArrivalJob
    KafkaStubBroker.clear()
    (0 until 4).foreach(p => KafkaStubBroker.createPartition("events_raw", p))
    (0 until 20).foreach(i => KafkaStubBroker.publish("events_raw", i % 4, s"pre-$i"))
    val root = java.nio.file.Files.createTempDirectory("stub_arrival").toString
    def arrivalOnce(): Unit = {
      val in = KafkaSource.readStream(spark, "stub:9092", Seq("events_raw"),
        format = "graft-kafka-stub")
      val q = ArrivalJob.start(in, s"$root/data", s"$root/ledger", s"$root/ckpt")
      q.awaitTermination()
    }
    arrivalOnce() // starts at LATEST: pins offsets {p: 5}, consumes nothing
    val ledgerDir = new java.io.File(s"$root/ledger")
    assert(!ledgerDir.exists() || !ledgerDir.listFiles()
      .exists(_.getName.startsWith("jobRunId=")),
      "nothing may be ledgered before the live publishes")
    val live = (0 until 12).map(i =>
      (i % 4, KafkaStubBroker.publish("events_raw", i % 4, s"live-$i")))
    arrivalOnce() // resumes from the checkpoint: exactly the post-start window
    val data = spark.read.parquet(s"$root/data")
    assert(data.count() == 12)
    val vals = data.collect().map(r =>
      (r.getAs[Int]("partition"), r.getAs[Long]("offset"), r.getAs[String]("value"))).toSet
    assert(vals == live.zipWithIndex.map { case ((p, o), i) => (p, o, s"live-$i") }.toSet)
    // ledger rows = the replayOptions shape the reference's kafka_event holds
    val ledger = spark.read.parquet(s"$root/ledger").collect().map(r =>
      (r.getAs[Int]("partition"), r.getAs[Long]("fromOffset"), r.getAs[Long]("untilOffset"))).toSet
    assert(ledger == (0 until 4).map(p => (p, 5L, 8L)).toSet, ledger.toString)
  }

  test("maxOffsetsPerTrigger drains a backlog in rate-limited batches and the " +
    "ledger matches the broker exactly — the connector's admission control") {
    import graft.streaming.ArrivalJob
    KafkaStubBroker.clear()
    // 3 partitions with skewed lag: 12 + 6 + 2 = 20 records
    (0 until 3).foreach(p => KafkaStubBroker.createPartition("events_raw", p))
    (0 until 12).foreach(i => KafkaStubBroker.publish("events_raw", 0, s"p0-$i"))
    (0 until 6).foreach(i => KafkaStubBroker.publish("events_raw", 1, s"p1-$i"))
    (0 until 2).foreach(i => KafkaStubBroker.publish("events_raw", 2, s"p2-$i"))
    val root = java.nio.file.Files.createTempDirectory("stub_ratelimit").toString
    val in = KafkaSource.readStream(spark, "stub:9092", Seq("events_raw"),
      format = "graft-kafka-stub", maxOffsetsPerTrigger = Some(8L),
      startingOffsets = "earliest")
    val q = ArrivalJob.start(in, s"$root/data", s"$root/ledger", s"$root/ckpt")
    q.awaitTermination()
    // options are captured when the scan materializes (query start)
    assert(KafkaStubBroker.lastStreamOptions("maxoffsetspertrigger") == "8")
    // every record arrived exactly once
    val data = spark.read.parquet(s"$root/data")
    assert(data.count() == 20)
    val vals = data.collect().map(r =>
      (r.getAs[Int]("partition"), r.getAs[Long]("offset"))).toSet
    assert(vals == (0 until 12).map(o => (0, o.toLong)).toSet ++
      (0 until 6).map(o => (1, o.toLong)).toSet ++
      (0 until 2).map(o => (2, o.toLong)).toSet)
    // the run split into ≥3 batches (20 rows / cap 8) and each batch stayed
    // under the cap — read off the LEDGER, the audit-surface of record
    val ledger = spark.read.parquet(s"$root/ledger")
    val perBatch = ledger.groupBy("jobRunId")
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.col("untilOffset") -
          org.apache.spark.sql.functions.col("fromOffset")).as("rows"))
      .collect().map(r => r.getAs[Long]("jobRunId") -> r.getAs[Long]("rows")).toMap
    assert(perBatch.size >= 3, s"expected >=3 rate-limited batches: $perBatch")
    assert(perBatch.values.forall(_ <= 8L), s"a batch exceeded the cap: $perBatch")
    assert(perBatch.values.sum == 20L)
    // ledger windows are seamless per partition (continuity green)
    val continuity = graft.dq.Checks.offsetContinuity(ledger, "events_raw")
    assert(continuity.testResult == graft.model.ValidationResult.PASSED)
    // proportional split: batch 0 advanced the laggiest partition the most
    val b0 = ledger.filter(org.apache.spark.sql.functions.col("jobRunId") === 0L)
      .collect().map(r => r.getAs[Int]("partition") ->
        (r.getAs[Long]("untilOffset") - r.getAs[Long]("fromOffset"))).toMap
    assert(b0.getOrElse(0, 0L) > b0.getOrElse(2, 0L),
      s"prorate must favor the laggy partition: $b0")
  }

  test("failOnDataLoss=false reads past a trimmed head: surviving window only, " +
    "loss recorded as a warning the arrival audit turns into a FAILED check") {
    KafkaStubBroker.clear()
    KafkaStubBroker.createPartition("events_raw", 0, first = 5L) // head trimmed to 5
    (0 until 10).foreach(i => KafkaStubBroker.publish("events_raw", 0, s"m$i"))
    // the ledger says this run covered [2, 9) but retention ate [2, 5)
    val ranges = Seq(OffsetRange("events_raw", 0, 7L, 2L, 9L))
    val df = KafkaSource.readBatch(spark, "stub:9092", ranges,
      format = "graft-kafka-stub", failOnDataLoss = false)
    val offs = df.collect().map(_.getAs[Long]("offset")).sorted.toSeq
    // options are captured when the batch scan materializes (the collect)
    assert(KafkaStubBroker.lastBatchOptions("failondataloss") == "false")
    assert(offs == (5L until 9L), s"must emit exactly the surviving window: $offs")
    // the loss is surfaced, not swallowed
    assert(KafkaStubBroker.dataLossEvents.exists(m =>
      m.contains("(events_raw,0)") && m.contains("[2, 9)") && m.contains("[5, 15)")),
      KafkaStubBroker.dataLossEvents.toString)
    // and the arrival audit records it: expected count from the ledger (7)
    // vs what actually survived (4) — offsetCountMatch FAILS, by design
    val ledgerDf = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row("events_raw", 0, 7L, 2L, 9L))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("topicName",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("partition",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("jobRunId",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("fromOffset",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("untilOffset",
          org.apache.spark.sql.types.LongType))))
    val audit = graft.dq.Checks.offsetCountMatch(ledgerDf, df.count(), "events_raw")
    assert(audit.testResult == graft.model.ValidationResult.FAILED)
    assert(audit.comments.contains("expected=7") && audit.comments.contains("actual=4"))
    // whereas failOnDataLoss=true (the default) refuses the same read
    val e = intercept[Exception] {
      KafkaSource.readBatch(spark, "stub:9092", ranges,
        format = "graft-kafka-stub").collect()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse("")).toSeq
    assert(msgs.exists(_.contains("out of available range")), msgs.toString)
  }

  test("readStream through the stub starts at latest and sees only post-start publishes") {
    fixture()
    val out = KafkaSource.readStream(spark, "stub:9092", Seq("events_raw"),
      format = "graft-kafka-stub")
    val q = out.writeStream.format("memory").queryName("kafka_stub_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable() // batch 0: empty (started at latest)
      assert(spark.table("kafka_stub_stream").count() == 0)
      val o1 = KafkaStubBroker.publish("events_raw", 0, "live-1")
      val o2 = KafkaStubBroker.publish("events_raw", 1, "live-2")
      q.processAllAvailable()
      val rows = spark.table("kafka_stub_stream").collect()
        .map(r => (r.getAs[Int]("partition"), r.getAs[Long]("offset"), r.getAs[String]("value"))).toSet
      assert(rows == Set((0, o1, "live-1"), (1, o2, "live-2")), rows.toString)
      // normalize() applied: the kafka-shaped downstream contract columns
      assert(spark.table("kafka_stub_stream").columns.toSeq ==
        Seq("topic", "partition", "offset", "value"))
      // the stream consumed KafkaSource's exact options
      val sopts = KafkaStubBroker.lastStreamOptions
      assert(sopts("startingoffsets") == "latest")
      assert(sopts("subscribe") == "events_raw")
    } finally q.stop()
  }

  test("partition deleted mid-stream with failOnDataLoss=false: the stream continues " +
    "and the deletion is recorded as a structured data-loss seam") {
    KafkaStubBroker.clear()
    KafkaStubBroker.createPartition("events_raw", 0)
    KafkaStubBroker.createPartition("events_raw", 1)
    (0 until 4).foreach(i => KafkaStubBroker.publish("events_raw", 0, s"p0-m$i"))
    (0 until 3).foreach(i => KafkaStubBroker.publish("events_raw", 1, s"p1-m$i"))
    val out = KafkaSource.readStream(spark, "stub:9092", Seq("events_raw"),
      format = "graft-kafka-stub", failOnDataLoss = false,
      startingOffsets = "earliest")
    val q = out.writeStream.format("memory").queryName("stub_del_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      assert(spark.table("stub_del_stream").count() == 7)
      // the broker loses partition 1 (topic deletion / reassignment) while
      // the stream's checkpointed start still references offset 3 on it
      KafkaStubBroker.deletePartition("events_raw", 1)
      KafkaStubBroker.publish("events_raw", 0, "p0-after")
      q.processAllAvailable() // must not throw: warn-and-continue contract
      val rows = spark.table("stub_del_stream").collect()
        .map(r => (r.getAs[Int]("partition"), r.getAs[String]("value"))).toSet
      assert(rows.contains((0, "p0-after")), rows.toString)
      assert(rows.size == 8, rows.toString)
      // the seam is queryable, typed, and names the deletion — not a
      // retention trim — so the audit can attribute it correctly
      assert(KafkaStubBroker.dataLossSeams.exists(s =>
        s.topic == "events_raw" && s.partition == 1 && s.kind == "deleted_partition"),
        KafkaStubBroker.dataLossSeams.toString)
      assert(KafkaStubBroker.dataLossEvents.exists(_.contains("deleted topic-partition")),
        KafkaStubBroker.dataLossEvents.toString)
    } finally q.stop()
    // ...and failOnDataLoss=true (the default) refuses the same state
    // (checked after the stream is down — mutating the broker under a live
    // continuous-trigger stream races its next micro-batch plan)
    val e = intercept[Exception] {
      KafkaStubBroker.fetch(("events_raw", 9), 0L, 1L)
    }
    assert(e.getMessage.contains("unknown topic-partition"), e.getMessage)
  }

  test("offsetContinuityWithSeams: a ledger gap covered by a recorded retention loss " +
    "passes with the loss named; an uncovered gap still fails") {
    KafkaStubBroker.clear()
    // retention trimmed p0's head to 12; a checkpointed read from 9 clamps
    KafkaStubBroker.createPartition("events_raw", 0, first = 12L)
    (0 until 3).foreach(i => KafkaStubBroker.publish("events_raw", 0, s"m$i"))
    KafkaStubBroker.fetch(("events_raw", 0), 9L, 15L, failOnDataLoss = false)
    val seam = KafkaStubBroker.dataLossSeams
    assert(seam == Vector(
      KafkaStubBroker.DataLossSeam("events_raw", 0, 9L, 12L, "trimmed_head")), seam.toString)
    // the trimmed-head message is attributed to retention, not a caller bug
    assert(KafkaStubBroker.dataLossEvents.exists(_.contains("trimmed head")),
      KafkaStubBroker.dataLossEvents.toString)
    import spark.implicits._
    // ledger: run 1 ended at 9, run 2 (post-trim) starts at 12 — a gap
    // exactly covered by the recorded seam; p1 has an uncovered gap
    val ledger = Seq(
      ("events_raw", 0, 1L, 5L, 9L), ("events_raw", 0, 2L, 12L, 15L),
      ("events_raw", 1, 1L, 0L, 4L), ("events_raw", 1, 2L, 6L, 8L))
      .toDF("topicName", "partition", "jobRunId", "fromOffset", "untilOffset")
    val seams = KafkaStubBroker.seamsDf(spark)
    val mixed = graft.dq.Checks.offsetContinuityWithSeams(ledger, seams, "events_raw")
    assert(mixed.testResult == graft.model.ValidationResult.FAILED)
    assert(mixed.comments.contains("1 UNEXPLAINED") && mixed.comments.contains("1 explained"),
      mixed.comments)
    val explainedOnly = graft.dq.Checks.offsetContinuityWithSeams(
      ledger.filter($"partition" === 0), seams, "events_raw")
    assert(explainedOnly.testResult == graft.model.ValidationResult.PASSED)
    assert(explainedOnly.comments.contains("explained by recorded data loss"),
      explainedOnly.comments)
    // an end-beyond-latest request is recorded as the caller bug it is
    KafkaStubBroker.fetch(("events_raw", 0), 12L, 99L, failOnDataLoss = false)
    assert(KafkaStubBroker.dataLossEvents.exists(_.contains("end beyond latest")),
      KafkaStubBroker.dataLossEvents.toString)
    assert(KafkaStubBroker.dataLossSeams.exists(s =>
      s.kind == "end_beyond_latest" && s.lostFrom == 15L && s.lostUntil == 99L),
      KafkaStubBroker.dataLossSeams.toString)
    // ...and that caller-bug seam can NEVER explain a ledger gap: this gap
    // [15, 50) is numerically covered by the [15, 99) end_beyond_latest
    // window, but no broker records were lost there — the check must
    // exclude non-broker-side kinds and stay FAILED
    val ledgerBug = Seq(
      ("events_raw", 0, 1L, 12L, 15L), ("events_raw", 0, 2L, 50L, 60L))
      .toDF("topicName", "partition", "jobRunId", "fromOffset", "untilOffset")
    val laundered = graft.dq.Checks.offsetContinuityWithSeams(
      ledgerBug, KafkaStubBroker.seamsDf(spark), "events_raw")
    assert(laundered.testResult == graft.model.ValidationResult.FAILED,
      laundered.comments)
  }

  test("offsets moved backwards (start beyond end): failOnDataLoss=false reads " +
    "nothing and records the seam; true fails the read — the connector's clamp") {
    KafkaStubBroker.clear()
    KafkaStubBroker.createPartition("events_raw", 0)
    (0 until 3).foreach(i => KafkaStubBroker.publish("events_raw", 0, s"m$i"))
    // a checkpointed start of 20 against a recreated topic whose end is 3
    val got = KafkaStubBroker.fetch(("events_raw", 0), 20L, 3L, failOnDataLoss = false)
    assert(got.isEmpty)
    assert(KafkaStubBroker.dataLossSeams.exists(s =>
      s.kind == "start_beyond_end" && s.lostFrom == 3L && s.lostUntil == 20L),
      KafkaStubBroker.dataLossSeams.toString)
    assert(KafkaStubBroker.dataLossEvents.exists(_.contains("offsets moved backwards")),
      KafkaStubBroker.dataLossEvents.toString)
    val e = intercept[IllegalArgumentException] {
      KafkaStubBroker.fetch(("events_raw", 0), 20L, 3L)
    }
    assert(e.getMessage.contains("inverted window"), e.getMessage)
  }
}
