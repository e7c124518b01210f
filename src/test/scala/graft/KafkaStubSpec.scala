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
    val bad = Seq(OffsetRange("events_raw", 0, 43L, 2L, 6L)) // earliest is 5
    val e = intercept[Exception] {
      KafkaSource.readBatch(spark, "stub:9092", bad, format = "graft-kafka-stub").collect()
    }
    assert(e.getMessage != null)
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
}
