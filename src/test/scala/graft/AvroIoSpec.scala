package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.AvroIo

/** The engine-carried avro container sink/source (the reference's conform
  * format — `Kafka_ArrivalToConform.sh:536-540`): schema translation both
  * directions, hive-partitioned layout round-trip, idempotent task replay,
  * and null/binary handling.
  */
class AvroIoSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("schema translation round-trips flat relational types with nullability") {
    val s = StructType(Seq(
      StructField("s", StringType, nullable = true),
      StructField("i", IntegerType, nullable = false),
      StructField("l", LongType, nullable = true),
      StructField("d", DoubleType, nullable = false),
      StructField("f", FloatType, nullable = true),
      StructField("b", BooleanType, nullable = false),
      StructField("raw", BinaryType, nullable = true)))
    assert(AvroIo.toSparkSchema(AvroIo.toAvroSchema(s)) == s)
    intercept[IllegalArgumentException] {
      AvroIo.toAvroSchema(StructType(Seq(
        StructField("nested", ArrayType(LongType), nullable = true))))
    }
  }

  test("partitioned write + read round-trip, nulls and binary included") {
    val dir = Files.createTempDirectory("graft_avroio").toString + "/t"
    val df = Seq(
      (Option("a"), 1L, Option(Array[Byte](1, 2)), "g1"),
      (Option.empty[String], 2L, Option.empty[Array[Byte]], "g1"),
      (Option("c"), 3L, Option(Array[Byte](3)), "g2"))
      .toDF("s", "n", "raw", "grp")
    AvroIo.writeAvro(df, dir, Seq("grp"))
    // layout: hive dirs per partition value
    val dirs = new java.io.File(dir).listFiles().map(_.getName).sorted
    assert(dirs.toSeq == Seq("grp=g1", "grp=g2"), dirs.mkString(","))
    val back = AvroIo.readAvro(spark, dir)
    assert(back.schema.fieldNames.toSeq == Seq("s", "n", "raw", "grp"))
    val rows = back.collect().map(r =>
      (Option(r.getString(0)), r.getLong(1),
        Option(r.getAs[Array[Byte]](2)).map(_.toSeq), r.getString(3))).toSet
    assert(rows == Set(
      (Some("a"), 1L, Some(Seq[Byte](1, 2)), "g1"),
      (None, 2L, None, "g1"),
      (Some("c"), 3L, Some(Seq[Byte](3)), "g2")))
  }

  test("replaying the same write replaces its own files (idempotent task replay)") {
    val dir = Files.createTempDirectory("graft_avroio2").toString + "/t"
    val df = Seq(("a", 1L, "g"), ("b", 2L, "g")).toDF("s", "n", "grp")
    AvroIo.writeAvro(df, dir, Seq("grp"))
    AvroIo.writeAvro(df, dir, Seq("grp"))
    assert(AvroIo.readAvro(spark, dir).count() == 2L,
      "a replayed batch must replace, not duplicate")
  }

  test("unpartitioned write lands at the root and reads back without partition cols") {
    val dir = Files.createTempDirectory("graft_avroio3").toString + "/t"
    Seq((1L, "x"), (2L, "y")).toDF("n", "s")
      .repartition(2).transform(d => { AvroIo.writeAvro(d, dir, Nil); d })
    val back = AvroIo.readAvro(spark, dir)
    assert(back.schema.fieldNames.toSeq == Seq("n", "s"))
    assert(back.as[(Long, String)].collect().toSet == Set((1L, "x"), (2L, "y")))
  }

  test("partition values with reserved path characters escape and unescape") {
    val dir = Files.createTempDirectory("graft_avroio4").toString + "/t"
    // includes a literal "%2F": unescaped '%' would round-trip it as '/'
    val df = Seq(("r1", "a=b/c:d%2Fe")).toDF("s", "grp")
    AvroIo.writeAvro(df, dir, Seq("grp"))
    val back = AvroIo.readAvro(spark, dir).select(col("grp")).head().getString(0)
    assert(back == "a=b/c:d%2Fe", back)
  }
}
