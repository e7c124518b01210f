package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for every suite (per-suite sessions would pay
  * ~5s JVM/context startup each).
  */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    Logs.quietBoundedWindowWarnings()
    s
  }
}

/** Kafka-shaped test record (top-level: inner case classes break encoder
  * codegen and fall back to interpreted mode).
  */
case class KRec(topic: String, partition: Int, offset: Long, value: String)
