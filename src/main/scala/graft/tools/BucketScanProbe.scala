package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Minimal diagnostic for the bucketed-scan cost model: times the three
  * primitive shapes q149-class audits are built from, over the raw
  * parquet table vs the declared bucketed layout —
  *
  *   a. full-scan count(distinct-ish) on the BUCKET key
  *      (`groupBy(l_orderkey).count` — exchange-free over the layout);
  *   b. the same on a NON-bucket key (`groupBy(l_partkey)` — shuffles
  *      either way; isolates pure scan-side cost);
  *   c. plain `count()` (scan only).
  *
  * Usage: `runMain graft.tools.BucketScanProbe <sfDir> [outJson]`.
  */
object BucketScanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_sf100")
    val outJson = args.lift(1)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "1024"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(body: => Long): (Double, Long) = {
      val t0 = System.nanoTime(); val n = body
      ((System.nanoTime() - t0) / 1e9, n)
    }
    def leg(name: String, routed: Boolean): Map[String, Double] = {
      if (!routed) spark.conf.set("spark.graft.bucketed.disabled", "true")
      else spark.conf.unset("spark.graft.bucketed.disabled")
      val li = graft.sources.Tables.load(spark, sfDir, "lineitem")
      val (tScan, _) = time(li.count())
      val (tBucketKey, _) = time(
        li.groupBy(col("l_orderkey")).agg(count(lit(1))).count())
      val (tOtherKey, _) = time(
        li.groupBy(col("l_partkey")).agg(count(lit(1))).count())
      println(f"$name: scan=$tScan%.1f groupBy(orderkey)=$tBucketKey%.1f " +
        f"groupBy(partkey)=$tOtherKey%.1f")
      Map("scan" -> tScan, "groupby_bucket_key" -> tBucketKey,
        "groupby_other_key" -> tOtherKey)
    }
    val raw = leg("raw", routed = false)
    val routed = leg("routed", routed = true)
    // isolate the two knobs the routed leg differs by: the sorted-scan
    // flag, and the bucketed scan itself (auto-disable rule). Confs are
    // set AFTER Tables.load (resolve re-asserts outputOrdering=true on
    // every load) and read at planning time, so each timed action below
    // plans under the stated combination.
    def legConf(name: String, order: Boolean, auto: Boolean): Map[String, Double] = {
      spark.conf.unset("spark.graft.bucketed.disabled")
      val li = graft.sources.Tables.load(spark, sfDir, "lineitem")
      spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering",
        order.toString)
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled",
        auto.toString)
      val (tBucketKey, _) = time(
        li.groupBy(col("l_orderkey")).agg(count(lit(1))).count())
      val (tOtherKey, _) = time(
        li.groupBy(col("l_partkey")).agg(count(lit(1))).count())
      println(f"$name: groupBy(orderkey)=$tBucketKey%.1f groupBy(partkey)=$tOtherKey%.1f")
      Map("groupby_bucket_key" -> tBucketKey, "groupby_other_key" -> tOtherKey)
    }
    val routedNoOrder = legConf("routed_noorder", order = false, auto = true)
    val routedNoAuto = legConf("routed_order_noauto", order = true, auto = false)
    def r1(v: Double) = String.format(java.util.Locale.ROOT, "%.1f", Double.box(v))
    val json = s"""{"sf_dir":"$sfDir",""" +
      s""""raw":{${raw.map { case (k, v) => s""""$k":${r1(v)}""" }.mkString(",")}},""" +
      s""""routed":{${routed.map { case (k, v) => s""""$k":${r1(v)}""" }.mkString(",")}},""" +
      s""""routed_noorder":{${routedNoOrder.map { case (k, v) => s""""$k":${r1(v)}""" }.mkString(",")}},""" +
      s""""routed_order_noauto":{${routedNoAuto.map { case (k, v) => s""""$k":${r1(v)}""" }.mkString(",")}}}"""
    println(json)
    outJson.foreach(p => java.nio.file.Files.write(
      java.nio.file.Paths.get(p), (json + "\n").getBytes("UTF-8")))
    spark.stop()
  }
}
