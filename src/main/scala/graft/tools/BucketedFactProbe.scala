package graft.tools

import org.apache.spark.sql.SparkSession

/** Bucketed-layout answer to q174's raw-parquet memory floor (r18, verdict
  * task 3): the 600M⋈150M orderkey sort-merge at sf100 needs ≥1 GB/core on
  * raw parquet because BOTH fact sides exchange+sort on the fly
  * (QueriesCommerce.varianceBridge's Scaladoc records the measured floor
  * and the failed r17 plan fixes). Bucketing lineitem AND orders by
  * orderkey with the same bucket count moves that cost to a ONE-TIME
  * layout step — exactly how a warehouse stores its co-joined facts — and
  * the probe's SMJ reads both sides in place: no exchange, no sort, no
  * allocation wall.
  *
  * Two modes, two JVMs, mirroring ingest-vs-query provisioning:
  *
  *  - `layout <srcDir> <warehouse> <buckets>` (generous heap — ingest):
  *    writes `lineitem_b`/`orders_b` with `bucketBy(buckets, orderkey)` +
  *    `sortBy(orderkey)` under `warehouse`.
  *  - `probe <srcDir> <warehouse> <buckets> <outJson>` (run it at the 8 g /
  *    32-core = 0.25 GB/core heap that OOMs the raw layout): re-declares
  *    the bucketed tables as EXTERNAL (`CREATE TABLE ... CLUSTERED BY ...
  *    LOCATION ...` — bucket metadata lives in the catalog, the files
  *    already carry bucket-id names), runs the IDENTICAL
  *    varianceBridgeFrom logical query over them, asserts the orderkey
  *    exchange is GONE from the physical plan, and records wall + result
  *    row count. Equality of the bucketed-leg results with the raw-parquet
  *    leg is asserted per-value in RunControlBucketingSpec at small sf
  *    (same builder, so the oracle hash is unchanged by construction).
  */
object BucketedFactProbe {

  def main(args: Array[String]): Unit = {
    // Validate BEFORE building a SparkSession: a typo'd mode must die with
    // the usage line immediately, not with a MatchError after 10s of init.
    require(args.length >= 4 && Set("layout", "probe").contains(args(0)),
      "usage: BucketedFactProbe layout|probe <srcDir> <warehouse> <buckets> [outJson]")
    val mode = args(0)
    val srcDir = args(1)
    val warehouse = args(2)
    val buckets = args(3).toInt
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "1024"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.warehouse.dir", warehouse)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    mode match {
      case "layout" =>
        graft.sources.Bucketing.writeBucketed(
          spark.read.parquet(s"$srcDir/lineitem.parquet"),
          "lineitem_b", "l_orderkey", buckets, sortCol = Some("l_orderkey"))
        graft.sources.Bucketing.writeBucketed(
          spark.read.parquet(s"$srcDir/orders.parquet"),
          "orders_b", "o_orderkey", buckets, sortCol = Some("o_orderkey"))
        println(s"""{"layout":"done","buckets":$buckets,"warehouse":"$warehouse"}""")

      case "probe" =>
        val outJson = args.lift(4).getOrElse("bench_out/r18_q174_bucketed_probe.json")
        // Re-declare the layout-step tables in this session's catalog: the
        // bucket SPEC is catalog metadata; the bucket ids are in the file
        // names the layout write produced.
        def declare(name: String, key: String): Unit = {
          val loc = s"$warehouse/$name"
          val ddl = spark.read.parquet(loc).schema.toDDL
          spark.sql(s"""CREATE TABLE $name ($ddl) USING parquet
            CLUSTERED BY ($key) SORTED BY ($key) INTO $buckets BUCKETS
            LOCATION '$loc'""")
        }
        declare("lineitem_b", "l_orderkey")
        declare("orders_b", "o_orderkey")
        val q = graft.Queries.varianceBridgeFrom(
          spark.table("lineitem_b"), spark.table("orders_b"),
          spark.read.parquet(s"$srcDir/part.parquet"))
        val plan = q.queryExecution.executedPlan.toString
        val orderkeyExchangeGone =
          !plan.contains("hashpartitioning(l_orderkey") &&
            !plan.contains("hashpartitioning(o_orderkey")
        require(orderkeyExchangeGone,
          "bucketed probe still exchanges on orderkey:\n" + plan.take(3000))
        val t0 = System.nanoTime()
        val rows = q.count()
        val wall = (System.nanoTime() - t0) / 1e9
        def r1(v: Double): String =
          String.format(java.util.Locale.ROOT, "%.1f", Double.box(v))
        val heap = Runtime.getRuntime.maxMemory() / (1L << 30)
        val json =
          s"""{"probe":"q174_variance_bridge over bucketed lineitem/orders",
             |"sf_dir":"$srcDir","buckets":$buckets,"heap_gib":$heap,
             |"shuffle_partitions":"${spark.conf.get("spark.sql.shuffle.partitions")}",
             |"orderkey_exchange_gone":$orderkeyExchangeGone,
             |"result_rows":$rows,"wall_sec":${r1(wall)},"completed":true}"""
            .stripMargin.replaceAll("\n", "")
        java.nio.file.Files.write(java.nio.file.Paths.get(outJson),
          (json + "\n").getBytes("UTF-8"))
        println(json)
    }
    spark.stop()
  }
}
