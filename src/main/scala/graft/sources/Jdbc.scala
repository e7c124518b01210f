package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC layer adapter — the reference's staging / 3NF / DWDD layers live in
  * Oracle behind sqlplus connection strings (`$STGDB_CONNECTION` at
  * `KafkaScript_ConformToStaging.sh:197`, `$TNFDB_CONNECTION` at
  * `Kafka_3NF.sh:234`, `$DWDDDB_CONNECTION` at
  * `Fact_Dagg_automation.sh:171`); this engine's layers are parquet
  * directories by default, and this adapter lets any layer LOCATION be a
  * `jdbc:` URL instead — [[Tables.load]] routes on the prefix, so every
  * query builder and every [[graft.pipeline.StageRunner]] job runs
  * unchanged against either storage.
  *
  * Scale discipline:
  *  - READ: an unpartitioned JDBC read is ONE task pulling the whole table
  *    through one connection — fine for dims, catastrophic for facts. The
  *    `partitioning` parameter maps to Spark's
  *    `partitionColumn/lowerBound/upperBound/numPartitions` so a fact scan
  *    fans out into N range-bounded queries, one connection each, and the
  *    DB does the striding. Catalyst pushes filters into each partition's
  *    generated SQL (asserted by the PlanSpec twin — look for
  *    `PushedFilters` on the `JDBCRelation` scan), so predicate evaluation
  *    happens IN the database, not after the pull.
  *  - WRITE: each Spark partition opens one connection and batches inserts
  *    (`batchsize`, default 1000); `coalesce` a very wide DataFrame first
  *    if the target DB can't take hundreds of concurrent writers.
  *
  * In this sandbox the only in-JVM engine on the classpath is embedded
  * Derby (`/opt/spark/jars/derby*.jar`, the Hive-metastore dependency), so
  * specs run against `jdbc:derby:`; on a deployment the same call takes any
  * vendor URL + driver (Oracle's `jdbc:oracle:thin:@...` included).
  */
object Jdbc {

  /** A layer location is JDBC when it carries the standard URL scheme. */
  def isJdbcLocation(location: String): Boolean =
    location.startsWith("jdbc:")

  /** Embedded-Derby driver class (in derbytools on the Spark classpath);
    * other vendors resolve via DriverManager from the URL alone.
    */
  private def driverFor(url: String): Option[String] =
    if (url.startsWith("jdbc:derby:")) Some("org.apache.derby.jdbc.EmbeddedDriver")
    else None

  /** Read one table (or `(subquery) alias`) from a JDBC URL.
    *
    * @param partitioning optional (column, lowerBound, upperBound,
    *   numPartitions): splits the read into range-striped parallel queries.
    *   The column should be an indexed integral key (the reference's run-id
    *   and surrogate-key columns are the natural choices).
    */
  def read(spark: SparkSession, url: String, table: String,
           partitioning: Option[(String, Long, Long, Int)] = None,
           driver: Option[String] = None): DataFrame = {
    var r = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
    driver.orElse(driverFor(url)).foreach(d => r = r.option("driver", d))
    partitioning.foreach { case (c, lo, hi, n) =>
      r = r.option("partitionColumn", c)
        .option("lowerBound", lo.toString)
        .option("upperBound", hi.toString)
        .option("numPartitions", n.toString)
    }
    r.load()
  }

  /** Write a DataFrame to a JDBC table. Overwrite maps to Spark's JDBC
    * truncate-or-recreate semantics; Append is the audit-log mode (the
    * *_TEST_LOG sinks are INSERT-only in the reference).
    */
  def write(df: DataFrame, url: String, table: String,
            mode: SaveMode = SaveMode.Overwrite,
            driver: Option[String] = None): Unit = {
    var w = df.write.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
    driver.orElse(driverFor(url)).foreach(d => w = w.option("driver", d))
    w.mode(mode).save()
  }
}
