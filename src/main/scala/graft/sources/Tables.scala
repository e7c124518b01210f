package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Canonical table loader over the parquet star schema.
  *
  * Mirrors the reference's layer-scoped table scans
  * (`Fact_Dagg_automation.sh:116-120` sqlplus `SELECT ... FROM <layer>.<table>`,
  * `KafkaScript_ConformToStaging.sh:143` `hive -e "use governed_data; <q>"`)
  * as plain parquet reads: Catalyst handles predicate pushdown and column
  * pruning, so callers should `select`/`filter` on the returned DataFrame and
  * let the optimizer reach the scan (check `.explain` for PushedFilters /
  * ReadSchema).
  *
  * At cluster scale the same call works against a directory of many parquet
  * files; `spark.sql.files.maxPartitionBytes` governs split sizing — nothing
  * here assumes a single file.
  */
object Tables {
  val starTables: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem",
    "events", "documents", "embeddings")

  /** Read one table from a scale-factor directory. */
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Register every table of the star schema as a temp view so queries can
    * also be expressed via `spark.sql` (the reference stores queries as data
    * — CLOBs in TESTING_QUERIES, `incremental.sh:63-67` — so a SQL execution
    * path is part of the surface).
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    starTables.foreach { t =>
      load(spark, dir, t).createOrReplaceTempView(t)
    }
}
