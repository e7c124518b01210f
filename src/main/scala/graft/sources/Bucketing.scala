package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers for shuffle-free co-located joins.
  *
  * The recurring fact⋈fact joins of the warehouse layers (staging↔3NF
  * reconciliation runs on every load) shuffle both sides on every execution
  * unless the tables are bucketed on the join key; writing both sides with
  * the same bucket count and key lets Spark's FileSourceStrategy plan a
  * sort-merge join with NO Exchange — at 100 TB that's the difference
  * between re-shuffling the fact table per validation run and reading it
  * in place.
  *
  * (Requires a metastore-backed table, hence `saveAsTable`; plain
  * `.parquet()` paths cannot carry bucket metadata.)
  */
object Bucketing {

  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    numBuckets: Int, sortCol: Option[String] = None): Unit = {
    var w = df.write.mode(SaveMode.Overwrite).bucketBy(numBuckets, bucketCol)
    sortCol.foreach(c => w = w.sortBy(c))
    w.format("parquet").saveAsTable(table)
  }

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)

  /** True when the physical plan of `df` contains no shuffle exchange —
    * the assertion that bucketing actually removed the shuffle.
    */
  def isShuffleFree(df: DataFrame): Boolean =
    !df.queryExecution.sparkPlan.toString.contains("Exchange")
}
