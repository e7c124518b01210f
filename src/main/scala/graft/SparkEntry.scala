package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` holds one named builder per implemented operator from
  * SURVEY.md §2 (and the training-data-pipeline surface); `oracleSql` the
  * DuckDB-equivalent SQL for each (omitted for the xxhash64-based fast paths
  * DuckDB cannot reproduce — those get rows-only checks). Implementations
  * live in [[Queries]]; the underlying operator library is graft.ops /
  * graft.dq / graft.functions.
  */
object SparkEntry {
  /** Flagship query on sf=0.001; driver smoke-checks rows>0. The literal
    * `query.txt:1` shape — scalar subqueries in join ON, aggregating
    * subquery, multi-source name/value CASE-unpivot (`Queries.flagshipFull`).
    */
  def entry(spark: SparkSession): DataFrame =
    Queries.flagshipFull(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Queries.oracle
}
