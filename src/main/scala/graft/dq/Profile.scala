package graft.dq

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, StringType}

/** Catalog-driven column profiling — the generalization of the reference's
  * metadata-generated checks (null counts from `all_tab_columns`,
  * `fact_dim_merging.sh:282-358`; NVL'd aggregates,
  * `FACT_AUTOMATION.sh:221-231`) into one profiling operator: per column,
  * row count, null count, approximate distinct, min/max (rendered as
  * strings so all columns stack into one result).
  *
  * The approx default is ONE pass over the data: every per-column aggregate
  * runs in a single Aggregate node (no per-column jobs), then unpivots
  * driver-side from the single collected row — the 100 TB cost is one scan
  * + one partial/final aggregate, independent of column count.
  *
  * The exact variant deliberately does NOT put N `countDistinct`s in one
  * Aggregate: Spark plans that as an Expand that multiplies every scanned
  * row by N+1 before the shuffle — the one catalog plan that degrades
  * superlinearly with column count. Instead each column gets its own
  * pre-aggregation (`groupBy(value) → count`, map-side combined, shuffle
  * width = #distinct values not #rows), unioned into one job; the scans
  * are column-pruned to a single parquet column each.
  */
object Profile {

  final case class ColumnProfile(
      column: String,
      n_rows: Long,
      n_nulls: Long,
      approx_distinct: Long,
      min_str: String,
      max_str: String)

  def profile(df: DataFrame, exact: Boolean = false): DataFrame = {
    if (exact) return profileExact(df)
    val spark = df.sparkSession
    import spark.implicits._
    val cols = df.columns.toSeq
    val aggs: Seq[Column] = count(lit(1)).as("__n") +: cols.flatMap { c =>
      Seq(
        count(when(col(c).isNull, 1)).as(s"${c}__nulls"),
        approx_count_distinct(col(c)).as(s"${c}__distinct"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val n = row.getAs[Long]("__n")
    cols.map { c =>
      ColumnProfile(c, n,
        row.getAs[Long](s"${c}__nulls"),
        row.getAs[Long](s"${c}__distinct"),
        Option(row.getAs[String](s"${c}__min")).orNull,
        Option(row.getAs[String](s"${c}__max")).orNull)
    }.toDS().toDF()
  }

  /** Exact profile, Expand-free: per column, pre-aggregate to
    * (value → occurrence count) — the distinct count is then the number of
    * non-null groups, and rows/nulls/min/max fold from the same grouped
    * rows, so exactness costs one extra (narrow) shuffle per column
    * instead of an (N+1)× row explosion of the full scan.
    */
  private def profileExact(df: DataFrame): DataFrame =
    df.columns.toSeq.map { c =>
      df.groupBy(col(c).as("__v")).agg(count(lit(1)).as("__cnt"))
        .agg(
          coalesce(sum(col("__cnt")), lit(0L)).as("n_rows"),
          coalesce(sum(when(col("__v").isNull, col("__cnt"))), lit(0L)).as("n_nulls"),
          count(col("__v")).as("approx_distinct"), // exact here: non-null groups
          min(col("__v")).cast("string").as("min_str"),
          max(col("__v")).cast("string").as("max_str"))
        .select(lit(c).as("column"), col("n_rows"), col("n_nulls"),
          col("approx_distinct"), col("min_str"), col("max_str"))
    }.reduce(_ unionAll _)

  /** Approximate quantiles per numeric column (Greenwald-Khanna sketch —
    * one pass, mergeable across partitions; relativeError trades sketch
    * size for accuracy at 100 TB).
    */
  def quantiles(df: DataFrame, probabilities: Seq[Double] = Seq(0.25, 0.5, 0.75, 0.95),
                relativeError: Double = 0.001): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val numCols = df.schema.fields
      .filter(_.dataType.isInstanceOf[NumericType]).map(_.name).toSeq
    val qs = df.stat.approxQuantile(numCols.toArray, probabilities.toArray, relativeError)
    numCols.zip(qs.map(_.toSeq)).toDF("column", "quantiles")
  }

  /** Numeric-column summary (sum/avg via exact decimal where sensible) —
    * kept as a separate narrow pass because string min/max and numeric
    * moments rarely belong to the same audit.
    */
  def numericSummary(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val numCols = df.schema.fields
      .filter(_.dataType.isInstanceOf[NumericType]).map(_.name).toSeq
    if (numCols.isEmpty) return Seq.empty[(String, Double, Double, Double)]
      .toDF("column", "min_val", "max_val", "sum_val")
    val aggs = numCols.flatMap { c =>
      Seq(min(col(c)).cast("double").as(s"${c}__min"),
        max(col(c)).cast("double").as(s"${c}__max"),
        sum(col(c)).cast("double").as(s"${c}__sum"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    numCols.map { c =>
      (c, row.getAs[Double](s"${c}__min"), row.getAs[Double](s"${c}__max"),
        row.getAs[Double](s"${c}__sum"))
    }.toDF("column", "min_val", "max_val", "sum_val")
  }
}
