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
  * One pass over the data: every per-column aggregate runs in a single
  * Aggregate node (no per-column jobs), then unpivots driver-side from the
  * single collected row — the 100 TB cost is one scan + one partial/final
  * aggregate, independent of column count.
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
    val spark = df.sparkSession
    import spark.implicits._
    val cols = df.columns.toSeq
    val aggs: Seq[Column] = count(lit(1)).as("__n") +: cols.flatMap { c =>
      val distinct =
        if (exact) countDistinct(col(c)) else approx_count_distinct(col(c))
      Seq(
        count(when(col(c).isNull, 1)).as(s"${c}__nulls"),
        distinct.as(s"${c}__distinct"),
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
