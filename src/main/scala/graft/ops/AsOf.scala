package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, the right row with the greatest
  * `rightTime <= leftTime` in the same key group (the standard event-
  * enrichment primitive — "state as of this event").
  *
  * Composed from built-ins per the preference ladder (no custom SparkPlan
  * needed): union both sides with a side marker, one window pass per key
  * ordered by (time, marker) carrying the right attributes forward as ONE
  * struct under a single `last(ignoreNulls)` — so the carried values always
  * come from the same right row even when individual payload columns are
  * null (per-column carries would splice stale values from older rows).
  * Keep left rows. Cost = one shuffle on the key + one sort — identical to
  * what a dedicated as-of SparkPlan would do (sort-merge within key
  * partitions), so composition loses nothing at scale.
  *
  * Right rows sort before left rows at equal timestamps → the match is
  * inclusive (rightTime == leftTime matches), same as DuckDB/kdb ASOF.
  * The right side must be unique per (key, time); pre-dedupe if not.
  */
object AsOf {

  /** @param left       left (probe) rows
    * @param right      right (state) rows, unique per (key, time)
    * @param key        equi-key column name present on both sides
    * @param leftTime   event-time column on `left` (numeric or timestamp)
    * @param rightTime  event-time column on `right`, same type
    * @param rightCols  right columns to carry (become nullable on no match)
    */
  def joinAsOf(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String,
               rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .withColumns(rightCols.map(c => s"__r_$c" -> lit(null)).toMap)
    val r = right.select(
      (col(key) +: rightCols.map(c => col(c).as(s"__r_$c"))) :+
        col(rightTime).as("__t") :+ lit(0).as("__side"): _*)
    // align schemas: right side lacks the left payload columns
    val rAligned = leftCols.filterNot(c => c == key).foldLeft(r) {
      (df, c) => df.withColumn(c, lit(null))
    }
    val unioned = l.select((leftCols.map(col) ++
      rightCols.map(c => col(s"__r_$c")) ++ Seq(col("__t"), col("__side"))): _*)
      .unionByName(rAligned.select((leftCols.map(col) ++
        rightCols.map(c => col(s"__r_$c")) ++ Seq(col("__t"), col("__side"))): _*))
    val w = Window.partitionBy(col(key))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // One struct per right row (null on left rows — a struct of nulls is NOT
    // null, so guard on the side marker), carried by a single
    // last(ignoreNulls): all fields atomically come from the matched row.
    val rightStruct = when(col("__side") === 0,
      struct(rightCols.map(c => col(s"__r_$c").as(c)): _*))
    val carried = unioned
      .withColumn("__asof", last(rightStruct, ignoreNulls = true).over(w))
    carried
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        rightCols.map(c => col("__asof").getField(c).as(s"asof_$c")): _*)
  }
}
