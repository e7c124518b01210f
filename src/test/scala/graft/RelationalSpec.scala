package graft

import graft.ops.Relational
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RelationalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("rankLatest keeps exactly the top row per key with total order") {
    val df = Seq(
      (1L, "2024-01-01", 10L), (1L, "2024-01-03", 11L), (1L, "2024-01-03", 12L),
      (2L, "2024-02-01", 20L)
    ).toDF("job_id", "end_date", "run_id")
    val latest = Relational.rankLatest(df, Seq(col("job_id")),
      Seq(col("end_date").desc, col("run_id").desc))
    val rows = latest.orderBy("job_id").collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(2))).toSeq == Seq((1L, 12L), (2L, 20L)))
  }

  test("watermarkBounds returns (0,0) when no new runs") {
    val ctl = Seq((5L, 1), (6L, 0)).toDF("run_id", "status")
    val wm = Relational.watermarkBounds(ctl, col("run_id"), lit(100L), col("status") === 1)
      .head()
    assert(wm.getLong(0) == 0L && wm.getLong(1) == 0L)
  }

  test("watermarkBounds finds min/max of new successful runs") {
    val ctl = Seq((5L, 1), (7L, 1), (9L, 1), (11L, 0)).toDF("run_id", "status")
    val wm = Relational.watermarkBounds(ctl, col("run_id"), lit(5L), col("status") === 1)
      .head()
    assert(wm.getLong(0) == 7L && wm.getLong(1) == 9L)
  }

  test("duplicateRows finds only duplicated full rows") {
    val df = Seq(("a", 1), ("a", 1), ("a", 2), ("b", 1)).toDF("k", "v")
    val dups = Relational.duplicateRows(df).collect()
    assert(dups.length == 1)
    assert(dups.head.getString(0) == "a" && dups.head.getInt(1) == 1)
    assert(dups.head.getLong(2) == 2L)
  }

  test("listAgg is sorted within group") {
    val df = Seq(("g", "b"), ("g", "a"), ("g", "c")).toDF("g", "v")
    val out = Relational.listAgg(df, Seq(col("g")), col("v")).head()
    assert(out.getString(1) == "a,b,c")
  }

  test("symmetricDiff uses set semantics and tags sides") {
    val a = Seq(1, 2, 2, 3).toDF("x")
    val b = Seq(3, 4).toDF("x")
    val d = Relational.symmetricDiff(a, b).collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
    assert(d == Set((1, "source_only"), (2, "source_only"), (4, "target_only")))
  }

  test("nullAudit flags rows with any null in selected columns") {
    val df = Seq((Some(1), Some("x")), (None, Some("y")), (Some(3), None))
      .toDF("a", "b")
    assert(Relational.nullAudit(df).count() == 2)
    assert(Relational.nullAudit(df, Seq("a")).count() == 1)
  }

  test("caseUnpivot widens name/value pairs without fan-out") {
    val df = Seq((1, "SMS", 10.0), (1, "DATA", 20.0), (2, "SMS", 5.0))
      .toDF("id", "name", "total")
    val wide = Relational.caseUnpivot(df, Seq(col("id")), col("name"), col("total"),
      Seq("SMS", "DATA")).orderBy("id").collect()
    assert(wide.length == 2)
    assert(wide(0).getDouble(1) == 10.0 && wide(0).getDouble(2) == 20.0)
    assert(wide(1).getDouble(1) == 5.0 && wide(1).isNullAt(2))
  }

  test("likeAny matches any pattern in the list") {
    val df = Seq("alpha_widget", "beta_bolt", "gamma").toDF("s")
    assert(df.filter(Relational.likeAny(col("s"), Seq("widget", "bolt"))).count() == 2)
  }

  test("groupTopK is bit-identical to the single-window form on a random frame") {
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(7)
    val rows = (1 to 500).map(i => (i.toLong, s"g${rnd.nextInt(4)}", rnd.nextInt(40)))
    val df = rows.toDF("id", "g", "m")
    for (shards <- Seq(1, 3, 64)) {
      val two = Relational.groupTopK(df, Seq(col("g")),
          Seq(col("m").desc, col("id")), col("id"), k = 7, shards = shards)
        .select("g", "rank", "id", "m").collect().map(_.toSeq).toSet
      val one = df.withColumn("rank", row_number().over(
          Window.partitionBy(col("g")).orderBy(col("m").desc, col("id"))))
        .filter(col("rank") <= 7)
        .select("g", "rank", "id", "m").collect().map(_.toSeq).toSet
      assert(two == one, s"shards=$shards diverged")
    }
  }

  test("groupTopK returns whole groups smaller than k") {
    val df = Seq((1L, "a", 5), (2L, "a", 3), (3L, "b", 9)).toDF("id", "g", "m")
    val out = Relational.groupTopK(df, Seq(col("g")),
      Seq(col("m").desc, col("id")), col("id"), k = 10).collect()
    assert(out.length == 3)
  }

  test("listAggBy orders values by a different column") {
    val df = Seq(("g", "first", 3), ("g", "second", 1), ("g", "third", 2))
      .toDF("g", "v", "ord")
    val out = Relational.listAggBy(df, Seq(col("g")), col("v"), col("ord")).head()
    assert(out.getString(1) == "second,third,first")
  }
}
