package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke over the driver contract: every catalog query runs on sf0.001 and
  * the ones the contract expects non-empty are non-empty. (Value-level
  * correctness is the DuckDB differential oracle — tools/diffcheck.py.)
  */
class QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("entry (flagship dim-enrich) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("every catalog query executes on sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, sf).count(); None }
      catch { case e: Exception => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("; "))
  }

  test("column names match between spark results and oracle SQL aliases") {
    // The driver sorts columns by name before hashing — mismatched aliases
    // break the compare even when values agree. Guard the contract here.
    val expected = Map(
      "q01_pricing_summary" -> Set("l_returnflag", "l_linestatus", "sum_qty",
        "count_order", "sum_base_price", "sum_disc_price"),
      "q02_rank_latest" -> Set("o_custkey", "o_orderkey", "order_date", "o_totalprice"),
      "q03_watermark_bounds" -> Set("min_run_id", "max_run_id"))
    expected.foreach { case (q, cols) =>
      assert(SparkEntry.queries(q)(spark, sf).columns.toSet == cols, q)
    }
  }
}
