package graft

import graft.ops.Bloom
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BloomSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bloom filter: no false negatives, bounded table, plausible FP rate") {
    val keys = (1 to 300 by 3).map(_.toLong).toDF("k")
    val bloom = Bloom.build(keys, col("k"))
    val rows = bloom.collect()
    assert(rows.length <= Bloom.Words)
    assert(rows.forall(r => r.getLong(0) >= 0 && r.getLong(0) < Bloom.Words))

    val probe = (1 to 1000).map(_.toLong).toDF("k")
    val verdict = Bloom.mightContain(probe, col("k"), bloom)
      .select(col("k"), col("might_contain"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    // every inserted key MUST test positive
    (1 to 300 by 3).foreach(k => assert(verdict(k.toLong), s"false negative for $k"))
    // absent keys may false-positive, but most of the universe must not:
    // 100 keys * 3 bits in 1024 → theoretical FP ≈ 2%; allow generous slack
    val absent = (1 to 1000).filterNot(k => k <= 300 && k % 3 == 1)
    val fp = absent.count(k => verdict(k.toLong))
    assert(fp.toDouble / absent.size < 0.25, s"fp=$fp of ${absent.size}")
  }

  test("bloom probe broadcasts the filter table and stays map-only") {
    val keys = (1 to 50).map(_.toLong).toDF("k")
    val probed = Bloom.mightContain((1 to 99).map(_.toLong).toDF("k"), col("k"),
      Bloom.build(keys, col("k")))
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join in:\n$plan")
    // the probe side must NOT shuffle: the only exchanges allowed are the
    // broadcast of the (tiny) filter table and its own build aggregates
    val probeSide = probed.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    // build-side bit_or aggregate is the one legitimate shuffle (≤ 32 rows)
    assert(probeSide.size <= 1, s"unexpected probe-side shuffles:\n$plan")
  }

  test("bloom positions are stable md5 lanes (engine-portable contract)") {
    val pos = (1 to 5).map(_.toLong).toDF("k")
      .select(array(Bloom.positions(col("k"), k = 3, mBits = 1024): _*).as("p"))
      .collect().map(_.getSeq[Long](0))
    // deterministic across invocations and within [0, 1024)
    assert(pos.flatten.forall(p => p >= 0 && p < 1024))
    val again = (1 to 5).map(_.toLong).toDF("k")
      .select(array(Bloom.positions(col("k"), k = 3, mBits = 1024): _*).as("p"))
      .collect().map(_.getSeq[Long](0))
    assert(pos.map(_.toList) sameElements again.map(_.toList))
  }
}
