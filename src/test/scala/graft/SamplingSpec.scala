package graft

import graft.functions.Sampling
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SamplingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = (0L until 1000L).map(i => (i, s"doc $i"))
    .toDF("doc_id", "text")

  test("split is deterministic and roughly proportional") {
    val counts = docs.withColumn("split", Sampling.split(col("doc_id"), 80, 10))
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 1000)
    assert(counts("train") > 700 && counts("train") < 900)
    assert(counts("val") > 40 && counts("val") < 160)
    assert(counts("test") > 40 && counts("test") < 160)
    // pure function of the key: a second run assigns identically
    val again = docs.withColumn("split", Sampling.split(col("doc_id"), 80, 10))
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == counts)
  }

  test("a record keeps its split when the corpus grows (append-only property)") {
    val small = docs.filter(col("doc_id") < 100)
    val assignSmall = small.withColumn("s", Sampling.split(col("doc_id"), 80, 10))
      .select("doc_id", "s").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val assignFull = docs.withColumn("s", Sampling.split(col("doc_id"), 80, 10))
      .filter(col("doc_id") < 100)
      .select("doc_id", "s").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(assignSmall == assignFull)
  }

  test("stratifiedSample returns at most n per stratum, deterministically") {
    val strat = docs.withColumn("lang", when(col("doc_id") % 3 === 0, "en")
      .when(col("doc_id") % 3 === 1, "de").otherwise("fr"))
    val s1 = Sampling.stratifiedSample(strat, Seq(col("lang")), col("doc_id"), 7)
    val perStratum = s1.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perStratum.values.forall(_ == 7), perStratum.toString)
    val ids1 = s1.select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = Sampling.stratifiedSample(strat, Seq(col("lang")), col("doc_id"), 7)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 == ids2)
  }

  test("packByBudget packs by per-shard running start offset") {
    val weighted = docs.withColumn("w", (col("doc_id") % 7 + 1) * 100)
    val packed = Sampling.packByBudget(weighted, col("doc_id"), col("w"),
      budget = 1000L, shards = 4)
      .select("doc_id", "w", "shard", "pack_bin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(packed.length == 1000)
    // recompute the invariant per shard: bin = floor(start_offset / budget)
    packed.groupBy(_._3).foreach { case (_, rows) =>
      var start = 0L
      rows.sortBy(_._1).foreach { case (_, w, _, bin) =>
        assert(bin == start / 1000L)
        start += w
      }
    }
    // weight is conserved: no record lost or double-assigned
    assert(packed.map(_._2).sum ==
      weighted.agg(sum("w")).head().getLong(0))
  }

  test("hashBucket matches its portable SQL derivation") {
    // Guard the oracle contract: first-8-md5-hex-chars as unsigned int.
    val viaSql = docs.select(col("doc_id"),
      expr("pmod(conv(substring(md5(cast(doc_id as string)), 1, 8), 16, 10), 100)")
        .cast("long").as("b"))
    val viaFn = docs.select(col("doc_id"), Sampling.hashBucket(col("doc_id")).as("b"))
    assert(viaFn.exceptAll(viaSql).isEmpty && viaSql.exceptAll(viaFn).isEmpty)
  }
  test("mixtureSample fills quotas by weight, excludes unweighted strata, append-stable") {
    import spark.implicits._
    val docs = (0L until 300L).map(i => (i, Seq("en", "es", "zh")((i % 3).toInt)))
      .toDF("id", "lang")
    val mix = Sampling.mixtureSample(docs, col("lang"), col("id"),
      weights = Map("en" -> 0.6, "es" -> 0.4), total = 50L)
    val byLang = mix.groupBy(col("lang")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang == Map("en" -> 30L, "es" -> 20L)) // floor(0.6*50), floor(0.4*50); zh excluded
    // append stability: growing the corpus never evicts a sampled record
    // whose stratum rank was already within quota... ranks CAN shift as new
    // records hash earlier; what must hold is determinism on identical input
    val again = Sampling.mixtureSample(docs, col("lang"), col("id"),
      weights = Map("en" -> 0.6, "es" -> 0.4), total = 50L)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(again == mix.select(col("id")).collect().map(_.getLong(0)).toSet)
  }

  test("tokenBudgetSample admits a hash-order prefix per stratum within the token budget") {
    import spark.implicits._
    // ids 1..40 in en (7 tokens each), 50..60 in es (3 tokens each), plus a
    // zh doc with no budget entry
    val docs = ((1L to 40L).map(i => ("en", i, "a b c d e f g")) ++
      (50L to 60L).map(i => ("es", i, "x y z")) :+ (("zh", 99L, "w"))).toDF("lang", "id", "txt")
    val out = Sampling.tokenBudgetSample(docs, col("lang"), col("id"),
        graft.functions.Text.tokenCount(col("txt")),
        budgets = Map("en" -> 70L, "es" -> 7L))
      .collect().map(r => (r.getAs[String]("lang"), r.getAs[Long]("id"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("cum_tokens")))
    // budgets admit exactly floor(70/7)=10 en docs and floor(7/3)=2 es docs
    assert(out.count(_._1 == "en") == 10, out.mkString(","))
    assert(out.count(_._1 == "es") == 2)
    assert(!out.exists(_._1 == "zh")) // no budget → excluded
    // the admitted set is the PREFIX of the deterministic hash order
    def bucket(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes).take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) % (1L << 30)
    }
    val expectedEn = (1L to 40L).sortBy(i => (bucket(i), i)).take(10).toSet
    assert(out.filter(_._1 == "en").map(_._2).toSet == expectedEn)
    // cumsum is consistent: max cum_tokens = 10 * 7
    assert(out.filter(_._1 == "en").map(_._4).max == 70L)
  }

  test("quantileBins cuts each stratum into n equal-count ordered bins") {
    import spark.implicits._
    // 23 docs in one stratum → ntile(4) buckets of 6,6,6,5 in metric order
    val docs = (1L to 23L).map(i => ("en", i, i * 10)) :+ (("es", 100L, 5L))
    val df = docs.toDF("lang", "id", "len")
    val out = Sampling.quantileBins(df, col("lang"), col("len"), col("id"), n = 4)
    val en = out.filter(col("lang") === "en")
      .groupBy(col("bin")).agg(count(lit(1)).as("c"), max(col("len")).as("mx"))
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(en == Map(1 -> ((6L, 60L)), 2 -> ((6L, 120L)),
      3 -> ((6L, 180L)), 4 -> ((5L, 230L))))
    // bins respect the metric order: every bin-2 len > every bin-1 len, etc.
    val es = out.filter(col("lang") === "es").select(col("bin")).head().getInt(0)
    assert(es == 1) // a 1-doc stratum lands entirely in the first bin
  }

  test("sqrtMixtureSample quotas follow integer isqrt shares exactly") {
    // strata 900 / 90 / 10 → isqrt weights 30 / 9 / 3, Σ = 42:
    // quotas for total=420 are 300 / 90 / 30 — rare strata upweighted
    // (raw shares would give 378 / 37 / 4)
    val df = (0L until 1000L).map { i =>
      (i, if (i < 900) "en" else if (i < 990) "de" else "fr")
    }.toDF("doc_id", "lang")
    val out = Sampling.sqrtMixtureSample(df, col("lang"), col("doc_id"),
      total = 420L)
    val quotas = out.groupBy("lang").agg(max("quota").as("q"),
        count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(quotas == Map("en" -> ((300L, 300L)), "de" -> ((90L, 90L)),
      "fr" -> ((30L, 10L))), quotas.toString) // fr: quota 30, only 10 exist
  }

  test("sqrtMixtureSample is shard-count-invariant and a hash-order prefix") {
    val df = (0L until 500L).map(i => (i, if (i % 5 == 0) "es" else "en"))
      .toDF("doc_id", "lang")
    def run(shards: Int) = Sampling.sqrtMixtureSample(df, col("lang"),
        col("doc_id"), total = 100L, shards = shards)
      .select("doc_id", "lang", "mix_rank", "quota").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3)))
      .toSet
    val base = run(1) // single window — the brute-force reference
    assert(run(7) == base)
    assert(run(64) == base)
  }

  test("sequentialPoissonSample: shard-count-invariant per-stratum top-k by h/w priority") {
    val df = (0L until 400L)
      .map(i => (i, if (i % 4 == 0) "es" else "en", 1L + i % 97))
      .toDF("doc_id", "lang", "n_chars")
    def run(shards: Int) = Sampling.sequentialPoissonSample(df, col("lang"),
        col("doc_id"), col("n_chars"), k = 20, shards = shards)
      .select("doc_id", "lang", "n_chars", "samp_rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getInt(3)))
      .toSet
    val base = run(1) // single window — the brute-force reference
    assert(base.count(_._2 == "en") == 20 && base.count(_._2 == "es") == 20)
    assert(run(5) == base)
    assert(run(64) == base)
    // heavier records have smaller priorities: the sample's mean weight
    // must exceed the population's (PPS bias, deterministic here)
    val popMean = (0L until 400L).map(i => 1L + i % 97).sum.toDouble / 400
    val sampMean = base.toSeq.map(_._3).sum.toDouble / base.size
    assert(sampMean > popMean, s"$sampMean vs $popMean")
  }

  test("sequentialPoissonSample excludes non-positive weights scan-locally") {
    val df = Seq((1L, "en", 0L), (2L, "en", -3L), (3L, "en", 5L))
      .toDF("doc_id", "lang", "w")
    val out = Sampling.sequentialPoissonSample(df, col("lang"), col("doc_id"),
      col("w"), k = 10).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out == Set(3L))
  }

  test("epochShuffle: exact per-epoch permutations, reshuffled between epochs, shard-invariant") {
    val df = (0L until 300L).toDF("doc_id")
    def run(shards: Int) = Sampling.epochShuffle(df, col("doc_id"),
        epochs = 2, shards = shards)
      .select("doc_id", "epoch", "pos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val base = run(1) // single window — the brute-force reference
    // each epoch is a complete permutation of 1..n
    for (e <- 1 to 2)
      assert(base.filter(_._2 == e).map(_._3) == (1L to 300L).toSet)
    // the two epochs order the corpus differently
    val o1 = base.filter(_._2 == 1).toSeq.sortBy(_._3).map(_._1)
    val o2 = base.filter(_._2 == 2).toSeq.sortBy(_._3).map(_._1)
    assert(o1 != o2)
    assert(run(7) == base)
    assert(run(64) == base)
  }

  test("epochPlan: isqrt weights, exact rational targets and ceil repeat factors") {
    // avail: a = 16 tokens (w 4), b = 9 tokens (w 3); wsum 7, budget 700
    // -> targets 400 / 300; epochs ceil(1000*400/16) = 25000,
    //    ceil(1000*300/9) = 33334.
    val df = Seq(("a", 7L), ("a", 9L), ("b", 9L)).toDF("src", "toks")
    val out = Sampling.epochPlan(df, col("src"), col("toks"), budget = 700L)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(out == Map(
      "a" -> ((2L, 16L, 400L, 25000L)),
      "b" -> ((1L, 9L, 300L, 33334L))), out.toString)
  }

  test("capBlocks: small blocks pass whole, big blocks thin to ~cap, deterministically") {
    // block "small": 50 rows (under cap) — must pass through untouched;
    // block "big": 5000 rows (25x the 200-row cap) — must thin to ~200
    val df = ((1L to 50L).map(i => ("small", i)) ++
      (1000L to 5999L).map(i => ("big", i))).toDF("blk", "id")
    def run() = Sampling.capBlocks(df, Seq("blk"), col("id"), cap = 200L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val kept = run()
    val small = kept.filter(_._1 == "small")
    val big = kept.filter(_._1 == "big")
    assert(small.size == 50, "an under-cap block must keep every row")
    // hashBucket(id)/1e6 < cap/bn keeps each row with p = cap/bn — the
    // sample size concentrates tightly around cap (binomial, sd ~14)
    assert(big.size > 130 && big.size < 270, s"~cap-sized sample, got ${big.size}")
    assert(kept.subsetOf(df.collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet))
    assert(run() == kept, "the hash-thin must be deterministic")
  }

  test("capBlocks: null block keys form a block that caps, not drops") {
    // The r13 ADVICE trap: a plain equi-join on the block cols silently
    // dropped null-keyed rows entirely. The null-safe (<=>) join must
    // treat null as its own block — under-cap passes whole, over-cap thins.
    val df = ((1L to 30L).map(i => (Option.empty[String], i)) ++
      (100L to 199L).map(i => (Some("x"), i))).toDF("blk", "id")
    val kept = Sampling.capBlocks(df, Seq("blk"), col("id"), cap = 50L)
      .collect().map(r => (Option(r.getString(0)), r.getLong(1))).toSet
    val nullBlock = kept.filter(_._1.isEmpty)
    val xBlock = kept.filter(_._1.contains("x"))
    assert(nullBlock.size == 30,
      "an under-cap NULL block must keep every row (not be dropped)")
    assert(xBlock.size > 20 && xBlock.size < 80,
      s"over-cap block thins to ~cap, got ${xBlock.size}")
  }

  test("exactQuantiles reports inverse-ECDF values per stratum") {
    // en: values 1..10 → p50 = value at rank ceil(5) = 5, p90 at rank 9
    // de: 4× the value 7 → every quantile is 7
    val df = ((1L to 10L).map(v => ("en", v)) ++ Seq.fill(4)(("de", 7L)))
      .toDF("lang", "len")
    val out = Sampling.exactQuantiles(df, Seq("lang"), col("len"),
        Seq(0.5, 0.9)).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out == Map("en" -> ((5L, 9L)), "de" -> ((7L, 7L))), out.toString)
  }
}
