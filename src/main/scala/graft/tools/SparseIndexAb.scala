package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Tfidf

/** Build-once/probe-many A/B for sparse retrieval (r18): measures q90's
  * per-query RECOMPUTE path (tokenize → explode → tf aggregate → df window
  * per probe) against the MATERIALIZED-index probe path (buildIndex +
  * writeIndex once, then N probes reading the postings parquet), on the
  * same corpus with the same query set.
  *
  * This is the measured answer to the one plan-level IOU the r17 audit
  * left open (Tfidf.scala's "at true index scale the production answer is
  * a MATERIALIZED inverted index"): the probe leg must (a) return the
  * byte-identical answer, (b) carry NO term-keyed exchange or window in
  * its plan, and (c) beat recomputation by the margin that justifies
  * maintaining the index at ingest time.
  *
  * Usage: `runMain graft.tools.SparseIndexAb <sfDir> <probes> <outJson>`
  * (defaults: /tmp/graft_sf10, 5, bench_out/r18_sparse_index_ab.json).
  */
object SparseIndexAb {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_sf10")
    val probes = args.lift(1).map(_.toInt).getOrElse(5)
    val outPath = args.lift(2).getOrElse("bench_out/r18_sparse_index_ab.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Logs.quietBoundedWindowWarnings()

    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
    val queries = docs.filter(col("doc_id") < 5)
    def recompute(): DataFrame =
      Tfidf.sparseTopK(docs, col("doc_id"), col("text"),
        queries, col("doc_id"), col("text"), k = 10, maxDfFrac = 0.78)
    docs.count() // warm IO + codegen outside every timed window

    def time(fn: => Unit): Double = {
      val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
    }
    val recomputeSecs = (1 to probes).map(_ => time(recompute().count()))

    val indexPath = s"${sys.props("java.io.tmpdir")}/graft_ab_index"
    val buildSec = time(Tfidf.writeIndex(
      Tfidf.buildIndex(docs, col("doc_id"), col("text"), maxDfFrac = 0.78),
      indexPath))
    def probe(): DataFrame =
      Tfidf.sparseTopKIndexed(spark.read.parquet(indexPath),
        queries, col("doc_id"), col("text"), k = 10)
    val probeSecs = (1 to probes).map(_ => time(probe().count()))

    // identical answers — the A/B is meaningless if the legs diverge
    val a = recompute().collect().map(_.toSeq).toSet
    val b = probe().collect().map(_.toSeq).toSet
    // On divergence, show WHAT differs, not just sizes — the two legs
    // typically return the same row count with different contents, so a
    // size-only message would read "10 vs 10" and explain nothing.
    require(a == b && a.nonEmpty, {
      val onlyRecompute = (a diff b).take(5).mkString("; ")
      val onlyProbe = (b diff a).take(5).mkString("; ")
      s"probe/recompute diverged (${a.size} vs ${b.size} rows): " +
        s"recompute-only sample=[$onlyRecompute] probe-only sample=[$onlyProbe]"
    })

    // the plan invariant the probe path exists for: no term-keyed exchange,
    // no df window, in the PROBE plan
    val plan = probe().queryExecution.executedPlan.toString
    val clean = !plan.contains("hashpartitioning(term") &&
      !plan.contains("windowspecdefinition(term")
    require(clean, "probe plan still carries a term-keyed exchange/window:\n" +
      plan.take(3000))

    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    def r3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val json =
      s"""{"sf":"$sfDir","probes":$probes,
         |"recompute_sec":[${recomputeSecs.map(r3).mkString(",")}],
         |"build_and_write_sec":${r3(buildSec)},
         |"probe_sec":[${probeSecs.map(r3).mkString(",")}],
         |"median_recompute":${r3(med(recomputeSecs))},
         |"median_probe":${r3(med(probeSecs))},
         |"speedup":${r3(med(recomputeSecs) / med(probeSecs))},
         |"probes_to_amortize_build":${r3(buildSec / math.max(med(recomputeSecs) - med(probeSecs), 1e-9))},
         |"probe_plan_term_exchange_free":$clean,
         |"results_identical":true}""".stripMargin.replace("\n", "")
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (json + "\n").getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}
