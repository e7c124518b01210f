package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sf-scale-up generator: replicate an existing testdata directory K×
  * with key-shifted replicas, so the heavy bench queries can be REHEARSED
  * at sf1 (the r12 verdict's top item: convert the lint-proven 100×-scale
  * claims into measured evidence). The driver's testdata is read-only and
  * fixed at sf ≤ 0.1; this main derives a larger set from it without
  * touching it.
  *
  * Scaling model — "K independent copies of the economy", which is how
  * TPC-H itself scales (more customers/orders/parts, same dimension
  * constants, same distributions):
  *  - region/nation stay fixed (dimension constants at every sf);
  *  - every other table gets K replicas with primary AND foreign keys
  *    shifted by replica × stride (stride = max key + 1), so join
  *    fan-outs, key cardinalities and group sizes all scale linearly and
  *    referential integrity is preserved within each replica;
  *  - document TEXT is re-tokenized per replica (`r<i>` prefixed to every
  *    token): replica corpora are shingle-disjoint, so the near-dup RATE
  *    stays that of the source corpus instead of every doc landing in a
  *    K-clique of exact copies — the degenerate dup graph a naive copy
  *    would produce. n_chars is recomputed to match.
  *  - embedding VECTORS are cyclically rotated per replica: norms and
  *    intra-replica geometry are preserved exactly while replicas land
  *    near-orthogonal to each other — K× the corpus, not K× identical
  *    points at distance 0.
  *  - event timestamps are kept: K× the events per day models K× the
  *    traffic on the same calendar, which is what stresses the
  *    shuffle/window paths.
  *
  * Usage: `runMain graft.tools.ScaleGen <srcDir> <destDir> <replicas>`
  * (e.g. `/root/testdata/sf0.1 /tmp/graft_sf1 10`). Deterministic —
  * re-running reproduces the same bytes modulo parquet row-group layout.
  */
object ScaleGen {

  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: ScaleGen <srcDir> <destDir> <replicas>")
    val (src, dest, k) = (args(0), args(1), args(2).toInt)
    require(k >= 1)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def read(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")
    def write(df: DataFrame, t: String): Unit = {
      df.write.mode("overwrite").parquet(s"$dest/$t.parquet")
      println(s"[scalegen] $t: ${spark.read.parquet(s"$dest/$t.parquet").count()} rows")
    }
    // stride per keyed table: max key + 1 (one tiny driver-side aggregate
    // per table — metadata-sized, not a data collect)
    def stride(t: String, key: String): Long =
      read(t).agg(max(col(key))).head().getLong(0) + 1L

    val (cS, sS, pS, oS) = (stride("customer", "c_custkey"),
      stride("supplier", "s_suppkey"), stride("part", "p_partkey"),
      stride("orders", "o_orderkey"))
    val (eS, uS) = (stride("events", "event_id"),
      read("events").agg(max(col("user_id"))).head().getLong(0) + 1L)
    val (dS, vS) = (stride("documents", "doc_id"), stride("embeddings", "vec_id"))
    // Guard the embedding replica family BEFORE any table is written: a
    // require that fires mid-generation would leave dest holding seven
    // new-scale tables and a missing/stale embeddings.parquet — a
    // silently cross-scale-inconsistent rehearsal directory.
    val dim = read("embeddings")
      .select(size(col("embedding"))).head().getInt(0)
    require(k <= 2 * dim,
      s"embedding replicas k=$k exceeds 2*dim=${2 * dim}: the " +
        "rotation+reversal family wraps; lower k or widen vectors")
    // pairwise distinctness additionally needs dim >= 3 once the family
    // wraps past the pure rotations: at dim 2 reversal equals rotation-by-1
    // (and at dim 1 it is the identity), so replicas dim..2*dim-1 would be
    // byte-identical to replicas 0..dim-1 — the degenerate distance-0
    // geometry the family exists to avoid.
    require(k <= dim || dim >= 3,
      s"embedding replicas k=$k with dim=$dim: reversal degenerates to a " +
        "rotation below dim 3, so the wrapped half duplicates the first")

    def replicate(t: String)(tf: (DataFrame, Int) => DataFrame): Unit =
      write((0 until k).map(i => tf(read(t), i)).reduce(_ unionByName _), t)

    // dimension constants: fixed at every sf, copied once
    write(read("region"), "region")
    write(read("nation"), "nation")

    replicate("customer")((d, i) =>
      d.withColumn("c_custkey", col("c_custkey") + lit(i * cS)))
    replicate("supplier")((d, i) =>
      d.withColumn("s_suppkey", col("s_suppkey") + lit(i * sS)))
    replicate("part")((d, i) =>
      d.withColumn("p_partkey", col("p_partkey") + lit(i * pS)))
    replicate("orders")((d, i) => d
      .withColumn("o_orderkey", col("o_orderkey") + lit(i * oS))
      .withColumn("o_custkey", col("o_custkey") + lit(i * cS)))
    replicate("lineitem")((d, i) => d
      .withColumn("l_orderkey", col("l_orderkey") + lit(i * oS))
      .withColumn("l_partkey", col("l_partkey") + lit(i * pS))
      .withColumn("l_suppkey", col("l_suppkey") + lit(i * sS)))
    replicate("events")((d, i) => d
      .withColumn("event_id", col("event_id") + lit(i * eS))
      .withColumn("user_id", col("user_id") + lit(i * uS)))
    replicate("documents")((d, i) => {
      val txt = if (i == 0) col("text")
        else regexp_replace(col("text"), "(\\S+)", s"r$i$$1")
      d.withColumn("doc_id", col("doc_id") + lit(i * dS))
        .withColumn("text", txt)
        .withColumn("n_chars", length(col("text")).cast("long"))
    })
    // Replica permutation family: rotation by i % dim, composed with a
    // full reversal on odd wraps (i / dim odd). Both are fixed
    // permutations applied uniformly to every vector of the replica, so
    // all intra-replica dot products / distances are preserved exactly;
    // reversal is orientation-flipping while rotations are not, so the
    // 2·dim members are pairwise distinct and no replica is a
    // byte-identical copy of another (rot = i % dim alone collides at
    // i = dim, 2·dim, … — the degenerate distance-0 K-clique geometry
    // this family exists to avoid; the guard ran before the first write).
    replicate("embeddings")((d, i) => {
      val rot = i % dim
      val rotated = if (rot == 0) col("embedding")
        else concat(slice(col("embedding"), rot + 1, dim - rot),
          slice(col("embedding"), 1, rot))
      val emb = if ((i / dim) % 2 == 0) rotated else reverse(rotated)
      d.withColumn("vec_id", col("vec_id") + lit(i * vS))
        .withColumn("embedding", emb)
    })
    spark.stop()
  }
}
