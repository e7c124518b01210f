package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r20 micro-probe: cost of one lineage-cut materialization per mechanism
  * (parquet round-trip seam vs reliable checkpoint vs localCheckpoint) on
  * a small and a mid-size frame, bench-like session.
  */
object SeamProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.setCheckpointDir(
      s"${sys.props("java.io.tmpdir")}/graft-ckpt-bench")
    val ckpt = Some(s"${sys.props("java.io.tmpdir")}/graft-ckpt-bench")
    def frame(n: Long) = spark.range(n).select(col("id"),
      (col("id") % 97).as("k"), (col("id") * 31 % 1000003).as("v"))
      .repartition(32)
    def time(label: String, reps: Int)(body: => Unit): Unit = {
      val t0 = System.nanoTime(); (1 to reps).foreach(_ => body)
      println(f"  $label%-34s ${(System.nanoTime() - t0) / 1e9 / reps}%.3f s/op")
    }
    Seq(1000L, 1000000L).foreach { n =>
      println(s"== rows=$n")
      val base = frame(n).localCheckpoint(eager = true)
      base.write.format("noop").mode("overwrite").save()
      time("noop of base (control)", 5) {
        base.write.format("noop").mode("overwrite").save()
      }
      time("parquet write only", 5) {
        base.write.mode("overwrite").parquet(
          s"${sys.props("java.io.tmpdir")}/seamprobe_w")
      }
      time("parquet write coalesce(4)", 5) {
        base.coalesce(4).write.mode("overwrite").parquet(
          s"${sys.props("java.io.tmpdir")}/seamprobe_w")
      }
      time("parquet write 1MB blocks", 5) {
        base.write.option("parquet.block.size", 1024 * 1024)
          .mode("overwrite").parquet(
            s"${sys.props("java.io.tmpdir")}/seamprobe_w")
      }
      time("parquet write uncompressed", 5) {
        base.write.option("compression", "none")
          .mode("overwrite").parquet(
            s"${sys.props("java.io.tmpdir")}/seamprobe_w")
      }
      time("parquet write rebalance-hint", 5) {
        base.hint("rebalance").write.mode("overwrite").parquet(
          s"${sys.props("java.io.tmpdir")}/seamprobe_w")
      }
      time("json write (control)", 5) {
        base.write.mode("overwrite").json(
          s"${sys.props("java.io.tmpdir")}/seamprobe_j")
      }
      time("parquet seam mat (no count)", 5) {
        graft.ops.Materialize.once(base, ckpt)
      }
      time("parquet seam mat + count", 5) {
        graft.ops.Materialize.once(base, ckpt).count()
      }
      time("reliable checkpoint(eager)", 5) {
        base.checkpoint(eager = true).count()
      }
      time("localCheckpoint(eager)", 5) {
        base.localCheckpoint(eager = true).count()
      }
    }
    spark.stop()
  }
}
