package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Relational Bloom filter: build a fixed-size bit array from a key set as
  * a tiny (word, bits) table, then test membership of a probe column with a
  * broadcast join — no shuffle of the probe side and no driver round-trip.
  *
  * This is the join-avoidance pattern the reference's blocklist-style
  * lookups want at 100 TB (cf. the control-table gating in
  * `KafkaScript_ConformToStaging.sh` — small key sets steering a large
  * scan): instead of semi-joining a billion-row probe against the key set,
  * the key set folds into [[Words]] longs once, broadcasts everywhere, and
  * the probe stays a map-only scan. False positives are possible (callers
  * re-verify positives exactly when needed); false negatives are not.
  *
  * Bit positions come from md5 substrings (the repo's portable-hash idiom,
  * [[graft.functions.Sampling.hashBucket]]), so the whole construction —
  * build and probe — is reproducible in plain SQL on any engine with md5:
  * position_j = int(md5(key)[8j .. 8j+8)) mod m. Words are 32-bit so every
  * mask stays positive in a signed 64-bit lane on engines whose `<<`
  * overflows at bit 63.
  */
object Bloom {

  /** 32 words × 32 bits = 1024-bit filter. Sized for control-table-scale
    * key sets (hundreds of keys at k=3 → usable FP rate); scale m by
    * raising Words — the table stays broadcast-trivial for any realistic
    * filter (1 MB = 256k words).
    */
  val Words = 32
  val BitsPerWord = 32

  /** The k bit positions of a key: independent 32-bit lanes of md5(key). */
  def positions(key: Column, k: Int, mBits: Int): Seq[Column] =
    (0 until k).map { j =>
      conv(substring(md5(key.cast("string")), 1 + 8 * j, 8), 16, 10)
        .cast("long") % mBits
    }

  private def wordAndMask(df: DataFrame): DataFrame =
    df.withColumn("word", expr(s"pos div $BitsPerWord"))
      .withColumn("mask", expr(s"shiftleft(1L, int(pos % $BitsPerWord))"))

  /** Fold a key column into the (word, bits) filter table — one explode to
    * k rows per key, one map-side-combined `bit_or` aggregate.
    */
  def build(keys: DataFrame, keyCol: Column, k: Int = 3): DataFrame = {
    val m = Words * BitsPerWord
    wordAndMask(keys.select(explode(array(positions(keyCol, k, m): _*)).as("pos")))
      .groupBy(col("word"))
      .agg(expr("bit_or(mask)").as("bits"))
  }

  /** Append a `might_contain` verdict column to `probe`: each of the k bit
    * tests is its own broadcast join on the word index (the filter table is
    * ≤ [[Words]] rows), ANDed in a projection. The probe side stays
    * MAP-ONLY — no shuffle, no per-key aggregate — which is the entire
    * point of a Bloom filter at 100 TB: an explode + groupBy(key) variant
    * would re-shuffle the full probe table just to AND three bits. An
    * absent word means those bits were never set → miss
    * (`coalesce(bits, 0)`).
    */
  def mightContain(probe: DataFrame, keyCol: Column, bloom: DataFrame,
                   k: Int = 3): DataFrame = {
    val m = Words * BitsPerWord
    val pos = positions(keyCol, k, m)
    val joined = pos.zipWithIndex.foldLeft(probe) { case (df, (p, j)) =>
      val b = bloom.select(col("word").as(s"__w$j"), col("bits").as(s"__b$j"))
      df.withColumn(s"__pos$j", p)
        .join(broadcast(b), expr(s"__pos$j div $BitsPerWord") === col(s"__w$j"),
          "left")
    }
    val hit = (0 until k).map { j =>
      val mask = expr(s"shiftleft(1L, int(__pos$j % $BitsPerWord))")
      coalesce(col(s"__b$j"), lit(0L)).bitwiseAND(mask) === mask
    }.reduce(_ && _)
    joined.withColumn("might_contain", hit)
      .drop((0 until k).flatMap(j => Seq(s"__pos$j", s"__w$j", s"__b$j")): _*)
  }
}
