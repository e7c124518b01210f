package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Character-bigram language-model fluency scoring — the cheap statistical
  * stand-in for perplexity-based quality filtering when no trained model is
  * available: documents whose character transitions are typical of the
  * corpus score high, OCR garbage / wrong-charset / boilerplate-code blobs
  * score low.
  *
  * The per-transition "log-prob" is replaced by an INTEGER-scaled
  * conditional frequency, `floor(1e6 * count(c1c2) / count(c1·))`, so a
  * document's score is a sum of BIGINTs — exact, partition-order-free, and
  * reproducible on any engine (double sums are neither). The model itself
  * (alphabet² rows at most) broadcasts; scoring is one explode + one
  * broadcast join + one narrow re-aggregation by doc id.
  */
object LmScore {

  /** Corpus bigram model: (bigram, cnt, prefix_cnt) over the normalized
    * text of `docs`. Two small aggregates; output rows ≤ |alphabet|².
    */
  def bigramModel(docs: DataFrame, textCol: Column): DataFrame = {
    // r20: bigram explode over text is expression-bound — fan small inputs
    // to cores (see Tables.fanOutSmallInput).
    val grams = graft.sources.Tables.fanOutSmallInput(docs).select(
      explode(Text.charShingles(Text.normalized(textCol), 2)).as("bigram"))
    val counts = grams.groupBy(col("bigram")).agg(count(lit(1)).as("cnt"))
    val prefix = counts.groupBy(substring(col("bigram"), 1, 1).as("c1"))
      .agg(sum(col("cnt")).as("prefix_cnt"))
    counts.join(prefix, substring(col("bigram"), 1, 1) === col("c1"))
      .select(col("bigram"), col("cnt"), col("prefix_cnt"))
  }

  /** Per-document fluency: number of scored transitions and the exact
    * integer score sum. Callers derive a mean by dividing; an unseen
    * bigram would contribute 0 (scoring docs against a model from a
    * DIFFERENT corpus is the production case — here every bigram is seen).
    */
  def score(docs: DataFrame, idCol: Column, textCol: Column,
            model: DataFrame): DataFrame = {
    val grams = graft.sources.Tables.fanOutSmallInput(docs)
      .select(idCol.as("doc_id"),
      explode(Text.charShingles(Text.normalized(textCol), 2)).as("bigram"))
    grams.join(broadcast(model), Seq("bigram"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        coalesce(sum(floor(lit(1000000L) * col("cnt") / col("prefix_cnt"))),
          lit(0L)).cast("long").as("lm_score"))
  }
}
