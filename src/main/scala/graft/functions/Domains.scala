package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Domain-reputation curation: the per-registered-domain aggregate +
  * blocklist step a C4/RefinedWeb-style web pipeline runs before any
  * per-document quality filter — whole domains (link farms, mirror hosts,
  * template-spam sites) are cheaper to judge and drop than their documents
  * one by one.
  *
  * Everything is exact arithmetic (counts, BIGINT sums, integer
  * cross-multiplication for the verdicts), so the report runs verbatim
  * under the DuckDB differential oracle; regexes stay in the Java∩RE2
  * subset shared with [[Text]].
  *
  * Scale shape: domain extraction is a scan-local projection; the report
  * is one narrow aggregate keyed by the high-cardinality domain (millions
  * of groups — parallel, no hot reducer); only (domain, fingerprint,
  * chars) ever shuffle, never text. The blocklist that comes out is
  * domain-cardinality ≪ corpus-cardinality and broadcast back for the
  * filter, so the document table is never shuffled at all.
  */
object Domains {

  /** Registered domain (eTLD+1 approximation: the last two dot-labels) of
    * a URL's host, lowercased, port stripped — the rollup unit for crawl
    * reputation: `www.`/`cdn.`/user-subdomain variants of one site must
    * land in one group. Non-http(s) / unparseable URLs yield '' (callers
    * group them under the empty domain rather than dropping rows
    * silently). A public-suffix-list lookup (co.uk, com.br, …) is a
    * broadcast-join refinement over the same key; the two-label cut is the
    * deterministic, list-free core.
    */
  def registeredDomain(url: Column): Column =
    regexp_extract(
      regexp_replace(
        lower(regexp_extract(url, "(?i)^https?://([^/?#]+)", 1)),
        ":[0-9]+$", ""),
      "([^.]+\\.[^.]+)$", 1)

  /** Per-domain reputation report with the block verdict. Columns:
    * `domain, n_docs, n_unique, sum_chars, blocked`. A domain is blocked
    * when it is big enough to judge (`n_docs >= minDocs`) AND either of
    * the spam signals fires:
    *
    *  - duplicate share `1 - n_unique/n_docs` exceeds `maxDupPct`% —
    *    checked as `100·(n_docs − n_unique) > maxDupPct·n_docs`, exact
    *    BIGINT cross-multiplication, no double division;
    *  - mean document length is under `minMeanChars` — checked as
    *    `sum_chars < minMeanChars·n_docs`.
    *
    * `n_unique` counts distinct [[Text.fingerprint]]s (md5 of normalized
    * text → oracle-portable); one distinct column keeps the aggregate a
    * plain two-stage partial-distinct, no Expand (the q36 lesson).
    */
  def domainReputation(df: DataFrame, url: Column, text: Column,
                       nChars: Column, minDocs: Long, maxDupPct: Long,
                       minMeanChars: Long): DataFrame =
    df.select(registeredDomain(url).as("domain"),
        Text.fingerprint(text).as("fp"), nChars.cast("long").as("nc"))
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("fp")).as("n_unique"),
        sum(col("nc")).as("sum_chars"))
      .withColumn("blocked",
        (col("n_docs") >= minDocs) &&
          ((lit(100L) * (col("n_docs") - col("n_unique")) >
            lit(maxDupPct) * col("n_docs")) ||
           (col("sum_chars") < lit(minMeanChars) * col("n_docs"))))

  /** The filter step: documents whose registered domain is blocked are
    * dropped via broadcast LEFT ANTI join — the blocklist is tiny, the
    * corpus side stays map-only and its text never shuffles.
    */
  def blocklistFilter(df: DataFrame, url: Column,
                      reputation: DataFrame): DataFrame =
    df.join(
      broadcast(reputation.filter(col("blocked")).select(col("domain"))),
      registeredDomain(url) === col("domain"), "left_anti")
}
