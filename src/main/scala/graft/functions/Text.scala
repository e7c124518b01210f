package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis columns for large-scale training-data pipelines: token
  * counting, quality scoring, language ID, fingerprinting, shingling.
  *
  * Everything is built from `org.apache.spark.sql.functions._` higher-order
  * array functions — fully codegen'd, no UDFs, so the whole pipeline stays in
  * one WholeStageCodegen span and scales linearly with input: per-row work
  * only, no shuffle introduced by any function here.
  */
object Text {

  /** Whitespace tokenization. `documents.text` is space-separated; the regex
    * keeps this robust to runs of whitespace.
    */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: alpha runs, digit runs, and single
    * non-alphanumeric marks each count as one token — a cheap deterministic
    * stand-in for a real tokenizer's piece count.
    */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Tokens of `text` that appear in `vocab` (stopword hits etc.). */
  def tokensIn(text: Column, vocab: Seq[String]): Column = {
    val vocabArr = array(vocab.map(lit): _*)
    size(filter(tokens(text), t => array_contains(vocabArr, t)))
  }

  private val EnglishStopwords =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that", "for", "on", "with", "as")

  /** Quality-score features: char length, token count, mean token length
    * (x1000, integral for exact cross-engine compare), stopword hits,
    * punctuation count. Downstream filters (e.g. C4-style) threshold on
    * these.
    */
  def qualityFeatures(text: Column): Seq[(String, Column)] = {
    val toks = tokens(text)
    Seq(
      "n_chars" -> length(text),
      "n_tokens" -> size(toks),
      "mean_token_len_x1000" ->
        (aggregate(toks, lit(0L), (acc, t) => acc + length(t)) * 1000L / size(toks)),
      "stopword_hits" -> tokensIn(text, EnglishStopwords),
      "punct_count" -> size(regexp_extract_all(text, lit("[.,;:!?]"), lit(0))))
  }

  /** n-gram-heuristic language ID: score each candidate language by stopword
    * hits; argmax wins, ties broken by the declared language order, zero hits
    * → "und". Deterministic and SQL-expressible — the real-data version just
    * swaps in bigger per-language vocabularies.
    */
  val LangVocab: Seq[(String, Seq[String])] = Seq(
    "en" -> EnglishStopwords,
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "los", "por", "con"),
    "fr" -> Seq("le", "la", "les", "de", "et", "un", "une", "des", "est", "pour"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "den", "ein", "nicht"))

  def langId(text: Column): Column = {
    val scores = LangVocab.map { case (lang, vocab) => lang -> tokensIn(text, vocab) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    // First language (declared order) whose score equals the max — stable ties.
    scores.foldRight(lit("und")) { case ((lang, score), acc) =>
      when(score === best && best > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Exact-document fingerprint: md5 of whitespace-normalized lowercase text.
    * (`md5` exists verbatim in DuckDB → oracle-comparable; for pure Spark
    * pipelines prefer `xxhash64` — 64-bit, no string allocation.)
    */
  def fingerprint(text: Column): Column =
    md5(normalized(text))

  /** 64-bit rolling-style fingerprint for Spark-side pipelines (xxhash64 is
    * codegen'd and 4× cheaper than md5's hex-string path).
    */
  def fingerprint64(text: Column): Column =
    xxhash64(normalized(text))

  def normalized(text: Column): Column =
    lower(regexp_replace(trim(text), "\\s+", " "))

  /** Word k-shingles: overlapping k-grams joined by a space; the unit set for
    * MinHash/Jaccard dedup. Empty array when the document has fewer than k
    * tokens. Native single-pass expression ([[graft.plans.Shingles]]) — the
    * composable HOF form re-tokenizes once per shingle.
    */
  def shingles(text: Column, k: Int): Column =
    graft.plans.TextExpressions.shingles(tokens(normalized(text)), k)

  /** Intra-document repetition (the Gopher/C4-style quality rule): word
    * k-grams that repeat an earlier k-gram of the same document, as
    * (total, repeated) counts — callers derive the ratio. Pure per-row
    * projection, no shuffle.
    */
  def repetitionStats(text: Column, k: Int): Seq[(String, Column)] = {
    val sh = shingles(text, k)
    Seq(
      "n_grams" -> size(sh).cast("long"),
      "n_repeated" -> (size(sh) - size(array_distinct(sh))).cast("long"))
  }

  /** Training-window chunk spans over the token sequence: fixed `chunkSize`
    * windows advancing by `stride` tokens (overlap = chunkSize − stride);
    * the last window truncates, and a document shorter than one window
    * yields a single chunk. Returns an array of
    * `struct(chunk_id, start_tok, chunk_len)` — callers explode it and
    * slice the token array for the chunk text. Pure per-row projection: at
    * corpus scale chunking shuffles nothing and fans out by
    * ~`n_tokens / stride` rows per document.
    */
  def chunkSpans(text: Column, chunkSize: Int, stride: Int): Column = {
    require(chunkSize >= 1 && stride >= 1 && stride <= chunkSize,
      s"need 1 <= stride <= chunkSize, got chunkSize=$chunkSize stride=$stride")
    val n = size(tokens(normalized(text)))
    val nChunks = when(n <= chunkSize, lit(1L)).otherwise(
      ceil((n - chunkSize).cast("double") / stride).cast("long") + 1L)
    transform(sequence(lit(0L), nChunks - 1L), i => struct(
      i.as("chunk_id"),
      (i * stride).as("start_tok"),
      least(lit(chunkSize.toLong), n - i * stride).as("chunk_len")))
  }

  /** Gopher-style document-quality rules as 0/1 flag columns, ready to sum
    * into per-facet pass-rate reports: minimum token count, mean word
    * length in [3, 10], ≥80% of words containing an alphabetic character,
    * ≥2 stopword hits, and repeated-3-gram fraction ≤ 20%. Every
    * comparison is integer cross-multiplication (no float division), so
    * the flags are exact on any engine. Pure per-row projection.
    */
  def gopherFlags(text: Column): Seq[(String, Column)] = {
    val toks = tokens(text)
    val n = size(toks).cast("long")
    val totalLen = aggregate(toks, lit(0L), (acc, t) => acc + length(t))
    val alphaToks = size(filter(toks, t => t.rlike("[A-Za-z]"))).cast("long")
    val sh = shingles(text, 3)
    val flag = (c: Column) => when(c, lit(1L)).otherwise(lit(0L))
    Seq(
      "len_ok" -> flag(n >= 30L),
      "word_len_ok" -> flag(totalLen * 1000L >= n * 3000L &&
        totalLen * 1000L <= n * 10000L),
      "alpha_ok" -> flag(alphaToks * 5L >= n * 4L),
      "stop_ok" -> flag(tokensIn(text, EnglishStopwords) >= 2),
      "rep_ok" -> flag((size(sh) - size(array_distinct(sh))) * 5 <= size(sh)))
  }

  /** Character k-grams of the raw text (positional; fewer than k chars →
    * empty array). Native single-pass expression
    * ([[graft.plans.CharShingles]]); engine-portable semantics (`substr`
    * over character offsets), so Jaccard queries built on it run under the
    * DuckDB differential oracle.
    */
  def charShingles(text: Column, k: Int): Column =
    graft.plans.TextExpressions.char_shingles(text, k)

  // -------------------------------------------------------------------
  // PII scrubbing + URL extraction (training-data curation projections)
  // -------------------------------------------------------------------

  /** PII patterns shared by the detector and the redactor. Deliberately
    * alternation-free constructs (`\d`, `\b`, bounded classes) that mean
    * the same thing to Java's regex engine and RE2 — oracle-portable.
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhonePattern = "\\b\\d{3}-\\d{4}\\b"

  /** Per-document PII hit counts — pure codegen'd projections, no shuffle. */
  def piiCounts(text: Column): Seq[(String, Column)] = Seq(
    "n_emails" -> regexp_count(text, lit(EmailPattern)).cast("long"),
    "n_ips" -> regexp_count(text, lit(Ipv4Pattern)).cast("long"),
    "n_phones" -> regexp_count(text, lit(PhonePattern)).cast("long"))

  /** Redaction with a FIXED pass order — emails first (their host part
    * would otherwise be shredded by the IP pass), then IPs, then phones —
    * so every engine produces byte-identical scrubbed text.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, "<EMAIL>"),
        Ipv4Pattern, "<IP>"),
      PhonePattern, "<PHONE>")

  /** URL hostnames mentioned in the text (the capture group after the
    * scheme), the unit for domain-frequency stats and blocklist filters.
    */
  val UrlHostPattern = "https?://([A-Za-z0-9.-]+)"

  def urlHosts(text: Column): Column =
    regexp_extract_all(text, lit(UrlHostPattern), lit(1))

  /** Canonical URL form for frontier dedup — the normalization a crawl
    * pipeline applies before "have we fetched this already": drop the
    * fragment, lowercase scheme and host, strip a leading `www.`, strip a
    * trailing slash on the path, and drop tracking query parameters
    * (`utm_*`, `fbclid*`) while preserving the rest in order. The scheme
    * is preserved (http and https stay distinct) and matched
    * case-insensitively (`HTTP://` is valid per RFC 3986 and must not
    * produce an empty scheme). A root path collapses to the bare host.
    * Anything that doesn't parse as an http(s) URL passes through
    * UNCHANGED — a frontier must not collapse every unparseable entry
    * onto one degenerate `://` key. Pure per-row string ops in the
    * Java∩RE2 regex subset, replayable verbatim in DuckDB.
    */
  def canonicalizeUrl(url: Column): Column = {
    val nofrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(nofrag, "(?i)^(https?)://", 1))
    val host = regexp_replace(
      lower(regexp_extract(nofrag, "(?i)^https?://([^/?]+)", 1)), "^www\\.", "")
    val path = regexp_replace(
      regexp_extract(nofrag, "(?i)^https?://[^/?]+([^?]*)", 1), "/$", "")
    val qs = regexp_extract(nofrag, "\\?(.*)$", 1)
    val qk = array_join(
      filter(split(qs, "&"),
        p => !(p.startsWith("utm_") || p.startsWith("fbclid"))), "&")
    when(host === "", url)
      .otherwise(concat(scheme, lit("://"), host, path,
        when(qk =!= "", concat(lit("?"), qk)).otherwise(lit(""))))
  }
}
