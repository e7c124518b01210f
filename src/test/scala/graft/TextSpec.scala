package graft

import graft.functions.Text
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, text: String): Any =
    Seq(text).toDF("text").select(c).head().get(0)

  test("tokens and tokenCount handle whitespace runs") {
    assert(one(Text.tokenCount(col("text")), "a  b\tc") == 3)
    assert(one(Text.tokenCount(col("text")), "single") == 1)
  }

  test("subwordCount splits alpha/digit/punct runs") {
    assert(one(Text.subwordCount(col("text")), "abc123 x!") == 4)
  }

  test("fingerprint is case/whitespace-insensitive") {
    val a = one(Text.fingerprint(col("text")), "The  Cat")
    val b = one(Text.fingerprint(col("text")), "the cat")
    assert(a == b)
    val c = one(Text.fingerprint(col("text")), "the dog")
    assert(a != c)
    assert(one(Text.fingerprint64(col("text")), "The  Cat") ==
      one(Text.fingerprint64(col("text")), "the cat"))
  }

  test("shingles produce overlapping k-grams, empty when too short") {
    val sh = one(Text.shingles(col("text"), 3), "a b c d")
      .asInstanceOf[scala.collection.Seq[String]]
    assert(sh == Seq("a b c", "b c d"))
    val short = one(Text.shingles(col("text"), 3), "a b")
      .asInstanceOf[scala.collection.Seq[String]]
    assert(short.isEmpty)
  }

  test("langId picks the language with most stopword hits, und on none") {
    assert(one(Text.langId(col("text")), "the cat is on the mat") == "en")
    assert(one(Text.langId(col("text")), "el perro de la casa y un gato") == "es")
    assert(one(Text.langId(col("text")), "zzz qqq xxx") == "und")
  }

  test("qualityFeatures shapes") {
    val feats = Text.qualityFeatures(col("text"))
    val row = Seq("the quick brown fox.").toDF("text")
      .select(feats.map { case (n, c) => c.as(n) }: _*).head()
    assert(row.getAs[Int]("n_chars") == 20)
    assert(row.getAs[Int]("n_tokens") == 4)
    assert(row.getAs[Int]("stopword_hits") == 1)
    assert(row.getAs[Int]("punct_count") == 1)
  }
  test("repetitionStats counts repeated word k-grams") {
    val df = Seq("go stop go stop go stop").toDF("text")
    val stats = Text.repetitionStats(col("text"), 3).map { case (n, c) => c.as(n) }
    val r = df.select(stats: _*).head()
    // grams: [go stop go, stop go stop, go stop go, stop go stop] -> 2 repeats
    assert(r.getAs[Long]("n_grams") == 4L)
    assert(r.getAs[Long]("n_repeated") == 2L)
    val none = Seq("all grams here are unique words").toDF("text")
      .select(stats: _*).head()
    assert(none.getAs[Long]("n_repeated") == 0L)
  }
  test("chunkSpans covers every token with stride overlap, truncated tail") {
    val spans = Text.chunkSpans(col("text"), chunkSize = 4, stride = 3)
    // 11 tokens, size 4, stride 3 -> full windows at 0,3,6 and a truncated
    // tail at 9 (len 2); 10 tokens would need NO tail (window at 6 covers 6-9)
    val r = Seq(((1 to 11).map(i => s"t$i").mkString(" "))).toDF("text")
      .select(explode(spans).as("c"))
      .select(col("c.chunk_id"), col("c.start_tok"), col("c.chunk_len"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSeq
    assert(r == Seq((0L, 0L, 4L), (1L, 3L, 4L), (2L, 6L, 4L), (3L, 9L, 2L)))
    val ten = Seq(((1 to 10).map(i => s"t$i").mkString(" "))).toDF("text")
      .select(explode(spans).as("c")).count()
    assert(ten == 3L)
    // short doc -> exactly one chunk of its own length
    val short = Seq("a b").toDF("text").select(explode(spans).as("c"))
      .select(col("c.chunk_id"), col("c.chunk_len"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
    assert(short == Seq((0L, 2L)))
  }

  test("piiCounts and redactPii find and scrub emails, IPs, phones in order") {
    val txt = "mail a.b@x.co or c@y.org from 10.0.3.7 call 555-0199 not 1234-5678"
    val df = Seq(txt).toDF("text")
    val counts = df.select(Text.piiCounts(col("text")).map { case (n, c) => c.as(n) }: _*)
      .head()
    assert(counts.getLong(0) == 2L, "emails")
    assert(counts.getLong(1) == 1L, "ips")
    // 555-0199 matches; 1234-5678 does not (\b\d{3}- needs exactly 3 digits)
    assert(counts.getLong(2) == 1L, "phones")
    val red = df.select(Text.redactPii(col("text")).as("r")).head().getString(0)
    assert(red == "mail <EMAIL> or <EMAIL> from <IP> call <PHONE> not 1234-5678")
    // email pass must run before the IP pass: a digits-and-dots local/host
    // part would otherwise be shredded into an <IP> island
    val tricky = Seq("v1.2.3.4@host.example.com").toDF("text")
      .select(Text.redactPii(col("text"))).head().getString(0)
    assert(tricky == "<EMAIL>")
  }

  test("urlHosts extracts the hostname capture from http(s) URLs") {
    val hosts = Seq("see https://a.example.com/path?q=1 and http://www.b.org/x plain c.com")
      .toDF("text").select(Text.urlHosts(col("text")).as("h"))
      .head().getSeq[String](0)
    assert(hosts == Seq("a.example.com", "www.b.org"))
  }

  test("canonicalizeUrl: case/www/slash/tracking/fragment variants collapse; real params survive") {
    def canon(u: String): String =
      Seq(u).toDF("u").select(Text.canonicalizeUrl(col("u"))).head().getString(0)
    // the full gauntlet in one URL
    assert(canon("https://WWW.Example.COM/a/b/?utm_source=x&ref=1#frag")
      == "https://example.com/a/b?ref=1")
    // scheme is preserved, host lowercased, path case kept
    assert(canon("http://Site.ORG/Path") == "http://site.org/Path")
    // root path + tracking-only query collapses to the bare host
    assert(canon("https://site.org/?utm_a=1") == "https://site.org")
    // fbclid dropped, param order of survivors preserved
    assert(canon("https://s.io/p?b=2&fbclid=xyz&a=1") == "https://s.io/p?b=2&a=1")
    // already-canonical URLs are fixpoints
    val fix = "https://example.com/a/b?ref=1"
    assert(canon(fix) == fix && canon(canon(fix)) == canon(fix))
    // uppercase SCHEME is valid per RFC 3986 and must canonicalize, not
    // collapse to an empty-scheme '://' key
    assert(canon("HTTP://A.com/x") == "http://a.com/x")
    assert(canon("HTTPS://WWW.B.net/") == "https://b.net")
    // unparseable entries pass through unchanged — distinct garbage must
    // never merge onto one degenerate frontier key
    assert(canon("notaurl") == "notaurl")
    assert(canon("ftp://files.example.com/a") == "ftp://files.example.com/a")
    assert(canon("mailto:a@b.c") == "mailto:a@b.c")
  }
}
