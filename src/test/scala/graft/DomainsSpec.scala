package graft

import graft.functions.Domains
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DomainsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("registeredDomain rolls subdomains, ports and case onto eTLD+1") {
    val cases = Seq(
      "https://www.Site1.net/page" -> "site1.net",
      "http://cdn.assets.site1.net:8080/x?y=1" -> "site1.net",
      "HTTPS://SITE2.NET" -> "site2.net",
      "https://example.com#frag" -> "example.com",
      "ftp://site3.net/x" -> "", // non-http(s): empty, not a false domain
      "not a url" -> "")
    val out = cases.map(_._1).toDF("u")
      .select(col("u"), Domains.registeredDomain(col("u")).as("d"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (u, want) => assert(out(u) == want, u) }
  }

  test("domainReputation blocks on dup share and on mean length, above minDocs") {
    // dupfarm.net: 10 docs, one body  -> dup share 90%   -> blocked
    // shorty.net : 10 docs, 3 chars   -> mean 3 < 10     -> blocked
    // good.net   : 10 distinct normal docs               -> kept
    // tiny.net   : 2 docs of junk     -> under minDocs   -> kept
    val docs =
      (0 until 10).map(i => (s"https://a.dupfarm.net/$i", "same body")) ++
      (0 until 10).map(i => (s"https://shorty.net/$i", s"x$i ")) ++
      (0 until 10).map(i => (s"https://good.net/$i", s"a perfectly normal document body number $i")) ++
      (0 until 2).map(i => (s"https://tiny.net/$i", "j"))
    val rep = Domains.domainReputation(docs.toDF("u", "t"), col("u"),
      col("t"), length(col("t")), minDocs = 5L, maxDupPct = 25L,
      minMeanChars = 10L)
    val by = rep.collect().map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2), r.getBoolean(4)))).toMap
    assert(by("dupfarm.net") == ((10L, 1L, true)))
    assert(by("shorty.net") == ((10L, 10L, true)))
    assert(by("good.net") == ((10L, 10L, false)))
    assert(by("tiny.net") == ((2L, 1L, false)))
    // the filter step drops exactly the blocked domains' documents
    val kept = Domains.blocklistFilter(docs.toDF("u", "t"), col("u"), rep)
      .select(Domains.registeredDomain(col("u"))).distinct()
      .collect().map(_.getString(0)).toSet
    assert(kept == Set("good.net", "tiny.net"))
  }

  test("blocklistFilter plans a broadcast anti join; no text shuffle") {
    val docs = (0 until 100).map(i =>
      (s"https://d${i % 4}.net/$i", s"body $i")).toDF("u", "t")
    val rep = Domains.domainReputation(docs, col("u"), col("t"),
      length(col("t")), 10L, 25L, 2L)
    val plan = Domains.blocklistFilter(docs, col("u"), rep)
      .queryExecution.executedPlan.toString
    // the anti join itself is broadcast (corpus side streams map-only);
    // the only exchanges in the plan belong to the reputation aggregate
    assert(plan.linesIterator.exists(l =>
      l.contains("BroadcastHashJoin") && l.contains("LeftAnti")), plan)
  }
}
