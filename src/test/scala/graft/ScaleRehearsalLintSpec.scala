package graft

import org.scalatest.funsuite.AnyFunSuite

/** Catalog lint (the r13 verdict's ask): every query in the catalog must
  * carry sf10 scale-rehearsal evidence in a committed artifact — either a
  * per-query time in the full-catalog sweep detail
  * (bench_out/sf10_full_detail.json) or a hand-measured entry in
  * BENCH_SF10.json's `queries` map. A new query added without running the
  * rehearsal protocol (ScaleGen → Bench at /tmp/graft_sf10 with floors
  * disarmed and SPARK_GRAFT_SHUFFLE_PARTITIONS=256, then recording the
  * number) turns this suite red — scale evidence is part of "done", not
  * an end-of-round sweep that can silently miss late additions (the way
  * q54's quadratic block growth hid until the first FULL sf10 sweep).
  */
class ScaleRehearsalLintSpec extends AnyFunSuite {

  private def readFile(path: String): String = {
    val f = new java.io.File(path)
    if (!f.exists()) ""
    else new String(java.nio.file.Files.readAllBytes(f.toPath))
  }

  /** Top-level keys of the named JSON object, extracted by an escape-aware
    * scan (values may themselves be objects, as in BENCH_SF10's per-query
    * entries). String literals are consumed atomically so braces INSIDE
    * them — the errors map holds arbitrary exception text — can never
    * corrupt the depth count (the r15 ADVICE finding: a `{` in a crash
    * message could otherwise let the crashed query count as evidence).
    * A key is a depth-1 string whose next non-space character is ':'.
    */
  private def objectKeys(json: String, objName: String): Set[String] = {
    val start = json.indexOf("\"" + objName + "\"")
    if (start < 0) return Set.empty
    val open = json.indexOf('{', start)
    if (open < 0) return Set.empty
    val keys = scala.collection.mutable.Set.empty[String]
    var i = open
    var depth = 0
    var end = -1
    while (end < 0 && i < json.length) {
      json(i) match {
        case '{' => depth += 1; i += 1
        case '}' => depth -= 1; if (depth == 0) end = i; i += 1
        case '"' =>
          val sb = new StringBuilder
          var j = i + 1
          var esc = false
          var closed = false
          while (!closed && j < json.length) {
            val c = json(j)
            if (esc) { sb += c; esc = false }
            else if (c == '\\') esc = true
            else if (c == '"') closed = true
            else sb += c
            j += 1
          }
          var k = j
          while (k < json.length && json(k).isWhitespace) k += 1
          if (depth == 1 && k < json.length && json(k) == ':') keys += sb.toString
          i = j
        case _ => i += 1
      }
    }
    if (end < 0) Set.empty
    else keys.filter(_.matches("q\\d+[a-z0-9_]*")).toSet
  }

  /** sf10 evidence = a CLEAN per-query time: a key in the artifact's
    * `queries` map that is NOT also in its `errors` map. A query that
    * crashed during the sweep must stay red here (the r14 review finding:
    * the old any-quoted-token regex counted error entries as evidence).
    */
  private def queryKeys(path: String): Set[String] = {
    val json = readFile(path)
    objectKeys(json, "queries") -- objectKeys(json, "errors")
  }

  test("objectKeys survives braces and escaped quotes inside string values") {
    val json = """{"queries":{"q1_a":1.5,"q2_b":{"x":1}},""" +
      """"errors":{"q2_b":"boom {unbalanced \" and } braces: {{{ \"q9_fake\": no"}}"""
    assert(objectKeys(json, "queries") == Set("q1_a", "q2_b"))
    assert(objectKeys(json, "errors") == Set("q2_b"))
  }

  test("every catalog query has an sf10 rehearsal entry in a committed artifact") {
    val rehearsed = queryKeys("bench_out/sf10_full_detail.json") ++
      queryKeys("BENCH_SF10.json")
    assert(rehearsed.nonEmpty,
      "no sf10 artifacts found — expected bench_out/sf10_full_detail.json " +
        "and/or BENCH_SF10.json at the repo root (sbt cwd)")
    val missing = SparkEntry.queries.keySet.diff(rehearsed).toSeq.sorted
    assert(missing.isEmpty,
      s"queries with no sf10 scale-rehearsal evidence: ${missing.mkString(", ")} — " +
        "run the sf10 protocol (see BENCH_SF10.json `protocol`) and record " +
        "the per-query number before shipping")
  }

  test("every catalog query has a committed sf0.1 floor in BENCH_REF.json") {
    // Companion lint: a query without a floor silently disarms the bench's
    // suspect/warn gates for itself. BENCH_REF.json is itself the flat
    // floors object, so its top-level keys are the floor entries.
    val json = readFile("BENCH_REF.json")
    val floors = """"(q\d+[a-z0-9_]*)"\s*:""".r
      .findAllMatchIn(json).map(_.group(1)).toSet
    val missing = SparkEntry.queries.keySet.diff(floors).toSeq.sorted
    assert(missing.isEmpty,
      s"queries with no BENCH_REF.json floor: ${missing.mkString(", ")}")
  }
}
