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

  /** Top-level keys of the named JSON object, extracted by brace matching
    * (values may themselves be objects, as in BENCH_SF10's per-query
    * entries). Dependency-free on purpose — the artifacts are flat enough
    * that a counter suffices and strings in them never contain braces.
    */
  private def objectKeys(json: String, objName: String): Set[String] = {
    val start = json.indexOf("\"" + objName + "\"")
    if (start < 0) return Set.empty
    val open = json.indexOf('{', start)
    if (open < 0) return Set.empty
    var (i, depth) = (open, 0)
    var end = -1
    while (end < 0 && i < json.length) {
      json(i) match {
        case '{' => depth += 1
        case '}' => depth -= 1; if (depth == 0) end = i
        case _ =>
      }
      i += 1
    }
    if (end < 0) return Set.empty
    val body = json.substring(open, end + 1)
    // keys at depth 1 only: strip nested objects before matching
    val flat = {
      val sb = new StringBuilder
      var d = 0
      body.foreach {
        case '{' => d += 1; if (d == 1) sb += '{'
        case '}' => d -= 1; if (d == 0) sb += '}'
        case c if d == 1 => sb += c
        case _ =>
      }
      sb.toString
    }
    """"(q\d+[a-z0-9_]*)"\s*:""".r.findAllMatchIn(flat).map(_.group(1)).toSet
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
