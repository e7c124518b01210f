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

  private def queryKeys(path: String): Set[String] = {
    val f = new java.io.File(path)
    if (!f.exists()) Set.empty
    else """"(q\d+[a-z0-9_]*)"""".r
      .findAllMatchIn(new String(java.nio.file.Files.readAllBytes(f.toPath)))
      .map(_.group(1)).toSet
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
    // suspect/warn gates for itself.
    val floors = queryKeys("BENCH_REF.json")
    val missing = SparkEntry.queries.keySet.diff(floors).toSeq.sorted
    assert(missing.isEmpty,
      s"queries with no BENCH_REF.json floor: ${missing.mkString(", ")}")
  }
}
