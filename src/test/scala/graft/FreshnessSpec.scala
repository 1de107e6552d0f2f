package graft

import org.scalatest.funsuite.AnyFunSuite

/** Artifact-freshness gate (round 11, r10 verdict #6): round 10 closed
  * with COVERAGE.md and the self-bench two entries stale because the
  * docs were written BEFORE the last query entries landed. The doc
  * counts are now pinned to the code: adding a query entry without
  * updating COVERAGE.md's newest round-delta paragraph fails the
  * suite. (BENCH_SELF.json freshness is checked by the end-of-round
  * `graft.tools.FreshnessCheck` main instead — a spec would stay red
  * for the whole round between an entry landing and the final bench
  * regeneration, while COVERAGE.md is a one-line edit per entry.)
  */
class FreshnessSpec extends AnyFunSuite {
  test("COVERAGE.md newest entry counts equal SparkEntry.queries/oracleSql") {
    val text = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("COVERAGE.md")), "UTF-8")
    // FIRST match = the "Current:" line at the top of the doc — the
    // authoritative count (maxBy(count) would validate a STALE larger
    // historical paragraph if a round ever removed entries)
    val counts = """(\d+) query entries total; (\d+) with""".r
      .findAllMatchIn(text).map(m => (m.group(1).toInt, m.group(2).toInt)).toSeq
    assert(counts.nonEmpty, "COVERAGE.md lost its entry-count lines")
    val (docQueries, docOracles) = counts.head
    assert(docQueries == SparkEntry.queries.size,
      s"COVERAGE.md newest count says $docQueries query entries; code has " +
        s"${SparkEntry.queries.size} — update the newest round-delta paragraph")
    assert(docOracles == SparkEntry.oracleSql.size,
      s"COVERAGE.md newest count says $docOracles oracle entries; code has " +
        s"${SparkEntry.oracleSql.size}")
  }

  test("every oracleSql key is a queries key, and entry names are unique") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet -- qs
    assert(orphans.isEmpty, s"oracleSql keys without a queries entry: $orphans")
    val names = graft.operators.CoreQueries.entries.map(_.name) ++
      graft.operators.DsQueries.entries.map(_.name) ++
      graft.operators.FunctionQueries.entries.map(_.name) ++
      graft.operators.EventQueries.entries.map(_.name) ++
      graft.operators.TextOps.entries.map(_.name) ++
      graft.operators.VectorOps.entries.map(_.name)
    val dups = names.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicate query entry names (map silently drops one): $dups")
  }
}
