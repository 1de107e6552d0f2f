package graft.tools

/** End-of-round artifact-freshness gate (round 11, r10 verdict #6):
  * round 10 shipped COVERAGE.md and BENCH_r10_self.json two entries
  * stale because both were produced before the round's final query
  * entries landed. This main re-derives every count from the CODE and
  * exits nonzero naming each stale artifact, so the closing checklist
  * is `runMain graft.tools.FreshnessCheck [selfBenchPath]` AFTER the
  * last entry + self-bench regeneration (COVERAGE.md alone is also
  * suite-pinned by FreshnessSpec, which runs per-commit).
  *
  * Checks:
  *  - COVERAGE.md newest "N query entries total; M with" == code counts
  *  - the self-bench JSON's "queries" key set == SparkEntry.queries keys
  */
object FreshnessCheck {
  def main(args: Array[String]): Unit = {
    val selfBench = args.headOption.getOrElse("BENCH_SELF.json")
    val qs = graft.SparkEntry.queries.keySet
    val oracles = graft.SparkEntry.oracleSql.keySet
    var bad = List.empty[String]

    val cov = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("COVERAGE.md")), "UTF-8")
    val counts = """(\d+) query entries total; (\d+) with""".r
      .findAllMatchIn(cov).map(m => (m.group(1).toInt, m.group(2).toInt)).toSeq
    if (counts.isEmpty) bad ::= "COVERAGE.md: no entry-count line found"
    else {
      // FIRST match = the authoritative "Current:" top-of-doc line
      val (dq, dor) = counts.head
      if (dq != qs.size) bad ::= s"COVERAGE.md: says $dq query entries, code has ${qs.size}"
      if (dor != oracles.size) bad ::= s"COVERAGE.md: says $dor oracles, code has ${oracles.size}"
    }

    val p = java.nio.file.Paths.get(selfBench)
    if (!java.nio.file.Files.exists(p)) bad ::= s"$selfBench: missing"
    else {
      val txt = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
      // the bench line's "queries" object: {"name":sec,...} — extract
      // number-valued keys; the envelope's own number-valued scalars
      // are excluded by name ("metric"/"unit"/"sf" carry strings and
      // never match)
      val keys = """"([a-z][a-z0-9_]+)"\s*:\s*-?[0-9.]+""".r
        .findAllMatchIn(txt).map(_.group(1)).toSet
        .diff(Set("value", "loadavg_before", "loadavg_after"))
      val missing = qs -- keys
      val extra = keys -- qs
      if (missing.nonEmpty)
        bad ::= s"$selfBench: missing ${missing.size} entries: ${missing.toSeq.sorted.take(8).mkString(",")}"
      if (extra.nonEmpty)
        bad ::= s"$selfBench: ${extra.size} entries not in code: ${extra.toSeq.sorted.take(8).mkString(",")}"
    }

    if (bad.nonEmpty) {
      bad.reverse.foreach(m => System.err.println(s"STALE: $m"))
      sys.exit(1)
    }
    println(s"FRESH: COVERAGE.md + $selfBench match code (${qs.size} entries, ${oracles.size} oracles)")
  }
}
