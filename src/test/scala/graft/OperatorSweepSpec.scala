package graft

/** Every SparkEntry query must run green on sf0.001 and produce a
  * stable, non-empty schema. Value-level correctness is the driver's
  * DuckDB gate (Verify + oracle_sql); this sweep catches regressions
  * fast and keeps the map/oracle contract in sync.
  */
class OperatorSweepSpec extends SparkSpec {

  test("queries and oracleSql stay consistent") {
    val qs = SparkEntry.queries
    assert(qs.nonEmpty)
    // every oracle key must refer to an implemented query
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs.keySet))
    // most queries should carry an oracle (rows-only is the exception)
    assert(SparkEntry.oracleSql.size >= qs.size - 8,
      s"too many oracle-less queries: ${qs.keySet -- SparkEntry.oracleSql.keySet}")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs on sf0.001") {
      val df = fn(spark, sf())
      assert(df.schema.nonEmpty)
      val n = df.count()
      assert(n >= 0)
    }
  }
}
