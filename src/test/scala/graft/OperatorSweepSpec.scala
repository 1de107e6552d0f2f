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
      // Gate guard (round-13): the driver's pandas-based oracle harness
      // cannot sort rows containing array/map/struct cells ("unhashable
      // type: numpy.ndarray" — CORRECTNESS_r12 f25/f27). Every entry
      // must stringify complex outputs per the f16 house style
      // (array_join / ARRAY_TO_STRING on both sides). This closes the
      // gate-divergence class: the local check_oracle.py stringifies
      // tuples and would pass what the driver fails.
      val complex = df.schema.fields.collect {
        case f if {
              import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
              f.dataType.isInstanceOf[ArrayType] ||
              f.dataType.isInstanceOf[MapType] ||
              f.dataType.isInstanceOf[StructType]
            } => s"${f.name}: ${f.dataType.simpleString}"
      }
      assert(complex.isEmpty,
        s"$name emits complex-typed columns the driver gate cannot hash — " +
        s"stringify per f16 house style (array_join both sides): ${complex.mkString("; ")}")
      val n = df.count()
      assert(n >= 0)
    }
  }
}
