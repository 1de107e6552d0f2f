package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.HyperLogLogPlusPlus

/** Trino-name parity functions, registered into Catalyst's
  * FunctionRegistry so `spark.sql` text written against the reference's
  * SQL dialect (Trino 468 — walden `docker/devserver/Dockerfile:14`)
  * keeps working. Each is a thin Catalyst-expression rewrite — no UDFs,
  * so whole-stage codegen is preserved.
  */
object GraftFunctions {

  private def reg(spark: SparkSession, name: String)
                 (builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "built-in")

  def register(spark: SparkSession): Unit = synchronized {
    // Trino approx_distinct(x[, e]) -> HLL++ (same sketch family).
    reg(spark, "approx_distinct") { exprs =>
      HyperLogLogPlusPlus(exprs.head).toAggregateExpression()
    }
    // Trino strpos(string, substring) -> 1-based position, 0 if absent.
    reg(spark, "strpos") { exprs =>
      StringLocate(exprs(1), exprs(0), Literal(1))
    }
    // Trino date_diff(unit, from, to) = to - from in `unit`s.
    reg(spark, "date_diff") { exprs =>
      TimestampDiff(unitOf(exprs(0)), Cast(exprs(1), org.apache.spark.sql.types.TimestampType),
        Cast(exprs(2), org.apache.spark.sql.types.TimestampType))
    }
    // Trino TRY(expr) -> NULL on runtime error.
    reg(spark, "try") { exprs => TryEval(exprs.head) }
    // Trino json_extract_scalar(json, path).
    reg(spark, "json_extract_scalar") { exprs =>
      GetJsonObject(exprs(0), exprs(1))
    }
    // Trino day_of_week: ISO, Monday=1..Sunday=7 (Spark dayofweek is
    // Sunday=1..Saturday=7).
    reg(spark, "day_of_week") { exprs =>
      val spk = DayOfWeek(Cast(exprs.head, org.apache.spark.sql.types.DateType))
      Add(Pmod(Add(spk, Literal(5)), Literal(7)), Literal(1))
    }
    // Trino cardinality(array|map) -> size.
    reg(spark, "cardinality") { exprs => Size(exprs.head) }
    // Trino format_datetime ~ date_format (format-pattern caveats documented).
    reg(spark, "format_datetime") { exprs =>
      DateFormatClass(Cast(exprs(0), org.apache.spark.sql.types.TimestampType), exprs(1))
    }
    // Trino to_unixtime(ts) -> double seconds.
    reg(spark, "to_unixtime") { exprs =>
      Cast(UnixTimestamp(exprs.head, Literal("yyyy-MM-dd HH:mm:ss")),
        org.apache.spark.sql.types.DoubleType)
    }
    // graft-native: codegen'd dot product over array<double> (hot path
    // of the similarity-search operators; same fold order as the HOF
    // spelling so oracle hashes are unchanged).
    reg(spark, "vector_dot") { exprs => VectorDot(exprs(0), exprs(1)) }
    // graft-native: merge-count of two sorted array<long> sets (the
    // verification kernel of the set-similarity joins).
    reg(spark, "sorted_intersect_size") { exprs =>
      SortedIntersectSize(exprs(0), exprs(1))
    }
  }

  private def unitOf(e: Expression): String = e match {
    case Literal(u, _) => String.valueOf(u).toUpperCase
    case other => throw new IllegalArgumentException(
      s"date_diff unit must be a string literal, got $other")
  }

  /** True if our functions are visible in this session. */
  def isRegistered(spark: SparkSession): Boolean =
    spark.sessionState.functionRegistry
      .functionExists(FunctionIdentifier("approx_distinct"))
}
