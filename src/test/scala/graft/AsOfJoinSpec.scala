package graft

import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin

/** As-of join semantics (DuckDB/kdb convention: latest right row with
  * rightTs <= leftTs, inclusive) and its one-shuffle plan shape.
  */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val left = Seq(
    ("u1", 10L, "a"), ("u1", 20L, "b"), ("u1", 30L, "c"),
    ("u2", 15L, "d"),
    ("u3", 5L, "e")
  ).toDF("k", "t", "tag")

  private lazy val right = Seq(
    ("u1", 10L, 1.0), ("u1", 25L, 2.0),
    ("u2", 99L, 9.0)
  ).toDF("k", "rt", "rv")

  test("latest right row at or before each left ts; unmatched keep nulls") {
    val out = AsOfJoin.asofLeft(left, right, Seq("k"), "t", "rt")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (Option(r.get(3)).map(_.asInstanceOf[Long]), Option(r.get(4)).map(_.asInstanceOf[Double])))
      .toMap
    assert(out(("u1", 10L)) == ((Some(10L), Some(1.0)))) // inclusive: rt == t matches
    assert(out(("u1", 20L)) == ((Some(10L), Some(1.0)))) // rt=25 is in the future
    assert(out(("u1", 30L)) == ((Some(25L), Some(2.0)))) // latest wins
    assert(out(("u2", 15L)) == ((None, None)))           // only future right rows
    assert(out(("u3", 5L)) == ((None, None)))            // key absent on the right
  }

  test("output keeps exactly left rows (left-outer cardinality)") {
    val out = AsOfJoin.asofLeft(left, right, Seq("k"), "t", "rt")
    assert(out.count() == left.count())
    assert(out.columns.toSeq == Seq("k", "t", "tag", "rt", "rv"))
  }

  test("validateUnique catches a duplicate-keyed right side") {
    val dup = right.union(Seq(("u1", 10L, 99.0)).toDF("k", "rt", "rv"))
    val e = intercept[IllegalArgumentException](
      AsOfJoin.asofLeft(left, dup, Seq("k"), "t", "rt", validateUnique = true))
    assert(e.getMessage.contains("not unique"), e.getMessage)
    // a clean right side passes with validation on
    assert(AsOfJoin.asofLeft(left, right, Seq("k"), "t", "rt", validateUnique = true)
      .count() == left.count())
  }

  test("colliding carried column names are rejected") {
    val bad = right.withColumnRenamed("rv", "tag")
    val e = intercept[IllegalArgumentException](
      AsOfJoin.asofLeft(left, bad, Seq("k"), "t", "rt"))
    assert(e.getMessage.contains("tag"))
  }

  test("one shuffle total: no join node, single exchange") {
    val plan = AsOfJoin.asofLeft(left, right, Seq("k"), "t", "rt")
      .queryExecution.executedPlan.toString
    // the scalable property: a window pass, not a range join
    assert(!plan.contains("Join"), plan)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 exchange, plan:\n$plan")
  }

  test("e07 entry matches a hand-computed per-user trace") {
    val df = SparkEntry.queries("e07_asof_join")(spark, sf())
    // every purchase event must match itself (inclusive as-of)
    val selfMatched = df.filter(col("event_type") === "purchase")
      .filter(col("last_purchase_sec") === col("sec"))
    val purchases = df.filter(col("event_type") === "purchase")
    assert(selfMatched.count() == purchases.count())
    // no event may carry a purchase from the future
    assert(df.filter(col("last_purchase_sec") > col("sec")).count() == 0)
    // rows with no prior purchase carry nulls in BOTH columns
    assert(df.filter(col("last_purchase_sec").isNull =!= col("last_purchase_value").isNull)
      .count() == 0)
  }
}
