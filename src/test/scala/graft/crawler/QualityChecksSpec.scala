package graft.crawler

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

class QualityChecksSpec extends SparkSpecBase {
  import spark.implicits._
  import QualityChecks._

  private def asMap(df: org.apache.spark.sql.DataFrame): Map[String, (Long, Long, Boolean)] =
    df.collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap

  test("all rule families count violations in one pass") {
    val t = Seq(
      (Option(1L), Option("O"), Option(5.0)),
      (Option(2L), Option("X"), Option(-1.0)), // bad status, below range
      (Option.empty[Long], Option("F"), Option(3.0)), // null key
      (Option(2L), Option.empty[String], Option(99.0)) // dup key, null status, above range
    ).toDF("k", "st", "v")
    val r = asMap(validate(t, Seq(
      NotNull("k_not_null", "k"),
      AcceptedValues("st_ok", "st", Seq("O", "F")),
      InRange("v_range", "v", 0.0, 10.0),
      Predicate("v_pos", col("v") > 0),
      Unique("k_unique", "k"))))
    assert(r("k_not_null") === ((1L, 4L, false)))
    assert(r("st_ok") === ((1L, 4L, false))) // null status is NOT an accepted-values violation
    assert(r("v_range") === ((2L, 4L, false)))
    assert(r("v_pos") === ((1L, 4L, false))) // null predicate would also violate; here all non-null
    // 4 rows, 2 distinct non-null keys: the dup AND the null both violate
    // (nulls count as rows but contribute no distinct value)
    assert(r("k_unique") === ((2L, 4L, false)))
  }

  test("clean table passes every rule") {
    val t = Seq((1L, "O", 1.0), (2L, "F", 2.0)).toDF("k", "st", "v")
    val r = asMap(validate(t, Seq(
      NotNull("nn", "k"), Unique("u", "k"),
      AcceptedValues("av", "st", Seq("O", "F")), InRange("ir", "v", 0, 10))))
    assert(r.values.forall { case (v, t2, ok) => v == 0 && t2 == 2 && ok })
  }

  test("referential integrity counts orphan child rows") {
    val parent = Seq(1L, 2L).toDF("pk")
    val child = Seq(Option(1L), Option(2L), Option(3L), Option.empty[Long]).toDF("fk")
    val r = asMap(referential("ref", child, "fk", parent, "pk"))
    // null fk is not an orphan (NotNull's job); 3L is
    assert(r("ref") === ((1L, 4L, false)))
  }

  test("single-pass plan: N rules over one table produce exactly one aggregate pair") {
    val t = Seq((1L, 2.0), (2L, 3.0)).toDF("k", "v")
    val plan = validate(t, Seq(
      NotNull("a", "k"), InRange("b", "v", 0, 10),
      Predicate("c", col("v") > 0))).queryExecution.executedPlan.toString
    // one partial + one final HashAggregate, no join, no extra exchange pairs
    assert("HashAggregate".r.findAllIn(plan).size <= 2, plan)
  }
}
