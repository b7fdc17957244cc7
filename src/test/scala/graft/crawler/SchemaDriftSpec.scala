package graft.crawler

import graft.SparkSpecBase

class SchemaDriftSpec extends SparkSpecBase {
  import spark.implicits._

  private def schema(rows: (String, String, String, Int)*) =
    rows.toDF("dataset", "col_name", "dtype", "position")

  test("added, removed, retyped, moved, unchanged") {
    val oldS = schema(
      ("t", "a", "bigint", 0), ("t", "b", "string", 1),
      ("t", "c", "int", 2), ("t", "d", "double", 3))
    val newS = schema(
      ("t", "a", "bigint", 0), ("t", "b", "string", 2), // moved
      ("t", "c", "bigint", 1), // retyped (and moved — retyped wins)
      ("t", "e", "string", 3)) // added; d removed
    val d = SchemaDrift.diff(oldS, newS).orderBy("col_name").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    assert(d === Seq(("b", "moved"), ("c", "retyped"), ("d", "removed"), ("e", "added")))
  }

  test("identical schemas diff to empty") {
    val s = schema(("t", "a", "bigint", 0), ("u", "a", "string", 0))
    assert(SchemaDrift.diff(s, s).count() === 0)
  }

  test("same column name in different datasets does not cross-match") {
    val oldS = schema(("t", "a", "bigint", 0), ("u", "a", "string", 0))
    val newS = schema(("t", "a", "string", 0)) // u removed entirely
    val d = SchemaDrift.diff(oldS, newS).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(d === Set(("t", "a", "retyped"), ("u", "a", "removed")))
  }

  test("end-to-end over a real crawl: unchanged lake has zero drift") {
    val s1 = SchemaDrift.schemaTable(spark, sf0001)
    val s2 = SchemaDrift.schemaTable(spark, sf0001)
    assert(SchemaDrift.diff(s1, s2).count() === 0)
  }
}
