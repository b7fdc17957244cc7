package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

class SnapshotDiffSpec extends SparkSpecBase {
  import spark.implicits._

  private def oldSnap = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))
    .toDF("k", "s", "v")

  private def newSnap = Seq(
    (1L, "a", 10.0),  // unchanged
    (2L, "B", 20.0),  // update (string payload)
    (3L, "c", 31.5),  // update (numeric payload)
    (5L, "e", 50.0))  // insert; 4 deleted
    .toDF("k", "s", "v")

  test("classifies insert/delete/update and omits unchanged") {
    val d = SnapshotDiff.diff(oldSnap, newSnap, Seq("k"))
      .orderBy("k").collect()
    assert(d.map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((2L, "update"), (3L, "update"), (4L, "delete"), (5L, "insert")))
    // new-side payload carried on insert/update, null on delete
    assert(d.find(_.getLong(0) == 3L).get.getDouble(3) === 31.5)
    assert(d.find(_.getLong(0) == 4L).get.isNullAt(2))
  }

  test("payload encoding is unambiguous: no cross-field merge, no sentinel collision") {
    // delimiter-free concat merges these; separator-based concat merges
    // when the value itself contains the separator byte
    val o1 = Seq((1L, "ab", "c"), (2L, "a\u0001", "b")).toDF("k", "x", "y")
    val n1 = Seq((1L, "a", "bc"), (2L, "a", "\u0001b")).toDF("k", "x", "y")
    assert(SnapshotDiff.diff(o1, n1, Seq("k")).count() === 2)
    // no string sentinel can collide with null under JSON encoding
    val o2 = Seq((1L, Option("\u0000")), (2L, Option("null"))).toDF("k", "x")
    val n2 = Seq((1L, Option.empty[String]), (2L, Option.empty[String])).toDF("k", "x")
    assert(SnapshotDiff.diff(o2, n2, Seq("k")).count() === 2)
  }

  test("null vs empty-string payloads are distinct changes, and null==null is unchanged") {
    val o = Seq((1L, Option.empty[String]), (2L, Option(""))).toDF("k", "s")
    val n = Seq((1L, Option("")), (2L, Option.empty[String])).toDF("k", "s")
    val d = SnapshotDiff.diff(o, n, Seq("k"))
    assert(d.count() === 2) // both flips detected
    val same = SnapshotDiff.diff(o, o, Seq("k"))
    assert(same.count() === 0)
  }

  test("round-trip: applyUpserts(old, diff) reproduces new exactly") {
    val delta = SnapshotDiff.diff(oldSnap, newSnap, Seq("k"))
      // applyUpserts semantics: version > base's 0, delete marker column.
      .withColumn("version", lit(1L))
      .withColumn("deleted", col("op") === "delete")
      .drop("op")
    val base = oldSnap.withColumn("version", lit(0L)).withColumn("deleted", lit(false))
    val rebuilt = Dedup.applyUpserts(base, delta,
        keyCols = Seq("k"), versionCol = "version", deleteCol = Some("deleted"))
      .select("k", "s", "v")
    assert(rebuilt.exceptAll(newSnap).count() === 0)
    assert(newSnap.exceptAll(rebuilt).count() === 0)
  }

  test("real table: diff of a table against itself is empty") {
    val orders = graft.core.Lake.table(spark, sf0001, "orders")
    assert(SnapshotDiff.diff(orders, orders, Seq("o_orderkey")).count() === 0)
  }

  test("diffImages: both row images carried, consistent with diff") {
    val o = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "s", "v")
    val n = Seq((2L, "b", 25.0), (3L, "c", 30.0), (4L, "d", 40.0))
      .toDF("k", "s", "v")
    val d = SnapshotDiff.diffImages(o, n, Seq("k")).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(d.keySet == Set(1L, 2L, 4L)) // 3 unchanged
    val del = d(1L)
    assert(del.getAs[String]("op") == "delete" && del.isNullAt(3) &&
      del.getStruct(2).getDouble(1) == 10.0,
      "a delete must carry its BEFORE image and a null after")
    val upd = d(2L)
    assert(upd.getAs[String]("op") == "update" &&
      upd.getStruct(2).getDouble(1) == 20.0 &&
      upd.getStruct(3).getDouble(1) == 25.0,
      "an update must carry both images")
    val ins = d(4L)
    assert(ins.getAs[String]("op") == "insert" && ins.isNullAt(2) &&
      ins.getStruct(3).getDouble(1) == 40.0,
      "an insert must carry its AFTER image and a null before")
    // same keys + ops as the plain diff
    val plain = SnapshotDiff.diff(o, n, Seq("k")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(plain == d.map { case (k, r) => (k, r.getAs[String]("op")) }.toSet)
  }
}
