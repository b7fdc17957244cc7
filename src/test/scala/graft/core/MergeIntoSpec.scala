package graft.core

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Full SQL MERGE INTO semantics (ordered matched clauses + conditioned
  * insert) and UPDATE … WHERE — the rewrite-scoping (only hit files),
  * clause order, null-key, and duplicate-source contracts. */
class MergeIntoSpec extends SparkSpecBase {
  import spark.implicits._

  private def mk(t: String): Unit =
    TxnTable.createClustered(spark, t,
      (for (g <- 0L until 4L; i <- 1L to 5L)
        yield (g * 10 + i, g, (g * 10 + i) * 100)).toDF("id", "g", "v"),
      Seq(col("g")), targetFiles = 4)

  private def rows(t: String): Set[(Long, Long, Long)] =
    TxnTable.read(spark, t).as[(Long, Long, Long)].collect().toSet

  test("updateWhere rewrites only hit files, casts SET to column type") {
    val t = Files.createTempDirectory("graft_upd").toString + "/t"
    mk(t)
    val before = rows(t)
    val nFiles = TxnTable.snapshotFiles(t).size
    TxnTable.updateWhere(spark, t, col("g") === 1L,
      Map("v" -> (col("v") + lit(0.5)))) // double expr cast back to long
    val c = TxnTable.commits(t).last
    assert(c.op == "update" && c.removes.nonEmpty &&
      c.removes.size < nFiles,
      s"update must rewrite a strict subset of $nFiles files, got $c")
    // the cast truncates +0.5 back to long ⇒ values unchanged for g==1
    assert(rows(t) == before)
    // a real update now
    TxnTable.updateWhere(spark, t, col("g") === 2L,
      Map("v" -> (col("v") * 2)))
    assert(rows(t) == before.map { case (id, g, v) =>
      (id, g, if (g == 2L) v * 2 else v)
    })
    // no-match predicate: version must not move
    val v0 = TxnTable.currentVersion(t)
    TxnTable.updateWhere(spark, t, col("g") === 99L,
      Map("v" -> lit(0L)))
    assert(TxnTable.currentVersion(t) == v0)
  }

  test("mergeInto: ordered clauses, first fire wins; conditioned insert") {
    val t = Files.createTempDirectory("graft_mi").toString + "/t"
    mk(t)
    val nFiles = TxnTable.snapshotFiles(t).size
    // source: ids 11..15 (g=1, matched), 21..22 (g=2, matched),
    // 90,91 (new), one null-keyed row
    val source = Seq(
      (Some(11L), 1000L), (Some(12L), 1000L), (Some(13L), 40L),
      (Some(14L), 40L), (Some(15L), 40L),
      (Some(21L), 7L), (Some(22L), 9000L),
      (Some(90L), 500L), (Some(91L), 30L), (None, 600L))
      .toDF("id", "nv")
    TxnTable.mergeInto(spark, t, source, Seq("id"),
      matched = Seq(
        // clause 1: delete matched rows whose NEW value is tiny
        MatchedDelete(Some(TxnTable.srcCol("nv") < 50L)),
        // clause 2: update the rest to the source value, tagging g
        MatchedUpdate(Map(
          "v" -> TxnTable.srcCol("nv"),
          "g" -> (col("g") + 100L)))),
      notMatched = Seq(NotMatchedInsert(
        Map("id" -> TxnTable.srcCol("id"),
          "g" -> lit(9L),
          "v" -> TxnTable.srcCol("nv")),
        cond = Some(TxnTable.srcCol("nv") >= 100L))))
    val got = TxnTable.read(spark, t).filter(col("id").isNotNull)
      .as[(Long, Long, Long)].collect().toSet
    // deleted: 13,14,15 (nv<50), 21 (nv<50); updated: 11,12 (→1000,
    // g=101), 22 (→9000, g=102); inserted: 90 (nv≥100); NOT 91 (nv<100),
    // NOT the null-key row (insert values project id=null… cond passes
    // nv=600 ⇒ inserted with NULL id — SQL says null keys fall to
    // insert; assert it landed)
    assert(!got.exists(r => Set(13L, 14L, 15L, 21L).contains(r._1)))
    assert(got.contains((11L, 101L, 1000L)) &&
      got.contains((12L, 101L, 1000L)) && got.contains((22L, 102L, 9000L)))
    assert(got.contains((90L, 9L, 500L)) && !got.exists(_._1 == 91L))
    val withNull = TxnTable.read(spark, t)
      .filter(col("id").isNull).as[(Option[Long], Long, Long)].collect()
    assert(withNull.toSeq == Seq((None, 9L, 600L)),
      "null-keyed source row must fall through to the insert clause")
    // untouched groups remain intact
    assert(got.filter(_._2 == 0L).map(_._1) == Set(1L, 2L, 3L, 4L, 5L))
    // only files holding fired rows were rewritten (g=0 and g=3 files
    // untouched): commit removes a strict subset
    val c = TxnTable.commits(t).last
    assert(c.op == "merge" && c.removes.size < nFiles,
      s"merge must rewrite a strict subset of $nFiles files, got $c")
  }

  test("mergeIntoMor: identical clause semantics to mergeInto, zero " +
    "pre-existing files rewritten") {
    val cow = Files.createTempDirectory("graft_mim").toString + "/cow"
    val mor = Files.createTempDirectory("graft_mim").toString + "/mor"
    mk(cow); mk(mor)
    val filesBefore = TxnTable.snapshotFiles(mor).toSet
    val source = Seq(
      (Some(11L), 1000L), (Some(12L), 1000L), (Some(13L), 40L),
      (Some(14L), 40L), (Some(15L), 40L),
      (Some(21L), 7L), (Some(22L), 9000L),
      (Some(90L), 500L), (Some(91L), 30L), (None, 600L))
      .toDF("id", "nv")
    val matched = Seq(
      MatchedDelete(Some(TxnTable.srcCol("nv") < 50L)),
      MatchedUpdate(Map(
        "v" -> TxnTable.srcCol("nv"),
        "g" -> (col("g") + 100L))))
    val notMatched = Seq(NotMatchedInsert(
      Map("id" -> TxnTable.srcCol("id"),
        "g" -> lit(9L),
        "v" -> TxnTable.srcCol("nv")),
      cond = Some(TxnTable.srcCol("nv") >= 100L)))
    TxnTable.mergeInto(spark, cow, source, Seq("id"), matched, notMatched)
    TxnTable.mergeIntoMor(spark, mor, source, Seq("id"), matched,
      notMatched)
    def all(t: String) = TxnTable.read(spark, t)
      .as[(Option[Long], Long, Long)].collect().toSet
    assert(all(mor) == all(cow),
      "MOR and CoW MERGE INTO must produce identical content")
    val c = TxnTable.commits(mor).last
    assert(c.op == "dvmerge" && c.adds.nonEmpty && c.dvs.nonEmpty &&
      c.removes.isEmpty)
    assert(filesBefore.subsetOf(TxnTable.snapshotFiles(mor).toSet),
      "MOR MERGE INTO must not rewrite a single pre-existing file")
    // time travel intact; a later compact materializes identically
    assert(TxnTable.read(spark, mor, 0L).count() == 20)
    TxnTable.compact(spark, mor, targetFiles = 2)
    assert(TxnTable.snapshotDvs(mor).isEmpty && all(mor) == all(cow))
    // no-op source: version unchanged
    val v = TxnTable.currentVersion(mor)
    assert(TxnTable.mergeIntoMor(spark, mor,
      Seq((Some(12345L), 1L)).toDF("id", "nv"), Seq("id"),
      Seq(MatchedDelete(None))) == v)
  }

  test("mergeInto: clause ORDER decides the winner on overlap") {
    val t = Files.createTempDirectory("graft_mi2").toString + "/t"
    mk(t)
    val source = Seq((11L, 5L)).toDF("id", "nv")
    // update listed FIRST claims the row; the unconditional delete
    // after it must not fire
    TxnTable.mergeInto(spark, t, source, Seq("id"),
      matched = Seq(
        MatchedUpdate(Map("v" -> TxnTable.srcCol("nv"))),
        MatchedDelete(None)))
    assert(rows(t).contains((11L, 1L, 5L)),
      "first-listed update must claim the row before the delete")
  }

  test("NOT MATCHED BY SOURCE: full-sync CDC in ONE statement, CoW and " +
    "MOR bit-exact") {
    // source drives inserts, updates, AND deletes of target rows it no
    // longer carries — the replication-by-statement shape
    val cow = Files.createTempDirectory("graft_bs1").toString + "/t"
    val mor = Files.createTempDirectory("graft_bs2").toString + "/t"
    mk(cow); mk(mor)
    val filesBefore = TxnTable.snapshotFiles(mor).toSet
    val source = ((1L to 5L) ++ (11L to 15L)).map(id => (id, id * 1000L))
      .toDF("id", "nv")
      .unionAll(Seq((99L, 7L)).toDF("id", "nv"))
    val matched = Seq(MatchedUpdate(Map("v" -> TxnTable.srcCol("nv"))))
    val notMatched = Seq(NotMatchedInsert(
      Map("id" -> TxnTable.srcCol("id"), "g" -> lit(9L),
        "v" -> TxnTable.srcCol("nv"))))
    // ordered first-fire-wins: unmatched g==3 rows die, the REST of
    // the unmatched rows (g==2) bump v — conditions see TARGET columns
    val bySource = Seq(
      BySourceDelete(Some(col("g") === 3L)),
      BySourceUpdate(Map("v" -> (col("v") + 1L))))
    TxnTable.mergeInto(spark, cow, source, Seq("id"), matched,
      notMatched, bySource = bySource)
    TxnTable.mergeIntoMor(spark, mor, source, Seq("id"), matched,
      notMatched, bySource = bySource)
    val expected =
      ((1L to 5L) ++ (11L to 15L)).map(id => (id, id / 10, id * 1000L))
        .toSet ++
      (21L to 25L).map(id => (id, 2L, id * 100L + 1L)).toSet +
      ((99L, 9L, 7L))
    assert(rows(cow) == expected, s"CoW content wrong: ${rows(cow)}")
    assert(rows(mor) == expected, "MOR must agree bit-exactly with CoW")
    // MOR shape: one dvmerge commit, zero pre-existing files rewritten
    val c = TxnTable.commits(mor).last
    assert(c.op == "dvmerge" && c.dvs.nonEmpty && c.removes.isEmpty)
    assert(filesBefore.subsetOf(TxnTable.snapshotFiles(mor).toSet))
  }

  test("by-source clauses rewrite ONLY the files holding fired rows") {
    val t = Files.createTempDirectory("graft_bs3").toString + "/t"
    mk(t)
    val nFiles = TxnTable.snapshotFiles(t).size
    // source matches nothing; the by-source delete fires only on g==3
    // rows, which the clustered layout pins to one file
    TxnTable.mergeInto(spark, t, Seq((999L, 0L)).toDF("id", "nv"),
      Seq("id"), matched = Nil,
      bySource = Seq(BySourceDelete(Some(col("g") === 3L))))
    val c = TxnTable.commits(t).last
    assert(c.op == "merge" && c.removes.size == 1 && c.removes.size < nFiles,
      s"by-source delete must rewrite only the hit file, got $c")
    assert(rows(t) == (for (g <- 0L until 3L; i <- 1L to 5L)
      yield (g * 10 + i, g, (g * 10 + i) * 100)).toSet)
    // by-source clauses that fire on nothing: version unmoved
    val v0 = TxnTable.currentVersion(t)
    TxnTable.mergeInto(spark, t, Seq((999L, 0L)).toDF("id", "nv"),
      Seq("id"), matched = Nil,
      bySource = Seq(BySourceDelete(Some(lit(false)))))
    assert(TxnTable.currentVersion(t) == v0)
  }

  test("multiple WHEN NOT MATCHED clauses: ordered, first fire wins") {
    val t = Files.createTempDirectory("graft_nm2").toString + "/t"
    mk(t)
    val before = rows(t)
    val source = Seq((99L, 1500L), (100L, 10L)).toDF("id", "nv")
    TxnTable.mergeInto(spark, t, source, Seq("id"), matched = Nil,
      notMatched = Seq(
        NotMatchedInsert(
          Map("id" -> TxnTable.srcCol("id"), "g" -> lit(1L),
            "v" -> TxnTable.srcCol("nv")),
          cond = Some(TxnTable.srcCol("nv") >= 1000L)),
        NotMatchedInsert(
          Map("id" -> TxnTable.srcCol("id"), "g" -> lit(2L),
            "v" -> TxnTable.srcCol("nv")))))
    assert(rows(t) == before + ((99L, 1L, 1500L)) + ((100L, 2L, 10L)),
      "first passing clause must claim the row")
    // an unconditional first clause starves the second entirely
    val source2 = Seq((101L, 1L)).toDF("id", "nv")
    TxnTable.mergeInto(spark, t, source2, Seq("id"), matched = Nil,
      notMatched = Seq(
        NotMatchedInsert(Map("id" -> TxnTable.srcCol("id"),
          "g" -> lit(7L), "v" -> TxnTable.srcCol("nv"))),
        NotMatchedInsert(Map("id" -> TxnTable.srcCol("id"),
          "g" -> lit(8L), "v" -> TxnTable.srcCol("nv")))))
    assert(rows(t).contains((101L, 7L, 1L)) &&
      !rows(t).exists(r => r._1 == 101L && r._2 == 8L))
  }

  test("mergeInto: duplicate source keys rejected; no-op returns base") {
    val t = Files.createTempDirectory("graft_mi3").toString + "/t"
    mk(t)
    val dup = Seq((11L, 1L), (11L, 2L)).toDF("id", "nv")
    intercept[IllegalArgumentException] {
      TxnTable.mergeInto(spark, t, dup, Seq("id"),
        matched = Seq(MatchedUpdate(Map("v" -> TxnTable.srcCol("nv")))))
    }
    // source that matches nothing and inserts nothing: version unmoved
    val v0 = TxnTable.currentVersion(t)
    TxnTable.mergeInto(spark, t, Seq((999L, 1L)).toDF("id", "nv"),
      Seq("id"),
      matched = Seq(MatchedDelete(None)))
    assert(TxnTable.currentVersion(t) == v0)
    // conditions that never fire on matched rows: also a no-op
    TxnTable.mergeInto(spark, t, Seq((11L, 1L)).toDF("id", "nv"),
      Seq("id"),
      matched = Seq(MatchedDelete(Some(lit(false)))))
    assert(TxnTable.currentVersion(t) == v0)
  }
}
