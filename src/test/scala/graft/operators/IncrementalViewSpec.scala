package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.core.TxnTable
import graft.streaming.StreamIvm

/** Incremental min/max/count/sum view maintenance, pinned:
  *  - count/sum fold exactly; min/max grow monotonically from inserts
  *    with ZERO files read;
  *  - a delete/update whose before-image sits strictly inside its
  *    group's (mn, mx) folds with ZERO files read (untouched groups'
  *    files are never re-read — the non-invertible recompute is
  *    triggered, and priced, only by extremes);
  *  - extreme-touching deletes recompute ONLY the affected groups via
  *    the pruned reads (files read < live snapshot);
  *  - every step's state equals a direct recompute of the snapshot;
  *  - the streaming maintainer is exactly-once across restarts and
  *    no-ops on redelivery.
  */
class IncrementalViewSpec extends SparkSpecBase {
  import spark.implicits._

  private def direct(t: String, v: Long): Seq[(Long, Long, Long, Long, Long)] =
    IncrementalView.materializeMinMax(
        TxnTable.read(spark, t, v), "g", "v")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .toSeq.sortBy(_._1)

  private def snap(df: DataFrame): Seq[(Long, Long, Long, Long, Long)] =
    df.select(col("g"), col("cnt"), col("sm"), col("mn"), col("mx"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .toSeq.sortBy(_._1)

  test("min/max view: monotone inserts free, extreme deletes pruned recompute") {
    val t = Files.createTempDirectory("graft_ivm").toString + "/t"
    // 4 groups × values 10g+1 .. 10g+9, one file per group
    val rows = for (g <- 0L until 4L; i <- 1L to 9L)
      yield (g * 100 + i, g, g * 10 + i)
    TxnTable.createClustered(spark, t,
      rows.toDF("id", "g", "v"), Seq(col("g")), targetFiles = 4) // v0

    var state = IncrementalView.materializeMinMax(
      TxnTable.read(spark, t, 0L), "g", "v")
    assert(snap(state) == direct(t, 0L))

    // v1: interior insert + duplicate-of-max insert — monotone fold,
    // no recompute, no files read
    TxnTable.append(spark, t,
      Seq((150L, 1L, 15L), (350L, 3L, 39L)).toDF("id", "g", "v"))
    val (s1, st1) = IncrementalView.maintainMinMaxStep(spark, t, state,
      0L, 1L, Seq("id"), "g", "v")
    assert(st1.affectedGroups == 0 && st1.filesRead == 0)
    assert(snap(s1) == direct(t, 1L))
    state = s1

    // v2: delete group 2's max row — ONLY group 2 recomputed, from a
    // strict subset of the snapshot's files
    TxnTable.deleteWhere(spark, t, col("id") === 209L)
    val (s2, st2) = IncrementalView.maintainMinMaxStep(spark, t, state,
      1L, 2L, Seq("id"), "g", "v")
    assert(st2.affectedGroups == 1)
    assert(st2.filesRead > 0 && st2.filesRead < st2.liveFiles,
      s"extreme recompute must prune: read ${st2.filesRead} of ${st2.liveFiles}")
    assert(snap(s2) == direct(t, 2L))
    assert(snap(s2).find(_._1 == 2L).get._5 == 28L, "new max after delete")
    state = s2

    // v3: interior delete (15 sits strictly inside group 1's range) —
    // zero files read, nothing recomputed
    TxnTable.deleteWhere(spark, t, col("id") === 105L)
    val (s3, st3) = IncrementalView.maintainMinMaxStep(spark, t, state,
      2L, 3L, Seq("id"), "g", "v")
    assert(st3.affectedGroups == 0 && st3.filesRead == 0,
      "interior delete must not trigger the recompute path")
    assert(snap(s3) == direct(t, 3L))
    state = s3

    // v4: one update lifts group 1's MIN row (recompute, group 1 only),
    // another raises a group-2 interior value past the max (monotone)
    TxnTable.merge(spark, t,
      Seq((101L, 1L, 16L), (203L, 2L, 35L)).toDF("id", "g", "v"),
      Seq("id"), clusterBy = Seq(col("g")))
    val (s4, st4) = IncrementalView.maintainMinMaxStep(spark, t, state,
      3L, 4L, Seq("id"), "g", "v")
    assert(st4.affectedGroups == 1, "interior-before update must not recompute")
    assert(snap(s4) == direct(t, 4L))
    val g2 = snap(s4).find(_._1 == 2L).get
    assert(g2._5 == 35L, "monotone max growth from update after-image")
    state = s4

    // v5: duplicate-extreme delete (one of two value-39 rows in group
    // 3): recompute keeps 39 from the surviving duplicate
    TxnTable.deleteWhere(spark, t, col("id") === 309L)
    val (s5, st5) = IncrementalView.maintainMinMaxStep(spark, t, state,
      4L, 5L, Seq("id"), "g", "v")
    assert(st5.affectedGroups == 1)
    assert(snap(s5) == direct(t, 5L))
    assert(snap(s5).find(_._1 == 3L).get._5 == 39L)
    state = s5

    // v6: whole-group delete — the group drops out of the view
    TxnTable.deleteWhere(spark, t, col("g") === 0L)
    val (s6, _) = IncrementalView.maintainMinMaxStep(spark, t, state,
      5L, 6L, Seq("id"), "g", "v")
    assert(snap(s6) == direct(t, 6L))
    assert(!snap(s6).exists(_._1 == 0L))
  }

  test("streaming maintainer: exactly-once folds, redelivery no-op") {
    val root = Files.createTempDirectory("graft_sivm").toString
    val t = s"$root/t"
    val view = s"$root/view"
    val ckpt = s"$root/ckpt"
    val rows = for (g <- 0L until 4L; i <- 1L to 9L)
      yield (g * 100 + i, g, g * 10 + i)
    TxnTable.createClustered(spark, t,
      rows.toDF("id", "g", "v"), Seq(col("g")), targetFiles = 4) // v0

    // pass 1: initial materialization (v0)
    StreamIvm.maintainMinMaxView(spark, t, view, Seq("id"), "g", "v", ckpt)
    assert(StreamIvm.appliedVersion(view).contains(0L))
    assert(snap(TxnTable.read(spark, view)) == direct(t, 0L))

    // three more commits, then pass 2 folds them incrementally
    TxnTable.append(spark, t, Seq((150L, 1L, 15L)).toDF("id", "g", "v"))
    TxnTable.deleteWhere(spark, t, col("id") === 209L)
    TxnTable.merge(spark, t, Seq((101L, 1L, 16L)).toDF("id", "g", "v"),
      Seq("id"), clusterBy = Seq(col("g")))
    StreamIvm.maintainMinMaxView(spark, t, view, Seq("id"), "g", "v", ckpt)
    assert(StreamIvm.appliedVersion(view).contains(3L))
    assert(snap(TxnTable.read(spark, view)) == direct(t, 3L))

    // pass 3 with no new commits: the view table must not move at all
    val vBefore = TxnTable.currentVersion(view)
    StreamIvm.maintainMinMaxView(spark, t, view, Seq("id"), "g", "v", ckpt)
    assert(TxnTable.currentVersion(view) == vBefore,
      "no-new-data pass must be a no-op on the view table")

    // redelivery simulation: a FRESH checkpoint replays every version
    // from scratch — the sink's high-water marker makes it a no-op
    StreamIvm.maintainMinMaxView(spark, t, view, Seq("id"), "g", "v",
      s"$root/ckpt2")
    assert(TxnTable.currentVersion(view) == vBefore,
      "replayed batches must hit the applied>=target fence")
    assert(snap(TxnTable.read(spark, view)) == direct(t, 3L))
  }

  test("null group keys: carried when untouched, recomputed when hit, " +
    "never poisoning unaffected groups") {
    // the advice hole: equi-joins never match null keys, so a null
    // group row silently vanished from the refreshed state; worse, a
    // null in `affected` made !isInCollection three-valued and
    // filtered out EVERY unaffected group
    def snapN(df: DataFrame): Seq[(Option[Long], Long, Long, Long, Long)] =
      df.select(col("g"), col("cnt"), col("sm"), col("mn"), col("mx"))
        .collect()
        .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
          r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSeq.sortBy(_._1)
    def directN(t: String, v: Long) = snapN(
      IncrementalView.materializeMinMax(TxnTable.read(spark, t, v),
        "g", "v"))
    val t = Files.createTempDirectory("graft_ivnull").toString + "/t"
    // group NULL = {5, 9}, group 1 = {10, 18}, group 2 = {20, 29}
    TxnTable.create(spark, t, Seq(
      (1L, Option.empty[Long], 5L), (2L, Option.empty[Long], 9L),
      (3L, Some(1L), 10L), (4L, Some(1L), 18L),
      (5L, Some(2L), 20L), (6L, Some(2L), 29L)).toDF("id", "g", "v"))
    var state = IncrementalView.materializeMinMax(
      TxnTable.read(spark, t, 0L), "g", "v")
    var fromV = 0L
    def advance(): Unit = {
      val toV = TxnTable.currentVersion(t)
      val (removed, added, _) =
        TxnTable.changedRowSides(spark, t, fromV, toV)
      val (next, _) = IncrementalView.maintainMinMaxFromSides(
        spark, t, state, removed, added, "g", "v", toV)
      state = next; fromV = toV
      assert(snapN(state) == directN(t, toV), s"diverged at v$toV")
    }
    // v1: inserts touch ONLY the null group (grow its max)
    TxnTable.append(spark, t,
      Seq((7L, Option.empty[Long], 12L)).toDF("id", "g", "v"))
    advance()
    assert(snapN(state).head == (None, 3L, 26L, 5L, 12L))
    // v2: delete the null group's MAX — the extreme recompute path,
    // with non-null groups untouched (they must all survive)
    TxnTable.deleteWhere(spark, t, col("id") === 7L)
    advance()
    assert(snapN(state).head == (None, 2L, 14L, 5L, 9L))
    assert(snapN(state).size == 3, "unaffected groups must survive")
    // v3: extreme delete in group 1 with the null group UNTOUCHED —
    // the null state row must be carried through the merge
    TxnTable.deleteWhere(spark, t, col("id") === 4L)
    advance()
    assert(snapN(state).exists(_._1.isEmpty),
      "an untouched null group must not vanish from the state")
    // v4: the keyed-image variant takes the same null split
    TxnTable.append(spark, t,
      Seq((8L, Option.empty[Long], 3L)).toDF("id", "g", "v"))
    val toV = TxnTable.currentVersion(t)
    val (next, _) = IncrementalView.maintainMinMaxStep(spark, t, state,
      fromV, toV, Seq("id"), "g", "v")
    state = next; fromV = toV
    assert(snapN(state) == directN(t, toV))
    assert(snapN(state).head == (None, 3L, 17L, 3L, 9L))
    // v5: whole null-group delete — the group drops out
    TxnTable.deleteWhere(spark, t, col("g").isNull)
    advance()
    assert(!snapN(state).exists(_._1.isEmpty))
  }

  test("PROPERTY: maintainMinMaxFromSides over a seeded-random DML " +
    "sequence equals a direct recompute at every step") {
    val rnd = new scala.util.Random(20260816L)
    val t = Files.createTempDirectory("graft_ivprop").toString + "/t"
    def rows(n: Int): Seq[(Long, Long)] =
      Seq.fill(n)((rnd.nextInt(12).toLong, (rnd.nextInt(2000) - 500).toLong))
    TxnTable.create(spark, t, rows(80).toDF("g", "v"))
    var state = IncrementalView.materializeMinMax(
      TxnTable.read(spark, t), "g", "v")
    var fromV = TxnTable.currentVersion(t)
    // 14 random steps: appends, CoW band deletes/updates, MOR deletes
    (1 to 14).foreach { step =>
      rnd.nextInt(4) match {
        case 0 => TxnTable.append(spark, t, rows(30).toDF("g", "v"))
        case 1 => TxnTable.deleteWhere(spark, t,
          col("v") % 7 === rnd.nextInt(7) && col("g") < rnd.nextInt(12))
        case 2 => TxnTable.updateWhere(spark, t,
          col("g") === rnd.nextInt(12).toLong,
          Map("v" -> (col("v") + lit(rnd.nextInt(300).toLong - 150L))))
        case 3 => TxnTable.deleteWhereMor(spark, t,
          col("v") > lit(1200L - step * 50L))
      }
      val toV = TxnTable.currentVersion(t)
      if (toV > fromV) {
        val (removed, added, _) =
          TxnTable.changedRowSides(spark, t, fromV, toV)
        val (next, _) = IncrementalView.maintainMinMaxFromSides(
          spark, t, state, removed, added, "g", "v", toV)
        state = next
        fromV = toV
        assert(snap(state).sortBy(_._1) == direct(t, toV),
          s"step $step diverged at v$toV")
      }
    }
  }
}
