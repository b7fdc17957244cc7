package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.core.TxnTable

/** CDC replication: a replica TxnTable follows the source commit log
  * (st19's module). Covers the three apply paths (snapshot copy,
  * incremental image apply, empty-diff marker), exactly-once fences,
  * and the applyChanges/commitMarker primitives it rides on. */
class StreamReplicaSpec extends SparkSpecBase {
  import spark.implicits._

  private def rows(t: String): Set[(Long, Long, Long)] =
    TxnTable.read(spark, t).as[(Long, Long, Long)].collect().toSet

  test("applyChanges: one commit carries deletes + upserts atomically") {
    val t = Files.createTempDirectory("graft_ac").toString + "/t"
    TxnTable.create(spark, t,
      Seq((1L, 0L, 10L), (2L, 0L, 20L), (3L, 1L, 30L))
        .toDF("id", "g", "v"))                                     // v0
    // change batch: delete id=1, update id=2 -> 25, insert id=4
    val keys = Seq(1L, 2L, 4L).toDF("id")
    val ups = Seq((2L, 0L, 25L), (4L, 1L, 40L)).toDF("id", "g", "v")
    val v = TxnTable.applyChanges(spark, t, keys, ups, Seq("id"),
      op = "stream:rep:9")
    assert(v == 1L, "delete+upsert must be ONE commit")
    assert(rows(t) == Set((2L, 0L, 25L), (3L, 1L, 30L), (4L, 1L, 40L)))
    assert(TxnTable.streamHighWater(t, "rep").contains(9L),
      "the marker rides the same commit as the data change")
  }

  test("commitMarker: metadata-only commit, content untouched, races retry") {
    val t = Files.createTempDirectory("graft_cm").toString + "/t"
    TxnTable.create(spark, t, Seq((1L, 0L, 10L)).toDF("id", "g", "v"))
    val before = rows(t)
    val v1 = TxnTable.commitMarker(t, "stream:rep:5")
    assert(v1 == 1L && rows(t) == before)
    assert(TxnTable.streamHighWater(t, "rep").contains(5L))
    // interleave a competing commit right before ours: must retry past it
    var fired = false
    TxnTable.preCommitHook = () => if (!fired) {
      fired = true
      TxnTable.append(spark, t, Seq((2L, 0L, 20L)).toDF("id", "g", "v"))
    }
    try {
      val v2 = TxnTable.commitMarker(t, "stream:rep:6")
      assert(v2 == 3L, "marker must land after the interleaved append")
    } finally TxnTable.preCommitHook = () => ()
    assert(TxnTable.streamHighWater(t, "rep").contains(6L))
    assert(rows(t) == before + ((2L, 0L, 20L)))
  }

  test("replicate: snapshot copy, incremental images, empty-diff marker, " +
    "redelivery no-op") {
    val root = Files.createTempDirectory("graft_srep").toString
    val src = s"$root/src"
    val dst = s"$root/dst"
    val ckpt = s"$root/ckpt"
    val base = for (g <- 0L until 4L; i <- 1L to 9L)
      yield (g * 100 + i, g, g * 10 + i)
    TxnTable.createClustered(spark, src,
      base.toDF("id", "g", "v"), Seq(col("g")), targetFiles = 4)   // v0

    // pass 1: initial snapshot copy
    StreamReplica.replicate(spark, src, dst, Seq("id"), ckpt,
      clusterBy = Seq("g"))
    assert(StreamReplica.appliedVersion(dst).contains(0L))
    assert(rows(dst) == rows(src))

    // three commits (insert / delete / update), then one catch-up pass
    TxnTable.append(spark, src, Seq((150L, 1L, 15L)).toDF("id", "g", "v"))
    TxnTable.deleteWhere(spark, src, col("g") === 2L)
    TxnTable.merge(spark, src, Seq((101L, 1L, 16L)).toDF("id", "g", "v"),
      Seq("id"), clusterBy = Seq(col("g")))
    StreamReplica.replicate(spark, src, dst, Seq("id"), ckpt,
      clusterBy = Seq("g"))
    assert(StreamReplica.appliedVersion(dst).contains(3L))
    assert(rows(dst) == rows(src))
    assert(!rows(dst).exists(_._2 == 2L) &&
      rows(dst).contains((101L, 1L, 16L)) &&
      rows(dst).contains((150L, 1L, 15L)))

    // a compaction changes no rows: replica advances by marker only
    TxnTable.compact(spark, src)                                   // v4
    val contentV = TxnTable.currentVersion(dst)
    StreamReplica.replicate(spark, src, dst, Seq("id"), ckpt,
      clusterBy = Seq("g"))
    assert(StreamReplica.appliedVersion(dst).contains(4L))
    assert(rows(dst) == rows(src))
    assert(TxnTable.currentVersion(dst) == contentV + 1,
      "empty net diff must cost exactly one metadata-only commit")

    // no-new-data pass and fresh-checkpoint full replay: both no-ops
    val vStable = TxnTable.currentVersion(dst)
    StreamReplica.replicate(spark, src, dst, Seq("id"), ckpt,
      clusterBy = Seq("g"))
    StreamReplica.replicate(spark, src, dst, Seq("id"), s"$root/ckpt2",
      clusterBy = Seq("g"))
    assert(TxnTable.currentVersion(dst) == vStable,
      "replayed version ranges must hit the applied>=target fence")
    assert(rows(dst) == rows(src))
  }

  test("applyUpTo fences stale targets: applied >= target is a no-op") {
    val root = Files.createTempDirectory("graft_srep2").toString
    val src = s"$root/src"
    val dst = s"$root/dst"
    TxnTable.create(spark, src, Seq((1L, 0L, 10L)).toDF("id", "g", "v"))
    TxnTable.append(spark, src, Seq((2L, 0L, 20L)).toDF("id", "g", "v"))
    StreamReplica.applyUpTo(spark, src, dst, 1L, Seq("id"))
    assert(StreamReplica.appliedVersion(dst).contains(1L))
    val v = TxnTable.currentVersion(dst)
    StreamReplica.applyUpTo(spark, src, dst, 0L, Seq("id")) // stale
    StreamReplica.applyUpTo(spark, src, dst, 1L, Seq("id")) // duplicate
    assert(TxnTable.currentVersion(dst) == v)
    assert(rows(dst) == rows(src))
  }

  test("applyUpToFollow: consecutive ALTERs replay as replica DDL, a " +
    "mid-boundary redelivery is idempotent, key renames and " +
    "schema+data commits refuse") {
    val root = Files.createTempDirectory("graft_repfol").toString
    val src = s"$root/src"
    val dst = s"$root/dst"
    TxnTable.create(spark, src,
      Seq((1L, 10L), (2L, 20L)).toDF("id", "v"))                   // v0
    StreamReplica.applyUpToFollow(spark, src, dst, 0L, Seq("id"))
    // two CONSECUTIVE ALTERs with no data between, then data
    TxnTable.addColumns(spark, src,
      Seq(("w", org.apache.spark.sql.types.IntegerType)))          // v1
    TxnTable.renameColumn(spark, src, "v", "val")                  // v2
    TxnTable.append(spark, src,
      Seq((3L, 30L, 300)).toDF("id", "val", "w"))                  // v3
    TxnTable.widenColumnType(spark, src, "w",
      org.apache.spark.sql.types.LongType)                         // v4
    TxnTable.append(spark, src,
      Seq((4L, 40L, 6000000000L)).toDF("id", "val", "w"))          // v5
    StreamReplica.applyUpToFollow(spark, src, dst, 5L, Seq("id"))
    val srcDf = TxnTable.read(spark, src)
    val dstDf = TxnTable.read(spark, dst)
    assert(dstDf.columns.toSeq == Seq("id", "val", "w"))
    assert(srcDf.exceptAll(dstDf).isEmpty && dstDf.exceptAll(srcDf).isEmpty)
    // the RENAME preserved replica data (a drop+add would null it)
    assert(TxnTable.read(spark, dst).filter(col("id") === 1L)
      .head().getLong(1) == 10L)
    // mid-boundary redelivery: re-running the same range no-ops at
    // the replica head (every boundary's schema check short-circuits)
    val head = TxnTable.currentVersion(dst)
    StreamReplica.applyUpToFollow(spark, src, dst, 5L, Seq("id"))
    assert(TxnTable.currentVersion(dst) == head)
    // renaming a KEY column refuses with the re-anchor remedy
    TxnTable.renameColumn(spark, src, "id", "pk")                  // v6
    val e = intercept[IllegalArgumentException] {
      StreamReplica.applyUpToFollow(spark, src, dst, 6L, Seq("id"))
    }
    assert(e.getMessage.contains("re-anchor"), e.getMessage)
    // a schema+data single commit refuses with the re-materialize
    // remedy (fresh twin source: the key rename above poisons src)
    val src2 = s"$root/src2"
    val dst2 = s"$root/dst2"
    TxnTable.create(spark, src2, Seq((1L, 1L)).toDF("id", "v"))
    StreamReplica.applyUpToFollow(spark, src2, dst2, 0L, Seq("id"))
    TxnTable.append(spark, src2,
      Seq((2L, 2L, 9L)).toDF("id", "v", "x"), evolveSchema = true)
    val e2 = intercept[IllegalStateException] {
      StreamReplica.applyUpToFollow(spark, src2, dst2, 1L, Seq("id"))
    }
    assert(e2.getMessage.contains("schema AND data"), e2.getMessage)
  }
}
