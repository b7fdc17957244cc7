package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpecBase
import graft.core.TxnTable

/** The first-class streaming row-image change feed: initial load as
  * insert rows, live commits drained through checkpointed restarts on
  * BOTH halves (pump offsets + consumer file-stream), correct
  * before/after images across CoW update / MOR delete / append, feed ≡
  * batch diff, and exactly-once under pump-checkpoint loss. */
class StreamChangesSpec extends SparkSpecBase {
  import spark.implicits._

  test("readChangesStream: initial load, live commits through restarts, " +
    "redelivery no-ops") {
    val root = Files.createTempDirectory("graft_stch").toString
    val t = s"$root/t"
    TxnTable.create(spark, t,
      Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("id", "v")) // v0
    val got = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, Option[Long], Option[Long], Long)]
    // each drain is a FRESH consumer query on the SAME user checkpoint
    // — the restart path is exercised on every call
    def drain(): Int = {
      val before = got.size
      val q = StreamChanges.readChangesStream(spark, t, s"$root/spool",
        s"$root/pump_ckpt", Seq("id"))
        .writeStream.option("checkpointLocation", s"$root/user_ckpt")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: Dataset[Row], _: Long) =>
          val rows = b.select(col("id"), col("op"),
            col("before.v"), col("after.v"), col("from_version"))
            .collect()
            .map(r => (r.getLong(0), r.getString(1),
              if (r.isNullAt(2)) None else Some(r.getLong(2)),
              if (r.isNullAt(3)) None else Some(r.getLong(3)),
              r.getLong(4)))
          got.synchronized { got ++= rows; () }
        }
        .start()
      try q.awaitTermination() finally q.stop()
      got.size - before
    }
    // initial load: the v0 snapshot arrives as insert rows
    assert(drain() == 3)
    assert(got.toSet == Set(
      (1L, "insert", None, Some(10L), -1L),
      (2L, "insert", None, Some(20L), -1L),
      (3L, "insert", None, Some(30L), -1L)))
    // live commit → drain: images carry before AND after
    TxnTable.updateWhere(spark, t, col("id") === 2L,
      Map("v" -> lit(99L))) // v1
    assert(drain() == 1)
    assert(got.contains((2L, "update", Some(20L), Some(99L), 0L)))
    // two more commits in one pump pass: one spool per VERSION
    TxnTable.deleteWhereMor(spark, t, col("id") === 3L) // v2
    TxnTable.append(spark, t, Seq((4L, 40L)).toDF("id", "v")) // v3
    assert(drain() == 2)
    assert(got.contains((3L, "delete", Some(30L), None, 1L)))
    assert(got.contains((4L, "insert", None, Some(40L), 2L)))
    // the reassembled feed ≡ the batch span diff, op for op
    val span = TxnTable.diffVersionsImages(spark, t, 0L, 3L, Seq("id"))
      .select(col("id"), col("op"), col("before.v"), col("after.v"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
      .toSet
    assert(got.filter(_._5 >= 0L).map(r => (r._1, r._2, r._3, r._4))
      .toSet == span)
    // nothing new: a drain is a no-op
    assert(drain() == 0)
    // pump-checkpoint LOSS: every version is re-offered under new
    // batch boundaries — the per-version markers make each a no-op
    def rm(p: java.nio.file.Path): Unit = {
      if (Files.isDirectory(p)) {
        val it = Files.list(p)
        try it.iterator().forEachRemaining(rm) finally it.close()
      }
      Files.deleteIfExists(p); ()
    }
    rm(java.nio.file.Paths.get(s"$root/pump_ckpt"))
    assert(drain() == 0,
      "replayed versions must never duplicate the feed")
  }

  test("startingVersion tail-follow spools zero history; vacuumSpool " +
    "sweeps below the watermark; swept ranges never resurrect") {
    val root = Files.createTempDirectory("graft_sttail").toString
    val t = s"$root/t"
    TxnTable.create(spark, t,
      Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("id", "v"))       // v0
    TxnTable.updateWhere(spark, t, col("id") === 1L,
      Map("v" -> lit(11L)))                                       // v1
    TxnTable.append(spark, t, Seq((4L, 40L)).toDF("id", "v"))     // v2
    def ranges(): Set[String] = {
      val it = Files.list(java.nio.file.Paths.get(s"$root/spool"))
      try {
        val b = scala.collection.mutable.Set.empty[String]
        it.iterator().forEachRemaining { p =>
          val n = p.getFileName.toString
          if (n.startsWith("r")) { b += n; () }
        }
        b.toSet
      } finally it.close()
    }
    def drain(userCkpt: String, start: Option[Long]): Seq[(Long, String)] = {
      val sink = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
      val q = StreamChanges.readChangesStream(spark, t, s"$root/spool",
        s"$root/pump_ckpt", Seq("id"), start)
        .writeStream.option("checkpointLocation", userCkpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: Dataset[Row], _: Long) =>
          sink ++= b.select(col("id"), col("op")).collect()
            .map(r => (r.getLong(0), r.getString(1)))
          ()
        }
        .start()
      try q.awaitTermination() finally q.stop()
      sink.toSeq
    }
    // late start at v2: the v0 snapshot and v1 are NEVER materialized
    val got = drain(s"$root/uc1", Some(2L))
    assert(got.toSet == Set((4L, "insert")), s"got $got")
    assert(ranges() == Set("r1_2"),
      s"zero historical spool bytes expected, got ${ranges()}")
    // one more commit flows through the same feed
    TxnTable.deleteWhere(spark, t, col("id") === 2L)              // v3
    assert(drain(s"$root/uc1", Some(2L)).toSet == Set((2L, "delete")))
    assert(ranges() == Set("r1_2", "r2_3"))
    // retention: sweep ranges consumers are done with (to_version < 3)
    assert(StreamChanges.vacuumSpool(s"$root/spool", 3L) == 1)
    assert(ranges() == Set("r2_3"), "the >= watermark range must survive")
    // a FRESH consumer on the swept spool reads exactly what remains
    assert(drain(s"$root/uc2", Some(2L)).toSet == Set((2L, "delete")))
    // pump-checkpoint LOSS re-offers v2: the watermark makes it a
    // no-op — a resurrected range would re-feed consumed duplicates
    def rm(p: java.nio.file.Path): Unit = {
      if (Files.isDirectory(p)) {
        val it = Files.list(p)
        try it.iterator().forEachRemaining(rm) finally it.close()
      }
      Files.deleteIfExists(p); ()
    }
    rm(java.nio.file.Paths.get(s"$root/pump_ckpt"))
    assert(drain(s"$root/uc1", Some(2L)).isEmpty)
    assert(ranges() == Set("r2_3"),
      "a swept range must never resurrect after pump-checkpoint loss")
  }

  test("vacuumSpool is idempotent and its watermark is monotonic") {
    val root = Files.createTempDirectory("graft_vsp").toString
    val spool = s"$root/spool"
    Files.createDirectories(java.nio.file.Paths.get(spool))
    for ((f, t) <- Seq((-1, 0), (0, 1), (1, 2), (2, 3))) {
      val d = java.nio.file.Paths.get(s"$spool/r${f}_$t")
      Files.createDirectories(d)
      Files.write(d.resolve("part-0.parquet"), Array[Byte](1))
    }
    assert(StreamChanges.vacuumSpool(spool, 2L) == 2) // r-1_0, r0_1
    // a re-run with the same watermark sweeps nothing further
    assert(StreamChanges.vacuumSpool(spool, 2L) == 0)
    // a LOWER keepAfter never lowers the watermark or un-sweeps
    assert(StreamChanges.vacuumSpool(spool, 1L) == 0)
    val wm = new String(Files.readAllBytes(
      java.nio.file.Paths.get(s"$spool/_vacuum_watermark"))).trim
    assert(wm == "2", s"watermark must stay monotonic, got $wm")
    // advancing sweeps the next range and leaves the newest
    assert(StreamChanges.vacuumSpool(spool, 3L) == 1)
    assert(Files.exists(java.nio.file.Paths.get(s"$spool/r2_3")))
  }

  test("readChangesSince follows commits after a wall-clock instant; " +
    "pre-horizon instants hit the versionAt fence") {
    val root = Files.createTempDirectory("graft_stsince").toString
    val t = s"$root/t"
    TxnTable.create(spark, t,
      Seq((1L, 10L), (2L, 20L)).toDF("id", "v"))                  // v0
    Thread.sleep(30)
    TxnTable.append(spark, t, Seq((3L, 30L)).toDF("id", "v"))     // v1
    Thread.sleep(30)
    TxnTable.append(spark, t, Seq((4L, 40L)).toDF("id", "v"))     // v2
    val ts = TxnTable.history(spark, t)
      .select(col("version"), col("ts_millis")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val sink = scala.collection.mutable.ArrayBuffer.empty[Long]
    // "since v1's instant": v1 itself is already committed AT that
    // instant — the feed starts at the first commit AFTER it (v2)
    val q = StreamChanges.readChangesSince(spark, t, s"$root/spool",
      s"$root/pc", Seq("id"), ts(1L))
      .writeStream.option("checkpointLocation", s"$root/uc")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (b: Dataset[Row], _: Long) =>
        sink ++= b.select(col("id")).collect().map(_.getLong(0)); ()
      }
      .start()
    try q.awaitTermination() finally q.stop()
    assert(sink.toSet == Set(4L), s"got $sink")
    // a pre-horizon instant is the same loud fence as every
    // timestamp-addressed read
    val e = intercept[IllegalArgumentException] {
      StreamChanges.readChangesSince(spark, t, s"$root/spool2",
        s"$root/pc2", Seq("id"), ts(0L) - 3600000L)
    }
    assert(e.getMessage.contains("predates the earliest readable commit"))
  }

  test("the feed refuses loudly to pump across a schema change; a new " +
    "feed from the change version continues under the new schema") {
    val root = Files.createTempDirectory("graft_stalter").toString
    val t = s"$root/t"
    TxnTable.create(spark, t,
      Seq((1L, 10L), (2L, 20L)).toDF("id", "v"))                  // v0
    def drain(spool: String, pumpCkpt: String, ckpt: String,
        start: Option[Long]): Seq[(Long, String)] = {
      val sink = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
      val q = StreamChanges.readChangesStream(spark, t, spool,
        pumpCkpt, Seq("id"), start)
        .writeStream.option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: Dataset[Row], _: Long) =>
          sink ++= b.select(col("id"), col("op")).collect()
            .map(r => (r.getLong(0), r.getString(1)))
          ()
        }
        .start()
      try q.awaitTermination() finally q.stop()
      sink.toSeq
    }
    assert(drain(s"$root/spool", s"$root/pc", s"$root/uc", None)
      .size == 2) // initial load
    TxnTable.addColumns(spark, t,
      Seq(("w", org.apache.spark.sql.types.LongType)))            // v1: ALTER
    TxnTable.append(spark, t,
      Seq((3L, 30L, 300L)).toDF("id", "v", "w"))                  // v2
    val e = intercept[Exception] {
      drain(s"$root/spool", s"$root/pc", s"$root/uc", None)
    }
    def chain(x: Throwable): Seq[String] =
      if (x == null) Nil else Option(x.getMessage).toSeq ++ chain(x.getCause)
    assert(chain(e).exists(_.contains("cannot cross the schema change")),
      s"wrong failure: ${chain(e)}")
    // no partial v1/v2 range leaked into the refused spool
    val it = Files.list(java.nio.file.Paths.get(s"$root/spool"))
    try it.iterator().forEachRemaining { p =>
      val n = p.getFileName.toString
      assert(n == "r-1_0" || n.startsWith("_") || n.startsWith("."),
        s"leaked range $n")
    } finally it.close()
    // the remedy in the error works: a NEW feed pinned at the new
    // schema picks up from the ALTER version
    val got = drain(s"$root/spool2", s"$root/pc2", s"$root/uc2", Some(1L))
    assert(got.toSet == Set((3L, "insert")), s"got $got")
  }

  test("follow-schema generations: a mid-feed ALTER rolls the spool, " +
    "the old generation ends with a typed terminal row pointing at " +
    "the next, and the reassembled feed equals the batch diffs") {
    val root = Files.createTempDirectory("graft_stgen").toString
    val t = s"$root/t"
    TxnTable.create(spark, t,
      Seq((1L, 10L), (2L, 20L)).toDF("id", "v"))                  // v0
    TxnTable.updateWhere(spark, t, col("id") === 1L,
      Map("v" -> lit(11L)))                                       // v1
    def drainFrame(df: org.apache.spark.sql.DataFrame, ckpt: String,
        cols: Seq[String]): Seq[Row] = {
      val sink = scala.collection.mutable.ArrayBuffer.empty[Row]
      val q = df.writeStream.option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: Dataset[Row], _: Long) =>
          sink ++= b.select(cols.map(col): _*).collect(); ()
        }
        .start()
      try q.awaitTermination() finally q.stop()
      sink.toSeq
    }
    // first pass: one generation, ordinary feed semantics
    val g0 = drainFrame(
      StreamChanges.readChangesStreamFollow(spark, t, s"$root/spool",
        s"$root/pc", Seq("id")),
      s"$root/uc0", Seq("id", "op", "to_version"))
    assert(g0.map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set((1L, "insert"), (2L, "insert"), (1L, "update")))
    assert(StreamChanges.generations(s"$root/spool") == Seq(0L))
    // mid-feed ALTER, then post-ALTER data under the NEW schema
    TxnTable.addColumns(spark, t,
      Seq(("w", org.apache.spark.sql.types.LongType)))            // v2
    TxnTable.append(spark, t,
      Seq((3L, 30L, 300L)).toDF("id", "v", "w"))                  // v3
    TxnTable.deleteWhereMor(spark, t, col("id") === 2L)           // v4
    // the SAME pump (same checkpoint) rolls instead of refusing
    StreamChanges.pumpFollowSchema(spark, t, s"$root/spool",
      s"$root/pc", Seq("id"))
    assert(StreamChanges.generations(s"$root/spool") == Seq(0L, 2L))
    // the consumer finishes gen-0 on its SAME checkpoint: exactly one
    // new row — the typed terminal, whose to_version IS the next gen
    val tail0 = drainFrame(
      StreamChanges.readGeneration(spark, s"$root/spool", 0L, Seq("id")),
      s"$root/uc0", Seq("id", "op", "to_version"))
    assert(tail0.size == 1, s"got $tail0")
    assert(tail0.head.isNullAt(0) &&
      tail0.head.getString(1) == "end_of_generation" &&
      tail0.head.getLong(2) == 2L)
    // …re-binds at the pointer: the new generation carries the new
    // payload shape (w present) and the post-ALTER changes
    val g1 = drainFrame(
      StreamChanges.readGeneration(spark, s"$root/spool",
        tail0.head.getLong(2), Seq("id")),
      s"$root/uc1", Seq("id", "op", "after.v", "after.w", "before.v"))
    assert(g1.map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set((3L, "insert"), (2L, "delete")))
    assert(g1.find(_.getString(1) == "insert").exists(r =>
      r.getLong(2) == 30L && r.getLong(3) == 300L))
    assert(g1.find(_.getString(1) == "delete").exists(_.getLong(4) == 20L))
    // reassembled feed ≡ batch diffs op-for-op
    val batchDiff = TxnTable.diffVersionsImages(spark, t, 2L, 4L,
      Seq("id")).select(col("id"), col("op")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(g1.map(r => (r.getLong(0), r.getString(1))).toSet == batchDiff)
    // exactly-once under pump-checkpoint loss: a FRESH pump re-offers
    // every version; all no-op on their markers (terminal included)
    def ranges(): Set[String] = {
      val out = scala.collection.mutable.Set.empty[String]
      for (g <- StreamChanges.generations(s"$root/spool")) {
        val it = Files.list(
          java.nio.file.Paths.get(s"$root/spool/gen-$g"))
        try it.iterator().forEachRemaining { p =>
          val n = p.getFileName.toString
          if (n.startsWith("r")) { out += s"gen-$g/$n"; () }
        } finally it.close()
      }
      out.toSet
    }
    val before = ranges()
    StreamChanges.pumpFollowSchema(spark, t, s"$root/spool",
      s"$root/pc_fresh", Seq("id"))
    assert(ranges() == before,
      "a checkpoint-lost pump must no-op on every marker")
    assert(StreamChanges.generations(s"$root/spool") == Seq(0L, 2L))
    // per-GENERATION retention: each gen dir is spool-shaped, so
    // vacuumSpool sweeps a drained generation's consumed ranges while
    // the terminal handoff row survives for late consumers
    assert(StreamChanges.vacuumSpool(s"$root/spool/gen-0", 2L) == 2,
      "exactly r-1_0 and r0_1 sit below watermark 2")
    assert(ranges() == before -- Set("gen-0/r-1_0", "gen-0/r0_1"))
    // …and a checkpoint-lost pump cannot resurrect the swept ranges
    StreamChanges.pumpFollowSchema(spark, t, s"$root/spool",
      s"$root/pc_fresh2", Seq("id"))
    assert(ranges() == before -- Set("gen-0/r-1_0", "gen-0/r0_1"),
      "swept generation ranges must never resurrect")
    // a commit changing schema AND data in one version stays refused
    val t2 = s"$root/t2"
    TxnTable.create(spark, t2, Seq((1L, 1L)).toDF("id", "v"))
    StreamChanges.pumpFollowSchema(spark, t2, s"$root/spool2",
      s"$root/pc2", Seq("id"))
    TxnTable.append(spark, t2, Seq((2L, 2L, 9L)).toDF("id", "v", "x"),
      evolveSchema = true) // schema + data, one commit
    val e = intercept[Exception] {
      StreamChanges.pumpFollowSchema(spark, t2, s"$root/spool2",
        s"$root/pc2", Seq("id"))
    }
    def chain(x: Throwable): Seq[String] =
      if (x == null) Nil else Option(x.getMessage).toSeq ++ chain(x.getCause)
    assert(chain(e).exists(_.contains("schema AND data")),
      s"wrong failure: ${chain(e)}")
  }

  test("followChanges: ONE call drains every generation in order " +
    "under one consumer checkpoint tree, surfaces each generation's " +
    "schema, and stays exactly-once across restarts") {
    val root = Files.createTempDirectory("graft_stfol").toString
    val t = s"$root/t"
    TxnTable.create(spark, t, Seq((1L, 10L), (2L, 20L)).toDF("id", "v")) // v0
    TxnTable.addColumns(spark, t,
      Seq(("w", org.apache.spark.sql.types.LongType)))                   // v1
    TxnTable.append(spark, t, Seq((3L, 30L, 300L)).toDF("id", "v", "w")) // v2
    TxnTable.addColumns(spark, t,
      Seq(("x", org.apache.spark.sql.types.LongType)))                   // v3
    TxnTable.append(spark, t,
      Seq((4L, 40L, 400L, 4000L)).toDF("id", "v", "w", "x"))             // v4
    val buf = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Seq[String], Long, String)]
    def drainAll(): Seq[Long] =
      StreamChanges.followChanges(spark, t, s"$root/spool", s"$root/pc",
        s"$root/cc", Seq("id")) { (g, schema, df) =>
        buf ++= df.select(col("id"), col("op")).collect()
          .map(r => (g, schema.fieldNames.toSeq, r.getLong(0),
            r.getString(1)))
      }
    // two ALTERs mid-feed → three generations, one call sees all rows
    assert(drainAll() == Seq(0L, 1L, 3L))
    assert(buf.map(x => (x._1, x._3, x._4)).toSet == Set(
      (0L, 1L, "insert"), (0L, 2L, "insert"),
      (1L, 3L, "insert"), (3L, 4L, "insert")),
      s"got $buf")
    // each generation surfaced ITS schema
    assert(buf.filter(_._1 == 0L).forall(_._2 == Seq("id", "v")))
    assert(buf.filter(_._1 == 1L).forall(_._2 == Seq("id", "v", "w")))
    assert(buf.filter(_._1 == 3L).forall(_._2 == Seq("id", "v", "w", "x")))
    // restart with MORE data: the same consumer tree re-offers only
    // the new rows (completed generations no-op on their checkpoints)
    TxnTable.deleteWhereMor(spark, t, col("id") === 1L)                  // v5
    buf.clear()
    assert(drainAll() == Seq(0L, 1L, 3L))
    assert(buf.map(x => (x._1, x._3, x._4)).toSet ==
      Set((3L, 1L, "delete")), s"restart must see ONLY the delta: $buf")
    // and an idle re-run delivers nothing
    buf.clear()
    drainAll()
    assert(buf.isEmpty, s"an idle follow must deliver zero rows: $buf")
    // a TRAILING ALTER (no data after it yet) rolls an EMPTY
    // generation: the follow surfaces it without erroring and
    // delivers nothing until data lands
    TxnTable.addColumns(spark, t,
      Seq(("y", org.apache.spark.sql.types.LongType)))                 // v6
    buf.clear()
    assert(drainAll() == Seq(0L, 1L, 3L, 6L))
    assert(buf.isEmpty, s"an empty trailing generation has no rows: $buf")
    TxnTable.append(spark, t,
      Seq((6L, 60L, 600L, 6000L, 60000L)).toDF("id", "v", "w", "x", "y"))
    buf.clear()
    drainAll()
    assert(buf.map(x => (x._1, x._3, x._4)).toSet ==
      Set((6L, 6L, "insert")),
      s"data after the trailing ALTER lands in its generation: $buf")
  }

  test("generation roll crash window: the new generation is stamped " +
    "BEFORE the terminal marker publishes, so the only crash state " +
    "(stamp without marker) heals on redelivery") {
    val root = Files.createTempDirectory("graft_stcrash").toString
    val t = s"$root/t"
    TxnTable.create(spark, t, Seq((1L, 10L)).toDF("id", "v"))      // v0
    StreamChanges.pumpFollowSchema(spark, t, s"$root/spool",
      s"$root/pc", Seq("id"))
    TxnTable.addColumns(spark, t,
      Seq(("w", org.apache.spark.sql.types.LongType)))             // v1
    StreamChanges.pumpFollowSchema(spark, t, s"$root/spool",
      s"$root/pc", Seq("id"))
    val marker = java.nio.file.Paths.get(s"$root/spool/gen-0/r0_1")
    val gen1stamp =
      java.nio.file.Paths.get(s"$root/spool/gen-1/_schema.json")
    assert(Files.exists(marker) && Files.exists(gen1stamp))
    // simulate the crash BETWEEN the two effects: with the fixed
    // ordering the stamp lands first, so the on-disk crash state is
    // gen-1 stamped + terminal marker missing. (The reverse state —
    // marker without gen-1 — wedged the feed forever: redelivery
    // no-ops on the marker, gen-1 is never created, and every later
    // version binds the OLD schema.)
    val w = Files.walk(marker)
    try w.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
      .iterator().forEachRemaining(p => { Files.deleteIfExists(p); () })
    finally w.close()
    // post-ALTER data lands while the feed is in the crashed state
    TxnTable.append(spark, t, Seq((2L, 20L, 200L)).toDF("id", "v", "w"))
    // redelivery (checkpoint-lost pump re-offers everything): the
    // absent marker lets the WHOLE roll sequence re-run — stamp
    // no-ops idempotently, the terminal republishes — and v2 spools
    // under gen-1's schema, not gen-0's
    StreamChanges.pumpFollowSchema(spark, t, s"$root/spool",
      s"$root/pc_fresh", Seq("id"))
    assert(Files.exists(marker), "the terminal marker must republish")
    assert(StreamChanges.generations(s"$root/spool") == Seq(0L, 1L))
    // the consumer handshake works end-to-end across the healed roll
    def drain(df: org.apache.spark.sql.DataFrame, ckpt: String,
        cols: Seq[String]): Seq[Row] = {
      val sink = scala.collection.mutable.ArrayBuffer.empty[Row]
      val q = df.writeStream.option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: Dataset[Row], _: Long) =>
          sink ++= b.select(cols.map(col): _*).collect(); ()
        }
        .start()
      try q.awaitTermination() finally q.stop()
      sink.toSeq
    }
    val g0 = drain(
      StreamChanges.readGeneration(spark, s"$root/spool", 0L, Seq("id")),
      s"$root/c0", Seq("id", "op", "to_version"))
    val term = g0.filter(_.getString(1) == "end_of_generation")
    assert(term.size == 1 && term.head.getLong(2) == 1L)
    val g1 = drain(
      StreamChanges.readGeneration(spark, s"$root/spool", 1L, Seq("id")),
      s"$root/c1", Seq("id", "op", "after.w"))
    assert(g1.map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set((2L, "insert")) && g1.head.getLong(2) == 200L,
      s"post-ALTER data must bind the NEW generation's schema, got $g1")
  }

  test("the change feed carries a TRUNCATE as delete images for every " +
    "row — a consumer's replica empties exactly like the table") {
    val root = Files.createTempDirectory("graft_sttrunc").toString
    val t = s"$root/t"
    TxnTable.create(spark, t,
      Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("id", "v")) // v0
    TxnTable.truncate(t)                                    // v1
    TxnTable.append(spark, t, Seq((9L, 90L)).toDF("id", "v")) // v2
    val got = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, Long)]
    val q = StreamChanges.readChangesStream(spark, t, s"$root/spool",
      s"$root/pc", Seq("id"))
      .writeStream.option("checkpointLocation", s"$root/uc")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: Dataset[Row], _: Long) =>
        got ++= b.select(col("id"), col("op"), col("to_version"))
          .collect()
          .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        ()
      }
      .start()
    try q.awaitTermination() finally q.stop()
    // v0 snapshot inserts, v1 = one delete image PER ROW, v2 insert
    assert(got.count(_._2 == "insert") == 4)
    assert(got.filter(_._3 == 1L).toSet ==
      Set((1L, "delete", 1L), (2L, "delete", 1L), (3L, "delete", 1L)),
      s"the truncate version must carry every row as a delete, got " +
        got.filter(_._3 == 1L))
    // replaying the feed op-for-op lands on the table's head state
    val replayed = got.groupBy(_._1).filter { case (_, ops) =>
      ops.maxBy(_._3)._2 != "delete"
    }.keySet
    assert(replayed == Set(9L))
  }

  test("spool publish: losing the rename race is benign, but any " +
    "other move failure rethrows (a swallowed one drops the version " +
    "from the feed forever)") {
    val root = Files.createTempDirectory("graft_stpub")
    def mkTmp(): java.nio.file.Path = {
      val tmp = root.resolve(s".tmp-${java.util.UUID.randomUUID()}")
      Files.createDirectories(tmp)
      Files.write(tmp.resolve("part-0.parquet"), Array[Byte](1, 2, 3))
      tmp
    }
    // won race: the range already exists — our copy is dropped, no throw
    val won = root.resolve("r0_1")
    Files.createDirectories(won)
    Files.write(won.resolve("part-x.parquet"), Array[Byte](9))
    val tmp1 = mkTmp()
    StreamChanges.publish(tmp1, won)
    assert(!Files.exists(tmp1), "the losing copy must be cleaned up")
    assert(Files.exists(won.resolve("part-x.parquet")),
      "the winner's content must be untouched")
    // genuine failure: the destination parent does not exist — the
    // range was NOT published, so the failure must propagate
    val tmp2 = mkTmp()
    val dead = root.resolve("no-such-parent").resolve("r1_2")
    intercept[java.nio.file.FileSystemException] {
      StreamChanges.publish(tmp2, dead)
    }
    assert(!Files.exists(dead),
      "sanity: the genuine failure really published nothing")
  }

  test("concurrent vacuumSpool sweeps never regress the watermark " +
    "(the read-modify-write is serialized under the spool lock)") {
    val root = Files.createTempDirectory("graft_stvwm")
    // fake published ranges r0_1 … r9_10 — vacuumSpool's sweep is pure
    // directory listing + watermark arithmetic, no parquet is read
    (0L until 10L).foreach { v =>
      val d = root.resolve(s"r${v}_${v + 1}")
      Files.createDirectories(d)
      Files.write(d.resolve("part-0.parquet"), Array[Byte](1))
    }
    // racing sweeps with out-of-order keepAfter values: without the
    // lock, read(7)/read(3)/write(7)/write(3) interleavings can
    // persist 3 AFTER ranges below 7 were deleted — re-arming the
    // swept-range resurrection the watermark exists to prevent
    val keeps = Seq(5L, 3L, 7L, 2L, 6L, 4L)
    val threads = keeps.map { k =>
      new Thread(() => {
        StreamChanges.vacuumSpool(root.toString, k); ()
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    val wm = new String(Files.readAllBytes(root.resolve(
      "_vacuum_watermark")), java.nio.charset.StandardCharsets.UTF_8)
      .trim.toLong
    assert(wm == 7L,
      s"watermark must settle at the MAX keepAfter, got $wm")
    // every range below the max is swept, everything at/above survives
    val left = {
      val it = Files.list(root)
      try {
        val b = scala.collection.mutable.Set.empty[String]
        it.iterator().forEachRemaining { p =>
          val n = p.getFileName.toString
          if (n.startsWith("r")) { b += n; () }
        }
        b.toSet
      } finally it.close()
    }
    assert(left == Set("r6_7", "r7_8", "r8_9", "r9_10"),
      s"exactly to_version >= 7 must survive, got $left")
    // a later lower-valued sweep stays a no-op: monotonic forever
    assert(StreamChanges.vacuumSpool(root.toString, 2L) == 0)
    assert(new String(Files.readAllBytes(root.resolve(
      "_vacuum_watermark")), java.nio.charset.StandardCharsets.UTF_8)
      .trim.toLong == 7L)
  }
}
