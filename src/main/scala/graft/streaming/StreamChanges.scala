package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.core.TxnTable

/** FIRST-CLASS streaming row-image change feed over a TxnTable:
  * [[readChangesStream]] returns a STREAMING DataFrame of change
  * images — `keyCols… , op (insert|update|delete), before, after,
  * from_version, to_version` — so incremental consumption is a
  * one-liner (`readChangesStream → foreachBatch(apply)`) instead of
  * the log-signal + hand-rolled `diffVersionsImages` harness pattern
  * StreamIvm/StreamReplica grew up on.
  *
  * Architecture (the Delta-CDF shape): change DATA must not funnel
  * through a streaming source's row-iterator readers — a bulk commit
  * would drag table-scale rows through single-partition iterators. So
  * the feed is split into two fully distributed halves:
  *
  *  1. the PUMP ([[pump]]) follows the commit log
  *     ([[TxnLogSourceProvider]], offsets checkpointed — a restarted
  *     pump resumes exactly after the last version it spooled) and
  *     materializes EACH VERSION's changes as one distributed
  *     [[TxnTable.diffVersionsImages]] job (file-scoped: reads only
  *     the files that version changed) written to a parquet SPOOL.
  *     Idempotent per version: each lands as one `r<v-1>_<v>/` range
  *     directory published by a single ATOMIC rename — the directory
  *     IS the done-marker — so replayed versions (an
  *     engine-redelivered batch, or a pump whose CHECKPOINT was lost
  *     re-offering everything under different batch boundaries) all
  *     no-op on one existence probe and the feed stays exactly-once;
  *     a consumer can never observe a half-written range. Version 0
  *     (the table's birth) spools the full snapshot as `insert` rows:
  *     the initial load IS part of the feed. Per-version is the
  *     standard CDF semantics (a key changed twice shows both
  *     changes); the cost is one small file-scoped job per commit
  *     rather than one netted job per batch.
  *  2. the returned frame is Spark's OWN file stream over the spool —
  *     distributed scan, its own checkpoint, so the consumer restarts
  *     independently of the pump.
  *
  * Scale: pump work per range is O(changed files read + changed rows
  * written); consumer work is a parquet scan of exactly the new spool
  * files. A 100 TB table with 1% daily churn spools ~1%/day. The only
  * extra cost vs the harness pattern is one materialization of the
  * change rows — the standard CDC trade for replayable, multi-consumer
  * feeds. A pump killed mid-write leaves only an orphaned `.tmp-*`
  * directory the consumer's `r*` glob never matches; the restart
  * republishes the version atomically.
  */
object StreamChanges {

  /** The feed's schema for `path` keyed on `keyCols`: the key columns
    * (in `keyCols` order) ++ op, before/after payload structs,
    * from_version/to_version. */
  def changesSchema(spark: SparkSession, path: String,
      keyCols: Seq[String]): StructType = {
    val t = TxnTable.read(spark, path).schema
    val missing = keyCols.filterNot(k =>
      t.fieldNames.exists(_.equalsIgnoreCase(k)))
    require(missing.isEmpty, s"changesSchema: no such key columns $missing")
    val payload = StructType(
      t.fields.filterNot(f => keyCols.exists(_.equalsIgnoreCase(f.name))))
    StructType(
      keyCols.map(k =>
        t.fields.find(_.name.equalsIgnoreCase(k)).get) ++ Seq(
        StructField("op", StringType),
        StructField("before", payload),
        StructField("after", payload),
        StructField("from_version", LongType),
        StructField("to_version", LongType)))
  }

  /** Drain every commit not yet spooled (Trigger.AvailableNow), then
    * return. Re-call (same `checkpointDir`) after more commits, or
    * schedule it for a continuous feed. */
  def pump(spark: SparkSession, srcPath: String, spoolDir: String,
      checkpointDir: String, keyCols: Seq[String]): Unit = {
    Files.createDirectories(Paths.get(spoolDir))
    val q = StreamIvm.changesStream(spark, srcPath).writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
         _: Long) =>
          // spool PER VERSION, not per batch range: markers are then
          // stable under ANY batch regrouping — even a pump whose
          // checkpoint was lost replays versions it already spooled
          // and every one no-ops on its marker (a range-keyed marker
          // would miss when the replayed batch boundaries differ).
          // Per-version is also the standard CDF semantics: a key
          // changed twice shows both changes, not the net.
          val vs = batch.select(col("version")).collect()
            .map(_.getLong(0)).sorted
          vs.foreach(v =>
            spool(batch.sparkSession, srcPath, spoolDir, v - 1, v,
              keyCols))
      }
      .start()
    try q.awaitTermination() finally q.stop()
  }

  /** One pump pass, then the user-facing STREAMING frame of row
    * images over the spool. The frame's own checkpoint (set by the
    * caller's writeStream) makes consumer restarts resume at the
    * first unread spool file. */
  def readChangesStream(spark: SparkSession, srcPath: String,
      spoolDir: String, pumpCheckpointDir: String,
      keyCols: Seq[String]): DataFrame = {
    pump(spark, srcPath, spoolDir, pumpCheckpointDir, keyCols)
    // published range directories only — in-flight .tmp-* dirs never
    // match the glob, so a consumer cannot observe a partial range
    spark.readStream.schema(changesSchema(spark, srcPath, keyCols))
      .parquet(s"$spoolDir/r*")
  }

  /** Materialize one version range's images into the spool. The range
    * lands as ONE directory (`r<from>_<to>/part-*.parquet`) published
    * by a single ATOMIC rename — the directory's existence IS the
    * done-marker, so (a) a replayed version no-ops on one existence
    * probe (never a spool-wide listing — per-version pump cost stays
    * flat over the feed's lifetime), (b) a consumer can never observe
    * a half-written range, and (c) a pump crashing mid-write leaves
    * only an orphaned `.tmp-*` dir that never matches the consumer's
    * `r*` glob. Two pumps racing the same version derive IDENTICAL
    * content from the immutable log, so losing the rename race is
    * benign. */
  private def spool(spark: SparkSession, srcPath: String,
      spoolDir: String, fromV: Long, toV: Long,
      keyCols: Seq[String]): Unit = {
    val root = Paths.get(spoolDir)
    val rangeDir = root.resolve(s"r${fromV}_${toV}")
    if (Files.exists(rangeDir)) return // redelivered version: no-op
    val imgs =
      if (fromV >= 0)
        TxnTable.diffVersionsImages(spark, srcPath, fromV, toV, keyCols)
      else {
        // table birth: the whole snapshot at toV is the initial load,
        // emitted as insert rows so the feed is complete from v0
        val snap = TxnTable.read(spark, srcPath, toV)
        val payload = snap.columns.filterNot(c =>
          keyCols.exists(_.equalsIgnoreCase(c))).toSeq
        val payloadType = StructType(snap.schema.fields.filterNot(f =>
          keyCols.exists(_.equalsIgnoreCase(f.name))))
        snap.select(keyCols.map(col) ++ Seq(
          lit("insert").as("op"),
          lit(null).cast(payloadType).as("before"),
          struct(payload.map(col): _*).as("after")): _*)
      }
    val out = imgs.withColumn("from_version", lit(fromV))
      .withColumn("to_version", lit(toV))
    val tmp = root.resolve(s".tmp-${java.util.UUID.randomUUID()}")
    out.write.parquet(tmp.toString)
    publish(tmp, rangeDir)
  }

  /** Publish a fully-written tmp dir as `rangeDir` with one atomic
    * rename. Losing the rename race to another pump is benign (both
    * derive identical content from the immutable log) — but ONLY a
    * race: any other move failure must propagate, because the pump's
    * checkpoint advances past this version and a swallowed failure
    * would drop it from the feed forever. So after cleaning our tmp
    * copy, the range must EXIST or the original failure is rethrown.
    *
    * Portability: ATOMIC_MOVE of a DIRECTORY is a local/HDFS-ism — an
    * object store (S3) has no atomic directory rename. A port there
    * must switch to the create-exclusive `_done`-marker-file form the
    * commit log itself uses (write files, then PUT-if-absent one
    * marker; consumers glob ranges by marker). */
  private[streaming] def publish(tmp: java.nio.file.Path,
      rangeDir: java.nio.file.Path): Unit = {
    try { Files.move(tmp, rangeDir, StandardCopyOption.ATOMIC_MOVE); () }
    catch {
      case e: java.nio.file.FileSystemException =>
        // drop our tmp copy either way, then verify the assumed winner
        val it = Files.walk(tmp)
        try it.sorted(java.util.Comparator.reverseOrder())
          .iterator().forEachRemaining(p => { Files.deleteIfExists(p); () })
        catch { case _: Throwable => () }
        finally it.close()
        if (!Files.exists(rangeDir)) throw e
    }
  }
}
