package graft.streaming

import java.nio.file.{Files, Paths}

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
      keyCols: Seq[String]): StructType =
    feedSchema(TxnTable.read(spark, path).schema, keyCols)

  /** [[changesSchema]] from an explicit table schema — the shape used
    * when the feed's schema comes from the spool's pinned stamp rather
    * than the table's current head. */
  private def feedSchema(t: StructType, keyCols: Seq[String]): StructType = {
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

  // spool-root sidecars (underscore names: invisible to the consumer's
  // `r*` glob and to Spark's own listing)
  private def stampPath(root: java.nio.file.Path) =
    root.resolve("_schema.json")
  private def watermarkPath(root: java.nio.file.Path) =
    root.resolve("_vacuum_watermark")

  private def readWatermark(root: java.nio.file.Path): Long = {
    val p = watermarkPath(root)
    if (Files.exists(p))
      new String(Files.readAllBytes(p),
        java.nio.charset.StandardCharsets.UTF_8).trim.toLong
    else Long.MinValue
  }

  /** Drain every commit not yet spooled (Trigger.AvailableNow), then
    * return. Re-call (same `checkpointDir`) after more commits, or
    * schedule it for a continuous feed.
    *
    * `startingVersion` sets where a FRESH pump checkpoint starts
    * (`Some(s)` → first spooled commit is `s`; `Some(-1)` is reserved;
    * None → the whole history from v0, whose range r-1_0 is the full
    * snapshot as insert rows). A tail-follow feed over a 100 TB table
    * passes `Some(currentVersion + 1)` — or [[readChangesTail]] — and
    * pays ZERO initial-load spool.
    *
    * The first pump STAMPS the spool with the table's schema
    * (`_schema.json`); every spooled version's schema must match the
    * stamp, so a feed REFUSES loudly to pump across an ALTER
    * TABLE/schema-evolving commit instead of silently null-filling or
    * mis-binding payload structs under the consumer's fixed schema.
    * The remedy is in the error: start a NEW feed (fresh spool +
    * checkpoints) at the schema-change version. */
  def pump(spark: SparkSession, srcPath: String, spoolDir: String,
      checkpointDir: String, keyCols: Seq[String],
      startingVersion: Option[Long] = None): Unit = {
    val root = Paths.get(spoolDir)
    Files.createDirectories(root)
    // pin the feed's schema once, create-exclusive (two racing pumps
    // both derive it from the same head; first writer wins)
    if (!Files.exists(stampPath(root)))
      createStamped(root, TxnTable.read(spark, srcPath).schema.json)
    val pinnedJson = new String(Files.readAllBytes(stampPath(root)),
      java.nio.charset.StandardCharsets.UTF_8)
    val q = StreamIvm.changesStream(spark, srcPath,
      startingVersion.map(_.toString)).writeStream
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
              keyCols, pinnedJson))
      }
      .start()
    try q.awaitTermination() finally q.stop()
  }

  /** One pump pass, then the user-facing STREAMING frame of row
    * images over the spool. The frame's own checkpoint (set by the
    * caller's writeStream) makes consumer restarts resume at the
    * first unread spool file. The frame's schema is the spool's
    * PINNED stamp (falling back to the table head only before a first
    * pump), so a consumer resumed after the table evolved still binds
    * the spooled ranges' real payload shape. */
  def readChangesStream(spark: SparkSession, srcPath: String,
      spoolDir: String, pumpCheckpointDir: String,
      keyCols: Seq[String],
      startingVersion: Option[Long] = None): DataFrame = {
    pump(spark, srcPath, spoolDir, pumpCheckpointDir, keyCols,
      startingVersion)
    val root = Paths.get(spoolDir)
    val schema =
      if (Files.exists(stampPath(root)))
        feedSchema(DataType.fromJson(
          new String(Files.readAllBytes(stampPath(root)),
            java.nio.charset.StandardCharsets.UTF_8))
          .asInstanceOf[StructType], keyCols)
      else changesSchema(spark, srcPath, keyCols)
    // published range directories only — in-flight .tmp-* dirs never
    // match the glob, so a consumer cannot observe a partial range
    spark.readStream.schema(schema).parquet(s"$spoolDir/r*")
  }

  // -- follow-schema generations --------------------------------------------
  //
  // The pinned-stamp feed REFUSES to cross an ALTER (the default: a
  // consumer with a fixed schema must never silently mis-bind). The
  // follow-schema variant instead ROLLS the spool at each metadata-only
  // schema change: ranges live under `spoolDir/gen-<v>/` (v = the first
  // version the generation covers), each generation stamped with ITS
  // schema; the old generation ends with one TYPED terminal row
  // (`op = "end_of_generation"`, whose `to_version` IS the next
  // generation's id), so a consumer drains a generation, sees the
  // terminal row, and re-binds via [[readGeneration]] — the CDC
  // schema-evolution handshake, with no window where rows bind wrong.
  // Commits that change schema AND data in one version stay refused
  // (no single-schema image shape exists). Each generation directory
  // is spool-shaped (`r*` ranges + watermark), so [[vacuumSpool]]
  // retention applies per generation.

  private def listGens(root: java.nio.file.Path): Seq[Long] =
    if (!Files.isDirectory(root)) Nil
    else {
      val it = Files.list(root)
      try {
        import scala.jdk.CollectionConverters._
        it.iterator().asScala
          .map(_.getFileName.toString)
          .filter(_.startsWith("gen-"))
          .map(_.stripPrefix("gen-").toLong).toSeq.sorted
      } finally it.close()
    }

  private def createStamped(genDir: java.nio.file.Path,
      schemaJson: String): Unit = {
    Files.createDirectories(genDir)
    // create-exclusive through the Store seam: a lost race means the
    // stamp exists (first writer wins); a genuine I/O failure throws
    // HERE, never as a later NoSuchFileException from readStamp
    if (!Files.exists(stampPath(genDir))) {
      graft.core.Store.putIfAbsent(stampPath(genDir), schemaJson)
      ()
    }
  }

  private def readStamp(genDir: java.nio.file.Path): StructType =
    DataType.fromJson(new String(Files.readAllBytes(stampPath(genDir)),
      java.nio.charset.StandardCharsets.UTF_8)).asInstanceOf[StructType]

  /** Drain every commit not yet spooled into GENERATION directories,
    * rolling at each metadata-only schema change. Same checkpoint /
    * idempotence discipline as [[pump]]. */
  def pumpFollowSchema(spark: SparkSession, srcPath: String,
      spoolDir: String, checkpointDir: String, keyCols: Seq[String],
      startingVersion: Option[Long] = None): Unit = {
    val root = Paths.get(spoolDir)
    Files.createDirectories(root)
    val q = StreamIvm.changesStream(spark, srcPath,
      startingVersion.map(_.toString)).writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
         _: Long) =>
          val vs = batch.select(col("version")).collect()
            .map(_.getLong(0)).sorted
          vs.foreach(v =>
            spoolFollow(batch.sparkSession, srcPath, spoolDir, v, keyCols))
      }
      .start()
    try q.awaitTermination() finally q.stop()
  }

  /** Generations of a follow-schema spool, oldest first (a rolled
    * generation's id is the schema-change version that opened it; the
    * bootstrap generation is named by its pinning from-version). */
  def generations(spoolDir: String): Seq[Long] =
    listGens(Paths.get(spoolDir))

  /** The STREAMING frame over ONE generation, bound to that
    * generation's own pinned schema. A consumer runs a generation to
    * its terminal row, then re-binds here with the terminal row's
    * `to_version` as `gen`. */
  def readGeneration(spark: SparkSession, spoolDir: String, gen: Long,
      keyCols: Seq[String]): DataFrame = {
    val gd = Paths.get(spoolDir).resolve(s"gen-$gen")
    require(Files.exists(stampPath(gd)),
      s"readGeneration: no generation $gen under $spoolDir")
    spark.readStream.schema(feedSchema(readStamp(gd), keyCols))
      .parquet(s"$spoolDir/gen-$gen/r*")
  }

  /** One follow-schema pump pass, then the OLDEST generation's
    * streaming frame — the entry point mirroring [[readChangesStream]]
    * for feeds that must survive ALTERs. */
  def readChangesStreamFollow(spark: SparkSession, srcPath: String,
      spoolDir: String, pumpCheckpointDir: String, keyCols: Seq[String],
      startingVersion: Option[Long] = None): DataFrame = {
    pumpFollowSchema(spark, srcPath, spoolDir, pumpCheckpointDir,
      keyCols, startingVersion)
    val gens = generations(spoolDir)
    require(gens.nonEmpty, s"no generations spooled under $spoolDir")
    readGeneration(spark, spoolDir, gens.head, keyCols)
  }

  /** The COMPLETE follow-schema consumer loop: one call pumps, then
    * drains every generation available now IN ORDER under one
    * consumer checkpoint tree — each generation as its own
    * AvailableNow pass checkpointed at `<consumerCheckpointRoot>/
    * gen-<g>`, its pinned schema surfaced to the callback, terminal
    * handshake rows consumed by the loop itself (the callback sees
    * DATA rows only). This is the helper that finishes what the
    * manual drain → terminal row → [[readGeneration]] re-bind
    * handshake starts: exactly-once across restarts, because a
    * completed generation's checkpoint re-offers nothing and an
    * interrupted one resumes mid-generation.
    *
    * Returns the generations visited. Scale: the loop itself is pure
    * metadata (one directory listing + one stamp read per
    * generation); all data movement happens inside the per-generation
    * streams, which read only spooled ranges. */
  def followChanges(spark: SparkSession, srcPath: String,
      spoolDir: String, pumpCheckpointDir: String,
      consumerCheckpointRoot: String, keyCols: Seq[String],
      startingVersion: Option[Long] = None)(
      onBatch: (Long, StructType, DataFrame) => Unit): Seq[Long] = {
    pumpFollowSchema(spark, srcPath, spoolDir, pumpCheckpointDir,
      keyCols, startingVersion)
    val gens = generations(spoolDir)
    gens.foreach { g =>
      val gd = Paths.get(spoolDir).resolve(s"gen-$g")
      val schema = readStamp(gd)
      // a TRAILING-ALTER generation is stamped but has no ranges yet
      // (the ALTER commit itself changed no rows): nothing to drain —
      // skipping keeps the consumer checkpoint tree clean for when
      // data arrives
      val hasRanges = {
        val it = Files.list(gd)
        try {
          import scala.jdk.CollectionConverters._
          it.iterator().asScala
            .exists(_.getFileName.toString.startsWith("r"))
        } finally it.close()
      }
      if (hasRanges) {
      val q = readGeneration(spark, spoolDir, g, keyCols).writeStream
        .option("checkpointLocation", s"$consumerCheckpointRoot/gen-$g")
        .trigger(Trigger.AvailableNow())
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
           _: Long) =>
            // the terminal row is the LOOP's handshake, not data —
            // the listed generation order IS the pointer chain, so
            // consuming it here loses nothing
            val data = b.filter(col("op") =!= "end_of_generation")
            onBatch(g, schema, data)
        }
        .start()
      try q.awaitTermination() finally q.stop()
      }
    }
    gens
  }

  /** Spool version `v` into the CURRENT generation, rolling a new one
    * at a schema change. Marker discipline: `r<v-1>_<v>` existing in
    * ANY generation means v is already spooled (the terminal marker
    * shares the naming, so a redelivered ALTER version no-ops the
    * same way). */
  private def spoolFollow(spark: SparkSession, srcPath: String,
      spoolDir: String, v: Long, keyCols: Seq[String]): Unit = {
    val root = Paths.get(spoolDir)
    val gens = listGens(root)
    if (gens.exists(g => Files.exists(
        root.resolve(s"gen-$g").resolve(s"r${v - 1}_$v"))))
      return // redelivered version (data range or terminal): no-op
    // the generation COVERING v (largest id <= v-1), never blindly the
    // latest: a checkpoint-lost pump re-offers versions from BEFORE
    // the feed's start — those have no covering generation and must
    // no-op (spooling them under a later generation's schema would be
    // exactly the mis-binding this feed exists to prevent)
    val covering = gens.filter(_ <= v - 1)
    if (gens.nonEmpty && covering.isEmpty) return
    val (genDir, pinned) =
      if (gens.isEmpty) {
        // bootstrap: stamped with the FROM side's schema (v0 has no
        // from side — its own create schema pins), and NAMED by that
        // from version — so a first pumped version that is itself an
        // ALTER rolls into a distinct gen-<v> instead of colliding
        // with its own bootstrap directory
        val baseV = math.max(v - 1, 0)
        val j = TxnTable.read(spark, srcPath, baseV).schema.json
        val gd = root.resolve(s"gen-$baseV")
        createStamped(gd, j)
        (gd, j)
      } else {
        val gd = root.resolve(s"gen-${covering.max}")
        (gd, readStamp(gd).json)
      }
    val vSchema = TxnTable.read(spark, srcPath, v).schema.json
    if (vSchema == pinned) {
      spoolRange(spark, srcPath, genDir, v - 1, v, keyCols, pinned)
      return
    }
    // schema change at v: a commit that ALSO changed data has no
    // single-schema image shape — same refusal as the pinned feed
    val dataChanged = v == 0 ||
      TxnTable.snapshotFiles(srcPath, v - 1).toSet !=
        TxnTable.snapshotFiles(srcPath, v).toSet ||
      TxnTable.snapshotDvs(srcPath, v - 1) !=
        TxnTable.snapshotDvs(srcPath, v)
    if (dataChanged) throw new IllegalStateException(
      s"change feed cannot represent version $v of $srcPath: the " +
        "commit changed the schema AND data rows in one version, so " +
        "its images have no single-schema shape. Re-materialize the " +
        "consumer from a snapshot at or after this version.")
    // terminal row in the OLD generation: typed, and its to_version
    // points at the NEW generation's id
    val core = feedSchema(DataType.fromJson(pinned)
      .asInstanceOf[StructType], keyCols)
    val terminal = spark.createDataFrame(
      java.util.Collections.singletonList(
        org.apache.spark.sql.Row.fromSeq(
          keyCols.map(_ => null) ++
            Seq("end_of_generation", null, null, v - 1, v))), core)
    val tmp = genDir.resolve(s".tmp-${java.util.UUID.randomUUID()}")
    terminal.write.parquet(tmp.toString)
    // the new generation must exist BEFORE its terminal pointer is
    // published: a crash between the two in the old order left the
    // marker on disk with no gen-<v>, so redelivery no-op'd on the
    // marker check and the feed wedged (every later version resolved
    // its covering generation to the OLD schema). createStamped is
    // idempotent, so a crash after it simply re-runs the publish.
    createStamped(root.resolve(s"gen-$v"), vSchema)
    // the ALTER commit itself changed no rows, so gen-<v> needs no
    // range; the terminal row in the OLD generation points at it
    publish(tmp, genDir.resolve(s"r${v - 1}_$v"))
  }

  /** One data range into `genDir` — [[spool]]'s body parameterized by
    * the target directory (the pinned-feed spool writes to the spool
    * root; a follow-schema spool writes to its generation). */
  private def spoolRange(spark: SparkSession, srcPath: String,
      genDir: java.nio.file.Path, fromV: Long, toV: Long,
      keyCols: Seq[String], pinnedSchemaJson: String): Unit = {
    val rangeDir = genDir.resolve(s"r${fromV}_${toV}")
    if (Files.exists(rangeDir)) return
    if (toV < readWatermark(genDir)) return
    val imgs =
      if (fromV >= 0)
        TxnTable.diffVersionsImages(spark, srcPath, fromV, toV, keyCols)
      else {
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
    val tmp = genDir.resolve(s".tmp-${java.util.UUID.randomUUID()}")
    out.write.parquet(tmp.toString)
    publish(tmp, rangeDir)
  }

  /** Tail-follow feed: changes from NOW on — the next commit after the
    * current head is the first range, so a 100 TB table's feed starts
    * with ZERO initial-load spool (contrast the default feed, whose
    * first range IS the v0 snapshot). */
  def readChangesTail(spark: SparkSession, srcPath: String,
      spoolDir: String, pumpCheckpointDir: String,
      keyCols: Seq[String]): DataFrame =
    readChangesStream(spark, srcPath, spoolDir, pumpCheckpointDir,
      keyCols, Some(TxnTable.currentVersion(srcPath) + 1))

  /** Changes since a WALL-CLOCK instant ("follow everything committed
    * after yesterday 09:00"): the first spooled commit is the first
    * one that landed AFTER `sinceMillis`, resolved through the same
    * log-mtime clock as every timestamp-addressed read (`versionAt` —
    * its pre-horizon fence applies: an instant older than the earliest
    * readable commit is a loud error, never a silent full replay). */
  def readChangesSince(spark: SparkSession, srcPath: String,
      spoolDir: String, pumpCheckpointDir: String,
      keyCols: Seq[String], sinceMillis: Long): DataFrame =
    readChangesStream(spark, srcPath, spoolDir, pumpCheckpointDir,
      keyCols, Some(TxnTable.versionAt(srcPath, sinceMillis) + 1))

  /** RETENTION sweep: delete published ranges the consumers are done
    * with — every range whose `to_version < keepAfterVersion` — and
    * record `keepAfterVersion` as the spool's monotonic vacuum
    * watermark BEFORE deleting, so a pump whose checkpoint is later
    * lost re-offers those versions into watermark no-ops instead of
    * resurrecting swept ranges (which a consumer would re-ingest as
    * duplicates). Ranges at or above the watermark stay readable;
    * callers pass the slowest consumer's applied version. Returns the
    * number of ranges deleted. */
  def vacuumSpool(spoolDir: String, keepAfterVersion: Long): Int = {
    val root = Paths.get(spoolDir)
    require(Files.isDirectory(root), s"vacuumSpool: no spool at $spoolDir")
    // The watermark update is a read-modify-write: two concurrent
    // sweeps (keepAfter=5 racing keepAfter=3) could otherwise
    // interleave read(5)/read(3)/write(5)/write(3) and REGRESS the
    // persisted watermark after ranges above 3 were already deleted —
    // re-arming exactly the swept-range resurrection the watermark
    // exists to prevent. An OS-level file lock serializes the whole
    // sweep (monotonic max + atomic publish + deletes), across
    // processes as well as threads. Same-JVM callers are serialized by
    // a per-spool monitor FIRST — java.nio file locks are held per
    // JVM, so a second thread's lock() would throw
    // OverlappingFileLockException rather than wait.
    //
    // Portability: the lock plus the watermark's ATOMIC_MOVE publish
    // below are local/HDFS-isms — an object store (S3) has neither
    // advisory locks nor atomic rename. A port there must switch the
    // watermark to a conditional PUT (If-Match on a versioned object)
    // and CAS-loop the monotonic max, same as the spool publish's
    // documented marker-file form. A lost watermark update can only
    // weaken resurrection protection (ranges re-spool and consumers
    // may see duplicates), never lose data.
    val monitor = sweepMonitors.computeIfAbsent(
      root.toAbsolutePath.normalize.toString, _ => new Object)
    monitor.synchronized {
      graft.core.Store.withProcessLock(root.resolve("_vacuum_lock")) {
        vacuumSpoolLocked(root, keepAfterVersion)
      }
    }
  }

  // one monitor per spool path: JVM-internal serialization in front of
  // the cross-process file lock
  private val sweepMonitors =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private def vacuumSpoolLocked(root: java.nio.file.Path,
      keepAfterVersion: Long): Int = {
    val next = math.max(readWatermark(root), keepAfterVersion)
    graft.core.Store.putAtomic(watermarkPath(root), next.toString
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val Range = """r(-?\d+)_(-?\d+)""".r
    import scala.jdk.CollectionConverters._
    val victims = {
      val it = Files.list(root)
      try it.iterator().asScala.filter { p =>
        p.getFileName.toString match {
          case Range(_, to) => to.toLong < next
          case _ => false
        }
      }.toList
      finally it.close()
    }
    victims.foreach { dir =>
      val walk = Files.walk(dir)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .iterator().forEachRemaining(p => { Files.deleteIfExists(p); () })
      finally walk.close()
    }
    victims.size
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
      keyCols: Seq[String], pinnedSchemaJson: String): Unit = {
    val root = Paths.get(spoolDir)
    val rangeDir = root.resolve(s"r${fromV}_${toV}")
    if (Files.exists(rangeDir)) return // redelivered version: no-op
    // swept range re-offered after a pump-checkpoint loss: the vacuum
    // watermark says consumers are done with it — never resurrect it
    if (toV < readWatermark(root)) return
    // the feed's schema is PINNED at the stamp: a version whose table
    // schema differs (ALTER TABLE, schema-evolving overwrite) must not
    // be spooled under the consumer's fixed schema — refuse loudly
    // with the remedy instead of silently null-filling/mis-binding
    val vSchema = TxnTable.read(spark, srcPath, toV).schema.json
    if (vSchema != pinnedSchemaJson) throw new IllegalStateException(
      s"change feed cannot cross the schema change at version $toV of " +
        s"$srcPath: the spool is pinned to the schema it was created " +
        "with. Start a NEW feed (fresh spool + pump/consumer " +
        s"checkpoints) with startingVersion=$toV to continue under " +
        "the new schema.")
    val pinned = DataType.fromJson(pinnedSchemaJson)
      .asInstanceOf[StructType]
    val imgs =
      if (fromV >= 0 &&
          TxnTable.read(spark, srcPath, fromV).schema.json != vSchema) {
        // the schema-change commit ITSELF (a new feed pinned at the
        // new schema starts here): a metadata-only ALTER changes no
        // rows — publish an EMPTY range so the marker discipline
        // holds; a commit that changed schema AND data in one version
        // has no single-schema image representation — refuse
        val dataChanged =
          TxnTable.snapshotFiles(srcPath, fromV).toSet !=
            TxnTable.snapshotFiles(srcPath, toV).toSet ||
          TxnTable.snapshotDvs(srcPath, fromV) !=
            TxnTable.snapshotDvs(srcPath, toV)
        if (dataChanged) throw new IllegalStateException(
          s"change feed cannot represent version $toV of $srcPath: the " +
            "commit changed the schema AND data rows in one version, so " +
            "its images have no single-schema shape. Re-materialize the " +
            "consumer from a snapshot at or after this version.")
        val core = StructType(
          feedSchema(pinned, keyCols).fields.dropRight(2))
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], core)
      } else if (fromV >= 0)
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
    graft.core.Store.publishDirIfAbsent(tmp, rangeDir)
    ()
  }
}
