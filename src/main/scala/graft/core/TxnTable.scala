package graft.core

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path => JPath, Paths, FileAlreadyExistsException}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One data file added by a commit. `stats` is the file's write-time
  * column statistics as compact JSON
  * (`{"cols":[…],"l":{col:[mn,mx]},"s":{col:[mn,mx]}}` — the leaf
  * columns attempted, long bounds in the column's PHYSICAL footer
  * space, and UTF8 string bounds), a pure cache of what a read-time
  * footer index would compute: pruned reads plan from the log alone,
  * zero footer opens. Absent on adds written before stats-in-log —
  * those files fall back to footer reads. */
case class TxnAdd(path: String, rows: Long, bytes: Long,
    stats: Option[String] = None)

/** One committed version: the actions that produced it. `schema` is the
  * table schema as of this commit (JSON), recorded on create and on
  * explicit evolution; absent otherwise. `dvs` are DELETION-VECTOR
  * reassignments: (data file, DV file) pairs stating that from this
  * version on, the data file's logical rows are its physical rows MINUS
  * the positions listed in the DV file (merge-on-read delete — the data
  * file itself is untouched). A commit that re-adds or removes a data
  * file implicitly clears its DV. */
case class TxnCommit(
    version: Long,
    op: String,
    adds: Seq[TxnAdd],
    removes: Seq[String],
    schema: Option[String] = None,
    dvs: Seq[(String, String)] = Nil)

/** MERGE INTO matched-clause ADT (SQL MERGE / the Delta DSL): clauses
  * are evaluated in the order given, first clause whose condition fires
  * claims the row. Conditions and update expressions may reference the
  * target's columns by name and the source row's via
  * [[TxnTable.srcCol]]. */
sealed trait MergeMatched
/** WHEN MATCHED [AND cond] THEN UPDATE SET … (per-column expressions,
  * each cast to the column's existing type). */
case class MatchedUpdate(set: Map[String, Column],
    cond: Option[Column] = None) extends MergeMatched
/** WHEN MATCHED [AND cond] THEN DELETE. */
case class MatchedDelete(cond: Option[Column] = None) extends MergeMatched
/** WHEN NOT MATCHED [AND cond] THEN INSERT (values reference source
  * columns via [[TxnTable.srcCol]]; unspecified table columns get
  * NULL). Multiple clauses apply first-fire-wins per source row. */
case class NotMatchedInsert(values: Map[String, Column],
    cond: Option[Column] = None)

/** WHEN NOT MATCHED BY SOURCE clauses: applied to TARGET rows whose
  * key has no source match (the third leg of SQL MERGE — with it a
  * single statement expresses full-sync CDC: source drives inserts,
  * updates, AND deletes of rows it no longer carries). Conditions and
  * SET expressions see TARGET columns only; ordered first-fire-wins
  * like WHEN MATCHED. */
sealed trait MergeBySource
case class BySourceUpdate(set: Map[String, Column],
    cond: Option[Column] = None) extends MergeBySource
case class BySourceDelete(cond: Option[Column] = None) extends MergeBySource

/** A minimal transactional table format: snapshot-versioned parquet with
  * an append-only JSON commit log — the ACID layer the plain-directory
  * lake lacks (SURVEY.md residual gap; Compactor's swap and SnapshotDiff
  * were the seeds).
  *
  * Layout:
  * {{{
  *   table/data/part-<uuid>.parquet      immutable data files
  *   table/_graft_log/v0000000042.json   one commit per version
  * }}}
  *
  * Properties, each pinned by TxnTableSpec or the s13 gate:
  *  - **Atomic commit / optimistic concurrency**: a commit is staged to
  *    a temp file and published create-exclusive ([[Store.putIfAbsent]],
  *    POSIX link(2) locally)
  *    is create-exclusive, so exactly ONE writer wins a version; losers
  *    see [[TxnConflictException]] and retry against the new snapshot.
  *    (On an object store this primitive becomes a conditional PUT /
  *    putIfAbsent; the protocol is unchanged.)
  *  - **Snapshot isolation**: data files are immutable and never deleted
  *    by commits (remove = logical). A reader of version N resolves its
  *    file list from the log prefix ≤ N and is unaffected by concurrent
  *    appends, deletes, or compaction.
  *  - **Time travel**: `read(spark, path, asOf = N)`.
  *  - **Delete/compact as rewrites**: `deleteWhere` rewrites only the
  *    files that contain matching rows (file-level pruning via one
  *    `input_file_name()` pass); `compact` folds the current snapshot
  *    into fewer files; both are ordinary commits.
  *
  * Scale notes: the log is metadata — O(1) JSON per commit. Every
  * `CheckpointInterval`-th commit also writes a checkpoint holding the
  * RESOLVED live-file list at that version, so snapshot resolution
  * replays at most `CheckpointInterval` commits past the nearest
  * checkpoint — O(1) amortized reads per lookup instead of
  * O(versions). Checkpoints are derived data: written best-effort by
  * the commit winner, idempotent by content, and a missing one only
  * costs a longer replay. Data-file work (rewrite, compaction) is
  * Spark jobs over only the affected files.
  */
object TxnTable {

  class TxnConflictException(version: Long)
    extends RuntimeException(s"version $version was committed concurrently")

  /** Accept both plain local paths and `file:` URIs (the crawler hands
    * over Hadoop-style URI strings). */
  private def localRoot(path: String): JPath =
    if (path.startsWith("file:"))
      Paths.get(java.net.URI.create(path).getPath)
    else Paths.get(path)

  private def logDir(path: String): JPath = localRoot(path).resolve("_graft_log")
  private def dataDir(path: String): JPath = localRoot(path).resolve("data")
  private def dvDir(path: String): JPath = localRoot(path).resolve("dv")
  private def versionFile(path: String, v: Long): JPath =
    logDir(path).resolve(f"v$v%010d.json")

  // -- commit (de)serialization: the log schema is a stable, tiny JSON --

  /** JSON string-escape for every string field the log embeds. User
    * data reaches commit files through several of them — string min/max
    * bounds in stats-in-log, constraint SQL in `constraint:add` ops,
    * recorded schemas — so CONTROL CHARACTERS must escape too: a raw
    * newline inside a bound would write a commit file that is invalid
    * JSON, and every subsequent log read throws, leaving the table
    * permanently unreadable after a routine append. */
  private def esc(s: String): String = {
    val b = new java.lang.StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\\' => b.append("\\\\")
        case '"' => b.append("\\\"")
        case '\n' => b.append("\\n")
        case '\r' => b.append("\\r")
        case '\t' => b.append("\\t")
        case c if c < 0x20 => b.append(f"\\u${c.toInt}%04x")
        case c => b.append(c)
      }
      i += 1
    }
    b.toString
  }

  private def renderAdd(a: TxnAdd): String =
    s"""{"path":"${esc(a.path)}","rows":${a.rows},"bytes":${a.bytes}""" +
      a.stats.map(s => s""","stats":$s""").getOrElse("") + "}"

  private def parseAdd(a: org.json4s.JValue): TxnAdd = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    implicit val fmts: Formats = DefaultFormats
    val stats = (a \ "stats") match {
      case o: JObject => Some(JsonMethods.compact(JsonMethods.render(o)))
      case _ => None
    }
    TxnAdd((a \ "path").extract[String], (a \ "rows").extract[Long],
      (a \ "bytes").extract[Long], stats)
  }

  private def render(c: TxnCommit): String = {
    val adds = c.adds.map(renderAdd).mkString("[", ",", "]")
    val removes = c.removes.map(r => s""""${esc(r)}"""").mkString("[", ",", "]")
    val schema = c.schema.map(s => s""","schema":"${esc(s)}"""").getOrElse("")
    val dvs =
      if (c.dvs.isEmpty) ""
      else c.dvs.map { case (f, dv) =>
        s"""{"f":"${esc(f)}","dv":"${esc(dv)}"}"""
      }.mkString(""","dvs":[""", ",", "]")
    s"""{"version":${c.version},"op":"${esc(c.op)}","adds":$adds,"removes":$removes$schema$dvs}"""
  }

  private def parse(json: String): TxnCommit = {
    // parsed with the JSON parser already on Spark's classpath
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    implicit val fmts: Formats = DefaultFormats
    val j = JsonMethods.parse(json)
    val adds = (j \ "adds") match {
      case JArray(arr) => arr.map(parseAdd)
      case _ => Nil
    }
    val removes = (j \ "removes") match {
      case JArray(arr) => arr.map(_.extract[String])
      case _ => Nil
    }
    val schema = (j \ "schema") match {
      case JString(s) => Some(s)
      case _ => None
    }
    val dvs = (j \ "dvs") match {
      case JArray(arr) => arr.map(d =>
        ((d \ "f").extract[String], (d \ "dv").extract[String]))
      case _ => Nil
    }
    TxnCommit((j \ "version").extract[Long], (j \ "op").extract[String],
      adds, removes, schema, dvs)
  }

  /** Latest committed version, or -1 for a nonexistent/empty table. */
  def currentVersion(path: String): Long = {
    val ld = logDir(path)
    if (!Files.isDirectory(ld)) return -1L
    val it = Files.list(ld)
    try {
      it.iterator().asScala
        .map(_.getFileName.toString)
        .filter(n => n.startsWith("v") && n.endsWith(".json"))
        .map(n => n.substring(1, n.length - 5).toLong)
        .foldLeft(-1L)(math.max)
    } finally it.close()
  }

  private implicit class JIter[T](it: java.util.Iterator[T]) {
    def asScala: Iterator[T] = new Iterator[T] {
      def hasNext: Boolean = it.hasNext
      def next(): T = it.next()
    }
  }

  /** Write a checkpoint every this-many versions (v10, v20, …). */
  val CheckpointInterval = 10

  /** Test seam: counts physical version-file reads, so specs can assert
    * the checkpoint-amortized paths replay O(CheckpointInterval) commits
    * per call instead of O(versions). Monotone; specs diff around a call. */
  private[graft] val versionFileReads = new java.util.concurrent.atomic.AtomicLong

  /** The single physical read path for version files. */
  private def readCommit(path: String, v: Long): TxnCommit = {
    versionFileReads.incrementAndGet()
    parse(new String(Files.readAllBytes(versionFile(path, v)),
      StandardCharsets.UTF_8))
  }

  private def checkpointFile(path: String, v: Long): JPath =
    logDir(path).resolve(f"ckpt-v$v%010d.json")

  /** Parsed checkpoint content. Besides the resolved live-file list and
    * the vacuum horizon, a checkpoint carries every piece of log-derived
    * state a hot-path reader needs, so NO read replays more than the
    * commit suffix past the nearest checkpoint:
    *  - `schemaGens`/`schema`: how many schema generations the prefix
    *    recorded, and the latest one — `read`'s mergeSchema decision and
    *    `currentSchema` (hence every append's validation) stop at the
    *    checkpoint instead of walking to v0;
    *  - `streams`: per-streamId highest applied batch id — the role of
    *    Delta's `txn` action — so `appendStreamBatch`'s idempotence
    *    check is O(suffix), not O(versions) per micro-batch;
    *  - `allAdds`: add metadata of every EXTANT ever-referenced data
    *    file in the prefix (pruned of files a vacuum already deleted —
    *    once gone, nothing can reference them again) — what lets
    *    `vacuum` build its dead-set and `restore` its re-add list
    *    without replaying every commit JSON (an always-on streaming
    *    sink accumulates ~one version per micro-batch, so O(versions)
    *    maintenance would grow without bound).
    * The Option fields are None for checkpoints written by older code;
    * readers then fall back to a full replay (correct, just slower).
    */
  private case class Ckpt(
      version: Long,
      files: Seq[String],
      horizon: Long,
      schemaGens: Option[Long],
      schema: Option[String],
      streams: Option[Map[String, Long]],
      allAdds: Option[Seq[TxnAdd]],
      dvs: Option[Map[String, String]],
      constraints: Option[Map[String, String]],
      props: Option[Map[String, String]],
      copySrcs: Option[Seq[String]])

  /** `stream:<id>:<batch>[:files:[...]]` op → (id, batch); None for
    * other ops. The optional `:files:` suffix (a JSON array of source
    * paths, written by the COPY INTO … FROM STREAM route) is trimmed
    * before the batch-id parse — it feeds [[copySourcesInfo]], not the
    * per-stream high-water. */
  private def parseStreamOp(op: String): Option[(String, Long)] =
    if (!op.startsWith("stream:")) None
    else {
      val rest0 = op.stripPrefix("stream:")
      val fi = rest0.indexOf(":files:[")
      val rest = if (fi >= 0) rest0.take(fi) else rest0
      val i = rest.lastIndexOf(':')
      if (i <= 0) None
      else scala.util.Try((rest.take(i), rest.drop(i + 1).toLong)).toOption
    }

  /** The `:files:` manifest of a stream op, if present. */
  private def parseStreamFilesOp(op: String): Seq[String] =
    if (!op.startsWith("stream:")) Nil
    else {
      val fi = op.indexOf(":files:[")
      if (fi < 0) Nil
      else parseKeysOp(op.drop(fi + ":files:".length))
    }

  /** (schema generations, latest recorded schema) of the log prefix ≤
    * `upTo` — checkpoint-amortized: state is read from the nearest
    * checkpoint and only the suffix is replayed. */
  /** Memo for [[schemaInfo]]: the log is IMMUTABLE per (path, version)
    * — a commit file is never rewritten once published — so the derived
    * (generations, schema) pair is a pure function of the key. Bounded:
    * cleared wholesale past a size cap (correctness never depends on a
    * hit). Keeps the column-mapping seam (applyDv resolves the schema
    * on every read) from re-replaying the checkpoint suffix that the
    * read itself just replayed. */
  private val schemaInfoMemo =
    new java.util.concurrent.ConcurrentHashMap[(String, Long), (Long, Option[String])]()

  private def schemaInfo(path: String, upTo: Long): (Long, Option[String]) = {
    val key = (path, upTo)
    val hit = schemaInfoMemo.get(key)
    if (hit != null) return hit
    val (from, gens0, s0) = latestCheckpoint(path, upTo) match {
      case Some(ck) if ck.schemaGens.isDefined =>
        (ck.version + 1, ck.schemaGens.get, ck.schema)
      case _ => (0L, 0L, None) // no/old-format checkpoint: full replay
    }
    var gens = gens0
    var s = s0
    (from to upTo).foreach { v =>
      readCommit(path, v).schema.foreach { js => gens += 1; s = Some(js) }
    }
    if (schemaInfoMemo.size() > 100000) schemaInfoMemo.clear()
    schemaInfoMemo.put(key, (gens, s))
    (gens, s)
  }

  /** Add metadata per EXTANT ever-referenced data-file path of the
    * prefix ≤ `upTo` — checkpoint-amortized like [[schemaInfo]]. The
    * index underlying [[vacuum]]'s dead-set and [[restore]]'s re-add
    * list: a path's (rows, bytes) are immutable once written, so
    * first-seen metadata is authoritative even when a restore re-adds
    * the path by reference in a later commit. Paths pruned at
    * checkpoint time (physically deleted by a vacuum) stay pruned —
    * a deleted file can never be referenced again (restore is fenced
    * at the vacuum horizon). */
  private def addsIndex(path: String, upTo: Long): Map[String, TxnAdd] = {
    val (from, init) = latestCheckpoint(path, upTo) match {
      case Some(ck) if ck.allAdds.isDefined =>
        (ck.version + 1, ck.allAdds.get.map(a => a.path -> a).toMap)
      case _ => (0L, Map.empty[String, TxnAdd])
    }
    var m = init
    (from to upTo).foreach { v =>
      readCommit(path, v).adds.foreach { a =>
        if (!m.contains(a.path)) m = m.updated(a.path, a)
      }
    }
    m
  }

  /** Highest applied batch id per streamId in the prefix ≤ `upTo` —
    * checkpoint-amortized like `schemaInfo`. */
  private def streamBatches(path: String, upTo: Long): Map[String, Long] = {
    val (from, init) = latestCheckpoint(path, upTo) match {
      case Some(ck) if ck.streams.isDefined => (ck.version + 1, ck.streams.get)
      case _ => (0L, Map.empty[String, Long])
    }
    var m = init
    (from to upTo).foreach { v =>
      parseStreamOp(readCommit(path, v).op).foreach { case (id, b) =>
        m = m.updated(id, math.max(b, m.getOrElse(id, Long.MinValue)))
      }
    }
    m
  }

  /** Active CHECK constraints (name -> SQL expression) of the prefix
    * <= `upTo` -- folded from `constraint:add:<name>:<sql>` /
    * `constraint:drop:<name>` ops, checkpoint-amortized like
    * [[schemaInfo]]. */
  private def constraintsInfo(path: String, upTo: Long)
      : Map[String, String] = {
    val (from, init) = latestCheckpoint(path, upTo) match {
      case Some(ck) if ck.constraints.isDefined =>
        (ck.version + 1, ck.constraints.get)
      case _ => (0L, Map.empty[String, String])
    }
    var m = init
    (from to upTo).foreach { v =>
      val op = readCommit(path, v).op
      if (op.startsWith("constraint:add:")) {
        val rest = op.stripPrefix("constraint:add:")
        val i = rest.indexOf(':')
        if (i > 0) m = m.updated(rest.take(i), rest.drop(i + 1))
      } else if (op.startsWith("constraint:drop:"))
        m -= op.stripPrefix("constraint:drop:")
    }
    m
  }

  /** Test seam: invoked between the version read and the tryCommit of
    * every retrying writer (append / restore / appendStreamBatch /
    * vacuum) and before every commit attempt of the rewrite writers
    * (deleteWhere / merge / compact / compactClustered / overwrite,
    * which rebase past commutable interleaved commits and abort to the
    * caller on a true logical conflict — see [[commitRewrite]]),
    * letting specs deterministically interleave a concurrent commit
    * into the race window. No-op in production. */
  private[graft] var preCommitHook: () => Unit = () => ()

  /** Test seam: invoked by the metadata-only aggregates (countRange /
    * minMaxOf) AFTER the snapshot version is resolved and BEFORE the
    * scan half runs, letting specs interleave a concurrent commit into
    * the window and pin that both halves answer at the SAME resolved
    * snapshot. No-op in production. */
  private[graft] var midReadHook: () => Unit = () => ()

  /** Test seam: invoked by [[convertParquet]] AFTER the directory
    * listing and schema read and BEFORE the distributed footer
    * harvest, letting specs deterministically vanish a listed file
    * into the harvest window (the race the loud-failure contract
    * covers). No-op in production. */
  private[graft] var convertHarvestHook: () => Unit = () => ()

  // Scoped commit tagging for multi-table write groups: every commit
  // made inside `withOpTag(tag) { ... }` has `tag` PREFIXED onto its
  // op, so [[TxnGroup]]'s rollback can prove (op.startsWith(tag)) that
  // a commit above a table's pre-group version belongs to the group —
  // without threading an op parameter through every write verb. The
  // fence below restricts tagged commits to PLAIN (colon-free) DML
  // ops: maintenance/metadata ops carry parsed `verb:payload` shapes
  // (constraint:/tblprops:/stream:/…) whose folds key on the prefix,
  // so tagging one would corrupt its parse — a group step must not
  // make such commits in the first place.
  private val opTag = new scala.util.DynamicVariable[String]("")

  /** Prefix every commit op inside `body` with `tag` (driver-side,
    * nesting refused by [[TxnGroup]] — see the fence there). */
  def withOpTag[T](tag: String)(body: => T): T = opTag.withValue(tag)(body)

  /** The active group tag, if `body` runs inside [[withOpTag]]. */
  def activeOpTag: Option[String] =
    Option(opTag.value).filter(_.nonEmpty)

  /** Publish `commit` as exactly version `commit.version`.
    * @throws TxnConflictException if that version already exists. */
  def tryCommit(path: String, commit0: TxnCommit): Unit = {
    val commit = activeOpTag match {
      case None => commit0
      case Some(tag) =>
        require(!commit0.op.contains(':'),
          s"a write-group step may only make plain DML commits " +
            s"(append/overwrite/update/delete/merge and their MOR " +
            s"twins), got '${commit0.op}' — run maintenance and DDL " +
            "outside the group")
        commit0.copy(op = tag + commit0.op)
    }
    Files.createDirectories(logDir(path))
    // create-exclusive through the Store seam: losing the race IS the
    // version-conflict signal
    if (!Store.putIfAbsent(versionFile(path, commit.version),
        render(commit).getBytes(StandardCharsets.UTF_8)))
      throw new TxnConflictException(commit.version)
    // A version-0 commit is a table BIRTH: if a table previously lived
    // at this path in this JVM (deleted externally, then recreated),
    // every memoized (path, version) schema belongs to the dead table —
    // drop them, or reads of the new table would bind the stale schema.
    if (commit.version == 0L)
      schemaInfoMemo.keySet.removeIf(_._1 == path)
    // Checkpoint: only the winner of version V reaches here, so there
    // is exactly one writer; the content is deterministic from the log
    // prefix, so a torn/failed write is safe (readers fall back to a
    // longer replay). Never let checkpoint failure fail the commit.
    if (commit.version > 0 && commit.version % CheckpointInterval == 0) {
      try {
        val files = snapshotFiles(path, commit.version)
        // Derived-state fields are themselves amortized against the
        // PREVIOUS checkpoint, so writing one costs O(interval) reads.
        val (gens, schema) = schemaInfo(path, commit.version)
        val streams = streamBatches(path, commit.version)
        // Extant-pruned: entries whose data file a vacuum already
        // deleted are dropped (they can never be restored or vacuumed
        // again), so the field's size tracks live + not-yet-vacuumed
        // files, not table lifetime. The existence probe is O(entries)
        // metadata, paid only at checkpoint cadence.
        val allAdds = addsIndex(path, commit.version).values.toSeq
          .filter(a => Store.exists(localRoot(path).resolve(a.path)))
          .sortBy(_.path)
        val dvs = snapshotDvs(path, commit.version)
        val cons = constraintsInfo(path, commit.version)
        val prps = propsInfo(path, commit.version)
        val json = s"""{"version":${commit.version},""" +
          s""""horizon":${earliestVersion(path)},""" +
          s""""schemaGens":$gens,""" +
          schema.map(s => s""""schema":"${esc(s)}",""").getOrElse("") +
          s""""constraints":""" +
          cons.toSeq.sortBy(_._1)
            .map { case (n, e) => s""""${esc(n)}":"${esc(e)}"""" }
            .mkString("{", ",", "}") +
          s""","props":""" +
          prps.toSeq.sortBy(_._1)
            .map { case (k, x) => s""""${esc(k)}":"${esc(x)}"""" }
            .mkString("{", ",", "}") +
          s""","copySrcs":""" +
          copySourcesInfo(path, commit.version).toSeq.sorted
            .map(s => s""""${esc(s)}"""").mkString("[", ",", "]") +
          s""","dvs":""" +
          dvs.toSeq.sortBy(_._1)
            .map { case (f, dv) => s""""${esc(f)}":"${esc(dv)}"""" }
            .mkString("{", ",", "}") +
          s""","streams":""" +
          streams.toSeq.sortBy(_._1)
            .map { case (k, b) => s""""${esc(k)}":$b""" }
            .mkString("{", ",", "}") +
          s""","allAdds":""" +
          allAdds.map(renderAdd).mkString("[", ",", "]") +
          s""","files":""" +
          files.map(f => s""""${esc(f)}"""").mkString("[", ",", "]") + "}"
        // derived state: overwrite-OK atomic publish via the seam
        Store.putAtomic(checkpointFile(path, commit.version),
          json.getBytes(StandardCharsets.UTF_8))
      } catch { case _: Throwable => () }
    }
  }

  /** Latest checkpoint at or below `v`, fully parsed. The derived-state
    * fields (`schemaGens`/`schema`/`streams`) are None for checkpoints
    * written by older code — consumers then fall back to a full replay. */
  private def latestCheckpoint(path: String, v: Long): Option[Ckpt] = {
    val ld = logDir(path)
    if (!Files.isDirectory(ld)) return None
    val it = Files.list(ld)
    val best =
      try it.iterator().asScala
        .map(_.getFileName.toString)
        .filter(n => n.startsWith("ckpt-v") && n.endsWith(".json"))
        .map(n => n.substring(6, n.length - 5).toLong)
        .filter(_ <= v)
        .foldLeft(-1L)(math.max)
      finally it.close()
    if (best < 0) return None
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    implicit val fmts: Formats = DefaultFormats
    try {
      val j = JsonMethods.parse(new String(
        Files.readAllBytes(checkpointFile(path, best)), StandardCharsets.UTF_8))
      val files = (j \ "files") match {
        case JArray(arr) => arr.map(_.extract[String])
        // no files ARRAY at all (an empty snapshot is JArray(Nil)) →
        // the checkpoint is corrupt, not "empty": jackson ignores
        // trailing garbage after a parseable prefix, so a truncated/
        // mangled checkpoint could otherwise half-parse into a Ckpt
        // that silently resolves every snapshot to zero files
        case _ => return None
      }
      val horizon = (j \ "horizon") match {
        case JInt(h) => h.toLong
        case _ => 0L // pre-horizon checkpoint format
      }
      val schemaGens = (j \ "schemaGens") match {
        case JInt(g) => Some(g.toLong)
        case _ => None
      }
      val schema = (j \ "schema") match {
        case JString(s) => Some(s)
        case _ => None
      }
      val streams = (j \ "streams") match {
        case JObject(fields) =>
          Some(fields.map { case (k, jv) => k -> jv.extract[Long] }.toMap)
        case _ => None
      }
      val allAdds = (j \ "allAdds") match {
        case JArray(arr) => Some(arr.map(parseAdd))
        case _ => None
      }
      val dvs = (j \ "dvs") match {
        case JObject(fields) =>
          Some(fields.map { case (k, jv) => k -> jv.extract[String] }.toMap)
        case _ => None
      }
      val cons = (j \ "constraints") match {
        case JObject(fields) =>
          Some(fields.map { case (k, jv) => k -> jv.extract[String] }.toMap)
        case _ => None
      }
      val prps = (j \ "props") match {
        case JObject(fields) =>
          Some(fields.map { case (k, jv) => k -> jv.extract[String] }.toMap)
        case _ => None
      }
      val csrc = (j \ "copySrcs") match {
        case JArray(arr) => Some(arr.map(_.extract[String]))
        case _ => None
      }
      Some(Ckpt(best, files, horizon, schemaGens, schema, streams, allAdds,
        dvs, cons, prps, csrc))
    } catch { case _: Throwable => None } // corrupt checkpoint → full replay
  }

  /** One commit by version — O(1), for callers walking the log
    * backward (e.g. "find the last commit whose op matches") who must
    * not pay [[commits]]' full-prefix read. */
  def commitInfo(path: String, version: Long): TxnCommit =
    readCommit(path, version)

  /** All commits with version ≤ asOf (or all, if asOf < 0), in order. */
  def commits(path: String, asOf: Long = -1L): Seq[TxnCommit] = {
    val top = currentVersion(path)
    require(top >= 0, s"not a TxnTable: $path")
    val upTo = if (asOf < 0) top else asOf
    require(upTo <= top, s"version $upTo does not exist (latest $top)")
    (0L to upTo).map(readCommit(path, _))
  }

  /** Resolve the data-file list of a snapshot: nearest checkpoint ≤
    * target, then replay only the commit suffix (≤ CheckpointInterval
    * commits amortized).
    */
  def snapshotFiles(path: String, asOf: Long = -1L): Seq[String] = {
    val top = currentVersion(path)
    require(top >= 0, s"not a TxnTable: $path")
    val upTo = if (asOf < 0) top else asOf
    require(upTo <= top, s"version $upTo does not exist (latest $top)")
    val (from, initial) = latestCheckpoint(path, upTo)
      .map(ck => (ck.version, ck.files)).getOrElse((-1L, Seq.empty[String]))
    val live = scala.collection.mutable.LinkedHashSet(initial: _*)
    ((from + 1) to upTo).foreach { v =>
      val c = readCommit(path, v)
      c.removes.foreach(live -= _)
      c.adds.foreach(a => live += a.path)
    }
    live.toSeq
  }

  /** Resolve the DELETION-VECTOR map of a snapshot: live data file →
    * its current DV file (absent = no deleted positions). Folds like
    * [[snapshotFiles]] (checkpoint-amortized): a remove or re-add
    * clears a file's DV, a commit's `dvs` entries (re)assign; within
    * one commit the dvs assignments win, so [[restore]] can re-add a
    * file and restore its DV in the same commit. */
  def snapshotDvs(path: String, asOf: Long = -1L): Map[String, String] = {
    val top = currentVersion(path)
    require(top >= 0, s"not a TxnTable: $path")
    val upTo = if (asOf < 0) top else asOf
    require(upTo <= top, s"version $upTo does not exist (latest $top)")
    val (from, init) = latestCheckpoint(path, upTo) match {
      case Some(ck) if ck.dvs.isDefined => (ck.version, ck.dvs.get)
      case _ => (-1L, Map.empty[String, String]) // old checkpoint: replay
    }
    var m = init
    ((from + 1) to upTo).foreach { v =>
      val c = readCommit(path, v)
      c.removes.foreach(m -= _)
      c.adds.foreach(a => m -= a.path)
      c.dvs.foreach { case (f, dv) => m += (f -> dv) }
    }
    m
  }

  /** Write df's rows as fresh immutable part files; returns their adds.
    * Rows per file are counted from the parquet footers the write
    * produced (no second scan).
    */
  private def writeData(
      spark: SparkSession,
      path: String,
      df: DataFrame,
      partitions: Int): Seq[TxnAdd] =
    writeDataPrepared(spark, path, df.repartition(partitions))

  /** Like writeData but trusts the frame's existing partitioning/sort —
    * the seam clustered layouts (compactClustered) come through, where a
    * blind repartition would destroy the ordering being written. */
  /** Test seam: counts physical data-write jobs (every staged tranche
    * comes through writeDataPrepared), so specs can assert a REBASED
    * rewrite committed without re-running its rewrite job. */
  private[graft] val dataWriteJobs = new java.util.concurrent.atomic.AtomicLong

  /** Test seam: suppresses write-time stats-in-log (simulating adds
    * written before the feature) so specs can pin the mixed-generation
    * footer fallback. Row counts are still footer-derived either way. */
  private[graft] var collectWriteStats = true

  private def writeDataPrepared(
      spark: SparkSession,
      path: String,
      df: DataFrame): Seq[TxnAdd] = {
    dataWriteJobs.incrementAndGet()
    val staging = Files.createTempDirectory("graft_txn_stage").toString
    // column mapping: files always store PHYSICAL names — the single
    // write-side seam (no-op on unrenamed tables / first writes)
    val physical = recordedSchemaAt(path, -1L)
      .map(toPhysical(df, _)).getOrElse(df)
    physical.write.mode("overwrite").parquet(staging)
    Files.createDirectories(dataDir(path))
    val conf = spark.sparkContext.hadoopConfiguration
    Files.list(Paths.get(staging)).iterator().asScala.toSeq
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .map { src =>
        // ONE footer read per fresh file, at write time: row count for
        // the add (no second data scan) + the column min/max cache
        // that lets pruned reads plan from the log alone (stats-in-log)
        val st = graft.crawler.SkippingIndex.fileStats(conf, src.toString)
        val name = s"part-${java.util.UUID.randomUUID()}.parquet"
        val dst = dataDir(path).resolve(name)
        Files.move(src, dst)
        val statsJ =
          if (collectWriteStats)
            st.map { case (_, cols, ls, ss, ns) =>
              statsJson(cols, ls, ss, ns) }
          else None
        TxnAdd(s"data/$name", st.map(_._1).getOrElse(0L),
          Files.size(dst), statsJ)
      }
  }

  private def statsJson(cols: Seq[String],
      ls: Map[String, (Long, Long)],
      ss: Map[String, (String, String)],
      ns: Map[String, Long] = Map.empty): String = {
    val c = cols.map(x => s""""${esc(x)}"""").mkString("[", ",", "]")
    val l = ls.toSeq.sortBy(_._1).map { case (k, (mn, mx)) =>
      s""""${esc(k)}":[$mn,$mx]"""
    }.mkString("{", ",", "}")
    val s = ss.toSeq.sortBy(_._1).map { case (k, (mn, mx)) =>
      s""""${esc(k)}":["${esc(mn)}","${esc(mx)}"]"""
    }.mkString("{", ",", "}")
    // "n": exact per-column null counts — present only when every row
    // group set them; upgrades bounds from pruning hints to an exact
    // metadata-only COUNT source (countRange)
    val n = ns.toSeq.sortBy(_._1).map { case (k, v) =>
      s""""${esc(k)}":$v"""
    }.mkString("{", ",", "}")
    s"""{"cols":$c,"l":$l,"s":$s,"n":$n}"""
  }

  private case class AddStats(cols: Set[String],
      l: Map[String, (Long, Long)], s: Map[String, (String, String)],
      n: Map[String, Long])

  private def parseAddStats(json: String): Option[AddStats] =
    try {
      import org.json4s._
      import org.json4s.jackson.JsonMethods
      implicit val fmts: Formats = DefaultFormats
      val j = JsonMethods.parse(json)
      val cols = (j \ "cols") match {
        case JArray(arr) => arr.map(_.extract[String]).toSet
        case _ => return None
      }
      val l = (j \ "l") match {
        case JObject(fields) => fields.map { case (k, v) =>
          val b = v.extract[Seq[Long]]; k -> (b(0), b(1))
        }.toMap
        case _ => Map.empty[String, (Long, Long)]
      }
      val s = (j \ "s") match {
        case JObject(fields) => fields.map { case (k, v) =>
          val b = v.extract[Seq[String]]; k -> (b(0), b(1))
        }.toMap
        case _ => Map.empty[String, (String, String)]
      }
      // absent in pre-round-13 logs → empty map (bounds still prune;
      // only the metadata-only COUNT path needs null counts)
      val n = (j \ "n") match {
        case JObject(fields) => fields.map { case (k, v) =>
          k -> v.extract[Long]
        }.toMap
        case _ => Map.empty[String, Long]
      }
      Some(AddStats(cols, l, s, n))
    } catch { case _: Throwable => None } // malformed → footer fallback

  class SchemaMismatchException(msg: String) extends RuntimeException(msg)

  /** Reader for the RAW snapshot-file reads the rewrite paths do
    * (deleteWhere / merge / compact): pinned to the latest RECORDED
    * schema, so a rewrite of a schema-evolved table reads old-generation
    * files with the evolved shape (missing columns null-filled) instead
    * of whatever single footer parquet inference happens to pick —
    * survivor rows can never silently lose evolved columns. Tables
    * created before schemas were recorded (none in practice: create
    * always records one) fall back to plain inference.
    */
  private def snapshotReader(spark: SparkSession, path: String,
      upTo: Long): org.apache.spark.sql.DataFrameReader =
    recordedSchemaAt(path, upTo) match {
      // bind by PHYSICAL names — files always store physical; a renamed
      // logical name would silently read all-NULL
      case Some(s) => spark.read.schema(physicalSchema(s))
      case None => spark.read
    }

  // -- column mapping (ALTER TABLE RENAME COLUMN) --------------------------
  //
  // A rename is metadata-only: the field keeps its STABLE physical name
  // (the name it was first written under — files are never rewritten)
  // and the recorded schema carries the logical name plus a
  // `graft.physical` metadata key. Every raw parquet scan binds the
  // physical schema and is aliased back to logical names in ONE place
  // (the tail of [[applyDv]], which every read path flows through);
  // every data write renames logical → physical in ONE place
  // ([[writeDataPrepared]]). Stats-in-log keys are physical
  // (written from physical files), so stat lookups translate the
  // caller's logical column first. Unrenamed tables have no mapping and
  // every helper is an exact no-op.

  private val PhysicalKey = "graft.physical"

  private def physicalFieldName(
      f: org.apache.spark.sql.types.StructField): String =
    if (f.metadata.contains(PhysicalKey)) f.metadata.getString(PhysicalKey)
    else f.name

  private def hasMapping(s: org.apache.spark.sql.types.StructType): Boolean =
    s.fields.exists(_.metadata.contains(PhysicalKey))

  /** The schema as stored IN FILES: physical names, metadata stripped. */
  private def physicalSchema(s: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(s.fields.map(f =>
      org.apache.spark.sql.types.StructField(
        physicalFieldName(f), f.dataType, f.nullable)))

  /** Logical column name → the physical name stats/files use. */
  private def physicalColName(path: String, upTo: Long,
      logical: String): String =
    recordedSchemaAt(path, upTo)
      .flatMap(_.fields.find(_.name.equalsIgnoreCase(logical)))
      .map(physicalFieldName).getOrElse(logical)

  /** Rename via ONE simultaneous projection — never
    * `withColumnsRenamed`, which applies entries one-by-one: with a
    * swap-shaped mapping (field A's new name = field B's old name,
    * e.g. RENAME v→value + a fresh `v` added later) the sequential
    * renames collide into duplicate columns. A single aliased select
    * maps every column exactly once. */
  private def renameAll(df: DataFrame, m: Map[String, String]): DataFrame =
    if (m.isEmpty) df
    else df.select(df.columns.map(c =>
      col(s"`$c`").as(m.getOrElse(c.toLowerCase, c))).toSeq: _*)

  private def toLogical(df: DataFrame,
      s: org.apache.spark.sql.types.StructType): DataFrame =
    if (!hasMapping(s)) df
    else renameAll(df,
      s.fields.filter(_.metadata.contains(PhysicalKey))
        .map(f => physicalFieldName(f).toLowerCase -> f.name).toMap)

  private def toPhysical(df: DataFrame,
      s: org.apache.spark.sql.types.StructType): DataFrame =
    if (!hasMapping(s)) df
    else renameAll(df,
      s.fields.filter(_.metadata.contains(PhysicalKey))
        .map(f => f.name.toLowerCase -> physicalFieldName(f)).toMap)

  private def recordedSchemaAt(path: String, v: Long)
      : Option[org.apache.spark.sql.types.StructType] = {
    val upTo = if (v < 0) currentVersion(path) else v
    if (upTo < 0) None
    else schemaInfo(path, upTo)._2.map(js =>
      org.apache.spark.sql.types.DataType.fromJson(js)
        .asInstanceOf[org.apache.spark.sql.types.StructType])
  }

  /** Every PHYSICAL column name (lowercased) that may exist in the
    * table's data files: the current schema's physical names, the
    * physical names of every schema recorded in the readable log
    * prefix (covers dropped columns whose bytes still sit in live
    * files), and the column sets logged with each live file's
    * write-time stats (covers pre-horizon eras the log no longer
    * replays). Used by [[checkSchema]]'s evolution path to refuse a
    * new logical name that would re-bind old bytes — O(versions)
    * driver metadata on the rare evolve path only. */
  private def physicalNamesInUse(path: String, upTo: Long): Set[String] = {
    def phys(s: org.apache.spark.sql.types.StructType): Seq[String] =
      s.fields.toSeq.map(f => physicalFieldName(f).toLowerCase)
    val hist = (earliestVersion(path) to upTo).flatMap { v =>
      readCommit(path, v).schema.toSeq.flatMap(js =>
        phys(org.apache.spark.sql.types.DataType.fromJson(js)
          .asInstanceOf[org.apache.spark.sql.types.StructType]))
    }
    val logged = addsIndex(path, upTo).values
      .flatMap(_.stats).flatMap(parseAddStats)
      .flatMap(_.cols.map(_.toLowerCase))
    (recordedSchemaAt(path, upTo).toSeq.flatMap(phys) ++ hist ++ logged)
      .toSet
  }

  /** Apply a snapshot's DELETION VECTORS to a raw parquet scan of (a
    * subset of) its files: attach the scan-time file name and row
    * position (`input_file_name()` / `_metadata.row_index` — both must
    * be planted BEFORE any join buries the scan), then anti-join the
    * (file, pos) pairs listed in the snapshot's DV files. A snapshot
    * with no DVs returns the scan untouched — ZERO plan overhead on the
    * common path. DV rows are cumulative per file (a newer DV is a
    * superset of the one it replaced), so reading every mapped DV file
    * and anti-joining the union is exact even when one DV file is
    * current for file A but superseded for file B. The DV side is
    * O(deleted rows) and Spark broadcast-joins it while small; compact
    * materializes and clears DVs when they grow. `keepFname` returns
    * the frame with `__fname` still attached for the rewrite paths. */
  private def applyDv(spark: SparkSession, path: String, asOf: Long,
      scan: DataFrame, keepFname: Boolean): DataFrame = {
    val dvm = snapshotDvs(path, asOf)
    def named = scan.withColumn("__fname",
      element_at(split(input_file_name(), "/"), -1))
    val dvApplied =
      if (dvm.isEmpty) { if (keepFname) named else scan }
      else {
        val cols = scan.columns.toSeq
        val dvAbs = dvm.values.toSeq.distinct
          .map(f => localRoot(path).resolve(f).toString)
        val dv = spark.read.parquet(dvAbs: _*)
          .select(col("file").as("__dv_file"), col("pos").as("__dv_pos"))
        val withMeta = named.withColumn("__pos", col("_metadata.row_index"))
        val out = withMeta.join(dv,
          withMeta("__fname") === dv("__dv_file") &&
            withMeta("__pos") === dv("__dv_pos"), "left_anti")
          .drop("__pos")
        if (keepFname) out else out.select(cols.map(col): _*)
      }
    // column mapping: raw scans bind PHYSICAL names; alias back to the
    // snapshot's logical names here — the single seam every read path
    // flows through (after the DV machinery, which only consumes
    // __fname/_metadata and never a data column)
    recordedSchemaAt(path, asOf).map(toLogical(dvApplied, _))
      .getOrElse(dvApplied)
  }

  /** Delete the staged-but-never-committed data files of an aborted
    * write. writeData moves fresh files into data/ BEFORE the commit
    * loop, and vacuum only ever deletes files some commit referenced —
    * so an abort (schema mismatch discovered on retry, a single-shot
    * writer losing its race, an exhausted retry budget) must clean up
    * its own staging or the files leak forever. Only called with adds
    * this writer created itself; restore/vacuum re-reference existing
    * files and never come through here. */
  private def cleanupStaged(path: String, adds: Seq[TxnAdd]): Unit =
    adds.foreach(a =>
      try Files.deleteIfExists(localRoot(path).resolve(a.path))
      catch { case _: Throwable => () })

  /** How a rewrite commit may REBASE past commits that landed between
    * its snapshot read and its tryCommit (the Delta-style logical
    * conflict check). Without rebase, always-on ingest starves
    * maintenance: a compaction that takes longer than one streaming
    * micro-batch loses the CAS race to the stream's next commit every
    * time and redoes the whole rewrite job from scratch. */
  private sealed trait RebasePolicy
  /** Never rebase — CAS writers whose INPUT ROWS were derived from the
    * base snapshot (appendCas, merge with expectedBase): committing
    * them over anything newer could encode stale derivations. */
  private case object NoRebase extends RebasePolicy
  /** Rebase iff no interleaved commit removed any of THIS rewrite's
    * removes. An append (or any commit touching disjoint files)
    * commutes: the rewrite's removes are still live at the new head,
    * its adds carry exactly their replacement rows, so re-committing
    * the SAME adds/removes at the new version preserves every
    * interleaved writer's data. A true overlap (someone rewrote or
    * deleted one of our source files) still aborts — our adds were
    * computed from rows that no longer stand. This is WriteSerializable
    * isolation (Delta's default): a rebased deleteWhere/merge applies
    * its predicate to the snapshot it READ; rows appended concurrently
    * are not re-filtered. An interleaved commit that RECORDS A SCHEMA
    * (evolution) aborts the rebase even without file overlap — our
    * staged files carry the pre-evolution shape (the
    * ConcurrentMetadataChange rule). */
  private case object CommuteNonOverlapping extends RebasePolicy
  /** Rebase only past commits that changed NO files (vacuum and other
    * metadata-only commits). INSERT OVERWRITE replaces the table's
    * whole logical content, so it must NOT commute with an interleaved
    * append — the overwrite would need to remove the appended files
    * too, which its recorded removes (resolved at base) do not cover. */
  private case object CommuteMetadataOnly extends RebasePolicy

  /** Publish a rewrite commit at `base + 1`, rebasing past commutable
    * interleaved commits per `policy` — the SAME adds/removes re-commit
    * at the new head WITHOUT re-running the rewrite job (the whole
    * point: the loser's work is metadata-rebased, not redone). Returns
    * the committed version; throws [[TxnConflictException]] on a true
    * logical conflict (callers clean their staged adds). */
  private def commitRewrite(path: String, base: Long, op: String,
      adds: Seq[TxnAdd], removes: Seq[String], policy: RebasePolicy,
      schema: Option[String] = None, maxRebases: Int = 20): Long = {
    val myRemoves = removes.toSet
    var v = base + 1
    var attempt = 0
    while (true) {
      preCommitHook()
      try {
        tryCommit(path, TxnCommit(v, op, adds, removes, schema))
        return v
      } catch {
        case e: TxnConflictException =>
          if (attempt >= maxRebases) throw e
          val cur = currentVersion(path)
          val commutes = policy match {
            case NoRebase => false
            case CommuteNonOverlapping =>
              (v to cur).forall { iv =>
                val c = readCommit(path, iv)
                // a schema-recording commit (evolution) never commutes:
                // our adds were written under the PRE-evolution shape,
                // and rebasing them past it would commit old-shape
                // files as if they post-dated the new schema — mirror
                // the reference lake formats' ConcurrentMetadataChange
                // rule and abort regardless of file overlap
                // a DV assignment on one of OUR removes also conflicts:
                // our adds were computed from the pre-DV rows, so
                // rebasing past it would resurrect the DV-deleted rows
                // a constraint:add/:drop is a metadata change like a
                // schema evolution: our adds were validated (withChecks)
                // against the constraint set at OUR base, so rebasing
                // past a fresh CHECK could commit rows it never saw —
                // abort and let the caller re-run under the new rules
                // an interleaved commit that RE-ADDS one of our removes
                // (restore) also conflicts: the re-add resets that
                // file's DV/content state, so our adds — computed from
                // the pre-restore snapshot — would silently undo it
                c.schema.isEmpty &&
                  !c.op.startsWith("constraint:") &&
                  !c.removes.exists(myRemoves.contains) &&
                  !c.dvs.exists(d => myRemoves.contains(d._1)) &&
                  !c.adds.exists(a => myRemoves.contains(a.path))
              }
            case CommuteMetadataOnly =>
              (v to cur).forall { iv =>
                val c = readCommit(path, iv)
                // a DV delete changes logical content like an append —
                // an overwrite must not silently swallow it. A
                // schema-recording commit (ALTER/evolution) or a
                // constraint:add/:drop is a metadata change the staged
                // overwrite never saw: its files carry the pre-ALTER
                // shape and were validated against the pre-change
                // constraint set — abort, mirroring
                // CommuteNonOverlapping's ConcurrentMetadataChange rule
                // (rebasing past a fresh CHECK would commit rows it
                // never validated).
                c.adds.isEmpty && c.removes.isEmpty && c.dvs.isEmpty &&
                  c.schema.isEmpty && !c.op.startsWith("constraint:")
              }
          }
          if (!commutes) throw e
          attempt += 1
          v = cur + 1
      }
    }
    -1L // unreachable
  }

  /** The table schema as of the latest commit that recorded one
    * (create + explicit evolutions) — checkpoint-amortized via
    * [[schemaInfo]]: the nearest checkpoint carries the latest recorded
    * schema, so the cost is O(CheckpointInterval) reads, not O(versions).
    */
  def currentSchema(path: String)
      : Option[org.apache.spark.sql.types.StructType] = {
    val top = currentVersion(path)
    if (top < 0) return None
    schemaInfo(path, top)._2.map { json =>
      org.apache.spark.sql.types.DataType.fromJson(json)
        .asInstanceOf[org.apache.spark.sql.types.StructType]
    }
  }

  /** Validate an incoming write's schema; returns the schema to record
    * in the commit (on create/evolution, or when a nullability-LOOSER
    * writer auto-evolves the recorded schema to nullable — the
    * asymmetric direction: stricter writers record nothing) or None
    * (unchanged). Validate-only callers that discard the result accept
    * the loosening without recording it; that is sound here because
    * every file-backed read forces asNullable (Spark file sources do,
    * and the zero-file path does explicitly) — recording where the
    * caller commits a schema just keeps the metadata honest.
    * @throws SchemaMismatchException on drift without evolveSchema. */
  private def checkSchema(path: String, df: DataFrame,
      evolveSchema: Boolean): Option[String] = {
    import org.apache.spark.sql.types._
    // nullability/metadata are NORMALIZED out of the NAME+TYPE match
    // (sig keys on name+type only) — but nullability itself is then
    // reconciled ASYMMETRICALLY below: a writer stricter than the
    // recorded schema is safe as-is, while a writer LOOSER anywhere
    // (top-level or nested) auto-evolves the recorded schema to
    // nullable. Accepting a looser writer without evolving would let
    // pinned readers bind nullable=false over parquet files that
    // really contain nulls — Spark trusts declared nullability, so
    // that is wrong results or codegen NPEs, not a style nit.
    def norm(dt: DataType): DataType = dt match {
      case st: StructType => StructType(st.fields.map(f =>
        StructField(f.name, norm(f.dataType), nullable = true)))
      case ArrayType(et, _) => ArrayType(norm(et), containsNull = true)
      case MapType(k, v, _) =>
        MapType(norm(k), norm(v), valueContainsNull = true)
      case other => other
    }
    def sig(s: StructType) =
      s.fields.map(f => (f.name, norm(f.dataType))).toSeq
    // The recorded type with nullability relaxed wherever the writer
    // is looser (names/types already matched by sig, case-sensitive,
    // so positional find-by-name is total here). Metadata — including
    // column-mapping physical names — rides on the recorded side.
    def relax(rec: DataType, w: DataType): DataType = (rec, w) match {
      case (rs: StructType, ws: StructType) =>
        StructType(rs.fields.map { rf =>
          ws.fields.find(_.name == rf.name) match {
            case Some(wf) => rf.copy(
              dataType = relax(rf.dataType, wf.dataType),
              nullable = rf.nullable || wf.nullable)
            case None => rf
          }
        })
      case (ArrayType(re, rn), ArrayType(we, wn)) =>
        ArrayType(relax(re, we), rn || wn)
      case (MapType(rk, rv, rn), MapType(wk, wv, wn)) =>
        MapType(relax(rk, wk), relax(rv, wv), rn || wn)
      case _ => rec
    }
    currentSchema(path) match {
      case Some(cur) if sig(cur) == sig(df.schema) =>
        val relaxed = relax(cur, df.schema).asInstanceOf[StructType]
        if (relaxed == cur) None else Some(relaxed.json)
      case Some(cur) if !evolveSchema =>
        throw new SchemaMismatchException(
          s"append schema ${df.schema.simpleString} does not match table " +
            s"schema ${cur.simpleString}; pass evolveSchema=true to evolve")
      case cur =>
        // Evolution binds a NEW column's logical name as its physical
        // name (the data files of this very append already store it
        // that way — they are written from the pre-evolution mapping).
        // That name must therefore collide with NO physical name the
        // table's files may already contain: after RENAME a→b an
        // evolve-append carrying `a` would put two physical `a` fields
        // in the schema (every read fails), and after DROP s one
        // carrying `s` would re-bind the dropped bytes (deleted data
        // resurrects). Reject loudly — ADD COLUMNS remaps to a fresh
        // physical name and is always safe.
        cur.foreach { c =>
          val existing = c.fieldNames.map(_.toLowerCase).toSet
          val fresh = df.schema.fieldNames
            .filterNot(n => existing(n.toLowerCase))
          if (fresh.nonEmpty) {
            val inUse = physicalNamesInUse(path, currentVersion(path))
            val clash = fresh.filter(n => inUse(n.toLowerCase))
            require(clash.isEmpty,
              s"schema evolution: ${clash.mkString(", ")} collides with " +
                "a physical column name already present in the table's " +
                "files (a renamed or dropped column) — use ALTER TABLE " +
                "ADD COLUMNS, which assigns a fresh physical name")
          }
        }
        // evolution records the writer's LOGICAL schema — carry each
        // surviving field's column-mapping metadata forward, or a
        // rename's physical binding would be silently wiped and every
        // later read of that column would null-fill
        val merged = org.apache.spark.sql.types.StructType(
          df.schema.fields.map { f =>
            cur.flatMap(_.fields.find(_.name.equalsIgnoreCase(f.name)))
              .filter(_.metadata.contains(PhysicalKey)) match {
              case Some(old) => f.copy(metadata =
                new org.apache.spark.sql.types.MetadataBuilder()
                  .withMetadata(f.metadata)
                  .putString(PhysicalKey,
                    old.metadata.getString(PhysicalKey)).build())
              case None => f
            }
          })
        Some(merged.json)
    }
  }

  /** CONVERT an existing plain-parquet directory into a TxnTable IN
    * PLACE, without moving or rewriting a byte at any size: version 0
    * references every `*.parquet` under `path` (recursive, hidden
    * files skipped) by its root-relative name, records the directory's
    * merged schema, and harvests each file's parquet footer ONCE —
    * distributed as a Spark job, one task per slice of the file list —
    * so row counts land on the adds and min/max/null-count stats land
    * in the log: pruned reads and metadata aggregates plan from the
    * log from the first post-convert read, exactly like a born-graft
    * table. The adoption cost is one footer read per file (what any
    * first crawl pays) against ZERO data movement.
    *
    * After the convert the directory IS the table: appends/rewrites
    * land under its `data/`, vacuum deletes only under `data/` (the
    * adopted originals are never reaped — rewrites strand them as
    * unreferenced history exactly like a shallow clone's source), time
    * travel to v0 always shows the adopted content. */
  def convertParquet(spark: SparkSession, path: String): Long = {
    require(currentVersion(path) < 0,
      s"convertParquet: $path is already a TxnTable")
    val root = localRoot(path)
    require(Files.isDirectory(root), s"convertParquet: no directory $path")
    val walk = Files.walk(root)
    // hidden/metadata filtering applies to EVERY path segment, not
    // just the leaf (Spark's own listing convention): a directory
    // being converted may carry another system's metadata tree (e.g.
    // _delta_log/…/NNN.checkpoint.parquet), and adopting those as
    // data would corrupt the table
    def visible(rel: JPath): Boolean =
      (0 until rel.getNameCount).forall { i =>
        val seg = rel.getName(i).toString
        !seg.startsWith("_") && !seg.startsWith(".")
      }
    val files =
      try walk.iterator().asScala
        .filter(p => Files.isRegularFile(p) &&
          p.getFileName.toString.endsWith(".parquet"))
        .map(root.relativize)
        .filter(visible)
        .map(_.toString).toSeq.sorted
      finally walk.close()
    require(files.nonEmpty, s"convertParquet: no parquet files under $path")
    // the DV machinery keys (file → positions) by BASENAME — the scan
    // side can only recover input_file_name()'s last segment, and
    // born-graft writers mint UUID names so leaves are unique by
    // construction. An adopted tree with duplicate leaves (e.g.
    // 2020/part-0.parquet + 2021/part-0.parquet) would attach one DV
    // to BOTH files and kill same-position rows in the wrong one —
    // silent corruption, so refuse the adoption loudly up front.
    val dupLeaves = files.groupBy(_.split('/').last)
      .filter(_._2.size > 1).values.flatten.toSeq.sorted
    require(dupLeaves.isEmpty,
      s"convertParquet: duplicate file basenames under $path — deletion " +
        s"vectors key on the basename, so adoption would corrupt MOR " +
        s"deletes/updates. Rename to unique leaves first: " +
        dupLeaves.take(6).mkString(", "))
    // merged schema across every footer generation (a drifted layout
    // converts with the union shape; old files null-fill, like any
    // schema-evolved read)
    val schema = spark.read.option("mergeSchema", "true")
      .parquet(files.map(f => root.resolve(f).toString): _*).schema
    // footer harvest as a DISTRIBUTED job: executors open footers with
    // a fresh Configuration (the log and data share one filesystem)
    convertHarvestHook()
    import spark.implicits._
    val rootStr = root.toString
    val harvested = spark.createDataset(files)
      .repartition(math.max(1, math.min(files.size, 256)))
      .map { f =>
        val conf = new org.apache.hadoop.conf.Configuration()
        val abs = java.nio.file.Paths.get(rootStr).resolve(f)
        val st = graft.crawler.SkippingIndex.fileStats(conf, abs.toString)
        // fileStats is None only when the file vanished between listing
        // and harvest — committing a rows=0 add would silently
        // undercount every metadata-only aggregate, so fail the convert
        if (st.isEmpty) throw new IllegalStateException(
          s"convertParquet: $f disappeared during the footer harvest — " +
            "the directory changed under the convert; re-run it")
        (f, st.map(_._1).getOrElse(0L), Files.size(abs),
          st.map { case (_, cols, ls, ss, ns) => statsJson(cols, ls, ss, ns) })
      }
      .collect() // O(files) add metadata — what the commit carries anyway
    val adds = harvested.toSeq.sortBy(_._1).map { case (f, rows, bytes, js) =>
      TxnAdd(f, rows, bytes, js)
    }
    tryCommit(path, TxnCommit(0L, "convert", adds, Nil, Some(schema.json)))
    0L
  }

  /** IDEMPOTENT bulk file ingestion — the COPY INTO shape: adopt every
    * `*.parquet` under `srcDir` not yet loaded into `path`, by
    * REFERENCE (the commit's adds carry the source files' absolute
    * paths, like a shallow clone's — ZERO data movement at any size;
    * one distributed footer harvest lands row counts and min/max stats
    * in the log, so pruned reads and metadata aggregates cover the
    * adopted files immediately). Idempotence is file-path identity
    * against the log's adds index: a re-run lists the same files,
    * finds them loaded, and returns the unchanged head — re-checked
    * inside the commit retry loop, so two concurrent COPY INTOs of one
    * directory never double-load a file. A source file MODIFIED in
    * place is NOT reloaded (path identity, the standard COPY INTO
    * contract — rename new data). CHECK constraints validate against
    * the fresh files' rows (one scan of only the new files); vacuum
    * never deletes foreign absolute paths, so the sources are never
    * reaped. Refused loudly: schema fields missing from the table,
    * basename collisions (the DV key), and column-mapped tables (the
    * adopted files carry source column names, which cannot be bound
    * through a physical-name mapping). Returns the commit's version,
    * or the unchanged head when nothing was new. */
  def copyInto(spark: SparkSession, path: String, srcDir: String,
      pattern: Option[String] = None): Long = {
    val top = currentVersion(path)
    require(top >= 0,
      s"copyInto: $path is not a TxnTable — CREATE it first")
    val src = localRoot(srcDir)
    require(Files.isDirectory(src), s"copyInto: no directory $srcDir")
    def visible(rel: JPath): Boolean =
      (0 until rel.getNameCount).forall { i =>
        val seg = rel.getName(i).toString
        !seg.startsWith("_") && !seg.startsWith(".")
      }
    val matches = patternMatcher(pattern)
    val walk = Files.walk(src)
    val listed =
      try walk.iterator().asScala
        .filter(p => Files.isRegularFile(p) &&
          p.getFileName.toString.endsWith(".parquet"))
        .filter(p => visible(src.relativize(p)) &&
          matches(src.relativize(p)))
        .map(_.toAbsolutePath.normalize.toString).toSeq.sorted
      finally walk.close()
    require(listed.nonEmpty, s"copyInto: no parquet files under $srcDir" +
      pattern.map(g => s" matching PATTERN '$g'").getOrElse(""))
    def freshAt(v: Long): Seq[String] = {
      val already = addsIndex(path, v).keySet
      listed.filterNot(already.contains)
    }
    var fresh = freshAt(top)
    if (fresh.isEmpty) return top
    // column-mapped tables cannot bind source-named files
    recordedSchemaAt(path, top).foreach(s => s.fields.foreach(f =>
      require(physicalFieldName(f) == f.name,
        s"copyInto: $path maps logical column ${f.name} to physical " +
          s"${physicalFieldName(f)} — adopted files cannot be bound " +
          "through a column mapping; INSERT INTO … SELECT instead")))
    // DV ambiguity guard, same rule as convertParquet: basenames must
    // be unique among fresh files AND against the live snapshot
    val liveLeaves = snapshotFiles(path, top).map(_.split('/').last).toSet
    val clash = fresh.groupBy(_.split('/').last)
      .filter { case (leaf, fs) => fs.size > 1 || liveLeaves(leaf) }
    require(clash.isEmpty,
      s"copyInto: file basename collision (deletion vectors key on " +
        s"the basename): ${clash.keys.take(6).mkString(", ")}")
    // every source field must already exist in the table, same type —
    // missing table columns null-fill at read like any evolved schema
    val tSchema = read(spark, path, top).schema
    val sSchema = spark.read.option("mergeSchema", "true")
      .parquet(fresh: _*).schema
    sSchema.fields.foreach(f => require(
      tSchema.fields.exists(t =>
        t.name.equalsIgnoreCase(f.name) && t.dataType == f.dataType),
      s"copyInto: source column ${f.name}: ${f.dataType.simpleString} " +
        s"does not match the table schema"))
    // constraints validate against ONLY the new rows (assert_true
    // throws on the first violating row)
    if (constraints(path).nonEmpty)
      withChecks(spark, path, spark.read.parquet(fresh: _*)).count()
    import spark.implicits._
    val harvested = spark.createDataset(fresh)
      .repartition(math.max(1, math.min(fresh.size, 256)))
      .map { f =>
        val conf = new org.apache.hadoop.conf.Configuration()
        val st = graft.crawler.SkippingIndex.fileStats(conf, f)
        if (st.isEmpty) throw new IllegalStateException(
          s"copyInto: $f disappeared during the footer harvest")
        (f, st.map(_._1).getOrElse(0L), Files.size(Paths.get(f)),
          st.map { case (_, cols, ls, ss, ns) => statsJson(cols, ls, ss, ns) })
      }
      .collect()
    var adds = harvested.toSeq.sortBy(_._1).map { case (f, rows, bytes, js) =>
      TxnAdd(f, rows, bytes, js)
    }
    var attempt = 0
    while (true) {
      val cur = currentVersion(path)
      preCommitHook()
      try {
        tryCommit(path, TxnCommit(cur + 1, "copyinto", adds, Nil, None))
        return cur + 1
      } catch {
        case e: TxnConflictException =>
          attempt += 1
          if (attempt > 20) throw e
          // a racing COPY INTO may have loaded some of our files:
          // drop them and retry with the remainder (or no-op)
          val rebasedTop = currentVersion(path)
          fresh = freshAt(rebasedTop)
          if (fresh.isEmpty) return currentVersion(path)
          val keep = fresh.toSet
          adds = adds.filter(a => keep(a.path))
          // re-run the DV ambiguity guard against the REBASED snapshot:
          // the entry check ran at `top`, but a concurrent commit may
          // have added a file sharing one of our basenames since — a
          // blind re-commit would land two live files with one leaf
          // name and every later MOR DML on the table would fail on
          // the dup-leaf require. Refusing here keeps the invariant
          // "live basenames are unique" a commit-time guarantee, not a
          // snapshot-at-entry hope.
          val liveNow = snapshotFiles(path, rebasedTop)
            .map(_.split('/').last).toSet
          val clashNow = fresh.map(_.split('/').last).filter(liveNow)
          require(clashNow.isEmpty,
            s"copyInto: file basename collision introduced by a " +
              s"concurrent commit (deletion vectors key on the " +
              s"basename): ${clashNow.take(6).mkString(", ")}")
      }
    }
    -1L // unreachable
  }

  /** COPY INTO's `PATTERN = '<glob>'` as a predicate over the path
    * RELATIVE to the landing directory (`**` crosses directories, the
    * standard glob contract) — scoping a load to one sub-drop of a
    * shared landing zone without listing-order dependence. IDEMPOTENCE
    * IS UNSCOPED by design: the loaded-source registry keys on
    * absolute paths, so a file loaded under one pattern never reloads
    * under a broader one. */
  private def patternMatcher(pattern: Option[String]): JPath => Boolean =
    pattern match {
      case None => _ => true
      case Some(g) =>
        val m = java.nio.file.FileSystems.getDefault
          .getPathMatcher("glob:" + g)
        rel => m.matches(rel)
    }

  /** Source files already materialized by a formatted COPY INTO
    * (csv/json), replayed from `copyinto:<fmt>:<json-array>` commit
    * ops — the idempotence registry for sources whose BYTES were
    * rewritten into table parquet (path identity can't live in the
    * adds index there, unlike the parquet adopt-by-reference route).
    * Checkpoint-amortized like constraints/props. */
  private def copySourcesInfo(path: String, upTo: Long): Set[String] = {
    val (from, init) = latestCheckpoint(path, upTo) match {
      case Some(ck) if ck.copySrcs.isDefined =>
        (ck.version + 1, ck.copySrcs.get.toSet)
      case _ => (0L, Set.empty[String])
    }
    var s = init
    (from to upTo).foreach { v =>
      val op = readCommit(path, v).op
      if (op.startsWith("copyinto:csv:"))
        s = s ++ parseKeysOp(op.stripPrefix("copyinto:csv:"))
      else if (op.startsWith("copyinto:json:"))
        s = s ++ parseKeysOp(op.stripPrefix("copyinto:json:"))
      else if (op.startsWith("stream:"))
        s = s ++ parseStreamFilesOp(op)
      else if (op.startsWith("copysrc:prune:"))
        s = s -- parseKeysOp(op.stripPrefix("copysrc:prune:"))
    }
    s
  }

  /** Bound the ingested-file registry: DROP entries under `srcDir`
    * whose source files no longer exist on disk (they were vacuumed
    * from the landing directory) via one `copysrc:prune:` metadata
    * commit that the registry fold subtracts — so a long-lived
    * interval-triggered landing dir doesn't grow every future
    * checkpoint's `copySrcs` without bound. Safe by construction:
    * only VANISHED files are prunable (an existing file's entry is
    * what prevents a double-load, so it must stay); if a pruned path
    * is ever re-landed it ingests again — exactly the semantics of a
    * fresh drop at that path. Returns the commit version, or the
    * unchanged head when nothing is prunable. */
  def pruneCopySources(spark: SparkSession, path: String,
      srcDir: String): Long = {
    val top = currentVersion(path)
    require(top >= 0, s"pruneCopySources: not a TxnTable: $path")
    val prefix = java.nio.file.Paths.get(srcDir)
      .toAbsolutePath.normalize().toString + "/"
    val gone = copySourcesInfo(path, top).toSeq.sorted.filter(p =>
      p.startsWith(prefix) &&
        !java.nio.file.Files.exists(java.nio.file.Paths.get(p)))
    if (gone.isEmpty) return top
    import org.json4s.{JArray, JString}
    import org.json4s.jackson.JsonMethods
    commitMarker(path, "copysrc:prune:" + JsonMethods.compact(
      JsonMethods.render(JArray(gone.map(JString(_)).toList))))
  }

  /** Source files already ingested into `path` through ANY
    * materializing COPY INTO route — formatted batch loads
    * (`copyinto:<fmt>:[...]` ops) and `COPY INTO … FROM STREAM`
    * micro-batches (`stream:…:files:[...]` ops) share one per-table
    * registry, so the same landed file loads exactly once no matter
    * which entry point sees it, and the registry — NOT the stream
    * checkpoint — is the source of truth: a lost checkpoint re-offers
    * everything, already-ingested files are filtered here, and files
    * landed SINCE the loss (bundled by the restarted stream into
    * already-seen batch ids) still load. Checkpoint-amortized via the
    * same `copySrcs` checkpoint field as the batch routes. */
  def streamSourcesIngested(path: String): Set[String] = {
    val top = currentVersion(path)
    if (top < 0) Set.empty else copySourcesInfo(path, top)
  }

  /** [[copyInto]] for NON-parquet landings — `COPY INTO t FROM '<dir>'
    * FORMAT AS CSV|JSON`: fresh source files MATERIALIZE through the
    * standard write path (schema coercion to the table shape, CHECK
    * constraints riding the write job, column-mapped tables fine —
    * the staged parquet stores physical names like any append), while
    * idempotence still keys on source-file PATH identity: each commit
    * records the batch's absolute source paths in its op
    * (`copyinto:<fmt>:[...]`, checkpoint-amortized replay), so a
    * re-run lists the directory, finds every file already loaded, and
    * returns the unchanged head — and two concurrent formatted COPY
    * INTOs re-check the registry inside the conflict retry, so a file
    * loads exactly once. Coercion contract, mirroring the parquet
    * route: every SOURCE column must name a table column and cast to
    * its type; missing table columns null-fill; a value that parses
    * but does not FIT its table type (cast returns null on a non-null
    * input) aborts the whole batch atomically — nothing commits. */
  def copyIntoFormat(spark: SparkSession, path: String, srcDir: String,
      format: String, pattern: Option[String] = None): Long = {
    val fmt = format.toLowerCase
    require(fmt == "csv" || fmt == "json",
      s"copyIntoFormat: unsupported format $format (CSV or JSON; " +
        "parquet adopts by reference via copyInto)")
    val top = currentVersion(path)
    require(top >= 0,
      s"copyInto: $path is not a TxnTable — CREATE it first")
    val src = localRoot(srcDir)
    require(Files.isDirectory(src), s"copyInto: no directory $srcDir")
    def visible(rel: JPath): Boolean =
      (0 until rel.getNameCount).forall { i =>
        val seg = rel.getName(i).toString
        !seg.startsWith("_") && !seg.startsWith(".")
      }
    val matches = patternMatcher(pattern)
    val ext = "." + fmt
    val walk = Files.walk(src)
    val listed =
      try walk.iterator().asScala
        .filter(p => Files.isRegularFile(p) &&
          p.getFileName.toString.endsWith(ext))
        .filter(p => visible(src.relativize(p)) &&
          matches(src.relativize(p)))
        .map(_.toAbsolutePath.normalize.toString).toSeq.sorted
      finally walk.close()
    require(listed.nonEmpty, s"copyInto: no $fmt files under $srcDir" +
      pattern.map(g => s" matching PATTERN '$g'").getOrElse(""))
    def freshAt(v: Long): Seq[String] =
      listed.filterNot(copySourcesInfo(path, v).contains)
    val fresh = freshAt(top)
    if (fresh.isEmpty) return top
    // parse the fresh files: CSV reads untyped (header row names the
    // columns) and coerces below; JSON carries its own scalar types
    // enforceSchema=false: every file's header is VALIDATED against
    // the batch schema — a landing file with drifted column order
    // fails loudly instead of silently loading values into the wrong
    // columns (the default maps by position, ignoring later headers)
    val raw = fmt match {
      case "csv" => spark.read.option("header", "true")
        .option("enforceSchema", "false").csv(fresh: _*)
      case _ => spark.read.json(fresh: _*)
    }
    val tSchema = read(spark, path, top).schema
    raw.columns.foreach(c => require(
      tSchema.fields.exists(_.name.equalsIgnoreCase(c)),
      s"copyInto: source column $c is not a table column"))
    val byName = raw.columns.map(c => c.toLowerCase -> c).toMap
    // table-shaped projection with LOUD coercion: a non-null source
    // value whose cast comes back null is malformed for this table —
    // raise inside the write job, aborting the batch atomically
    val coerced = raw.select(tSchema.fields.toSeq.map { f =>
      byName.get(f.name.toLowerCase) match {
        case None => lit(null).cast(f.dataType).as(f.name)
        case Some(c) =>
          val cast = col(c).cast(f.dataType)
          when(col(c).isNotNull && cast.isNull,
            raise_error(concat(
              lit(s"copyInto: malformed value for ${f.name} " +
                s"(${f.dataType.simpleString}): '"),
              col(c).cast("string"), lit("'"))))
            .otherwise(cast).as(f.name)
      }
    }: _*)
    val opJson = fresh.map(p => s""""${esc(p)}"""")
      .mkString(s"copyinto:$fmt:[", ",", "]")
    // standard write path: constraints ride the job; bins sized by the
    // source byte count against the table's bin-pack target
    val schemaAtStage = recordedSchemaAt(path, top).map(_.json)
    var csStage =
      try constraints(path)
      catch { case _: IllegalArgumentException => Map.empty[String, String] }
    val srcBytes = fresh.map(p => Files.size(Paths.get(p))).sum
    val bins = math.max(1,
      math.ceil(srcBytes.toDouble / (128L * 1024 * 1024)).toInt)
    val adds = writeData(spark, path, withChecks(spark, path, coerced),
      bins)
    var attempt = 0
    try {
      while (true) {
        val cur = currentVersion(path)
        preCommitHook()
        try {
          tryCommit(path, TxnCommit(cur + 1, opJson, adds, Nil, None))
          return cur + 1
        } catch {
          case e: TxnConflictException =>
            attempt += 1
            if (attempt > 20) throw e
            // a racing formatted COPY INTO may have loaded one of our
            // files: the staged batch mixes every file's rows, so a
            // partial drop is impossible — abort the whole batch and
            // let the caller re-run (which will list only what is
            // still fresh). A race that loaded NONE of ours commutes
            // like any append and re-commits at the new head.
            if (freshAt(currentVersion(path)).toSet != fresh.toSet)
              throw new IllegalStateException(
                "copyInto: a concurrent COPY INTO loaded part of this " +
                  "batch — re-run to load the remainder")
            // the lost race may have been an ALTER: the staged files
            // were coerced to the OLD shape — blindly re-committing
            // would land wrong-schema data (the same fence append's
            // retry applies via checkSchema)
            val schemaNow =
              recordedSchemaAt(path, currentVersion(path)).map(_.json)
            if (schemaNow != schemaAtStage)
              throw new IllegalStateException(
                "copyInto: the table schema changed concurrently — the " +
                  "staged batch was coerced to the old shape; re-run " +
                  "the load against the new schema")
            // …or a concurrent addConstraint: the staged rows were
            // checked against the OLD constraint set — re-validate
            // (the outer catch cleans the staged files on violation)
            csStage = revalidateStaged(spark, path, adds, csStage)
        }
      }
    } catch { case e: Throwable => cleanupStaged(path, adds); throw e }
    -1L // unreachable
  }

  /** Create version 0 from `df`, recording its schema. Fails if the
    * table already exists. */
  def create(spark: SparkSession, path: String, df: DataFrame,
      partitions: Int = 1, op: String = "create"): Long = {
    val adds = writeData(spark, path, df, partitions)
    try tryCommit(path, TxnCommit(0L, op, adds, Nil, Some(df.schema.json)))
    catch { case e: Throwable => cleanupStaged(path, adds); throw e }
    0L
  }

  /** Highest recorded `stream:<id>:<n>` marker for `streamId` — the
    * public read side of the per-stream transaction markers
    * ([[appendStreamBatch]]'s idempotence state, also writable via the
    * `op` parameter of [[create]]/[[overwrite]] for sinks that replace
    * rather than append, e.g. a maintained view recording the source
    * version it reflects). Checkpoint-amortized. None if the table or
    * marker doesn't exist. */
  def streamHighWater(path: String, streamId: String): Option[Long] = {
    val top = currentVersion(path)
    if (top < 0) None else streamBatches(path, top).get(streamId)
  }

  /** [[create]] with a clustered physical layout: range-partition the
    * rows by `clusterBy` into `targetFiles` files, sorted within each —
    * so every file owns a compact key range and its parquet footer
    * min/max on the leading cluster column feeds [[readPruned]] /
    * [[readPrunedIn]] from version 0, without waiting for a
    * [[compactClustered]] pass. The same one range-shuffle any sorted
    * write costs. */
  def createClustered(spark: SparkSession, path: String, df: DataFrame,
      clusterBy: Seq[Column], targetFiles: Int): Long = {
    val prepared = df.repartitionByRange(targetFiles, clusterBy: _*)
      .sortWithinPartitions(clusterBy: _*)
    val adds = writeDataPrepared(spark, path, prepared)
    // the LAYOUT SPEC rides the create commit as seeded table
    // properties (`create:props:` folds into propsInfo like a SET),
    // so DESCRIBE DETAIL can tell an operator what the table is
    // clustered on and how wide — with no extra commit shifting
    // version numbers
    val names = clusterBy.map(_.toString()).mkString(",")
    val op = s"""create:props:{"graft.clusterBy":"${esc(names)}",""" +
      s""""graft.targetFiles":"$targetFiles"}"""
    try tryCommit(path, TxnCommit(0L, op, adds, Nil, Some(df.schema.json)))
    catch { case e: Throwable => cleanupStaged(path, adds); throw e }
    0L
  }

  /** Append `df` as a new version; retries the version race, because an
    * append conflicts with nothing logically. The schema is enforced
    * against the table's recorded schema — a drifted writer fails loudly
    * instead of corrupting reads — unless `evolveSchema` explicitly
    * records the new shape (reads then mergeSchema across the log's
    * schema generations).
    */
  /** CAS append: commit `df` as `expectedBase + 1` or fail with
    * [[TxnConflictException]] (no retry — the caller's rows were
    * computed FROM the snapshot at `expectedBase`, so committing over
    * anything newer could encode stale derivations; the caller
    * recomputes and re-runs). `clusterBy` range-clusters the files so
    * footer pruning stays tight. Staged files are cleaned on abort.
    */
  def appendCas(spark: SparkSession, path: String, df: DataFrame,
      expectedBase: Long, clusterBy: Seq[Column] = Nil,
      partitions: Int = 1, op: String = "append"): Long = {
    val newSchema = checkSchema(path, df, evolveSchema = false)
    // Fail FAST before staging: a lost CAS race would otherwise pay a
    // complete tranche write plus cleanup just to be told to retry
    // (every retry of TxnIndex's upsert loops under contention).
    // tryCommit below remains the authoritative conflict check — this
    // is latency hygiene, not the correctness gate.
    val early = currentVersion(path)
    if (early != expectedBase) throw new TxnConflictException(early)
    val checked = withChecks(spark, path, df)
    val adds =
      if (clusterBy.nonEmpty)
        writeDataPrepared(spark, path,
          checked.repartitionByRange(partitions, clusterBy: _*)
            .sortWithinPartitions(clusterBy: _*))
      else writeData(spark, path, checked, partitions)
    val base = currentVersion(path)
    if (base != expectedBase) {
      cleanupStaged(path, adds)
      throw new TxnConflictException(base)
    }
    preCommitHook()
    try tryCommit(path, TxnCommit(base + 1, op, adds, Nil, newSchema))
    catch { case e: Throwable => cleanupStaged(path, adds); throw e }
    base + 1
  }

  /** The highest `stream:<streamId>:<batchId>` batch id committed to
    * `path` — the exactly-once idempotence check, public so composed
    * writers (e.g. a streaming index ingest that commits through
    * [[appendCas]] with a stream op label) can skip redelivered
    * batches the same way [[appendStreamBatch]] does. Checkpoint-
    * amortized like every other log-derived hot path. */
  def lastAppliedBatch(path: String, streamId: String): Option[Long] = {
    val top = currentVersion(path)
    if (top < 0) None else streamBatches(path, top).get(streamId)
  }

  /** INSERT OVERWRITE: atomically replace the table's entire logical
    * content with `df` — one commit removing every live file and adding
    * the new clustered layout. History stays readable (old files are
    * never deleted here); abort-on-conflict like [[compact]]. The
    * compaction primitive for merge-on-read layouts (TxnIndex folds
    * its tombstones through this).
    */
  /** [[overwriteClustered]] without a clustering requirement — INSERT
    * OVERWRITE for small derived/bookkeeping tables (e.g. folding a
    * bloom-sidecar's accumulated rows to one). Same conflict contract:
    * abort-on-conflict, staged files cleaned, history stays readable. */
  /** `evolveSchema = true` (REPLACE TABLE): the overwrite may carry a
    * DIFFERENT schema — recorded on the same commit, so the replace is
    * atomic (readers see old shape + old rows, or new shape + new
    * rows, never a mix); the evolution collision rules (physical-name
    * re-binding) apply as for append. */
  def overwrite(spark: SparkSession, path: String, df: DataFrame,
      partitions: Int = 1, op: String = "overwrite",
      evolveSchema: Boolean = false): Long = {
    val base = currentVersion(path)
    val files = snapshotFiles(path, base)
    val newSchema = checkSchema(path, df, evolveSchema)
    val adds = writeData(spark, path, withChecks(spark, path, df),
      partitions)
    try commitRewrite(path, base, op, adds, files, CommuteMetadataOnly,
      schema = newSchema)
    catch { case e: Throwable => cleanupStaged(path, adds); throw e }
  }

  def overwriteClustered(spark: SparkSession, path: String, df: DataFrame,
      clusterBy: Seq[Column], targetFiles: Int): Long = {
    val base = currentVersion(path)
    val files = snapshotFiles(path, base)
    checkSchema(path, df, evolveSchema = false)
    val adds = writeDataPrepared(spark, path,
      withChecks(spark, path, df)
        .repartitionByRange(targetFiles, clusterBy: _*)
        .sortWithinPartitions(clusterBy: _*))
    try commitRewrite(path, base, "overwrite", adds, files, CommuteMetadataOnly)
    catch { case e: Throwable => cleanupStaged(path, adds); throw e }
  }

  def append(spark: SparkSession, path: String, df: DataFrame,
      partitions: Int = 1, maxAttempts: Int = 20,
      evolveSchema: Boolean = false, op: String = "append"): Long = {
    var newSchema = checkSchema(path, df, evolveSchema)
    // Constraint baseline taken BEFORE the write job: anything added
    // after this point is re-validated against the staged files on a
    // lost version race (revalidateStaged).
    var csStage =
      try constraints(path)
      catch { case _: IllegalArgumentException => Map.empty[String, String] }
    val adds = writeData(spark, path, withChecks(spark, path, df),
      partitions)
    var attempt = 0
    // Any abort past this point (schema mismatch discovered on retry,
    // retry budget exhausted) must delete the staged files it can no
    // longer commit — see cleanupStaged.
    try {
      while (true) {
        val v = currentVersion(path) + 1
        preCommitHook()
        try {
          tryCommit(path, TxnCommit(v, op, adds, Nil, newSchema))
          return v
        } catch {
          case _: TxnConflictException if attempt < maxAttempts =>
            attempt += 1
            // The lost race may have been a concurrent evolveSchema:
            // re-validate against the FRESH snapshot so a drifted append
            // fails loudly instead of committing stale-schema data.
            newSchema = checkSchema(path, df, evolveSchema)
            // ... or a concurrent addConstraint: the staged rows were
            // checked against the OLD constraint set — re-validate them
            // (the outer catch cleans the staged files on violation)
            csStage = revalidateStaged(spark, path, adds, csStage)
        }
      }
    } catch { case e: Throwable => cleanupStaged(path, adds); throw e }
    -1L // unreachable
  }

  /** Delete matching rows by rewriting ONLY the files that contain them
    * (one input_file_name() pass finds those files; untouched files are
    * carried by reference). The snapshot it read is re-validated at
    * commit: commutable interleaved commits (appends, rewrites of
    * disjoint files) are rebased past without redoing the job; a
    * concurrent commit that touched one of the hit files aborts the
    * delete (no lost updates) — see [[commitRewrite]].
    */
  /** The snapshot's PHYSICAL-name scan, safe on ZERO-FILE snapshots
    * (truncate / delete-all): an empty frame with the recorded
    * physical schema substitutes for the parquet read — DML and
    * compaction on an emptied table then no-op through their own
    * nothing-matched paths instead of crashing on a pathless read. */
  private def snapshotScan(spark: SparkSession, path: String,
      base: Long, abs: Seq[String]): DataFrame =
    if (abs.nonEmpty)
      snapshotReader(spark, path, base).parquet(abs: _*)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      physicalSchema(recordedSchemaAt(path, base).getOrElse(
        throw new IllegalArgumentException(
          s"empty snapshot of $path at $base with no recorded schema"))))

  def deleteWhere(spark: SparkSession, path: String, predicate: Column): Long = {
    val base = currentVersion(path)
    val files = snapshotFiles(path, base)
    val abs = files.map(f => localRoot(path).resolve(f).toString)
    // Normalize input_file_name() to the bare file name ONCE — data
    // files live flat under data/ with UUID names, so the name is a
    // complete key. The hit-file set stays a DATAFRAME end-to-end
    // (localCheckpoint materializes the one input_file_name() pass so
    // the survivors join reuses it instead of recomputing); the only
    // driver materialization is the collect at the bottom, which the
    // commit's `removes` metadata needs regardless — bounded by the
    // snapshot file count, the same order as the file list itself.
    // applyDv: DV-deleted rows are logically gone — they must neither
    // trigger a hit nor survive the rewrite (the rewrite's removes
    // clear the hit files' DV mappings).
    val withName = applyDv(spark, path, base,
      snapshotScan(spark, path, base, abs), keepFname = true)
    val hitDf = withName.filter(predicate)
      .select(col("__fname")).distinct().localCheckpoint()
    if (hitDf.isEmpty) return base
    val survivors = withName
      .join(broadcast(hitDf), "__fname")
      .filter(!coalesce(predicate, lit(false)))
      .drop("__fname")
    val adds =
      if (survivors.isEmpty) Nil
      else writeData(spark, path, survivors, 1)
    val hitNames = hitDf.collect().map(_.getString(0)).toSet
    // last-segment comparison (UUID file names are a complete key):
    // works for own-root relative paths AND a shallow clone's absolute
    // source references alike
    val removes = files.filter(f => hitNames.contains(f.split('/').last))
    try commitRewrite(path, base, "delete", adds, removes,
      CommuteNonOverlapping)
    catch { case e: Throwable => cleanupStaged(path, adds); throw e }
  }

  /** MERGE-ON-READ delete (deletion vectors): mark every row matching
    * `predicate` deleted by POSITION, without rewriting a single data
    * file — one small DV parquet of (file, row position) pairs plus a
    * metadata commit. The write cost is O(deleted rows), not O(bytes
    * of the files they live in): deleting 0.1% of rows scattered
    * across a 100 TB table costs ~a few MB of positions where
    * [[deleteWhere]] (copy-on-write) would rewrite every touched
    * file. Readers anti-join the DV at scan time ([[applyDv]] — zero
    * overhead for DV-free snapshots); [[compact]] (or any rewrite
    * touching the file) MATERIALIZES the DV and clears it, which is
    * the read-amplification escape valve. DVs are cumulative per
    * file: the new DV carries the union of old and new positions, so
    * exactly one DV file is current per data file. Conflict contract:
    * rebase past interleaved commits that touch none of the DV'd
    * files; abort (after retries) when one removed or re-DV'd them.
    * Returns the base version unchanged if nothing matched. */
  def deleteWhereMor(spark: SparkSession, path: String,
      predicate: Column): Long = {
    val base = currentVersion(path)
    val (live, oldDv, files) = liveWithPos(spark, path, base)
    val hits = live.filter(predicate)
      .select(col("__fname").as("file"), col("__pos").as("pos"))
      .localCheckpoint()
    if (hits.isEmpty) return base
    val (dvs, dvFile) = buildDvs(spark, path, files, hits, oldDv)
    try commitDvs(path, base, "dvdelete", dvs)
    catch {
      case e: Throwable =>
        try Files.deleteIfExists(localRoot(path).resolve(dvFile))
        catch { case _: Throwable => () }
        throw e
    }
  }

  /** MERGE-ON-READ update: the [[updateWhere]] semantics at
    * [[deleteWhereMor]]'s cost — matching rows are marked dead by
    * position in a DV and their UPDATED images appended as fresh
    * files, ONE atomic commit (`dvupdate` carries both the adds and
    * the DV reassignments, so no reader ever sees the row missing or
    * doubled). Write cost is O(changed rows): updating 0.1% of rows
    * scattered across a 100 TB table writes ~the changed rows + a
    * few MB of positions, where [[updateWhere]] (copy-on-write)
    * rewrites every file containing a match. Same read/compaction
    * story as MOR delete (readers subtract the DV; compact
    * materializes); CDF shows the change as before/after images like
    * any rewrite. Returns the base version if nothing matched. */
  def updateWhereMor(spark: SparkSession, path: String,
      predicate: Column, set: Map[String, Column],
      partitions: Int = 1): Long = {
    val base = currentVersion(path)
    val (live, oldDv, files) = liveWithPos(spark, path, base)
    val tableCols = live.columns.toSeq
      .filterNot(c => c == "__fname" || c == "__pos")
    val bad = set.keySet -- tableCols
    require(bad.isEmpty, s"updateWhereMor: unknown columns $bad")
    require(!set.values.exists(hasJoinSubquery),
      "updateWhereMor: IN/EXISTS subqueries are not supported in SET " +
        "values (scalar subqueries are; or precompute via MERGE INTO)")
    // one materialized pass pins BOTH the hit positions and the row
    // content the updated images are computed from (the DV and the
    // appended rows must describe the same snapshot rows)
    val hitRows = live.filter(predicate).localCheckpoint()
    if (hitRows.isEmpty) return base
    val hits = hitRows
      .select(col("__fname").as("file"), col("__pos").as("pos"))
    val updated = hitRows.select(tableCols.map { c =>
      if (set.contains(c))
        set(c).cast(live.schema(c).dataType).as(c)
      else col(c)
    }: _*)
    val adds = writeData(spark, path, withChecks(spark, path, updated),
      partitions)
    val (dvs, dvFile) =
      try buildDvs(spark, path, files, hits, oldDv)
      catch { case e: Throwable => cleanupStaged(path, adds); throw e }
    try commitDvs(path, base, "dvupdate", dvs, adds)
    catch {
      case e: Throwable =>
        cleanupStaged(path, adds)
        try Files.deleteIfExists(localRoot(path).resolve(dvFile))
        catch { case _: Throwable => () }
        throw e
    }
  }

  /** Live rows of the snapshot `base` (existing DVs applied — an
    * already-deleted row must not re-trigger a hit) with `__fname` /
    * `__pos` scan metadata attached, plus the current DV rows and the
    * snapshot file list, for the MOR write paths. */
  private def liveWithPos(spark: SparkSession, path: String, base: Long)
      : (DataFrame, DataFrame, Seq[String]) = {
    val files = snapshotFiles(path, base)
    val abs = files.map(f => localRoot(path).resolve(f).toString)
    val dvm = snapshotDvs(path, base)
    // `_metadata.row_index` exists only on real file scans — the
    // zero-file substitute (truncate / delete-all) fakes the two
    // bookkeeping columns on the empty frame instead
    val scan0 = snapshotScan(spark, path, base, abs)
    val scan =
      if (abs.isEmpty)
        scan0.withColumn("__fname", lit(""))
          .withColumn("__pos", lit(0L))
      else scan0.withColumn("__fname",
          element_at(split(input_file_name(), "/"), -1))
        .withColumn("__pos", col("_metadata.row_index"))
    val oldDv =
      if (dvm.isEmpty)
        spark.emptyDataFrame
          .withColumn("file", lit("")).withColumn("pos", lit(0L))
          .limit(0).select(col("file"), col("pos"))
      else spark.read.parquet(dvm.values.toSeq.distinct
        .map(f => localRoot(path).resolve(f).toString): _*)
        .select(col("file"), col("pos"))
    val live = scan.join(oldDv,
      scan("__fname") === oldDv("file") && scan("__pos") === oldDv("pos"),
      "left_anti")
    // column mapping: physical scan → logical names (same seam as
    // applyDv's tail; the __fname/__pos bookkeeping columns pass through)
    val logical = recordedSchemaAt(path, base)
      .map(toLogical(live, _)).getOrElse(live)
    (logical, oldDv, files)
  }

  /** Write the replacement DV for `hits` (new positions ∪ the hit
    * files' previous positions — DVs are cumulative per file) and
    * return the per-file reassignments plus the DV file for cleanup. */
  private def buildDvs(spark: SparkSession, path: String,
      files: Seq[String], hits: DataFrame, oldDv: DataFrame)
      : (Seq[(String, String)], String) = {
    val hitNames = hits.select(col("file")).distinct()
      .collect().map(_.getString(0)).toSet
    val hitPaths = files.filter(f => hitNames.contains(f.split('/').last))
    // basename→path must be injective among the hit files: a DV keyed
    // on a shared leaf would kill same-position rows in BOTH files.
    // Unreachable for born-graft tables (UUID leaves) and guarded at
    // convertParquet; kept as a last-line corruption check.
    val dupLeaf = hitPaths.groupBy(_.split('/').last).filter(_._2.size > 1)
    require(dupLeaf.isEmpty,
      s"deletion vector would be ambiguous: duplicate basenames among " +
        s"hit files ${dupLeaf.values.flatten.mkString(", ")}")
    val carried = oldDv.filter(col("file")
      .isInCollection(hitNames.toSeq))
    val dvFile = writeDv(spark, path, hits.unionByName(carried))
    (hitPaths.map(f => f -> dvFile), dvFile)
  }

  /** Write one DV parquet under `dv/`; returns its table-relative path. */
  private def writeDv(spark: SparkSession, path: String,
      rows: DataFrame): String = {
    val staging = Files.createTempDirectory("graft_dv_stage").toString
    rows.coalesce(1).write.mode("overwrite").parquet(staging)
    Files.createDirectories(dvDir(path))
    val src = Files.list(Paths.get(staging)).iterator().asScala.toSeq
      .filter(_.getFileName.toString.endsWith(".parquet"))
    require(src.size == 1, s"writeDv: expected 1 part file, got ${src.size}")
    val name = s"dv-${java.util.UUID.randomUUID()}.parquet"
    Files.move(src.head, dvDir(path).resolve(name))
    s"dv/$name"
  }

  /** Publish a DV commit (optionally carrying fresh adds — the
    * MOR-update shape) at `base + 1`, rebasing past interleaved
    * commits that touched NONE of the DV'd files (an append, a rewrite
    * of other files, a marker all commute — the DV'd files' rows still
    * stand at the new head); abort when one removed, rewrote, or
    * re-DV'd them (our union-with-old-positions DV was computed from a
    * stale DV state). */
  private def commitDvs(path: String, base: Long, op: String,
      dvs: Seq[(String, String)], adds: Seq[TxnAdd] = Nil,
      maxRebases: Int = 20): Long = {
    val myFiles = dvs.map(_._1).toSet
    var v = base + 1
    var attempt = 0
    while (true) {
      preCommitHook()
      try {
        tryCommit(path, TxnCommit(v, op, adds, Nil, None, dvs))
        return v
      } catch {
        case e: TxnConflictException =>
          if (attempt >= maxRebases) throw e
          val cur = currentVersion(path)
          val commutes = (v to cur).forall { iv =>
            val c = readCommit(path, iv)
            // an interleaved commit that RE-ADDS one of our DV'd files
            // (restore) resets that file's DV state: our DV was built
            // as (old cumulative positions ∪ new hits) against the
            // PRE-restore map, so rebasing past the re-add would
            // silently re-delete the rows the restore just resurrected
            // a constraint change conflicts only when this commit also
            // APPENDS row images (MOR update): those were validated
            // against the constraint set at our base; a pure DV delete
            // removes rows and can never violate a fresh CHECK
            c.schema.isEmpty &&
              (adds.isEmpty || !c.op.startsWith("constraint:")) &&
              !c.removes.exists(myFiles.contains) &&
              !c.dvs.exists(d => myFiles.contains(d._1)) &&
              !c.adds.exists(a => myFiles.contains(a.path))
          }
          if (!commutes) throw e
          attempt += 1
          v = cur + 1
      }
    }
    -1L // unreachable
  }

  /** UPDATE … SET … WHERE: rewrite every row matching `predicate` with
    * the `set` expressions applied (each cast to its column's existing
    * type, so the table schema never drifts); non-matching rows in hit
    * files are carried through the rewrite unchanged, and files with NO
    * matching row are carried by reference — the update's cost is
    * O(files containing a match), not O(table). Same conflict contract
    * as [[deleteWhere]] (rebase-or-abort, staged files cleaned on
    * abort); the commit op is `update`, so the change feed (S17) shows
    * the touched files' before/after images. */
  def updateWhere(spark: SparkSession, path: String, predicate: Column,
      set: Map[String, Column]): Long = {
    val base = currentVersion(path)
    val files = snapshotFiles(path, base)
    val abs = files.map(f => localRoot(path).resolve(f).toString)
    val current = snapshotScan(spark, path, base, abs)
    // LOGICAL column surface: applyDv aliases the physical scan back to
    // the snapshot's logical names (column mapping) — user SET keys and
    // predicates speak logical
    val withName = applyDv(spark, path, base, current, keepFname = true)
    val tableCols = withName.columns.toSeq.filterNot(_ == "__fname")
    val colType = withName.schema.fields.map(f => f.name -> f.dataType).toMap
    val bad = set.keySet -- tableCols
    require(bad.isEmpty, s"updateWhere: unknown columns $bad")
    // SET values are projections on BOTH rewrite shapes — an IN/EXISTS
    // subquery there can never satisfy Spark's subquery-placement rule,
    // so reject it loudly (scalar subqueries are projection-legal)
    require(!set.values.exists(hasJoinSubquery),
      "updateWhere: IN/EXISTS subqueries are not supported in SET " +
        "values (scalar subqueries are; or precompute via MERGE INTO)")
    val hitDf = withName.filter(predicate)
      .select(col("__fname")).distinct().localCheckpoint()
    if (hitDf.isEmpty) return base
    val p = coalesce(predicate, lit(false))
    val inHit = withName.join(broadcast(hitDf), "__fname")
    // IN/EXISTS subqueries are only legal in FILTERS (Spark's subquery
    // placement rule), never inside the per-column when(p, …)
    // projection — a subquery predicate takes the two-filter shape
    // instead: untouched rows and updated rows selected separately
    // over the hit files and unioned. Plain predicates keep the
    // single-pass codegen'd when().
    val rewritten =
      if (!hasJoinSubquery(predicate))
        inHit.select(tableCols.map { c =>
          if (set.contains(c))
            when(p, set(c).cast(colType(c)))
              .otherwise(col(c)).as(c)
          else col(c)
        }: _*)
      else
        inHit.filter(!p).select(tableCols.map(col): _*)
          .unionByName(inHit.filter(p).select(tableCols.map { c =>
            if (set.contains(c)) set(c).cast(colType(c)).as(c)
            else col(c)
          }: _*))
    val adds = writeData(spark, path,
      withChecks(spark, path, rewritten), 1)
    val hitNames = hitDf.collect().map(_.getString(0)).toSet
    val removes = files.filter(f => hitNames.contains(f.split('/').last))
    try commitRewrite(path, base, "update", adds, removes,
      CommuteNonOverlapping)
    catch { case e: Throwable => cleanupStaged(path, adds); throw e }
  }

  /** Whether a predicate embeds an IN/EXISTS subquery (a join-shaped
    * subquery expression) — those only resolve inside filters, so
    * [[updateWhere]] switches to its two-filter rewrite shape. Scalar
    * subqueries are projection-legal and keep the fast path. */
  private def hasJoinSubquery(c: Column): Boolean =
    try org.apache.spark.sql.graftbridge.Bridge.eagerExpression(c).exists {
      case _: org.apache.spark.sql.catalyst.expressions.InSubquery => true
      case _: org.apache.spark.sql.catalyst.expressions.Exists => true
      case _ => false
    } catch { case _: Throwable => false }

  /** Keyed MERGE (the Delta MERGE whenMatched-delete + insert role):
    * atomically replace every current row whose `keyCols` tuple appears
    * in `df` with `df`'s rows — ONE commit, so no reader ever observes
    * the intermediate "deleted but not yet re-inserted" state that a
    * deleteWhere-then-append pair would expose. Rows with a NULL key in
    * `df` never match anything (SQL equality) and are simply appended —
    * which lets additive bookkeeping rows ride the same atomic commit
    * as the keyed replacement (TxnIndex uses this for its stats fold).
    *
    * Only files CONTAINING matched rows are rewritten (found by one
    * input_file_name() pass + a broadcast-or-keyed semi-join on the
    * keys — no driver-side key list, so the key set may be data-sized);
    * untouched files are carried by reference. Conflict contract:
    * rebase-or-abort like [[deleteWhere]] — the snapshot it read is
    * re-validated at commit; commutable interleaved commits rebase,
    * a true overlap surfaces as [[TxnConflictException]] (and a CAS
    * caller via `expectedBase` never rebases), and an aborted run
    * deletes its staged files.
    */
  def merge(spark: SparkSession, path: String, df: DataFrame,
      keyCols: Seq[String], partitions: Int = 1,
      clusterBy: Seq[Column] = Nil, expectedBase: Long = -1L): Long =
    rewriteByKeys(spark, path, df.select(keyCols.map(col): _*),
      keyCols, Some(df), partitions, clusterBy, expectedBase)

  /** Address a SOURCE column inside a [[mergeInto]] clause condition or
    * update/insert expression (target columns are addressed plainly). */
  def srcCol(name: String): Column = col(s"$SrcStruct.$name")

  private[graft] val SrcStruct = "__graft_src"

  /** Full SQL MERGE INTO: join `source` to the table on `keyCols` and
    * apply ordered WHEN MATCHED clauses (update/delete, each optionally
    * conditioned, first fire wins) plus an optional WHEN NOT MATCHED
    * insert — ONE atomic commit. Matched rows claimed by no clause, and
    * unmatched target rows, are untouched. Source rows must be unique
    * per key (multiple matches for one target row is an error, as in
    * Delta/SQL); NULL-keyed source rows match nothing and fall through
    * to the insert clause (SQL equality).
    *
    * Scale shape: ONE inner-join pass over the table finds (a) the
    * files containing a row some clause actually fires on — only those
    * are rewritten, carried files stay by reference — and (b) the
    * matched key set, so the insert side is an anti-join of the SOURCE
    * against metadata-scale keys, never a second table scan. The
    * source is broadcast when small (Spark decides); the rewrite reads
    * only hit files. Cost: O(table scan) + O(hit files rewrite),
    * exactly the Delta merge shape.
    */
  def mergeInto(spark: SparkSession, path: String, source: DataFrame,
      keyCols: Seq[String], matched: Seq[MergeMatched],
      notMatched: Seq[NotMatchedInsert] = Nil,
      clusterBy: Seq[Column] = Nil,
      bySource: Seq[MergeBySource] = Nil): Long = {
    val base = currentVersion(path)
    val files = snapshotFiles(path, base)
    val abs = files.map(f => localRoot(path).resolve(f).toString)
    val current = snapshotScan(spark, path, base, abs)
    // LOGICAL surface: applyDv aliases the physical scan to logical
    // names (column mapping); clause SETs and inserts speak logical
    val withName = applyDv(spark, path, base, current, keepFname = true)
    val tableCols = withName.columns.toSeq.filterNot(_ == "__fname")
    val colType = withName.schema.fields.map(f => f.name -> f.dataType).toMap
    val srcS = source.select(
      keyCols.map(col) :+
        struct(source.columns.map(col): _*).as(SrcStruct): _*)
    // duplicate source keys would make "which source row wins" ambiguous
    val dup = srcS.filter(keyCols.map(col(_).isNotNull).reduce(_ && _))
      .groupBy(keyCols.map(col): _*).count().filter(col("count") > 1)
    require(dup.isEmpty,
      "mergeInto: multiple source rows match the same key " +
        dup.limit(3).collect().mkString(", "))
    // first-fire-wins claim tracking: build per-clause disjoint fire
    // predicates (claimed rows are excluded from later clauses)
    val firePredicates = () => mergeFirePredicates(matched)
    val bySourcePredicates = () => bySourceFirePredicates(bySource)
    // pass 1: ONE table pass → fired file set + matched key set. A LEFT
    // join (not inner) so NOT MATCHED BY SOURCE clauses see unmatched
    // target rows; only matched rows and by-source-fired rows
    // materialize through the checkpoint (O(matched + fired), batch
    // scale — never the whole table). With no by-source clauses the
    // filter reduces to "matched", which Catalyst's EliminateOuterJoin
    // turns back into the inner join this always was.
    val m = col(SrcStruct).isNotNull
    val joinedAll = withName.join(srcS, keyCols, "left")
    val (delAll, updAll) = firePredicates()
    val anyMatchedFire = updAll.map(_._1).foldLeft(delAll)(_ || _)
    val (bsDelAll, bsUpdAll) = bySourcePredicates()
    val anyBsFire = bsUpdAll.map(_._1).foldLeft(bsDelAll)(_ || _)
    val probe = joinedAll
      .select(col("__fname") +: keyCols.map(col) :+ m.as("__m") :+
        when(m, anyMatchedFire).otherwise(anyBsFire).as("__fire"): _*)
      .filter(col("__m") || col("__fire"))
      .localCheckpoint()
    val hitDf = probe.filter(col("__fire"))
      .select(col("__fname")).distinct().localCheckpoint()
    val matchedKeys = probe.filter(col("__m"))
      .select(keyCols.map(col): _*).distinct()
    val nHitFiles = hitDf.count()
    // pass 2: rewrite ONLY hit files — delete claimed-deleted rows
    // (matched AND by-source), apply the winning update's SET per
    // side, carry everything else
    val survivorAdds =
      if (nHitFiles == 0) Nil
      else {
        val joined = withName.join(broadcast(hitDf), "__fname")
          .join(srcS, keyCols, "left")
        val mm = col(SrcStruct).isNotNull
        val (delP, upds) = firePredicates()
        val (bsDelP, bsUpds) = bySourcePredicates()
        val out = joined.filter(!when(mm, delP).otherwise(bsDelP))
          .select(tableCols.map { c =>
            val afterMatched =
              upds.foldRight(col(c)) { case ((fire, set), acc) =>
                if (set.contains(c))
                  when(mm && fire,
                    set(c).cast(colType(c))).otherwise(acc)
                else acc
              }
            bsUpds.foldRight(afterMatched) { case ((fire, set), acc) =>
              if (set.contains(c))
                when(!mm && fire,
                  set(c).cast(colType(c))).otherwise(acc)
              else acc
            }.as(c)
          }: _*)
        val outC = withChecks(spark, path, out)
        if (out.isEmpty) Nil
        else if (clusterBy.nonEmpty)
          writeDataPrepared(spark, path,
            outC.repartitionByRange(math.max(1, nHitFiles.toInt),
              clusterBy: _*).sortWithinPartitions(clusterBy: _*))
        else writeData(spark, path, outC, 1)
      }
    // insert side: anti-join the SOURCE against the matched keys
    // (metadata-scale), never a second scan of the table; multiple
    // clauses fold first-fire-wins into ONE select
    val insertAdds =
      if (notMatched.isEmpty) Nil
      else {
        val cand = srcS.join(matchedKeys, keyCols, "left_anti")
        val rows = notMatchedRows(cand, notMatched, tableCols,
          c => colType(c))
        val rowsC = withChecks(spark, path, rows)
        if (rows.isEmpty) Nil
        else if (clusterBy.nonEmpty)
          writeDataPrepared(spark, path,
            rowsC.repartitionByRange(1, clusterBy: _*)
              .sortWithinPartitions(clusterBy: _*))
        else writeData(spark, path, rowsC, 1)
      }
    val adds = survivorAdds ++ insertAdds
    if (adds.isEmpty && nHitFiles == 0) return base // nothing fired
    val hitNames = hitDf.collect().map(_.getString(0)).toSet
    val removes = files.filter(f => hitNames.contains(f.split('/').last))
    try commitRewrite(path, base, "merge", adds, removes,
      CommuteNonOverlapping)
    catch { case e: Throwable => cleanupStaged(path, adds); throw e }
  }

  /** First-fire-wins fire predicates for WHEN MATCHED clauses:
    * (delete-fire, per-update (fire, SET)) with claimed rows excluded
    * from later clauses. */
  private def mergeFirePredicates(matched: Seq[MergeMatched])
      : (Column, Seq[(Column, Map[String, Column])]) = {
    var claimed: Column = lit(false)
    var deleteP: Column = lit(false)
    val updates = Seq.newBuilder[(Column, Map[String, Column])]
    matched.foreach {
      case MatchedDelete(c) =>
        val fire = !claimed && coalesce(c.getOrElse(lit(true)), lit(false))
        deleteP = deleteP || fire
        claimed = claimed || fire
      case MatchedUpdate(set, c) =>
        val fire = !claimed && coalesce(c.getOrElse(lit(true)), lit(false))
        updates += ((fire, set))
        claimed = claimed || fire
    }
    (deleteP, updates.result())
  }

  /** [[mergeFirePredicates]] for WHEN NOT MATCHED BY SOURCE clauses —
    * same ordering/claim semantics, target-only expressions. */
  private def bySourceFirePredicates(bySource: Seq[MergeBySource])
      : (Column, Seq[(Column, Map[String, Column])]) = {
    var claimed: Column = lit(false)
    var deleteP: Column = lit(false)
    val updates = Seq.newBuilder[(Column, Map[String, Column])]
    bySource.foreach {
      case BySourceDelete(c) =>
        val fire = !claimed && coalesce(c.getOrElse(lit(true)), lit(false))
        deleteP = deleteP || fire
        claimed = claimed || fire
      case BySourceUpdate(set, c) =>
        val fire = !claimed && coalesce(c.getOrElse(lit(true)), lit(false))
        updates += ((fire, set))
        claimed = claimed || fire
    }
    (deleteP, updates.result())
  }

  /** Fold ordered WHEN NOT MATCHED insert clauses over the unmatched
    * source slice into one select: first clause whose condition passes
    * claims the row; unspecified columns NULL-fill. */
  private def notMatchedRows(cand: DataFrame,
      notMatched: Seq[NotMatchedInsert], tableCols: Seq[String],
      colType: String => org.apache.spark.sql.types.DataType): DataFrame = {
    var claimed: Column = lit(false)
    val clauses = notMatched.map { case NotMatchedInsert(values, cond) =>
      val fire = !claimed && coalesce(cond.getOrElse(lit(true)), lit(false))
      claimed = claimed || fire
      (fire, values)
    }
    val anyIns = clauses.map(_._1).foldLeft(lit(false))(_ || _)
    cand.filter(anyIns).select(tableCols.map { c =>
      clauses.foldRight(lit(null).cast(colType(c)): Column) {
        case ((fire, values), acc) =>
          when(fire, values.get(c).map(_.cast(colType(c)))
            .getOrElse(lit(null).cast(colType(c)))).otherwise(acc)
      }.as(c)
    }: _*)
  }

  /** [[mergeInto]] (ordered WHEN MATCHED clauses + conditioned insert)
    * at MERGE-ON-READ cost: every clause-claimed row is marked dead by
    * position in a DV — delete-claimed rows stay dead, update-claimed
    * rows are re-appended with the winning clause's SET applied, and
    * the NOT MATCHED inserts append alongside — ONE `dvmerge` commit
    * carrying the adds and the DV reassignments, ZERO pre-existing
    * data files rewritten. One table pass: the matched join slice is
    * materialized once (O(matched rows) — batch scale) and yields the
    * fired positions, the update images, and the matched-key set the
    * insert side anti-joins; clause semantics (first-fire-wins,
    * duplicate-source reject, NULL keys fall through to insert) are
    * [[mergeInto]]'s, spec-pinned against it. */
  def mergeIntoMor(spark: SparkSession, path: String, source: DataFrame,
      keyCols: Seq[String], matched: Seq[MergeMatched],
      notMatched: Seq[NotMatchedInsert] = Nil,
      partitions: Int = 1,
      bySource: Seq[MergeBySource] = Nil): Long = {
    val base = currentVersion(path)
    val (live, oldDv, files) = liveWithPos(spark, path, base)
    val tableCols = live.columns.toSeq
      .filterNot(c => c == "__fname" || c == "__pos")
    val schema = live.select(tableCols.map(col): _*).schema
    val srcS = source.select(
      keyCols.map(col) :+
        struct(source.columns.map(col): _*).as(SrcStruct): _*)
    val dup = srcS.filter(keyCols.map(col(_).isNotNull).reduce(_ && _))
      .groupBy(keyCols.map(col): _*).count().filter(col("count") > 1)
    require(dup.isEmpty,
      "mergeIntoMor: multiple source rows match the same key " +
        dup.limit(3).collect().mkString(", "))
    // ONE table pass: the LEFT-joined slice pins positions, fire
    // flags, and the source struct the update images are computed
    // from; by-source clauses (unmatched target rows) ride the same
    // pass — only matched + by-source-fired rows materialize. A fired
    // row dies by DV position; update images (matched AND by-source)
    // re-append alongside the NOT MATCHED inserts, ONE commit.
    val (delP, upds) = mergeFirePredicates(matched)
    val anyMatchedFire = upds.map(_._1).foldLeft(delP)(_ || _)
    val (bsDelP, bsUpds) = bySourceFirePredicates(bySource)
    val anyBsFire = bsUpds.map(_._1).foldLeft(bsDelP)(_ || _)
    val m = col(SrcStruct).isNotNull
    val matchedRows = live.join(srcS, keyCols, "left")
      .withColumn("__m", m)
      .withColumn("__del", when(m, delP).otherwise(bsDelP))
      .withColumn("__fire", when(m, anyMatchedFire).otherwise(anyBsFire))
      .filter(col("__m") || col("__fire"))
      .localCheckpoint()
    val hits = matchedRows.filter(col("__fire"))
      .select(col("__fname").as("file"), col("__pos").as("pos"))
    val updatedMatched = matchedRows
      .filter(col("__m") && col("__fire") && !col("__del"))
      .select(tableCols.map { c =>
        upds.foldRight(col(c)) { case ((fire, set), acc) =>
          if (set.contains(c))
            when(fire, set(c).cast(schema(c).dataType)).otherwise(acc)
          else acc
        }.as(c)
      }: _*)
    val updatedBySource = matchedRows
      .filter(!col("__m") && col("__fire") && !col("__del"))
      .select(tableCols.map { c =>
        bsUpds.foldRight(col(c)) { case ((fire, set), acc) =>
          if (set.contains(c))
            when(fire, set(c).cast(schema(c).dataType)).otherwise(acc)
          else acc
        }.as(c)
      }: _*)
    val inserts =
      if (notMatched.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else {
        val matchedKeys = matchedRows.filter(col("__m"))
          .select(keyCols.map(col): _*).distinct()
        notMatchedRows(srcS.join(matchedKeys, keyCols, "left_anti"),
          notMatched, tableCols, c => schema(c).dataType)
      }
    val newRows = updatedMatched.unionByName(updatedBySource)
      .unionByName(inserts)
    val adds =
      if (newRows.isEmpty) Nil
      else writeData(spark, path, withChecks(spark, path, newRows),
        partitions)
    if (hits.isEmpty && adds.isEmpty) return base // nothing fired
    val (dvs, dvFile) =
      if (hits.isEmpty) (Nil, None)
      else
        try {
          val (d, f) = buildDvs(spark, path, files, hits, oldDv)
          (d, Some(f))
        } catch { case e: Throwable => cleanupStaged(path, adds); throw e }
    try commitDvs(path, base, "dvmerge", dvs, adds)
    catch {
      case e: Throwable =>
        cleanupStaged(path, adds)
        dvFile.foreach { f =>
          try Files.deleteIfExists(localRoot(path).resolve(f))
          catch { case _: Throwable => () }
        }
        throw e
    }
  }

  /** Keyed anti-delete: atomically delete every current row whose
    * `keyCols` tuple appears in `keys` — [[merge]] without the insert.
    * Unlike [[deleteWhere]], the doomed set is a DataFrame joined
    * distributively, not a driver-evaluated predicate — the shape a
    * reconciliation pass needs when the keys to remove are themselves
    * the output of a join (StreamDedup.reconcile). */
  def deleteMatching(spark: SparkSession, path: String, keys: DataFrame,
      keyCols: Seq[String]): Long =
    rewriteByKeys(spark, path, keys.select(keyCols.map(col): _*),
      keyCols, None, 1, Nil, -1L)

  /** Apply a keyed CHANGE BATCH as ONE commit: delete every current row
    * whose key appears in `keys`, insert the `upserts` rows —
    * [[merge]] generalized to carry deletes (a CDC consumer's apply
    * primitive: keys = every changed key, upserts = after-images of
    * inserts+updates; a delete is a key with no upsert row). `op` lets
    * an exactly-once consumer record its stream marker on the same
    * commit ([[streamHighWater]]), so apply+marker is atomic. */
  def applyChanges(spark: SparkSession, path: String, keys: DataFrame,
      upserts: DataFrame, keyCols: Seq[String], partitions: Int = 1,
      clusterBy: Seq[Column] = Nil, op: String = "merge"): Long =
    rewriteByKeys(spark, path, keys, keyCols, Some(upserts), partitions,
      clusterBy, -1L, op)

  /** [[applyChanges]] at MERGE-ON-READ cost: matched current rows are
    * marked dead by position in a DV instead of rewriting their files,
    * the upsert after-images are appended as fresh files, ONE atomic
    * commit carries both (plus the caller's `op` marker — exactly-once
    * CDC apply stays atomic). The per-batch cost of a continuously
    * replicated table drops from O(bytes of every file containing a
    * changed key) to O(changed rows); compaction stays the
    * read-amplification escape valve. NULL-keyed upsert rows never
    * match (SQL equality) and are simply appended, like [[merge]].
    * A no-change batch (no match, no upsert) returns the base version
    * — callers needing a marker regardless use [[commitMarker]]. */
  def applyChangesMor(spark: SparkSession, path: String, keys: DataFrame,
      upserts: DataFrame, keyCols: Seq[String], partitions: Int = 1,
      op: String = "dvmerge"): Long = {
    val base = currentVersion(path)
    val (live, oldDv, files) = liveWithPos(spark, path, base)
    val keysS = keys.select(keyCols.map(col): _*).distinct()
    val hits = live.join(keysS, keyCols, "left_semi")
      .select(col("__fname").as("file"), col("__pos").as("pos"))
      .localCheckpoint()
    checkSchema(path, upserts, evolveSchema = false)
    val tableCols = live.columns.toSeq
      .filterNot(c => c == "__fname" || c == "__pos")
    val ups = withChecks(spark, path,
      upserts.select(tableCols.map(col): _*))
    val adds =
      if (upserts.isEmpty) Nil
      else writeData(spark, path, ups, partitions)
    if (hits.isEmpty && adds.isEmpty) return base
    val (dvs, dvFile) =
      if (hits.isEmpty) (Nil, None)
      else
        try {
          val (d, f) = buildDvs(spark, path, files, hits, oldDv)
          (d, Some(f))
        } catch { case e: Throwable => cleanupStaged(path, adds); throw e }
    try commitDvs(path, base, op, dvs, adds)
    catch {
      case e: Throwable =>
        cleanupStaged(path, adds)
        dvFile.foreach { f =>
          try Files.deleteIfExists(localRoot(path).resolve(f))
          catch { case _: Throwable => () }
        }
        throw e
    }
  }

  /** [[merge]] (keyed upsert) at MERGE-ON-READ cost — replace every
    * current row whose key appears in `df` with `df`'s row, via
    * [[applyChangesMor]]. */
  def mergeMor(spark: SparkSession, path: String, df: DataFrame,
      keyCols: Seq[String], partitions: Int = 1): Long =
    applyChangesMor(spark, path, df.select(keyCols.map(col): _*), df,
      keyCols, partitions)

  /** Commit a METADATA-ONLY marker (no adds, no removes — logical
    * content unchanged): the carrier for stream high-water marks when a
    * batch changes no data (e.g. a replicated version range that was
    * all vacuum/compaction), Delta's bare `txn` action. Retries version
    * races — a marker conflicts with nothing logically. */
  def commitMarker(path: String, op: String, maxAttempts: Int = 20): Long = {
    var attempt = 0
    while (true) {
      val v = currentVersion(path) + 1
      require(v > 0, s"commitMarker: not a table: $path")
      preCommitHook()
      try { tryCommit(path, TxnCommit(v, op, Nil, Nil)); return v }
      catch {
        case e: TxnConflictException =>
          if (attempt >= maxAttempts) throw e
          attempt += 1
      }
    }
    -1L // unreachable
  }

  /** Active CHECK constraints of the table head (name → SQL). */
  def constraints(path: String): Map[String, String] = {
    val top = currentVersion(path)
    if (top < 0) Map.empty else constraintsInfo(path, top)
  }

  class ConstraintViolationException(msg: String)
    extends RuntimeException(msg)

  /** ADD CONSTRAINT <name> CHECK (<exprSql>): validates that EVERY
    * existing row satisfies the expression (SQL CHECK semantics — a
    * NULL result satisfies), then records it as a metadata commit;
    * from that commit on, every write that brings NEW row content
    * (append / overwrite / merge / applyChanges / update / MOR update
    * / stream batches) enforces it IN the write job — single pass, no
    * second scan ([[withChecks]]). A conflict during the commit race
    * re-validates against the fresh snapshot, so an interleaved append
    * of violating rows aborts the add instead of slipping past it. */
  def addConstraint(spark: SparkSession, path: String, name: String,
      exprSql: String, maxAttempts: Int = 20): Long = {
    require(name.matches("[A-Za-z0-9_\\-]+"),
      s"constraint name must be alphanumeric/_/-: $name")
    require(!constraints(path).contains(name),
      s"constraint $name already exists")
    var attempt = 0
    while (true) {
      val base = currentVersion(path)
      val violating = read(spark, path)
        .filter(!coalesce(expr(exprSql), lit(true)))
      if (!violating.isEmpty)
        throw new ConstraintViolationException(
          s"cannot add CHECK constraint $name ($exprSql): " +
            s"existing rows violate it, e.g. ${violating.head()}")
      preCommitHook()
      try {
        tryCommit(path, TxnCommit(base + 1,
          s"constraint:add:$name:$exprSql", Nil, Nil))
        return base + 1
      } catch {
        case e: TxnConflictException =>
          if (attempt >= maxAttempts) throw e
          attempt += 1 // loop re-validates the fresh snapshot
      }
    }
    -1L // unreachable
  }

  /** DROP CONSTRAINT: a metadata commit; false if it did not exist. */
  def dropConstraint(path: String, name: String): Boolean =
    if (!constraints(path).contains(name)) false
    else { commitMarker(path, s"constraint:drop:$name"); true }

  // -- table properties (ALTER TABLE SET/UNSET TBLPROPERTIES) --------------
  //
  // Properties are TABLE STATE, not session state: flipping
  // `graft.mor` (DML routing) or `graft.targetBytes` (bin-pack sizing)
  // after the table grows is a METADATA COMMIT every subsequent
  // session and statement observes — folded from `tblprops:set:<json>`
  // / `tblprops:unset:<json>` ops, checkpoint-amortized like
  // constraints. Engine-reserved `graft.*` keys are validated at SET
  // time (a typo like `graft.morr` silently ignored forever is worse
  // than an error); everything else is free-form user metadata.

  private def propsInfo(path: String, upTo: Long): Map[String, String] = {
    val (from, init) = latestCheckpoint(path, upTo) match {
      case Some(ck) if ck.props.isDefined => (ck.version + 1, ck.props.get)
      case _ => (0L, Map.empty[String, String])
    }
    var m = init
    (from to upTo).foreach { v =>
      val op = readCommit(path, v).op
      if (op.startsWith("tblprops:set:"))
        m = m ++ parsePropsOp(op.stripPrefix("tblprops:set:"))
      else if (op.startsWith("tblprops:unset:"))
        m = m -- parseKeysOp(op.stripPrefix("tblprops:unset:"))
      else if (op.startsWith("create:props:"))
        // a clustered create seeds its layout spec as properties
        m = m ++ parsePropsOp(op.stripPrefix("create:props:"))
    }
    m
  }

  private def parsePropsOp(json: String): Map[String, String] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    implicit val fmts: Formats = DefaultFormats
    JsonMethods.parse(json) match {
      case JObject(fields) =>
        fields.map { case (k, v) => k -> v.extract[String] }.toMap
      case _ => Map.empty
    }
  }

  private def parseKeysOp(json: String): Seq[String] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    implicit val fmts: Formats = DefaultFormats
    JsonMethods.parse(json) match {
      case JArray(arr) => arr.map(_.extract[String])
      case _ => Nil
    }
  }

  /** The table head's properties (key → value). */
  def properties(path: String): Map[String, String] = {
    val top = currentVersion(path)
    if (top < 0) Map.empty else propsInfo(path, top)
  }

  /** [[properties]] at a pinned version — the CBO injection reads
    * histograms at the plan's snapshot, never the racing head. */
  def propertiesAt(path: String, asOf: Long): Map[String, String] =
    if (asOf < 0) properties(path) else propsInfo(path, asOf)

  /** `ANALYZE TABLE … COMPUTE HISTOGRAM`: per-column equi-HEIGHT
    * histograms — bin endpoints at i/bins approximate quantiles (one
    * aggregate pass), per-bin distinct counts (one grouped pass) —
    * persisted as table properties (`graft.hist.<col>` →
    * `{"h":height,"bins":[[lo,hi,ndv],…]}`) riding an ordinary
    * tblprops commit. The CBO injection then maps them onto
    * `CatalogColumnStat.histogram` straight from the LOG: planning
    * stays zero-footer at any scale, and the skewed-column blind spot
    * of the uniform min/max estimate closes. Estimation-only state:
    * an explicit user-invoked scan (exactly like ANALYZE), recorded
    * as-of the analyzed version; data committed later simply ages it,
    * correctness never depends on freshness. */
  /** Evidence hook: how many table scans the LAST [[computeHistogram]]
    * ran — the ANALYZE pass is batched (one quantile aggregate for ALL
    * columns, one combined per-bin-ndv pass, one MCV pass for all
    * string columns), so a 10-column ANALYZE costs 2 scans, not 20. */
  @volatile private[graft] var lastAnalyzeScans: Int = -1

  def computeHistogram(spark: SparkSession, path: String,
      columns: Seq[String], bins: Int = 64): Long = {
    import org.apache.spark.sql.types.{NumericType, StringType}
    require(bins >= 2 && bins <= 254, s"bins must be in [2,254], got $bins")
    require(columns.nonEmpty, "computeHistogram: no columns given")
    val top = currentVersion(path)
    require(top >= 0, s"computeHistogram: not a TxnTable: $path")
    val df = read(spark, path, top)
    val fields = columns.map { c =>
      df.schema.fields.find(_.name.equalsIgnoreCase(c)).getOrElse(
        throw new IllegalArgumentException(
          s"computeHistogram: no column $c in $path"))
    }
    val numFields = fields.filter(_.dataType.isInstanceOf[NumericType])
    val strFields = fields.filter(_.dataType == StringType)
    fields.foreach(f => require(
      f.dataType.isInstanceOf[NumericType] || f.dataType == StringType,
      s"computeHistogram: ${f.name} is ${f.dataType.simpleString} — " +
        "numeric columns get equi-height histograms, string columns " +
        "get MCV frequency stats"))
    var scans = 0
    val pct = (0 to bins).map(i => i.toDouble / bins)
    // PASS 1 — ONE aggregate over the table for the NUMERIC columns:
    // every column's equi-height endpoints + non-null count. String
    // columns do not appear here at all — their exact ndv and
    // non-null count fall out of the MCV pass below for free (ndv =
    // the pair-group count, nonnull = the frequency sum), so a
    // string-only ANALYZE is ONE scan. The per-column serial loop
    // this replaced cost 2 scans PER column.
    val p1 = numFields.flatMap { f =>
      val v = col(f.name).cast("double")
      Seq(percentile_approx(v, typedlit(pct), lit(10000))
          .as(s"q_${f.name.toLowerCase}"),
        count(col(f.name)).as(s"n_${f.name.toLowerCase}"))
    }
    val r1 = if (p1.isEmpty) null else df.agg(p1.head, p1.tail: _*).head()
    if (p1.nonEmpty) scans += 1
    def longAt(nm: String): Long = r1.getLong(r1.fieldIndex(nm))
    // PASS 2 — ONE combined per-bin ndv aggregate for ALL numeric
    // columns: approx_count_distinct(when(bin==b, v)) per (col, bin);
    // a null value never matches a bin, so each sketch sees exactly
    // the per-bin value set the old grouped pass saw.
    val histProps: Seq[(String, String)] = if (numFields.isEmpty) Nil else {
      val perCol = numFields.map { f =>
        val nm = f.name.toLowerCase
        require(!r1.isNullAt(r1.fieldIndex(s"q_$nm")) && longAt(s"n_$nm") > 0,
          s"computeHistogram: ${f.name} has no non-null values")
        val ends = r1.getSeq[Double](r1.fieldIndex(s"q_$nm")).toArray
        (f, ends, longAt(s"n_$nm"))
      }
      val ndvAggs = perCol.flatMap { case (f, ends, _) =>
        val v = col(f.name).cast("double")
        // bin id = endpoints strictly below the value (ties go low —
        // the estimator only needs bins that cover the range)
        val binId = (1 until bins)
          .map(i => (v > lit(ends(i))).cast("int"))
          .reduceOption[Column](_ + _).getOrElse(lit(0))
        (0 until bins).map(b => approx_count_distinct(
          when(binId === b, v)).as(s"h_${f.name.toLowerCase}_$b"))
      }
      val r2 = df.agg(ndvAggs.head, ndvAggs.tail: _*).head()
      scans += 1
      perCol.map { case (f, ends, n) =>
        val nm = f.name.toLowerCase
        val binsJson = (0 until bins).map(i =>
          s"[${ends(i)},${ends(i + 1)}," +
            s"${r2.getLong(r2.fieldIndex(s"h_${nm}_$i"))}]")
          .mkString("[", ",", "]")
        s"graft.hist.$nm" -> s"""{"h":${n.toDouble / bins},"bins":$binsJson}"""
      }
    }
    // PASS 2b (strings) — ONE pass for ALL string columns together:
    // explode to (colIdx, value), partial-agg counts, then per column
    // in the SAME aggregate: top-32 via the mergeable TopKRowsAgg
    // heap (O(32) per column to the driver, never a value-set sort),
    // EXACT ndv (the pair-group count — the groupBy already holds one
    // row per distinct value) and non-null count (the frequency sum).
    // The MCV list + exact ndv is what the CBO needs to price a
    // SKEWED string equality honestly — 1/ndv alone calls the 99%
    // value as rare as every other.
    val mcvProps: Seq[(String, String)] = if (strFields.isEmpty) Nil else {
      val pairs = df.select(explode(array(strFields.zipWithIndex.map {
          case (f, i) => struct(lit(i).as("i"), col(f.name).as("v")) }: _*))
          .as("p"))
        .select(col("p.i").as("i"), col("p.v").as("v"))
        .filter(col("v").isNotNull)
        .groupBy(col("i"), col("v")).agg(count(lit(1)).as("c"))
      val tops = pairs.groupBy(col("i"))
        .agg(graft.plans.TopKRowsAgg.top_k_rows(32,
          struct(col("v"), col("c")), col("c").desc, col("v")).as("top"),
          count(lit(1)).as("ndv"), sum(col("c")).as("nonnull"))
        .collect()
      scans += 1
      val byIdx = tops.map(r => r.getInt(0) ->
        ((r.getSeq[org.apache.spark.sql.Row](1)
            .map(h => (h.getString(0), h.getLong(1))),
          r.getLong(2), r.getLong(3)))).toMap
      strFields.zipWithIndex.map { case (f, i) =>
        val nm = f.name.toLowerCase
        require(byIdx.contains(i),
          s"computeHistogram: ${f.name} has no non-null values")
        val (mcv, ndv, nonnull) = byIdx(i)
        import org.json4s._
        import org.json4s.jackson.JsonMethods
        val j = JObject(
          "ndv" -> JLong(ndv),
          "nonnull" -> JLong(nonnull),
          "mcv" -> JArray(mcv.toList.map { case (v, c) =>
            JArray(List(JString(v), JLong(c))) }))
        s"graft.mcv.$nm" -> JsonMethods.compact(JsonMethods.render(j))
      }
    }
    lastAnalyzeScans = scans
    setProperties(path, (histProps ++ mcvProps).toMap)
  }

  /** SET TBLPROPERTIES: one metadata commit carrying every pair.
    * `graft.*` keys are engine-reserved and validated here —
    * `graft.mor` (true|false, re-routes subsequent DML),
    * `graft.targetFiles` (positive int, clustered-layout width),
    * `graft.targetBytes` (positive long, bin-pack target). */
  def setProperties(path: String, props: Map[String, String]): Long = {
    require(props.nonEmpty, "setProperties: no properties given")
    props.foreach { case (k, v) =>
      if (k.startsWith("graft.")) k match {
        case "graft.mor" => require(
          v.equalsIgnoreCase("true") || v.equalsIgnoreCase("false"),
          s"graft.mor must be true or false, got '$v'")
        case "graft.targetFiles" => require(
          scala.util.Try(v.toInt).toOption.exists(_ > 0),
          s"graft.targetFiles must be a positive int, got '$v'")
        case "graft.targetBytes" => require(
          scala.util.Try(v.toLong).toOption.exists(_ > 0),
          s"graft.targetBytes must be a positive long, got '$v'")
        case "graft.clusterBy" => require(v.trim.nonEmpty,
          "graft.clusterBy must name at least one column")
        // per-column equi-height histograms / string MCV stats
        // ([[computeHistogram]] — the CBO reads them back defensively,
        // malformed JSON is simply not injected)
        case h if h.startsWith("graft.hist.") => require(v.trim.nonEmpty,
          s"$h must carry the histogram JSON")
        case m if m.startsWith("graft.mcv.") => require(v.trim.nonEmpty,
          s"$m must carry the MCV JSON")
        case other => throw new IllegalArgumentException(
          s"unknown engine property $other — graft.* keys are " +
            "reserved (known: graft.mor, graft.targetFiles, " +
            "graft.targetBytes, graft.clusterBy, graft.hist.<col>, " +
            "graft.mcv.<col>); use an unprefixed key for user metadata")
      }
    }
    val json = props.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }
      .mkString("{", ",", "}")
    commitMarker(path, s"tblprops:set:$json")
  }

  /** UNSET TBLPROPERTIES [IF EXISTS]: a metadata commit; keys not
    * present are refused unless `ifExists` (SQL semantics). */
  def unsetProperties(path: String, keys: Seq[String],
      ifExists: Boolean = false): Long = {
    require(keys.nonEmpty, "unsetProperties: no keys given")
    val have = properties(path)
    val missing = keys.filterNot(have.contains)
    require(missing.isEmpty || ifExists,
      s"unsetProperties: no such properties ${missing.mkString(", ")} " +
        "— use IF EXISTS")
    val present = keys.filter(have.contains)
    if (present.isEmpty) return currentVersion(path)
    val json = present.sorted
      .map(k => s""""${esc(k)}"""").mkString("[", ",", "]")
    commitMarker(path, s"tblprops:unset:$json")
  }

  /** Enforce the table's CHECK constraints on `df` INSIDE the write
    * job that consumes it: each row is guarded by an `assert_true`
    * that throws (with the constraint name) on a FALSE check — a NULL
    * check satisfies, per SQL. Zero extra passes: the guard is a
    * codegen'd filter that keeps every passing row, so the write plan
    * is unchanged except for the inline assertion; tables with no
    * constraints get `df` back untouched. */
  private def withChecks(spark: SparkSession, path: String,
      df: DataFrame): DataFrame = {
    val cs =
      try constraints(path)
      catch { case _: IllegalArgumentException => Map.empty[String, String] }
    if (cs.isEmpty) df
    else df.filter(cs.toSeq.sortBy(_._1).map { case (n, sql) =>
      coalesce(
        assert_true(coalesce(expr(sql), lit(true)),
          lit(s"CHECK constraint $n violated: $sql")),
        lit(true))
    }.reduce(_ && _))
  }

  /** Re-validate already-STAGED files against constraints added since
    * they were written: a retrying append that lost its version race
    * to a concurrent [[addConstraint]] enforced the OLD constraint set
    * inside its write job ([[withChecks]]), so the staged rows were
    * never checked against the fresh CHECK — without this, violating
    * rows would slip past enforcement (addConstraint only re-validates
    * when IT loses the race). One scan of just the staged tranche, and
    * only when the set actually changed. Returns the fresh set as the
    * retry's new baseline. */
  private def revalidateStaged(spark: SparkSession, path: String,
      adds: Seq[TxnAdd], csAtStage: Map[String, String])
      : Map[String, String] = {
    val csNow =
      try constraints(path)
      catch { case _: IllegalArgumentException => Map.empty[String, String] }
    val fresh = csNow.filter { case (n, sql) => !csAtStage.get(n).contains(sql) }
    if (fresh.nonEmpty && adds.nonEmpty) {
      // staged files store PHYSICAL names (column mapping); constraint
      // SQL speaks logical — alias before validating
      val raw = spark.read.parquet(
        adds.map(a => localRoot(path).resolve(a.path).toString): _*)
      val staged = recordedSchemaAt(path, -1L)
        .map(toLogical(raw, _)).getOrElse(raw)
      fresh.toSeq.sortBy(_._1).foreach { case (n, sql) =>
        val viol = staged.filter(!coalesce(expr(sql), lit(true)))
        if (!viol.isEmpty)
          throw new ConstraintViolationException(
            s"CHECK constraint $n ($sql) was added concurrently and the " +
              s"staged rows violate it, e.g. ${viol.head()}")
      }
    }
    csNow
  }

  private def rewriteByKeys(spark: SparkSession, path: String,
      keys: DataFrame, keyCols: Seq[String], insert: Option[DataFrame],
      partitions: Int, clusterBy: Seq[Column], expectedBase: Long,
      op: String = "merge"): Long = {
    val base = currentVersion(path)
    // CAS guard: a caller that computed its input FROM a snapshot (e.g.
    // TxnIndex.upsert's replaced-doc stats) passes that snapshot's
    // version; a commit that landed in between makes those inputs stale,
    // so fail the merge up front instead of committing a wrong fold.
    if (expectedBase >= 0 && base != expectedBase)
      throw new TxnConflictException(base)
    val files = snapshotFiles(path, base)
    val abs = files.map(f => localRoot(path).resolve(f).toString)
    val keyset = keys.distinct()
    // Null-keyed rows match nothing under SQL equality; drop them from
    // the match set so an all-null bookkeeping row doesn't plan a join
    // that can never hit.
    val matchable = keyset.filter(keyCols.map(col(_).isNotNull).reduce(_ && _))
    insert.foreach(d => checkSchema(path, d, evolveSchema = false))
    // Schema-pinned read (snapshotReader): on a schema-evolved table the
    // survivor rewrite must see the evolved shape — parquet inference
    // from an old-generation footer would silently drop evolved columns
    // from the rewritten files (permanent data loss in the new commit).
    val current = snapshotScan(spark, path, base, abs)
    // LOGICAL surface (column mapping): tableCols from the aliased frame
    val withName = applyDv(spark, path, base, current, keepFname = true)
    val tableCols = withName.columns.toSeq.filterNot(_ == "__fname")
    // File names under data/ are UUIDs, so the bare name is a complete
    // key. The hit-file set is a DATAFRAME end-to-end (localCheckpoint
    // materializes the one input_file_name() pass; the survivors join
    // broadcasts it); the single driver materialization is the collect
    // at the bottom, which the commit's `removes` metadata needs
    // regardless — metadata-scale, bounded by the snapshot file count.
    val hitDf = withName.join(matchable, keyCols, "left_semi")
      .select(col("__fname")).distinct().localCheckpoint()
    val nHitFiles = hitDf.count()
    val survivorAdds =
      if (nHitFiles == 0) Nil
      else {
        // USING joins hoist the key columns to the front — restore the
        // table's column order so rewritten files match the schema.
        val survivors = withName
          .join(broadcast(hitDf), "__fname")
          .join(matchable, keyCols, "left_anti")
          .select(tableCols.map(col): _*)
        if (survivors.isEmpty) Nil
        else if (clusterBy.nonEmpty)
          // keep the rewritten files clustered too, one per hit file,
          // so a merge does not erode the layout's pruning tightness
          writeDataPrepared(spark, path,
            survivors.repartitionByRange(nHitFiles.toInt, clusterBy: _*)
              .sortWithinPartitions(clusterBy: _*))
        else writeData(spark, path, survivors, 1)
      }
    val insertAdds = insert match {
      case Some(d) if !d.isEmpty && clusterBy.nonEmpty =>
        writeDataPrepared(spark, path,
          withChecks(spark, path, d)
            .repartitionByRange(partitions, clusterBy: _*)
            .sortWithinPartitions(clusterBy: _*))
      case Some(d) if !d.isEmpty =>
        writeData(spark, path, withChecks(spark, path, d), partitions)
      case _ => Nil
    }
    val adds = survivorAdds ++ insertAdds
    if (adds.isEmpty && nHitFiles == 0) return base // no-op merge
    val hitNames = hitDf.collect().map(_.getString(0)).toSet
    // last-segment comparison — see deleteWhere (clone-safe)
    val removes = files.filter(f => hitNames.contains(f.split('/').last))
    // CAS callers derived their INPUT from the base snapshot — never
    // rebase those; a plain merge commutes with non-overlapping commits
    val policy = if (expectedBase >= 0) NoRebase else CommuteNonOverlapping
    try commitRewrite(path, base, op, adds, removes, policy)
    catch { case e: Throwable => cleanupStaged(path, adds); throw e }
  }

  /** AUTO-MAINTENANCE policy: compact when the snapshot's physical
    * shape has degraded past either threshold — too many files (write
    * amplification / footer overhead) or too large a MOR-DELETED row
    * fraction (read amplification: every scan drags the DV anti-join
    * until a rewrite materializes it). Returns the compaction's version
    * when it ran, None when the table is healthy. Both signals are
    * metadata-cheap: file count from the snapshot, live row counts from
    * the adds, dead positions by counting the CURRENT (file → DV)
    * pairs' rows in the tiny DV sidecars — exact even though a
    * cumulative DV file can carry superseded positions for OTHER data
    * files (those pairs are excluded by the mapping join). The policy
    * is advisory and race-tolerant: the compact itself rebases/aborts
    * under the normal conflict rules. */
  def maybeCompact(spark: SparkSession, path: String,
      maxFiles: Int = 64, maxDeadFrac: Double = 0.2,
      targetFiles: Int = 1): Option[Long] = {
    val base = currentVersion(path)
    val files = snapshotFiles(path, base)
    val dvm = snapshotDvs(path, base)
    val degraded =
      if (files.size > maxFiles) true
      else if (dvm.isEmpty) false
      else {
        val ai = addsIndex(path, base)
        val totalRows = files.flatMap(ai.get).map(_.rows).sum
        import spark.implicits._
        val mapping = dvm.toSeq
          .map { case (f, dv) => (f.split('/').last, dv.split('/').last) }
          .toDF("file", "__dv")
        val dvRows = spark.read.parquet(dvm.values.toSeq.distinct
            .map(f => localRoot(path).resolve(f).toString): _*)
          .withColumn("__dv",
            element_at(split(input_file_name(), "/"), -1))
          .join(mapping, Seq("file", "__dv"), "left_semi")
        val dead = dvRows.count()
        totalRows > 0 && dead.toDouble / totalRows > maxDeadFrac
      }
    if (degraded) Some(compact(spark, path, targetFiles)) else None
  }

  /** Fold the current snapshot into `targetFiles` files. Purely physical:
    * the logical content is unchanged, old versions stay readable (their
    * files are never deleted).
    */
  def compact(spark: SparkSession, path: String, targetFiles: Int = 1): Long = {
    val base = currentVersion(path)
    val files = snapshotFiles(path, base)
    val abs = files.map(f => localRoot(path).resolve(f).toString)
    // schema-pinned like every rewrite: compacting a schema-evolved
    // table must not lose evolved columns to single-footer inference
    val adds = writeData(spark, path,
      applyDv(spark, path, base,
        snapshotScan(spark, path, base, abs),
        keepFname = false), targetFiles)
    try commitRewrite(path, base, "compact", adds, files,
      CommuteNonOverlapping)
    catch { case e: Throwable => cleanupStaged(path, adds); throw e }
  }

  /** The OPTIMIZE statement's bin-pack: UNCONDITIONALLY fold the
    * snapshot's eligible files — small files (`< targetBytes`, the
    * write-amplification tail) plus every DV-carrying file (folding
    * materializes its deletes) — into ~`targetBytes` bins, leaving
    * healthy large files untouched. Unlike [[maybeCompact]] (the
    * policy-gated auto-maintenance), an explicit OPTIMIZE always runs
    * on eligible files; and unlike [[compact]] it never rewrites the
    * whole table — at 100 TB an OPTIMIZE after a streaming day folds
    * the day's small-file tail, not the archive. Sizing comes from the
    * log's add metadata (zero footer reads). Returns the compaction's
    * version, or the UNCHANGED head when nothing is eligible (fewer
    * than two small files and zero DVs) — the caller-distinguishable
    * no-op signal. */
  def binPack(spark: SparkSession, path: String,
      targetBytes: Long = 128L * 1024 * 1024): Long = {
    val base = currentVersion(path)
    binPackFiles(spark, path, base, snapshotFiles(path, base), targetBytes)
  }

  /** [[binPack]] SCOPED by a range predicate on `column` (physical
    * int64 bounds, like [[readPruned]]/[[countRange]]): only eligible
    * files whose LOGGED [min, max] intersects [lo, hi] fold — the
    * "re-pack the hot partition's tail" maintenance shape. At 100 TB
    * an OPTIMIZE after a day of banded ingest touches that band's
    * small files and nothing else; scoping comes entirely from the
    * commit log's write-time stats (zero footer reads — files without
    * stats for `column` are conservatively IN scope, same rule as
    * every pruned read). */
  def binPackWhere(spark: SparkSession, path: String, column: String,
      lo: Long, hi: Long,
      targetBytes: Long = 128L * 1024 * 1024): Long = {
    val base = currentVersion(path)
    // same loud type fence as countRange: bounds live in the physical
    // int64 space — a string column would silently degrade the scope
    // to the whole table (no long stats → conservatively kept)
    val (schema, _) = snapshotSchemaFenced(spark, path, base)
    schema(column).dataType match {
      case org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.DateType |
           org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType => ()
      case dt => throw new IllegalArgumentException(
        s"binPackWhere: $column has non-integral type $dt (bounds live " +
          "in the physical int64 space)")
    }
    val files = snapshotFiles(path, base)
    val idx = statsIndexFor(spark, path, base, Seq(column))
    val keptAbs = graft.crawler.SkippingIndex
      .selectFiles(idx, 0, lo, hi).toSet
    val inRange = files.filter(f =>
      keptAbs.contains(localRoot(path).resolve(f).toString))
    binPackFiles(spark, path, base, inRange, targetBytes)
  }

  /** The shared bin-pack tail: fold `scope`'s eligible files (small or
    * DV-carrying) into ~targetBytes bins; unchanged head when nothing
    * is eligible. */
  private def binPackFiles(spark: SparkSession, path: String, base: Long,
      scope: Seq[String], targetBytes: Long): Long = {
    val ai = addsIndex(path, base)
    val dvm = snapshotDvs(path, base)
    val candidates = scope.filter(f =>
      dvm.contains(f) || ai.get(f).exists(_.bytes < targetBytes))
    if (candidates.size < 2 && !candidates.exists(dvm.contains))
      return base // nothing to fold: head unchanged IS the signal
    val abs = candidates.map(f => localRoot(path).resolve(f).toString)
    val totalBytes = candidates.flatMap(ai.get).map(_.bytes).sum
    val bins = math.max(1,
      math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val adds = writeData(spark, path,
      applyDv(spark, path, base,
        snapshotScan(spark, path, base, abs),
        keepFname = false), bins)
    try commitRewrite(path, base, "compact", adds, candidates,
      CommuteNonOverlapping)
    catch { case e: Throwable => cleanupStaged(path, adds); throw e }
  }

  /** Fold the current snapshot into `targetFiles` Z-ORDERED files on
    * (a, b) — the OPTIMIZE-with-clustering role: each rewritten file
    * owns a compact z-range, so its (a, b) parquet footer min/max
    * become box-prunable (SkippingIndex or engine row-group pruning) —
    * data skipping inside the ACID table. Logical content is unchanged
    * and history stays readable; it is an ordinary compact commit.
    * At scale the rewrite is the same range-partition + local-sort
    * shuffle any global sort costs, amortized over every pruned read.
    *
    * Conflict contract — rebase-or-abort, like [[compact]] and
    * [[deleteWhere]]: losing the version race triggers the LOGICAL
    * conflict check ([[commitRewrite]]) — interleaved commits that
    * touched none of this rewrite's removes (appends, stream batches,
    * disjoint rewrites) commute, and the same adds/removes re-commit
    * at the new head without redoing the rewrite job; an interleaved
    * commit that removed one of our source files aborts with
    * [[TxnConflictException]] (blindly committing would undo that
    * writer's rows). An aborted run deletes its staged files.
    */
  /** Single-column sibling of [[compactClustered]]: fold the snapshot
    * into `targetFiles` RANGE-clustered files on `a` (what
    * [[createClustered]] lays out at birth) — the re-cluster half of
    * a 1-column `graft.clusterBy` layout's OPTIMIZE. Same commit and
    * conflict contract as every compaction. */
  def compactClusteredRange(spark: SparkSession, path: String,
      a: Column, targetFiles: Int = 16): Long = {
    val base = currentVersion(path)
    val files = snapshotFiles(path, base)
    val abs = files.map(f => localRoot(path).resolve(f).toString)
    val clustered = applyDv(spark, path, base,
      snapshotScan(spark, path, base, abs),
      keepFname = false)
      .repartitionByRange(targetFiles, a)
      .sortWithinPartitions(a)
    val adds = writeDataPrepared(spark, path, clustered)
    try commitRewrite(path, base, "compact:cluster", adds, files,
      CommuteNonOverlapping)
    catch { case e: Throwable => cleanupStaged(path, adds); throw e }
  }

  def compactClustered(spark: SparkSession, path: String,
      a: Column, b: Column, targetFiles: Int = 16): Long = {
    val base = currentVersion(path)
    val files = snapshotFiles(path, base)
    val abs = files.map(f => localRoot(path).resolve(f).toString)
    val clustered = graft.operators.Layout.zorderPartitions(
      applyDv(spark, path, base,
        snapshotScan(spark, path, base, abs),
        keepFname = false), a, b, targetFiles)
    val adds = writeDataPrepared(spark, path, clustered)
    try commitRewrite(path, base, "compact:cluster", adds, files,
      CommuteNonOverlapping)
    catch { case e: Throwable => cleanupStaged(path, adds); throw e }
  }

  /** [[compactClustered]] on THREE dimensions (Morton3, 21 bits/dim) —
    * each rewritten file owns a compact range on all three columns, so
    * [[readPrunedBoxN]] multiplies three selectivities. Same contract
    * otherwise: abort-on-conflict, history readable, staged files
    * cleaned on abort. */
  def compactClustered3(spark: SparkSession, path: String,
      a: Column, b: Column, c: Column, targetFiles: Int = 27): Long = {
    val base = currentVersion(path)
    val files = snapshotFiles(path, base)
    val abs = files.map(f => localRoot(path).resolve(f).toString)
    val clustered = graft.operators.Layout.zorderPartitions3(
      applyDv(spark, path, base,
        snapshotScan(spark, path, base, abs),
        keepFname = false), a, b, c,
      targetFiles)
    val adds = writeDataPrepared(spark, path, clustered)
    try commitRewrite(path, base, "compact:cluster", adds, files,
      CommuteNonOverlapping)
    catch { case e: Throwable => cleanupStaged(path, adds); throw e }
  }

  /** The table's UN-CLUSTERED TAIL, from log metadata alone: files
    * added since the newest cluster commit (`compact:cluster`, or a
    * clustered create) that are still live. None when the table was
    * never clustered. A tail-clustering commit is itself a cluster
    * commit, so successive tails chain correctly. */
  case class ClusterTail(clusterV: Long, tailFiles: Seq[String],
      tailBytes: Long, totalBytes: Long)

  def clusterTailInfo(path: String): Option[ClusterTail] = {
    val base = currentVersion(path)
    if (base < 0) return None
    val clusterV = commits(path, base).reverse.collectFirst {
      case c if c.op.startsWith("compact:cluster") => c.version
      case c if c.op.startsWith("create:props:") &&
        c.op.contains("\"graft.clusterBy\"") => c.version
    }.getOrElse(return None)
    val live = snapshotFiles(path, base)
    val bulk = snapshotFiles(path, clusterV).toSet
    // files a SCOPED re-cluster (compact:zscope) wrote since the last
    // full/tail cluster commit are clustered too — they own compact
    // ranges — so they leave the tail WITHOUT resetting the chain
    // baseline (a zscope must not hide unclustered files outside its
    // box from the next bare ZORDER)
    val scoped = commits(path, base).filter(c =>
      c.version > clusterV && c.op == "compact:zscope")
      .flatMap(_.adds.map(_.path)).toSet
    val tail = live.filterNot(f => bulk(f) || scoped(f))
    val ai = addsIndex(path, base)
    Some(ClusterTail(clusterV, tail,
      tail.flatMap(ai.get).map(_.bytes).sum,
      live.flatMap(ai.get).map(_.bytes).sum))
  }

  /** INCREMENTAL re-cluster: fold ONLY the un-clustered tail (files
    * added since the last cluster commit) into range/z-ordered files
    * at the persisted layout, leaving the already-clustered bulk
    * byte-for-byte untouched. At 100 TB this turns "re-cluster after
    * a week of appends" from a full-table rewrite into an
    * O(tail-bytes) job: the bulk keeps its tight per-file ranges, the
    * tail gains its own, and a box-pruned read over both is within a
    * file or two of a fresh full re-cluster's (measured in the
    * s64_zorder_tail gate). The output width is the persisted
    * targetFiles scaled by the tail's byte share (min 1), so repeated
    * tail folds do not fragment the layout. The commit op is
    * `compact:cluster`, so the NEXT tail starts after this commit.
    * 1, 2, or 3 cluster columns (range / Morton2 / Morton3 — the same
    * layouts as the full [[compactClustered]] family). Unchanged head
    * when the tail is empty. */
  def compactClusteredTail(spark: SparkSession, path: String,
      cols: Seq[Column], targetFiles: Int = 16): Long = {
    require(cols.nonEmpty && cols.size <= 3,
      s"1-3 cluster columns, got ${cols.size}")
    val base = currentVersion(path)
    val ct = clusterTailInfo(path).getOrElse(
      throw new IllegalArgumentException(
        s"$path has no cluster commit — run a full re-cluster " +
          "(compactClustered) or CTAS CLUSTER BY first"))
    if (ct.tailFiles.isEmpty) return base // already fully clustered
    val abs = ct.tailFiles.map(f => localRoot(path).resolve(f).toString)
    val bins = math.max(1, math.round(targetFiles.toDouble *
      ct.tailBytes / math.max(1L, ct.totalBytes)).toInt)
    val scan = applyDv(spark, path, base,
      snapshotScan(spark, path, base, abs), keepFname = false)
    val clustered = cols match {
      case Seq(a) =>
        scan.repartitionByRange(bins, a).sortWithinPartitions(a)
      case Seq(a, b) =>
        graft.operators.Layout.zorderPartitions(scan, a, b, bins)
      case Seq(a, b, c) =>
        graft.operators.Layout.zorderPartitions3(scan, a, b, c, bins)
    }
    val adds = writeDataPrepared(spark, path, clustered)
    try commitRewrite(path, base, "compact:cluster", adds, ct.tailFiles,
      CommuteNonOverlapping)
    catch { case e: Throwable => cleanupStaged(path, adds); throw e }
  }

  /** SCOPED re-cluster — `OPTIMIZE t ZORDER BY (…) WHERE col BETWEEN
    * lo AND hi`: re-cluster ONLY the files whose LOGGED range on
    * `column` intersects the box (the binPackWhere stats walk — zero
    * footer reads to pick the set), at a width proportional to their
    * byte share, leaving everything outside the box byte-for-byte
    * untouched. The re-pack-the-hot-band shape: at 100 TB, fixing one
    * churned partition's layout is an O(band) job, not a table
    * rewrite and not even a tail fold. Commits as `compact:zscope` —
    * a DISTINCT op, so [[clusterTailInfo]] counts its outputs as
    * clustered without moving the chain baseline (unclustered files
    * outside the box keep their tail status for the next bare
    * ZORDER). 1/2/3 columns = range/Morton2/Morton3, the same layout
    * family as [[compactClustered]]. Unchanged head when nothing
    * intersects. */
  def compactClusteredWhere(spark: SparkSession, path: String,
      cols: Seq[Column], column: String, lo: Long, hi: Long,
      targetFiles: Int = 16): Long = {
    require(cols.nonEmpty && cols.size <= 3,
      s"1-3 cluster columns, got ${cols.size}")
    val base = currentVersion(path)
    // same loud type fence as binPackWhere: bounds live in the
    // physical int64 space
    val (schema, _) = snapshotSchemaFenced(spark, path, base)
    schema(column).dataType match {
      case org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.DateType |
           org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType => ()
      case dt => throw new IllegalArgumentException(
        s"compactClusteredWhere: $column has non-integral type $dt " +
          "(bounds live in the physical int64 space)")
    }
    val files = snapshotFiles(path, base)
    val idx = statsIndexFor(spark, path, base, Seq(column))
    val keptAbs = graft.crawler.SkippingIndex
      .selectFiles(idx, 0, lo, hi).toSet
    val inRange = files.filter(f =>
      keptAbs.contains(localRoot(path).resolve(f).toString))
    if (inRange.isEmpty) return base // nothing intersects the box
    val ai = addsIndex(path, base)
    val selBytes = inRange.flatMap(ai.get).map(_.bytes).sum
    val totBytes = files.flatMap(ai.get).map(_.bytes).sum
    val bins = math.max(1, math.round(targetFiles.toDouble *
      selBytes / math.max(1L, totBytes)).toInt)
    val abs = inRange.map(f => localRoot(path).resolve(f).toString)
    val scan = applyDv(spark, path, base,
      snapshotScan(spark, path, base, abs), keepFname = false)
    val clustered = cols match {
      case Seq(a) =>
        scan.repartitionByRange(bins, a).sortWithinPartitions(a)
      case Seq(a, b) =>
        graft.operators.Layout.zorderPartitions(scan, a, b, bins)
      case Seq(a, b, c) =>
        graft.operators.Layout.zorderPartitions3(scan, a, b, c, bins)
    }
    val adds = writeDataPrepared(spark, path, clustered)
    try commitRewrite(path, base, "compact:zscope", adds, inRange,
      CommuteNonOverlapping)
    catch { case e: Throwable => cleanupStaged(path, adds); throw e }
  }

  /** Exactly-once streaming append (the foreachBatch sink): commit the
    * micro-batch under op `stream:<streamId>:<batchId>` and SKIP any
    * batch id already in the log — checkpoint recovery re-delivers the
    * last un-acknowledged batch, and this makes the redelivery a no-op
    * (the idempotent-writer pattern a transactional log enables; the
    * same role Delta's txn action plays). Version races re-check
    * idempotence before retrying, so a duplicate can't slip in between
    * the check and the commit. Returns the committed version, or None
    * if the batch was already applied.
    *
    * Single-writer-per-streamId is assumed (Structured Streaming's
    * checkpoint lock provides it); concurrent DIFFERENT streams and
    * batch writers compose through the normal version protocol.
    *
    * `srcFiles` (the COPY INTO … FROM STREAM route): the batch's
    * source-file manifest, recorded in the op and folded into the
    * per-table copy-sources registry — idempotence then keys on FILE
    * identity (like the reference's COPY INTO), not the batch id, so
    * a lost checkpoint can never mask files landed since the loss
    * behind a stale batch-id high-water.
    */
  def appendStreamBatch(
      spark: SparkSession,
      path: String,
      df: DataFrame,
      streamId: String,
      batchId: Long,
      partitions: Int = 1,
      maxAttempts: Int = 20,
      clusterBy: Seq[Column] = Nil,
      srcFiles: Seq[String] = Nil): Option[Long] = {
    val op =
      if (srcFiles.isEmpty) s"stream:$streamId:$batchId"
      else {
        import org.json4s.{JArray, JString}
        import org.json4s.jackson.JsonMethods
        s"stream:$streamId:$batchId:files:" + JsonMethods.compact(
          JsonMethods.render(
            JArray(srcFiles.sorted.map(JString(_)).toList)))
      }
    // Idempotence has two regimes. Without srcFiles (a computed
    // streaming sink): checkpoint-amortized per-stream high-water
    // marks — `>=` (not ==) is safe because Structured Streaming
    // delivers batch ids monotonically per stream (single writer per
    // streamId). With srcFiles (the COPY INTO … FROM STREAM route):
    // FILE-level idempotence via the copy-sources registry — the
    // batch-id high-water must NOT govern, because a lost checkpoint
    // restarts batch ids at 0 and would bundle files landed since the
    // loss into already-seen ids, silently skipping them forever.
    def alreadyApplied(): Boolean = {
      val top = currentVersion(path)
      if (top < 0) return false
      if (srcFiles.nonEmpty) {
        val seen = copySourcesInfo(path, top)
        val hits = srcFiles.count(seen.contains)
        // partial overlap is unreachable under the single-writer-per-
        // streamId contract (the caller filters to fresh files first);
        // committing would double-load the overlap and skipping would
        // drop the fresh remainder — fail loudly instead of picking
        if (hits != 0 && hits != srcFiles.size) sys.error(
          s"appendStreamBatch: $op overlaps the ingested-file registry " +
            s"($hits of ${srcFiles.size} already loaded) — a concurrent " +
            "writer violated single-writer-per-streamId")
        hits == srcFiles.size
      } else streamBatches(path, top).get(streamId).exists(_ >= batchId)
    }
    if (alreadyApplied()) return None
    checkSchema(path, df, evolveSchema = false)
    var csStage =
      try constraints(path)
      catch { case _: IllegalArgumentException => Map.empty[String, String] }
    // clusterBy range-clusters the batch's files (each owning a compact
    // key range) so footer pruning on the cluster column stays tight —
    // the layout an incrementally-served store (StreamDedup) needs.
    val checked = withChecks(spark, path, df)
    val adds =
      if (clusterBy.nonEmpty)
        writeDataPrepared(spark, path,
          checked.repartitionByRange(partitions, clusterBy: _*)
            .sortWithinPartitions(clusterBy: _*))
      else writeData(spark, path, checked, partitions)
    var attempt = 0
    while (attempt <= maxAttempts) {
      if (alreadyApplied()) {
        // duplicate detected only AFTER staging (the redelivered batch
        // lost a race to its own first delivery): the staged files will
        // never be committed — drop them, don't orphan them
        cleanupStaged(path, adds)
        return None
      }
      val v = currentVersion(path) + 1
      preCommitHook()
      try {
        tryCommit(path, TxnCommit(v, op, adds, Nil))
        return Some(v)
      } catch {
        case _: TxnConflictException =>
          attempt += 1
          // the lost race may have been a concurrent addConstraint —
          // re-validate the staged rows against the fresh set (cleaning
          // the staged tranche if they violate it; see revalidateStaged)
          try csStage = revalidateStaged(spark, path, adds, csStage)
          catch { case e: Throwable => cleanupStaged(path, adds); throw e }
      }
    }
    cleanupStaged(path, adds)
    sys.error(s"appendStreamBatch: lost $maxAttempts version races for $op")
  }

  /** SHALLOW CLONE: create `dst` whose version 0 references `src`'s
    * snapshot files BY PATH — zero data copied, pure metadata (the
    * zero-copy branch/sandbox operation: test a migration against
    * 100 TB without duplicating a byte). The clone's own writes land
    * under its own `data/`; rewrites (delete/merge/compact) replace
    * source references with clone-local files, progressively
    * materializing exactly the rewritten part. [[vacuum]] deletes only
    * files under a table's OWN root, so a clone's vacuum can never
    * reap source data. Caveat (the same contract as Delta shallow
    * clones): the SOURCE does not know about clones — vacuuming the
    * source can invalidate a clone's un-materialized references, so
    * retain source history for as long as clones live.
    */
  def cloneShallow(spark: SparkSession, src: String, dst: String,
      asOf: Long = -1L): Long = {
    val srcTop = currentVersion(src)
    require(srcTop >= 0, s"not a TxnTable: $src")
    val upTo = if (asOf < 0) srcTop else asOf
    if (asOf >= 0) {
      val earliest = earliestVersion(src)
      require(asOf >= earliest,
        s"cannot clone at $asOf: vacuumed (earliest readable $earliest)")
      require(asOf <= srcTop,
        s"cannot clone at $asOf: version does not exist (latest $srcTop)")
    }
    val byPath = addsIndex(src, srcTop)
    val adds = snapshotFiles(src, upTo).map { f =>
      val a = byPath.getOrElse(f,
        sys.error(s"clone: add metadata missing for $f (corrupt log?)"))
      a.copy(path = localRoot(src).resolve(f).toString)
    }
    val schema = schemaInfo(src, upTo)._2
    // carry the source snapshot's deletion vectors, absolutized like
    // the data references (keys must match the adds' paths; the DV
    // files live under the SOURCE's dv/ and are never reaped by the
    // clone's own vacuum, same as data)
    val dvs = snapshotDvs(src, upTo).toSeq.sortBy(_._1).map {
      case (f, dv) => (localRoot(src).resolve(f).toString,
        localRoot(src).resolve(dv).toString)
    }
    tryCommit(dst, TxnCommit(0L, s"clone:$upTo", adds, Nil, schema, dvs))
    // Register the clone's pin AT THE SOURCE (best-effort: a read-only
    // source degrades to the documented retain-history-manually
    // contract): the source's vacuum consults the registry and keeps
    // the pinned snapshot's files alive for as long as the clone is
    // registered — without this, a source vacuum can silently reap
    // files a live clone still references. releaseClone drops the pin.
    try {
      val cd = cloneRegistryDir(src)
      Files.createDirectories(cd)
      val json = s"""{"dst":"${esc(localRoot(dst).toString)}","version":$upTo}"""
      Files.write(cd.resolve(cloneRegName(dst)),
        json.getBytes(StandardCharsets.UTF_8))
    } catch { case _: Throwable => () }
    0L
  }

  private def cloneRegistryDir(path: String): JPath =
    localRoot(path).resolve("_graft_clones")

  /** Registry file name for a clone pin: a full 128-bit digest of the
    * clone's absolute path — collision-resistant, so two clones can
    * never overwrite each other's pin (a 32-bit hash here would let
    * releaseClone of one clone silently unpin another). */
  private def cloneRegName(dst: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(localRoot(dst).toString.getBytes(StandardCharsets.UTF_8))
    "c-" + md.map(b => f"$b%02x").mkString + ".json"
  }

  /** Drop `dst`'s registration at `src` — after this, a source vacuum
    * is free to reap the pinned snapshot's files and the clone's
    * un-materialized references become invalid (the clone should have
    * been deleted, or fully materialized via its own compact, first).
    * The stored `dst` field is verified before deleting, so even a
    * digest collision cannot release another clone's pin. Returns
    * whether a registration existed and was removed. */
  def releaseClone(src: String, dst: String): Boolean =
    try {
      val p = cloneRegistryDir(src).resolve(cloneRegName(dst))
      if (!Files.exists(p)) false
      else {
        import org.json4s._
        import org.json4s.jackson.JsonMethods
        implicit val fmts: Formats = DefaultFormats
        val j = JsonMethods.parse(new String(Files.readAllBytes(p),
          StandardCharsets.UTF_8))
        ((j \ "dst").extractOpt[String].contains(localRoot(dst).toString)
          && Files.deleteIfExists(p))
      }
    } catch { case _: Throwable => false }

  /** Pinned source versions of registered live clones (for vacuum). */
  private def registeredClonePins(path: String): Seq[Long] = {
    val cd = cloneRegistryDir(path)
    if (!Files.isDirectory(cd)) return Nil
    val it = Files.list(cd)
    try it.iterator().asScala
      .filter(_.getFileName.toString.endsWith(".json"))
      .flatMap { p =>
        try {
          import org.json4s._
          import org.json4s.jackson.JsonMethods
          implicit val fmts: Formats = DefaultFormats
          val j = JsonMethods.parse(new String(Files.readAllBytes(p),
            StandardCharsets.UTF_8))
          Some((j \ "version").extract[Long])
        } catch { case _: Throwable => None }
      }.toSeq
    finally it.close()
  }

  /** Roll the table back to the logical content of `toVersion` — as a
    * NEW commit (history is never rewritten): removes the current live
    * set and re-adds the target snapshot's files by reference. Requires
    * the target to still be readable (not vacuumed). Restore-of-restore
    * and restore-then-append compose like any other commits.
    */
  def restore(spark: SparkSession, path: String, toVersion: Long,
      maxAttempts: Int = 20): Long = {
    def requireReadable(): Unit = {
      val earliest = earliestVersion(path)
      require(toVersion >= earliest,
        s"cannot restore to $toVersion: vacuumed (earliest readable $earliest)")
    }
    requireReadable()
    val target = snapshotFiles(path, toVersion)
    // Checkpoint-amortized re-add metadata: the target's files are all
    // extant (the version is readable, so no vacuum deleted them),
    // hence every one is in the addsIndex — no O(versions) log replay.
    val byPath = addsIndex(path, currentVersion(path))
    val targetAdds = target.flatMap(byPath.get)
    require(targetAdds.size == target.size,
      s"restore: add metadata missing for ${target.size - targetAdds.size} " +
        s"of ${target.size} target files (corrupt log?)")
    var attempt = 0
    while (true) {
      val cur = currentVersion(path)
      val live = snapshotFiles(path, cur)
      // roll the recorded schema back too, if evolution happened since
      // (schemaInfo = checkpoint-amortized "schema as of version v")
      val schemaRollback = {
        val at = schemaInfo(path, toVersion)._2
        if (at != schemaInfo(path, cur)._2) at else None
      }
      preCommitHook()
      // Re-check INSIDE the race window: a vacuum may have raised the
      // horizon (and physically deleted the target's files) since the
      // entry check — committing would resurrect dangling paths. A
      // vacuum that lands after this check instead wins the version
      // race below, and the retry re-enters through this check.
      requireReadable()
      try {
        // dvs: the re-add clears each file's DV, the same commit's dvs
        // then restore the TARGET version's map — so a restore across
        // a dvdelete rolls the deletion vectors back too
        tryCommit(path, TxnCommit(cur + 1, s"restore:$toVersion",
          targetAdds, live.filterNot(target.contains), schemaRollback,
          snapshotDvs(path, toVersion).toSeq.sortBy(_._1)))
        return cur + 1
      } catch {
        case _: TxnConflictException if attempt < maxAttempts => attempt += 1
      }
    }
    -1L // unreachable
  }

  /** Oldest version still readable: 0, or the horizon of the most
    * aggressive vacuum so far. Checkpoint-amortized like
    * `snapshotFiles`: the checkpoint carries the horizon at its
    * version, so only the commit suffix is scanned.
    */
  def earliestVersion(path: String): Long = {
    val top = currentVersion(path)
    if (top < 0) return 0L
    val (from, ckHorizon) = latestCheckpoint(path, top)
      .map(ck => (ck.version, ck.horizon)).getOrElse((-1L, 0L))
    ((from + 1) to top).map { v =>
      val c = readCommit(path, v)
      if (c.op.startsWith("vacuum:")) c.op.stripPrefix("vacuum:").toLong
      else 0L
    }.foldLeft(ckHorizon)(math.max)
  }

  /** DESCRIBE HISTORY: one row per commit of the readable log —
    * (version, op, tsMillis from the commit file's mtime, files/rows/
    * bytes added, files removed, DV reassignments, whether a schema
    * was recorded). The table-audit surface: who-did-what-when over
    * the same log every read resolves from; pre-horizon versions are
    * absent (their commits may be unreadable after a vacuum). Driver-
    * side O(readable versions) metadata — the same order as the log
    * listing itself. */
  def history(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val top = currentVersion(path)
    require(top >= 0, s"not a TxnTable: $path")
    (earliestVersion(path) to top).map { v =>
      val c = readCommit(path, v)
      val ts = Files.getLastModifiedTime(versionFile(path, v)).toMillis
      (v, c.op, ts, c.adds.size.toLong, c.adds.map(_.rows).sum,
        c.adds.map(_.bytes).sum, c.removes.size.toLong,
        c.dvs.size.toLong, c.schema.isDefined)
    }.toDF("version", "op", "ts_millis", "files_added", "rows_added",
      "bytes_added", "files_removed", "dv_reassigned", "schema_change")
  }

  /** The operational one-row summary behind `DESCRIBE DETAIL`,
    * computed ENTIRELY from the commit log (zero data or footer I/O —
    * at 100 TB this must never scan): current/earliest version, live
    * file count, total logged rows (write-time counts, i.e. pre-DV;
    * MOR-deleted rows still reside in the files until a rewrite
    * materializes them), total bytes, DV-carrying file count, and
    * active constraint count. */
  def detail(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val top = currentVersion(path)
    require(top >= 0, s"not a TxnTable: $path")
    val files = snapshotFiles(path, top)
    val ai = addsIndex(path, top)
    val dvm = snapshotDvs(path, top)
    val adds = files.flatMap(ai.get)
    val props = propsInfo(path, top)
    // stats coverage: the share of live adds carrying write-time
    // min/max stats — the operator's "would OPTIMIZE make pruning
    // zero-footer?" signal (adds without stats scan conservatively in
    // every pruned read; a rewrite re-harvests them)
    val statsCov =
      if (adds.isEmpty) 1.0
      else adds.count(_.stats.exists(_.nonEmpty)).toDouble / adds.size
    Seq((path, top, earliestVersion(path), files.size.toLong,
      adds.map(_.rows).sum, adds.map(_.bytes).sum, dvm.size.toLong,
      constraints(path).size.toLong,
      props.get("graft.clusterBy"),
      props.get("graft.targetFiles").map(_.toLong),
      statsCov))
      .toDF("location", "version", "earliest_version", "num_files",
        "total_rows", "total_bytes", "num_dv_files", "num_constraints",
        "cluster_by", "target_files", "stats_coverage")
  }

  /** TRUNCATE: one commit removing every live file — a LOGICAL
    * delete-all (the bytes stay; history and time travel to the
    * pre-truncate snapshot keep working, and [[restore]] undoes it —
    * reclaim space explicitly with vacuum, the same never-delete-100-TB
    * contract as DROP TABLE). Schema, constraints, and properties
    * survive; subsequent appends start clean. Conflict contract: any
    * concurrent DATA commit aborts the truncate (a truncate that
    * silently swallowed a racing append would lose its rows); pure
    * metadata commits (properties) commute, like overwrite's. */
  def truncate(path: String): Long = {
    val top = currentVersion(path)
    require(top >= 0, s"not a TxnTable: $path")
    val files = snapshotFiles(path, top)
    if (files.isEmpty) return top // already empty: the no-op signal
    commitRewrite(path, top, "truncate", Nil, files, CommuteMetadataOnly)
  }

  /** FSCK — reconcile the log with storage after OUT-OF-BAND file
    * loss (a reaped bucket prefix, a fat-fingered rm, a failed
    * restore): list the live adds whose data files no longer exist
    * and, with `dryRun = false`, commit one `repair` that REMOVES
    * them, so the table serves the surviving rows instead of failing
    * every scan on the first missing file. Returns the missing files
    * as rows (file, rows, bytes — the logged extent of WHAT WAS LOST,
    * the ops answer an incident needs) whether or not it commits; the
    * dry run commits NOTHING. The repair is an ordinary rewrite
    * commit: history keeps the loss auditable, time travel BEFORE the
    * repair still (correctly) fails on the vanished bytes, DV
    * mappings of removed files clear with them, and concurrent
    * commits rebase-or-abort like any rewrite. Existence probing is
    * O(live files) metadata — no data or footer I/O. */
  def repair(spark: SparkSession, path: String,
      dryRun: Boolean = true): DataFrame = {
    import spark.implicits._
    val top = currentVersion(path)
    require(top >= 0, s"not a TxnTable: $path")
    val ai = addsIndex(path, top)
    // per-file probe through the Store seam: O(live files) metadata
    // locally; an object-store port batches per-prefix LISTs instead
    // of per-file HEADs (see Store.exists)
    val missing = snapshotFiles(path, top)
      .filterNot(f => Store.exists(localRoot(path).resolve(f)))
    if (!dryRun && missing.nonEmpty)
      commitRewrite(path, top, "repair", Nil, missing,
        CommuteNonOverlapping)
    missing.map { f =>
      val a = ai.get(f)
      (f, a.map(_.rows).getOrElse(-1L), a.map(_.bytes).getOrElse(-1L))
    }.toDF("file", "rows_lost", "bytes_lost")
  }

  /** Per-COLUMN statistics panel, computed ENTIRELY from the commit
    * log (zero data or footer I/O — the column-level sibling of
    * [[detail]]): for each logical column, the share of live adds
    * carrying write-time stats for it, the GLOBAL min/max folded over
    * the per-file bounds (reported only at FULL coverage — a single
    * add without bounds could hide the true extreme, so partial
    * coverage reports null rather than a lie), and the exact null
    * count (only when every add logged one). Integer/date/timestamp
    * bounds live in the physical int64 space (micros / epoch days —
    * the same space every pruned read uses); string bounds are
    * writer-truncated prefixes past `MaxLoggedStringBound`, accurate
    * for short values. At 100 TB this answers "what's in this table"
    * from O(files) commit metadata where ANALYZE would scan. */
  /** One column's log-folded statistics (see [[logTableStats]]):
    * bounds/nulls are present ONLY under full add-coverage — an
    * honest global claim, never a partial one. Long bounds live in
    * the PHYSICAL int64 space (days for dates, micros for
    * timestamps). */
  case class LogColStat(dataType: org.apache.spark.sql.types.DataType,
      coverage: Double, lmin: Option[Long], lmax: Option[Long],
      smin: Option[String], smax: Option[String], nulls: Option[Long])

  /** Table statistics folded from the COMMIT LOG alone — zero file
    * reads: total live bytes, live row count (add rows; rows hidden
    * by deletion vectors still count — an upper bound, which is what
    * an optimizer estimate wants), and per-column global bounds/null
    * counts from the write-time add stats. This is what `ANALYZE
    * TABLE` would scan 100 TB to recompute; the log already holds it.
    */
  def logTableStats(spark: SparkSession, path: String,
      asOf: Long = -1L): (Long, Long, Seq[(String, LogColStat)]) = {
    val top = if (asOf >= 0) asOf else currentVersion(path)
    require(top >= 0, s"not a TxnTable: $path")
    val files = snapshotFiles(path, top)
    val ai = addsIndex(path, top)
    val adds = files.flatMap(ai.get)
    val parsed = adds.map(a => (a.rows, a.stats.flatMap(parseAddStats)))
    val nAdds = parsed.size
    val schema = read(spark, path, top).schema
    val cols = schema.fields.toSeq.map { f =>
      val phys = physicalColName(path, top, f.name)
      val have = parsed.flatMap(_._2).filter(_.cols.contains(phys))
      val coverage =
        if (nAdds == 0) 1.0 else have.size.toDouble / nAdds
      val full = nAdds > 0 && have.size == nAdds
      val (lmin, lmax) = {
        val mins = have.flatMap(_.l.get(phys).map(_._1))
        val maxs = have.flatMap(_.l.get(phys).map(_._2))
        if (!full || mins.size != nAdds) (None, None)
        else (Some(mins.min), Some(maxs.max))
      }
      val (smin, smax) = {
        val mins = have.flatMap(_.s.get(phys).map(_._1))
        val maxs = have.flatMap(_.s.get(phys).map(_._2))
        if (!full || mins.size != nAdds) (None, None)
        else (Some(mins.min), Some(maxs.max))
      }
      val nulls = {
        val ns = have.flatMap(_.n.get(phys))
        if (!full || ns.size != nAdds) None else Some(ns.sum)
      }
      f.name -> LogColStat(f.dataType, coverage, lmin, lmax,
        smin, smax, nulls)
    }
    (adds.map(_.bytes).sum, parsed.map(_._1).sum, cols)
  }

  def columnStats(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val (_, _, cols) = logTableStats(spark, path)
    cols.map { case (n, c) =>
      (n, c.dataType.simpleString, c.coverage,
        c.lmin, c.lmax, c.smin, c.smax, c.nulls)
    }.toDF("column", "type", "stats_coverage", "min_long",
      "max_long", "min_str", "max_str", "null_count")
  }

  /** The commit file's modification stamp — a cheap TABLE-IDENTITY
    * witness: a table deleted and recreated at the same path restarts
    * version numbers, so any cache keyed on (path, version) alone
    * could serve the DEAD table's state; folding this stamp into the
    * key makes that impossible (one stat call, no content read). */
  def commitMtime(path: String, v: Long): Long =
    Files.getLastModifiedTime(versionFile(path, v)).toMillis

  /** TIMESTAMP time travel: the latest readable version whose commit
    * landed at or before `tsMillis` — resolved from the version files'
    * MODIFICATION TIMES (the reference lake formats' design: the log
    * is the clock; no format change, works on every existing table).
    * Commit files are created in version order, so their mtimes are
    * non-decreasing and a binary search over the readable range
    * suffices: O(log versions) stat calls, no commit is parsed.
    * Caveats shared with those formats: the resolution is the store's
    * mtime granularity, and copying a log with tools that reset
    * mtimes rewrites history's clock. Throws if `tsMillis` predates
    * the earliest READABLE commit (pre-vacuum-horizon history is gone
    * — same fence as version-addressed reads). */
  def versionAt(path: String, tsMillis: Long): Long = {
    val top = currentVersion(path)
    require(top >= 0, s"not a TxnTable: $path")
    def mtime(v: Long): Long =
      Files.getLastModifiedTime(versionFile(path, v)).toMillis
    var lo = earliestVersion(path)
    require(mtime(lo) <= tsMillis,
      s"timestamp $tsMillis predates the earliest readable commit " +
        s"(v$lo at ${mtime(lo)})")
    var hi = top
    while (lo < hi) { // invariant: mtime(lo) <= ts; answer in [lo, hi]
      val mid = lo + (hi - lo + 1) / 2
      if (mtime(mid) <= tsMillis) lo = mid else hi = mid - 1
    }
    lo
  }

  /** [[read]] addressed by wall-clock time instead of version. */
  def readAsOfTimestamp(spark: SparkSession, path: String,
      tsMillis: Long): DataFrame =
    read(spark, path, versionAt(path, tsMillis))

  /** Physical cleanup: delete data files referenced ONLY by snapshots
    * older than the time-travel horizon (the last `retainVersions`
    * versions stay fully readable). The horizon is recorded as a
    * `vacuum:<horizon>` commit, so pre-horizon time travel fails with a
    * clear error instead of missing files, and the vacuum itself is an
    * ordinary serialized commit (no file can be both vacuumed and
    * resurrected by a racing writer: the file set is resolved from the
    * log prefix the commit wins against). Logical content is unchanged
    * — the commit carries no adds/removes. Returns (new version,
    * number of files deleted).
    *
    * Scale: resolves `retainVersions` snapshots and the extant-adds
    * index — ALL checkpoint-amortized (O(interval) commit reads each,
    * never an O(versions) log replay; the spec pins the read count on
    * a 100+-commit table); deletion is O(dead files).
    *
    * **Clone pins**: every snapshot version a registered live shallow
    * clone references ([[cloneShallow]]'s registry) is added to the
    * keep-set REGARDLESS of the horizon — a source vacuum never reaps
    * files a registered clone still reads, however aggressive the
    * retention. [[releaseClone]] (or deleting the clone's pin file)
    * lifts the protection. Pins guard physical files only; the
    * time-travel horizon (and its fences) advance normally.
    *
    * **Orphan sweep** (opt-in via `orphanGraceMs >= 0`): also deletes
    * files under the table's own `data/` that are referenced by NO
    * commit — crashed-writer staging debris, which the known-dead set
    * can never reach — but only when older than the grace window.
    * Grace must exceed the longest write job's staging time: an
    * in-flight writer stages its files moments before committing, and
    * the window is what keeps the sweep from eating them (the same
    * retention-vs-writer-duration contract as the reference lake
    * formats' vacuum). The orphan set is re-resolved against the
    * LATEST log state after the vacuum commit wins, so anything
    * committed meanwhile is excluded.
    */
  /** [[vacuum]] with TIME-based retention (the reference lake formats'
    * `RETAIN n HOURS` shape): every snapshot that was current at any
    * instant within the trailing `retainMs` window stays readable —
    * the horizon lands on [[versionAt]](now − retainMs), the version
    * active AT the cutoff (not merely versions committed after it).
    * A window older than the whole readable log degrades to the
    * existing horizon (nothing newly reapable). */
  def vacuumRetainMillis(spark: SparkSession, path: String,
      retainMs: Long, orphanGraceMs: Long = -1L): (Long, Int) = {
    require(retainMs >= 0, "retention window must be non-negative")
    vacuum(spark, path, retainVersionsForWindow(path, retainMs),
      orphanGraceMs)
  }

  /** A `RETAIN ms` window expressed as a retained-version count:
    * everything current at any instant within the trailing window
    * stays readable. */
  private def retainVersionsForWindow(path: String, retainMs: Long): Int = {
    val top = currentVersion(path)
    val cutoff = System.currentTimeMillis() - retainMs
    val keepFrom =
      try versionAt(path, cutoff)
      catch { // cutoff predates the earliest readable commit
        case _: IllegalArgumentException => earliestVersion(path)
      }
    math.toIntExact(top - keepFrom + 1)
  }

  /** [[vacuum]]'s ADVISORY half — `VACUUM … DRY RUN`: the data files
    * the same retention would delete RIGHT NOW, with their logged
    * sizes, as rows. No commit, no deletion, pure log metadata (the
    * "how much would I reclaim" question must never scan a 100 TB
    * table). Advisory by nature: a concurrent commit can change the
    * dead set; the real vacuum re-resolves it under the log prefix its
    * own commit wins against. Same dead-set rule as [[vacuum]]:
    * known-dead only (referenced by some commit, absent from every
    * retained snapshot and every registered clone pin), own-data-dir
    * only. */
  def vacuumDryRun(spark: SparkSession, path: String,
      retainVersions: Int = 2): DataFrame = {
    import spark.implicits._
    require(retainVersions >= 1, "must retain at least the current version")
    val cur = currentVersion(path)
    require(cur >= 0, s"not a TxnTable: $path")
    val horizon = math.max(earliestVersion(path),
      math.max(0L, cur - retainVersions + 1))
    val pinned = registeredClonePins(path)
      .filter(v => v >= 0 && v <= cur).distinct
    val keep = ((horizon to cur) ++ pinned)
      .flatMap(v => snapshotFiles(path, v)).toSet
    val ai = addsIndex(path, cur)
    (ai.keySet -- keep).toSeq.sorted
      .filter { f =>
        val p = localRoot(path).resolve(f)
        // the log keeps referencing files an earlier vacuum already
        // reaped; "would reclaim" means bytes still on disk
        p.startsWith(dataDir(path)) && Files.exists(p)
      }
      .map(f => (f, ai(f).bytes))
      .toDF("file", "bytes")
  }

  /** [[vacuumDryRun]] with TIME-based retention (`RETAIN n HOURS DRY
    * RUN`). */
  def vacuumDryRunRetainMillis(spark: SparkSession, path: String,
      retainMs: Long): DataFrame = {
    require(retainMs >= 0, "retention window must be non-negative")
    vacuumDryRun(spark, path, retainVersionsForWindow(path, retainMs))
  }

  def vacuum(spark: SparkSession, path: String,
      retainVersions: Int = 2, orphanGraceMs: Long = -1L): (Long, Int) = {
    require(retainVersions >= 1, "must retain at least the current version")
    var attempt = 0
    while (true) {
      val cur = currentVersion(path)
      val horizon = math.max(earliestVersion(path),
        math.max(0L, cur - retainVersions + 1))
      val pinned = registeredClonePins(path)
        .filter(v => v >= 0 && v <= cur).distinct
      val keep = ((horizon to cur) ++ pinned)
        .flatMap(v => snapshotFiles(path, v)).toSet
      // Known-dead only: files REFERENCED by some commit and absent
      // from every retained snapshot. Never "everything not in keep" —
      // a concurrent appender stages its data files BEFORE its commit,
      // and an unreferenced file may be exactly that; addsIndex only
      // ever holds committed references. Checkpoint-amortized: the
      // index replays the suffix past the nearest checkpoint, not the
      // whole log. (Equal to the "pre-horizon commits only" dead-set:
      // any file added by a commit ≥ horizon is live at that commit's
      // own version, which is a retained snapshot — so it is in keep.)
      val dead = addsIndex(path, cur).keySet -- keep
      preCommitHook()
      try {
        tryCommit(path, TxnCommit(cur + 1, s"vacuum:$horizon", Nil, Nil))
        // the commit won: the dead-set is authoritative (later writers
        // build on a log that already contains this vacuum). Only
        // files under the table's OWN data dir are deletable — a
        // shallow clone references foreign absolute paths, and its
        // vacuum must never reap the source's data.
        var deleted = 0
        dead.foreach { f =>
          val p = localRoot(path).resolve(f)
          if (p.startsWith(dataDir(path)) && Files.deleteIfExists(p))
            deleted += 1
        }
        if (orphanGraceMs >= 0 && Files.isDirectory(dataDir(path))) {
          // referenced-by-NO-commit files, re-resolved at the LATEST
          // version (not `cur`): a writer that committed between our
          // vacuum commit and this scan is already in the index, so
          // only true debris older than the grace window is swept
          val referenced = addsIndex(path, currentVersion(path)).keySet
            .map(f => localRoot(path).resolve(f).normalize)
          val cutoff = System.currentTimeMillis() - orphanGraceMs
          val it = Files.walk(dataDir(path))
          try it.iterator().asScala.foreach { p =>
            if (Files.isRegularFile(p) &&
              !referenced.contains(p.normalize) &&
              Files.getLastModifiedTime(p).toMillis < cutoff &&
              Files.deleteIfExists(p)) deleted += 1
          } finally it.close()
        }
        if (orphanGraceMs >= 0 && Files.isDirectory(dvDir(path))) {
          // deletion-vector sweep, same age-graced contract: a DV file
          // is kept while ANY retained/pinned snapshot (or the latest
          // log state, covering commits that raced this vacuum) maps a
          // data file to it; superseded/orphaned DVs older than the
          // grace window are reaped. Grace is what protects a
          // concurrent dvdelete's staged-but-not-yet-committed file.
          val keepDv = (((horizon to cur) ++ pinned)
            .flatMap(v => snapshotDvs(path, v).values) ++
            snapshotDvs(path, currentVersion(path)).values).toSet
            .map((f: String) => localRoot(path).resolve(f).normalize)
          val cutoff = System.currentTimeMillis() - orphanGraceMs
          val it = Files.walk(dvDir(path))
          try it.iterator().asScala.foreach { p =>
            if (Files.isRegularFile(p) &&
              !keepDv.contains(p.normalize) &&
              Files.getLastModifiedTime(p).toMillis < cutoff &&
              Files.deleteIfExists(p)) deleted += 1
          } finally it.close()
        }
        return (cur + 1, deleted)
      } catch {
        case _: TxnConflictException if attempt < 20 => attempt += 1
      }
    }
    sys.error("unreachable")
  }

  /** Read a snapshot (latest, or time-travel to `asOf`). mergeSchema is
    * enabled only when the log prefix actually recorded more than one
    * schema generation — homogeneous tables keep the cheap single-footer
    * path.
    */
  def read(spark: SparkSession, path: String, asOf: Long = -1L): DataFrame = {
    if (asOf >= 0) {
      val earliest = earliestVersion(path)
      require(asOf >= earliest,
        s"version $asOf was vacuumed away (earliest readable: $earliest)")
    }
    val upTo = if (asOf < 0) currentVersion(path) else asOf
    // checkpoint-amortized: schema + generation count come from the
    // nearest checkpoint plus the commit suffix, not a walk to v0
    val (generations, recorded) = schemaInfo(path, upTo)
    val files = snapshotFiles(path, asOf)
    if (files.isEmpty) {
      // a TRUNCATE (or delete-all) leaves a ZERO-FILE snapshot: with a
      // recorded schema that is a well-defined empty frame, not an
      // error — appends start clean, aggregates answer zero
      require(recorded.isDefined,
        s"empty snapshot of $path at $asOf with no recorded schema")
      val st = recordedSchemaAt(path, upTo).get
      // all-nullable, like every real file scan (Spark's file sources
      // force asNullable on user schemas) — a zero-file snapshot must
      // be schema-IDENTICAL to its file-backed siblings, or consumers
      // comparing schema JSON (the change feed's pin) see a phantom
      // schema change at the truncate
      val nullable = org.apache.spark.sql.types.StructType(
        physicalSchema(st).fields.map(_.copy(nullable = true)))
      return toLogical(spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        nullable), st)
    }
    // Pin the RECORDED snapshot schema: evolved-in columns null-fill on
    // old-generation files exactly like mergeSchema did, and a DROPPED
    // column stays dropped even though old files still carry its bytes
    // (the metadata-only ALTER contract — mergeSchema would resurrect
    // it). Binding is by PHYSICAL names (column mapping: files always
    // store the stable physical name; applyDv aliases back to logical).
    // Pre-schema-era logs (none in practice) keep the old readers.
    val reader = recorded match {
      case Some(js) => spark.read.schema(physicalSchema(
        org.apache.spark.sql.types.DataType.fromJson(js)
          .asInstanceOf[org.apache.spark.sql.types.StructType]))
      case None if generations > 1 => spark.read.option("mergeSchema", "true")
      case None => spark.read
    }
    applyDv(spark, path, upTo,
      reader.parquet(files.map(f => localRoot(path).resolve(f).toString): _*),
      keepFname = false)
  }

  /** ALTER TABLE ADD COLUMNS: record the widened schema as a
    * metadata-only commit — O(1) at any table size; existing files
    * null-fill the new columns at read time (pinned-schema read). New
    * columns must be nullable (there is no backfill to satisfy a NOT
    * NULL on old rows).
    *
    * Every added column gets a FRESH physical name (`col-<uuid>`, the
    * column-mapping seam — like the open lake formats do when mapping
    * is active), never its logical name. Two resurrection/clash
    * hazards force this: (a) after RENAME a→b, ADD COLUMNS (a …) would
    * otherwise put two fields named `a` in the physical schema —
    * every subsequent read fails and writes corrupt; (b) after DROP
    * COLUMNS s, ADD COLUMNS (s …) would otherwise re-bind the dropped
    * column's bytes still sitting in old files — deleted data silently
    * resurrects. A fresh physical name can collide with nothing: no
    * file has ever stored it. */
  def addColumns(spark: SparkSession, path: String,
      cols: Seq[(String, org.apache.spark.sql.types.DataType)]): Long = {
    require(cols.nonEmpty, "addColumns: no columns given")
    commitSchemaChange(path, s"alter:add:${cols.map(_._1).mkString(",")}",
      () => {
        val cur = currentSchema(path).getOrElse(
          throw new IllegalArgumentException(s"not a TxnTable: $path"))
        val clash = cols.map(_._1.toLowerCase)
          .intersect(cur.fieldNames.map(_.toLowerCase).toSeq)
        require(clash.isEmpty, s"addColumns: already present: $clash")
        org.apache.spark.sql.types.StructType(
          cur.fields ++ cols.map { case (n, dt) =>
            org.apache.spark.sql.types.StructField(n, dt, nullable = true,
              new org.apache.spark.sql.types.MetadataBuilder()
                .putString(PhysicalKey,
                  s"col-${java.util.UUID.randomUUID().toString.take(8)}")
                .build()) })
      })
  }

  /** ALTER TABLE DROP COLUMNS: metadata-only — no file is rewritten
    * (data files keep the bytes, so [[restore]] across the drop
    * recovers the column WITH its data); reads bind the narrowed
    * recorded schema, and subsequent rewrites progressively
    * materialize the drop. Refuses while a CHECK constraint mentions
    * the column (drop the constraint first — a silently unenforceable
    * CHECK is worse than an error). */
  def dropColumns(spark: SparkSession, path: String,
      names: Seq[String]): Long = {
    require(names.nonEmpty, "dropColumns: no columns given")
    commitSchemaChange(path, s"alter:drop:${names.mkString(",")}",
      () => {
        val cur = currentSchema(path).getOrElse(
          throw new IllegalArgumentException(s"not a TxnTable: $path"))
        val lower = names.map(_.toLowerCase).toSet
        val missing = lower -- cur.fieldNames.map(_.toLowerCase)
        require(missing.isEmpty, s"dropColumns: no such columns: $missing")
        require(lower.size < cur.fields.length,
          "dropColumns: cannot drop every column")
        constraints(path).foreach { case (n, sql) =>
          val words = sql.toLowerCase.split("[^a-z0-9_]+").toSet
          require(words.intersect(lower).isEmpty,
            s"dropColumns: CHECK constraint $n references a dropped " +
              s"column ($sql) — drop the constraint first")
        }
        org.apache.spark.sql.types.StructType(
          cur.fields.filterNot(f => lower(f.name.toLowerCase)))
      })
  }

  /** ALTER TABLE RENAME COLUMN — metadata-only via COLUMN MAPPING: the
    * field keeps its STABLE physical name (what every existing AND
    * future file stores — see [[writeDataPrepared]]/[[applyDv]]) and
    * the recorded schema carries the new logical name plus a
    * `graft.physical` key. No file is touched at any table size;
    * reads/writes/stats translate at the two mapping seams; time
    * travel to a pre-rename version shows the old name (each
    * snapshot's recorded schema is its own). Chained renames keep the
    * ORIGINAL physical name. Refused while a CHECK constraint
    * references the old name (its SQL would silently stop binding).
    * A change-data-feed diff ACROSS the rename boundary fails loudly
    * (SnapshotDiff requires identical payload column names on both
    * sides) — re-anchor incremental consumers after a rename. */
  def renameColumn(spark: SparkSession, path: String, from: String,
      to: String): Long = {
    require(from.nonEmpty && to.nonEmpty, "renameColumn: empty name")
    commitSchemaChange(path, s"alter:rename:$from:$to", () => {
      val cur = currentSchema(path).getOrElse(
        throw new IllegalArgumentException(s"not a TxnTable: $path"))
      val f = cur.fields.find(_.name.equalsIgnoreCase(from)).getOrElse(
        throw new IllegalArgumentException(
          s"renameColumn: no such column $from"))
      require(!cur.fields.exists(_.name.equalsIgnoreCase(to)),
        s"renameColumn: $to already exists")
      constraints(path).foreach { case (n, sql) =>
        val words = sql.toLowerCase.split("[^a-z0-9_]+").toSet
        require(!words.contains(from.toLowerCase),
          s"renameColumn: CHECK constraint $n references $from ($sql) — " +
            "drop the constraint first")
      }
      org.apache.spark.sql.types.StructType(cur.fields.map { g =>
        if (g.name.equalsIgnoreCase(from))
          org.apache.spark.sql.types.StructField(to, g.dataType, g.nullable,
            new org.apache.spark.sql.types.MetadataBuilder()
              .withMetadata(g.metadata)
              .putString(PhysicalKey, physicalFieldName(g)).build())
        else g
      })
    })
  }

  /** ALTER TABLE ALTER COLUMN c TYPE <wider> — TYPE WIDENING as a
    * METADATA-ONLY commit: the one schema evolution a growing table
    * always hits (a key outgrows int, a measure outgrows float) that
    * would otherwise force a full CTAS rewrite at 100 TB. The recorded
    * schema's field gets the widened logical type; NO file is touched:
    *
    *  - READS: the pinned-schema scan binds the widened type over old
    *    files' narrower physical type — Spark's parquet readers
    *    (vectorized and row-based) upcast int32→long / float→double
    *    natively, filters included, so mixed-generation snapshots scan
    *    in one job with zero plan overhead. Time travel to a pre-widen
    *    version binds THAT snapshot's own (narrow) schema.
    *  - WRITES: every post-widen append/rewrite validates against the
    *    widened schema ([[checkSchema]]) and stores the wide physical
    *    type; rewrites progressively materialize the widening.
    *  - STATS/PRUNING: logged long bounds are stored as Long for ALL
    *    integer widths (the footer harvest widens at write time), so
    *    [[statsIndexFor]]/[[countRange]] read old adds' bounds
    *    unchanged in the widened space — pruning and metadata COUNTs
    *    stay zero-footer across generations.
    *
    * Only value-preserving widenings are accepted (byte→short/int/
    * long, short→int/long, int→long/double, float→double);
    * narrowing and lossy/incompatible casts (long→int, long→double,
    * string→anything) are refused loudly — they would need a real
    * rewrite and a data-loss decision the engine must not make
    * silently. The metadata commit makes every in-flight rewrite
    * rebase-abort, like any ALTER. */
  def widenColumnType(spark: SparkSession, path: String, column: String,
      to: org.apache.spark.sql.types.DataType): Long = {
    import org.apache.spark.sql.types._
    commitSchemaChange(path,
      s"alter:widen:$column:${to.simpleString}", () => {
        val cur = currentSchema(path).getOrElse(
          throw new IllegalArgumentException(s"not a TxnTable: $path"))
        val f = cur.fields.find(_.name.equalsIgnoreCase(column)).getOrElse(
          throw new IllegalArgumentException(
            s"widenColumnType: no such column $column"))
        require(wideningTargets(f.dataType)(to),
          s"widenColumnType: ${f.dataType.simpleString} -> " +
            s"${to.simpleString} is not a value-preserving widening " +
            "(supported: byte/short/int up the integer chain, " +
            "int->double, float->double) — narrowing or converting " +
            "needs an explicit rewrite (CTAS with a cast)")
        StructType(cur.fields.map(g =>
          if (g.name.equalsIgnoreCase(column)) g.copy(dataType = to)
          else g))
      })
  }

  /** Value-preserving widening targets (shared by the top-level and
    * struct-leaf ALTER COLUMN TYPE paths). int→double is exact: every
    * int32 is representable in a 53-bit mantissa; long→double is NOT
    * (precision loss above 2^53) and stays refused. */
  private def wideningTargets(dt: org.apache.spark.sql.types.DataType)
      : Set[org.apache.spark.sql.types.DataType] = {
    import org.apache.spark.sql.types._
    dt match {
      case ByteType => Set(ShortType, IntegerType, LongType)
      case ShortType => Set(IntegerType, LongType)
      case IntegerType => Set(LongType, DoubleType)
      case FloatType => Set(DoubleType)
      case _ => Set.empty
    }
  }

  // -- nested-field ALTER ---------------------------------------------------
  //
  // add/drop/widen a STRUCT LEAF as the same metadata-only schema
  // commits the top-level ALTERs use: the pinned-schema read binds
  // each snapshot's own nested shape, old files null-fill an added
  // leaf and upcast a widened one natively (Spark's parquet readers
  // clip the requested struct to the file's and widen int32→int64 at
  // any nesting), and NO file is touched at any table size. Leaves
  // keep their logical names physically (nested column mapping is not
  // threaded through the rename seams), so re-ADDING a previously
  // dropped leaf name is REFUSED from log history — the old bytes
  // still sitting in files must not silently resurrect.

  private def splitDotted(dotted: String): Seq[String] = {
    val parts = dotted.split('.').toSeq.map(_.trim).filter(_.nonEmpty)
    require(parts.length >= 2,
      s"expected a dotted struct path (parent.leaf), got $dotted")
    parts
  }

  /** Rebuild `schema` with the struct at `parts.init` transformed by
    * `leafOp` (loud when a segment is missing or not a struct). */
  private def transformStructPath(
      schema: org.apache.spark.sql.types.StructType, parts: Seq[String],
      leafOp: org.apache.spark.sql.types.StructType =>
        org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    if (parts.isEmpty) leafOp(schema)
    else {
      val hit = schema.fields.exists(_.name.equalsIgnoreCase(parts.head))
      require(hit, s"no such column ${parts.head}")
      StructType(schema.fields.map { f =>
        if (!f.name.equalsIgnoreCase(parts.head)) f
        else f.dataType match {
          case st: StructType =>
            f.copy(dataType = transformStructPath(st, parts.tail, leafOp))
          case other => throw new IllegalArgumentException(
            s"${f.name} is ${other.simpleString}, not a struct — " +
              "nested ALTER addresses struct leaves only")
        }
      })
    }
  }

  /** Every leaf name (lowercased) EVER recorded at the dotted parent
    * path across the readable log — the nested resurrection fence. */
  private def historicalLeafNames(path: String, parent: Seq[String])
      : Set[String] = {
    import org.apache.spark.sql.types._
    def leaves(s: StructType, parts: Seq[String]): Seq[String] =
      if (parts.isEmpty) s.fieldNames.toSeq.map(_.toLowerCase)
      else s.fields.find(_.name.equalsIgnoreCase(parts.head))
        .map(_.dataType).collect { case st: StructType =>
          leaves(st, parts.tail) }.getOrElse(Nil)
    val top = currentVersion(path)
    (earliestVersion(path) to top).flatMap { v =>
      readCommit(path, v).schema.toSeq.flatMap(js =>
        leaves(DataType.fromJson(js).asInstanceOf[StructType], parent))
    }.toSet
  }

  /** ALTER TABLE ADD COLUMNS (parent.leaf type): metadata-only; old
    * files null-fill the leaf at read time. A leaf name that EVER
    * existed at this path is refused (its bytes may still sit in live
    * files — re-binding them would resurrect dropped data; a CTAS is
    * the explicit way back). */
  def addStructField(spark: SparkSession, path: String, dotted: String,
      dt: org.apache.spark.sql.types.DataType): Long = {
    val parts = splitDotted(dotted)
    commitSchemaChange(path, s"alter:addnested:$dotted", () => {
      val cur = currentSchema(path).getOrElse(
        throw new IllegalArgumentException(s"not a TxnTable: $path"))
      val leaf = parts.last
      require(!historicalLeafNames(path, parts.init)
          .contains(leaf.toLowerCase),
        s"addStructField: $dotted existed in a previous schema " +
          "generation — old files may still hold its bytes, and " +
          "re-binding them would resurrect dropped data. Use a CTAS " +
          "to materialize the shape you want.")
      transformStructPath(cur, parts.init, st => {
        require(!st.fieldNames.exists(_.equalsIgnoreCase(leaf)),
          s"addStructField: $dotted already exists")
        org.apache.spark.sql.types.StructType(st.fields :+
          org.apache.spark.sql.types.StructField(leaf, dt,
            nullable = true))
      })
    })
  }

  /** ALTER TABLE ALTER COLUMN parent.leaf TYPE <wider>: the same
    * value-preserving widening matrix as the top-level form, applied
    * to a struct leaf — metadata-only, mixed generations upcast at
    * scan time. */
  def widenStructFieldType(spark: SparkSession, path: String,
      dotted: String, to: org.apache.spark.sql.types.DataType): Long = {
    val parts = splitDotted(dotted)
    commitSchemaChange(path,
      s"alter:widennested:$dotted:${to.simpleString}", () => {
        val cur = currentSchema(path).getOrElse(
          throw new IllegalArgumentException(s"not a TxnTable: $path"))
        transformStructPath(cur, parts.init, st => {
          val leaf = st.fields.find(_.name.equalsIgnoreCase(parts.last))
            .getOrElse(throw new IllegalArgumentException(
              s"widenStructFieldType: no such leaf $dotted"))
          require(wideningTargets(leaf.dataType)(to),
            s"widenStructFieldType: ${leaf.dataType.simpleString} -> " +
              s"${to.simpleString} is not a value-preserving widening")
          org.apache.spark.sql.types.StructType(st.fields.map(g =>
            if (g.name.equalsIgnoreCase(parts.last)) g.copy(dataType = to)
            else g))
        })
      })
  }

  /** ALTER TABLE DROP COLUMNS (parent.leaf): metadata-only (bytes
    * stay; restore across the drop recovers the leaf with its data).
    * Refused while a CHECK constraint references the leaf, and for a
    * struct's last leaf (an empty struct cannot be written). */
  def dropStructField(spark: SparkSession, path: String,
      dotted: String): Long = {
    val parts = splitDotted(dotted)
    commitSchemaChange(path, s"alter:dropnested:$dotted", () => {
      val cur = currentSchema(path).getOrElse(
        throw new IllegalArgumentException(s"not a TxnTable: $path"))
      val leaf = parts.last.toLowerCase
      constraints(path).foreach { case (n, sql) =>
        val words = sql.toLowerCase.split("[^a-z0-9_]+").toSet
        require(!words.contains(leaf),
          s"dropStructField: CHECK constraint $n references $leaf " +
            s"($sql) — drop the constraint first")
      }
      transformStructPath(cur, parts.init, st => {
        require(st.fieldNames.exists(_.equalsIgnoreCase(parts.last)),
          s"dropStructField: no such leaf $dotted")
        require(st.fields.length > 1,
          s"dropStructField: cannot drop a struct's last leaf " +
            s"($dotted) — drop the whole column instead")
        org.apache.spark.sql.types.StructType(
          st.fields.filterNot(_.name.equalsIgnoreCase(parts.last)))
      })
    })
  }

  /** A metadata-only commit that records a new schema — the ALTER
    * carrier. The schema is built FRESH on every attempt (a lost race
    * to another ALTER must not clobber it with a stale base); the
    * schema it carries makes every in-flight rewrite's rebase abort
    * (the ConcurrentMetadataChange rule), and retrying appends
    * re-validate against it ([[checkSchema]] on the fresh head). */
  private def commitSchemaChange(path: String, op: String,
      build: () => org.apache.spark.sql.types.StructType,
      maxAttempts: Int = 20): Long = {
    var attempt = 0
    while (true) {
      val v = currentVersion(path) + 1
      require(v > 0, s"commitSchemaChange: not a table: $path")
      val schema = build()
      preCommitHook()
      try {
        tryCommit(path, TxnCommit(v, op, Nil, Nil, Some(schema.json)))
        return v
      } catch {
        case e: TxnConflictException =>
          if (attempt >= maxAttempts) throw e
          attempt += 1
      }
    }
    -1L // unreachable
  }

  /** Snapshot read with FILE-level stats pruning: rows of the snapshot
    * whose `column` lies in [lo, hi], scanning ONLY live files whose
    * parquet footer [min, max] intersects the range. Row-group pushdown
    * inside kept files still applies afterwards — this prunes BEFORE
    * the scan is planned, so skipped files are never opened (on an
    * object store: never even GET) and task count is proportional to
    * matching files. Pair with [[compactClustered]], which is what
    * makes the per-file ranges tight. Files without long-typed stats
    * for `column` are conservatively kept; an empty kept set returns an
    * empty frame with the snapshot's schema.
    */
  /** The skipping index for `columns` over the snapshot's live files —
    * resolved from the COMMIT LOG's write-time stats when the adds
    * carry them (metadata-only: ZERO parquet footer opens), falling
    * back to footer reads ONLY for files written before stats-in-log.
    * Same output shape as [[graft.crawler.SkippingIndex.buildForFiles]]
    * (`file, row_count, mins, maxs`), so [[readPruned]]'s selection is
    * unchanged. A column a file's stats ATTEMPTED but has no bounds
    * for (no usable footer stats) gets null bounds without a footer
    * read — the footer would find nothing either; a column OUTSIDE the
    * attempted set (schema drift across generations) footer-reads that
    * file. At 100 TB the log path replaces millions of per-query
    * object-store footer GETs with the metadata the planner already
    * holds. */
  private def statsIndexFor(spark: SparkSession, path: String,
      asOf: Long, logicalColumns: Seq[String]): DataFrame = {
    import spark.implicits._
    val top = currentVersion(path)
    val upTo = if (asOf < 0) top else asOf
    // stats (log AND footers) are keyed by PHYSICAL names
    val columns = logicalColumns.map(physicalColName(path, upTo, _))
    val ai = addsIndex(path, upTo)
    val meta = Seq.newBuilder[(String, Long, Seq[Option[Long]], Seq[Option[Long]])]
    val fallback = Seq.newBuilder[String]
    snapshotFiles(path, upTo).foreach { f =>
      val abs = localRoot(path).resolve(f).toString
      ai.get(f).flatMap(_.stats).flatMap(parseAddStats) match {
        case Some(st) if columns.forall(st.cols.contains) =>
          meta += ((abs, ai(f).rows,
            columns.map(c => st.l.get(c).map(_._1)),
            columns.map(c => st.l.get(c).map(_._2))))
        case _ => fallback += abs
      }
    }
    val metaDf = meta.result().toDF("file", "row_count", "mins", "maxs")
    val fb = fallback.result()
    if (fb.isEmpty) metaDf
    else metaDf.unionByName(
      graft.crawler.SkippingIndex.buildForFiles(spark, fb, columns))
  }

  /** [[statsIndexFor]]'s STRING sibling (`file, row_count, mn, mx` —
    * the [[graft.crawler.SkippingIndex.buildStringIndex]] shape). A
    * string bound the writer dropped (raw binary, or longer than
    * `MaxLoggedStringBound`) reads as null bounds — the file is
    * conservatively kept, never footer-read. */
  private def stringStatsIndexFor(spark: SparkSession, path: String,
      asOf: Long, logicalColumn: String): DataFrame = {
    import spark.implicits._
    val top = currentVersion(path)
    val upTo = if (asOf < 0) top else asOf
    // stats (log AND footers) are keyed by PHYSICAL names
    val column = physicalColName(path, upTo, logicalColumn)
    val ai = addsIndex(path, upTo)
    val meta = Seq.newBuilder[(String, Long, Option[String], Option[String])]
    val fallback = Seq.newBuilder[String]
    snapshotFiles(path, upTo).foreach { f =>
      val abs = localRoot(path).resolve(f).toString
      ai.get(f).flatMap(_.stats).flatMap(parseAddStats) match {
        case Some(st) if st.cols.contains(column) =>
          meta += ((abs, ai(f).rows,
            st.s.get(column).map(_._1), st.s.get(column).map(_._2)))
        case _ => fallback += abs
      }
    }
    val metaDf = meta.result().toDF("file", "row_count", "mn", "mx")
    val fb = fallback.result()
    if (fb.isEmpty) metaDf
    else metaDf.unionByName(
      graft.crawler.SkippingIndex.buildStringIndex(spark, fb, column))
  }

  def readPruned(spark: SparkSession, path: String, column: String,
      lo: Long, hi: Long, asOf: Long = -1L): DataFrame = {
    val full = read(spark, path, asOf) // fence checks + mergeSchema logic
    val pred = physicalBetween(full, column, lo, hi)
    // Index ONLY the resolved live snapshot files (dead/orphaned
    // siblings under data/ never touched), from the commit log's
    // write-time stats — footers opened only for pre-stats adds.
    val idx = statsIndexFor(spark, path, asOf, Seq(column))
    val kept = graft.crawler.SkippingIndex.selectFiles(idx, 0, lo, hi)
    if (kept.isEmpty) full.filter(lit(false))
    else applyDv(spark, path, asOf,
      snapshotReader(spark, path, asOf).parquet(kept: _*),
      keepFname = false).filter(pred)
  }

  /** [[readPruned]] for a SET of point values instead of one range:
    * rows of the snapshot with `column` ∈ `values`, scanning only live
    * files whose footer [min, max] contains at least one of the values.
    * The footer index is built ONCE for all values (not once per value)
    * — this is the serving-read shape for bucket-hashed layouts, where
    * a query's keys map to a scattered set of bucket ids rather than a
    * contiguous range (TxnIndex). Files without long-typed stats for
    * `column` are conservatively kept. */
  /** COUNT(rows with `column` ∈ [lo, hi]) planned from the COMMIT LOG:
    * a file whose logged bounds lie fully inside the range contributes
    * (rows − nulls) with ZERO data I/O, a disjoint file contributes
    * nothing, and only BOUNDARY files (bounds straddling an endpoint),
    * files with unknown null counts, DV-carrying files, and stats-less
    * files are scanned — with the residual pushed into their row
    * groups. Returns (count, filesScanned, filesTotal). The null-count
    * term is what makes this exact, not heuristic: bounds cover only
    * non-null values, and "n" in the logged stats is recorded only
    * when every row group set num-nulls. At 100 TB this is the
    * difference between a metadata-only answer and a full-column scan
    * for the dashboard-style range counts every pipeline polls.
    * Bounds live in the column's physical int64 space (micros /
    * unix-days — [[physicalBetween]]), like every pruned read. */
  def countRange(spark: SparkSession, path: String, column: String,
      lo: Long, hi: Long, asOf: Long = -1L): (Long, Int, Int) = {
    // metadata-only planning: fences + RECORDED schema, never a
    // DataFrame over the full file list (building one stats every
    // file — O(files) filesystem I/O the metadata path must not pay)
    val (schema, upTo) = snapshotSchemaFenced(spark, path, asOf)
    schema(column).dataType match {
      case org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.DateType |
           org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType => ()
      case dt => throw new IllegalArgumentException(
        s"countRange: $column has non-integral type $dt (bounds live in " +
          "the physical int64 space)")
    }
    midReadHook()
    val physCol = physicalColName(path, upTo, column)
    val ai = addsIndex(path, upTo)
    val dvNames = snapshotDvs(path, upTo).keySet.map(_.split('/').last)
    var metaCount = 0L
    var total = 0
    val scan = Seq.newBuilder[String]
    snapshotFiles(path, upTo).foreach { f =>
      total += 1
      val abs = localRoot(path).resolve(f).toString
      val st = ai.get(f).flatMap(_.stats).flatMap(parseAddStats)
      val rows = ai.get(f).map(_.rows).getOrElse(0L)
      val hasDv = dvNames.contains(f.split('/').last)
      val b = st.flatMap(_.l.get(physCol))
      val nc = st.flatMap(_.n.get(physCol))
      if (b.exists { case (mn, mx) => mx < lo || mn > hi }) {
        // disjoint: 0 matches — a DV only removes rows, so it stays 0
      } else if (hasDv) scan += abs
      else (b, nc) match {
        case (Some((mn, mx)), Some(n)) if mn >= lo && mx <= hi =>
          metaCount += rows - n // fully inside: every non-null row hits
        case (None, Some(n)) if st.nonEmpty && n == rows =>
          () // all-null column: no row can match a range
        case _ => scan += abs // boundary / unknown nulls / voided bounds
      }
    }
    val scanFiles = scan.result()
    // scan half pinned to the SAME resolved snapshot as the metadata
    // half (upTo, not the raw asOf): a commit landing between the two
    // resolutions (e.g. a MOR delete adding a DV) must not mix
    // snapshots — metadata counted at upTo, boundary files
    // DV-subtracted at a newer head — or the documented-exact count
    // is wrong under concurrency.
    val scanned =
      if (scanFiles.isEmpty) 0L
      else applyDv(spark, path, upTo,
        spark.read.schema(physicalSchema(schema)).parquet(scanFiles: _*),
        keepFname = false)
        .filter(physicalBetweenType(schema(column).dataType, column, lo, hi))
        .count()
    (metaCount + scanned, scanFiles.size, total)
  }

  /** Recorded snapshot schema + resolved version, with [[read]]'s asOf
    * fences — schema resolution from the LOG (checkpoint-amortized),
    * zero file listings; pre-schema-era tables (none in practice) fall
    * back to one reader-based resolution. */
  private def snapshotSchemaFenced(spark: SparkSession, path: String,
      asOf: Long): (org.apache.spark.sql.types.StructType, Long) = {
    if (asOf >= 0) {
      val earliest = earliestVersion(path)
      require(asOf >= earliest,
        s"version $asOf was vacuumed away (earliest readable: $earliest)")
    }
    val upTo = if (asOf < 0) currentVersion(path) else asOf
    val schema = schemaInfo(path, upTo)._2 match {
      case Some(js) => org.apache.spark.sql.types.DataType.fromJson(js)
        .asInstanceOf[org.apache.spark.sql.types.StructType]
      case None => read(spark, path, asOf).schema
    }
    (schema, upTo)
  }

  /** Global (min, max) of `column` in the physical int64 space, planned
    * from the commit log: clean stats-carrying files contribute their
    * logged bounds driver-side; only DV-carrying and stats-less files
    * are scanned (a DV may have deleted the extreme row). Returns
    * (min, max, filesScanned, filesTotal) — None/None for an empty or
    * all-null column. Integral, date, and timestamp columns only. */
  def minMaxOf(spark: SparkSession, path: String, column: String,
      asOf: Long = -1L): (Option[Long], Option[Long], Int, Int) = {
    val (schema, upTo) = snapshotSchemaFenced(spark, path, asOf)
    import org.apache.spark.sql.types._
    val phys = schema(column).dataType match {
      case TimestampType => unix_micros(col(column))
      case DateType => unix_date(col(column)).cast("long")
      case ByteType | ShortType | IntegerType | LongType =>
        col(column).cast("long")
      case dt => throw new IllegalArgumentException(
        s"minMaxOf: $column has non-integral type $dt")
    }
    midReadHook()
    val physCol = physicalColName(path, upTo, column)
    val ai = addsIndex(path, upTo)
    val dvNames = snapshotDvs(path, upTo).keySet.map(_.split('/').last)
    var mn = Option.empty[Long]
    var mx = Option.empty[Long]
    var total = 0
    val scan = Seq.newBuilder[String]
    snapshotFiles(path, upTo).foreach { f =>
      total += 1
      val abs = localRoot(path).resolve(f).toString
      val st = ai.get(f).flatMap(_.stats).flatMap(parseAddStats)
      val rows = ai.get(f).map(_.rows).getOrElse(0L)
      val hasDv = dvNames.contains(f.split('/').last)
      st.flatMap(_.l.get(physCol)) match {
        case Some((fMn, fMx)) if !hasDv =>
          mn = Some(mn.fold(fMn)(math.min(_, fMn)))
          mx = Some(mx.fold(fMx)(math.max(_, fMx)))
        case None if !hasDv &&
            st.exists(_.n.get(physCol).contains(rows)) =>
          () // all-null column in this file: contributes no extreme
        case _ => scan += abs
      }
    }
    val scanFiles = scan.result()
    // same-snapshot pin as countRange: DV subtraction at upTo, never
    // at a head that advanced after the metadata half resolved
    if (scanFiles.nonEmpty) {
      val r = applyDv(spark, path, upTo,
        spark.read.schema(physicalSchema(schema)).parquet(scanFiles: _*),
        keepFname = false)
        .agg(min(phys), max(phys)).head()
      if (!r.isNullAt(0)) {
        val (sMn, sMx) = (r.getLong(0), r.getLong(1))
        mn = Some(mn.fold(sMn)(math.min(_, sMn)))
        mx = Some(mx.fold(sMx)(math.max(_, sMx)))
      }
    }
    (mn, mx, scanFiles.size, total)
  }

  def readPrunedIn(spark: SparkSession, path: String, column: String,
      values: Seq[Long], asOf: Long = -1L): DataFrame = {
    val full = read(spark, path, asOf)
    val vs = values.distinct
    if (vs.isEmpty) return full.filter(lit(false))
    // The intersect stays a DATAFRAME filter — only the KEPT file
    // names reach the driver (they become the scan's file set, the
    // same driver state any scan holds); full per-file stats never
    // funnel through one thread, and past SkippingIndex's threshold
    // the footer reads themselves fan out as a job. Per file the
    // values probe is a higher-order `exists` over the sorted literal
    // array — distributed, and short-circuiting per Spark's exists
    // semantics. Null bounds keep the file, never skip it.
    val sortedVals = typedlit(vs.sorted)
    val kept = statsIndexFor(spark, path, asOf, Seq(column))
      .select(col("file"), col("mins").getItem(0).as("mn"),
        col("maxs").getItem(0).as("mx"))
      .filter(col("mn").isNull || col("mx").isNull ||
        exists(sortedVals, v => v >= col("mn") && v <= col("mx")))
      .select(col("file")).collect().map(_.getString(0)).toSeq
    // empty kept set → a ZERO-file frame (not full.filter(false)), so
    // df.inputFiles honestly reports what a caller's scan would touch
    if (kept.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], full.schema)
    else applyDv(spark, path, asOf,
      snapshotReader(spark, path, asOf).parquet(kept: _*),
      keepFname = false).filter(col(column).isInCollection(vs))
  }

  /** [[readPruned]] for STRING columns: rows with `column` ∈ [lo, hi]
    * under binary-lexicographic order — the SAME order parquet's UTF8
    * footer stats and Spark's string comparison both use, so the
    * file-level prune and the residual predicate can never disagree.
    * Same contract as the long-typed reads: files without string stats
    * are conservatively kept, the intersect is a DataFrame filter,
    * only kept file NAMES are collected, and an empty kept set returns
    * a zero-file frame. Pair with a `createClustered`/
    * `compactClustered` layout leading on the string column. */
  def readPrunedString(spark: SparkSession, path: String, column: String,
      lo: String, hi: String, asOf: Long = -1L): DataFrame = {
    val full = read(spark, path, asOf)
    val kept = stringStatsIndexFor(spark, path, asOf, column)
      .filter(col("mn").isNull || col("mx").isNull ||
        (col("mn") <= hi && col("mx") >= lo))
      .select(col("file")).collect().map(_.getString(0)).toSeq
    val pred = col(column).between(lit(lo), lit(hi))
    if (kept.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], full.schema)
    else applyDv(spark, path, asOf,
      snapshotReader(spark, path, asOf).parquet(kept: _*),
      keepFname = false).filter(pred)
  }

  /** [[readPrunedIn]] for STRING columns: rows with `column` ∈ `values`,
    * scanning only live files whose string bounds contain at least one
    * of the values — the serving shape for domain/source-keyed reads
    * (`source IN (...)`) over a string-clustered layout. Log-stats-
    * first like every pruned read; files without string bounds are
    * conservatively kept. */
  def readPrunedInString(spark: SparkSession, path: String,
      column: String, values: Seq[String], asOf: Long = -1L): DataFrame = {
    val full = read(spark, path, asOf)
    val vs = values.distinct
    if (vs.isEmpty) return full.filter(lit(false))
    val sortedVals = typedlit(vs.sorted)
    val kept = stringStatsIndexFor(spark, path, asOf, column)
      .filter(col("mn").isNull || col("mx").isNull ||
        exists(sortedVals, v => v >= col("mn") && v <= col("mx")))
      .select(col("file")).collect().map(_.getString(0)).toSeq
    val pred = col(column).isInCollection(vs)
    if (kept.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], full.schema)
    else applyDv(spark, path, asOf,
      snapshotReader(spark, path, asOf).parquet(kept: _*),
      keepFname = false).filter(pred)
  }

  // -- per-file BLOOM skipping ----------------------------------------------
  //
  // Point lookups on a HIGH-CARDINALITY column the table is NOT
  // clustered on are the one read shape log min/max stats cannot
  // prune: when every file's range covers the probe value, range
  // pruning keeps everything and a single-key lookup scans the whole
  // table. Per-FILE Bloom filters close that gap (the lakehouse bloom
  // index design; Bloom 1970): one build pass records, per (file,
  // column), a filter sized to the file's logged row count, persisted
  // as rows of a sibling TxnTable (`<table>__bloom`) — distributed
  // metadata, never a monolithic driver blob. Because data files are
  // IMMUTABLE, a file's bloom can never go stale: churn only REPLACES
  // files, the replacements simply lack blooms (conservatively kept)
  // until the next build, and the build is incremental BY CONSTRUCTION
  // — it scans exactly the live (file, column) pairs the aux table
  // does not cover yet. Probe-time pruning is distributed (the filters
  // deserialize and probe inside tasks; only kept file NAMES reach the
  // driver, like every pruned read here) and footer-free.

  private[graft] def bloomPath(path: String): String = path + "__bloom"

  /** Evidence hook: the files the last [[computeBloom]] actually
    * scanned — specs pin the incremental top-up contract with it. */
  @volatile private[graft] var lastBloomBuiltFiles: Seq[String] = Nil

  private def bloomBytes(b: org.apache.spark.util.sketch.BloomFilter)
      : Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    b.writeTo(bos); bos.toByteArray
  }

  /** Build per-file Bloom filters for `columns` (integral or string)
    * over every live file the aux table does not cover yet; appends
    * the new (file, col, bloom) rows in ONE commit. Returns the aux
    * table's version (-1 when there was nothing to build and no aux
    * exists). Integral values hash through their Long form, so the
    * probe side is width-independent. */
  def computeBloom(spark: SparkSession, path: String,
      columns: Seq[String], fpp: Double = 0.01): Long = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType, StringType}
    import spark.implicits._
    require(columns.nonEmpty, "computeBloom: no columns given")
    require(fpp > 0 && fpp < 0.5, s"fpp must be in (0, 0.5), got $fpp")
    val top = currentVersion(path)
    require(top >= 0, s"computeBloom: not a TxnTable: $path")
    val schema = read(spark, path, top).schema
    val cols = columns.map(_.trim).filter(_.nonEmpty)
    val fields = cols.map(c => schema.fields
      .find(_.name.equalsIgnoreCase(c)).getOrElse(
        throw new IllegalArgumentException(
          s"computeBloom: no column $c in $path")))
    fields.foreach(f => require(Seq(ByteType, ShortType, IntegerType,
      LongType, StringType).contains(f.dataType),
      s"computeBloom covers integral and string columns, got " +
        s"${f.name}: ${f.dataType.simpleString}"))
    val names = fields.map(_.name) // canonical case
    val bp = bloomPath(path)
    val have: Set[(String, String)] =
      if (currentVersion(bp) < 0) Set.empty
      else read(spark, bp).select(col("file"), col("col")).collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
    val live = snapshotFiles(path, top)
    val work: Set[(String, String)] = (for {
      f <- live; c <- names if !have((f, c)) } yield (f, c)).toSet
    val files = work.map(_._1).toSeq.sorted
    lastBloomBuiltFiles = files
    if (files.isEmpty)
      return math.max(-1L, currentVersion(bp))
    val ai = addsIndex(path, top)
    // basename → (add name, expected items): part files carry UUIDs,
    // so basenames are unique within a table (the DV machinery's
    // standing assumption)
    val byBase: Map[String, (String, Long)] = files.map(f =>
      f.split('/').last -> (f, math.max(1L, ai(f).rows))).toMap
    val isStr: IndexedSeq[Boolean] =
      fields.map(_.dataType == StringType).toIndexedSeq
    val phys = names.map(physicalColName(path, top, _))
    val selects = col("_metadata.file_path").as("__fp") +:
      phys.zipWithIndex.map { case (p, i) =>
        if (isStr(i)) col(p) else col(p).cast("long") }
    val scan = snapshotReader(spark, path, top)
      .parquet(files.map(f => localRoot(path).resolve(f).toString): _*)
      .select(selects: _*)
    val n = names.length
    val fppB = fpp
    // partial blooms per (file, column) inside each task, merged per
    // file across tasks (filters built with identical sizing merge
    // exactly — the merge is a bitwise OR, so it is commutative,
    // associative, and order-independent); only the serialized
    // filters shuffle, never data rows. combineByKey rather than
    // groupByKey+mapGroups (guide §2.3 "aggregate before you
    // shuffle"): partials union map-side when a map partition holds
    // several for one key, and the reduce side folds each incoming
    // partial into ONE accumulator per key — streaming merge in
    // O(filter) memory instead of materializing every task's partial
    // for a file at once.
    val merged = scan.mapPartitions { it =>
      val local = scala.collection.mutable.Map[(String, Int),
        org.apache.spark.util.sketch.BloomFilter]()
      it.foreach { row =>
        val base = row.getString(0).split('/').last
        var i = 0
        while (i < n) {
          // the filter is created even for an all-null column — an
          // empty bloom prunes such files on every probe, and the
          // pair counts as covered for future top-ups
          val b = local.getOrElseUpdate((base, i),
            org.apache.spark.util.sketch.BloomFilter.create(
              byBase(base)._2, fppB))
          if (!row.isNullAt(i + 1)) {
            if (isStr(i)) b.putString(row.getString(i + 1))
            else b.putLong(row.getLong(i + 1))
          }
          i += 1
        }
      }
      local.iterator.map { case ((f, i), b) => ((f, i), bloomBytes(b)) }
    }.rdd.combineByKey(
      (b: Array[Byte]) => org.apache.spark.util.sketch.BloomFilter
        .readFrom(new java.io.ByteArrayInputStream(b)),
      (acc: org.apache.spark.util.sketch.BloomFilter, b: Array[Byte]) =>
        acc.mergeInPlace(org.apache.spark.util.sketch.BloomFilter
          .readFrom(new java.io.ByteArrayInputStream(b))),
      (a: org.apache.spark.util.sketch.BloomFilter,
       b: org.apache.spark.util.sketch.BloomFilter) => a.mergeInPlace(b)
    ).map { case ((f, i), b) => (byBase(f)._1, names(i), bloomBytes(b)) }
      .toDF("file", "col", "bloom")
    // a ZERO-ROW file never appears in the scan: cover it from log
    // metadata alone (its bloom is trivially empty)
    val zero = work.filter { case (f, _) => ai(f).rows == 0L }
      .toSeq.sorted.map { case (f, c) =>
        (f, c, bloomBytes(org.apache.spark.util.sketch.BloomFilter
          .create(1L, fppB)))
      }
    val outDf =
      if (zero.isEmpty) merged
      else merged.unionByName(zero.toDF("file", "col", "bloom"))
    val op = s"bloom:${names.mkString(",")}"
    if (currentVersion(bp) < 0) create(spark, bp, outDf, op = op)
    else append(spark, bp, outDf, op = op)
  }

  /** Point lookup through the per-file Bloom index: rows with `column`
    * ∈ `values`, scanning only files whose bloom might contain one of
    * the probes (files without a bloom row — new since the last build,
    * or no index at all — are conservatively kept; a false positive
    * costs one extra file scan, never a wrong row: the exact predicate
    * always re-applies). DV-aware, zero footer reads, and the probe
    * itself runs inside tasks — only kept file names reach the
    * driver. */
  def readPrunedBloom(spark: SparkSession, path: String,
      column: String, values: Seq[Long], asOf: Long = -1L): DataFrame =
    readPrunedBloomImpl(spark, path, column, asOf,
      values.distinct.map(v => v: Any),
      col(column).isInCollection(values.distinct),
      (b, vs) => vs.exists(v =>
        b.mightContainLong(v.asInstanceOf[Long])))

  /** [[readPrunedBloom]] for STRING columns. */
  def readPrunedBloomString(spark: SparkSession, path: String,
      column: String, values: Seq[String], asOf: Long = -1L): DataFrame =
    readPrunedBloomImpl(spark, path, column, asOf,
      values.distinct.map(v => v: Any),
      col(column).isInCollection(values.distinct),
      (b, vs) => vs.exists(v =>
        b.mightContainString(v.asInstanceOf[String])))

  /** Evidence hook: how many file names the last bloom probe job
    * returned to the driver — the probe runs inside tasks and only
    * names of files the index can EXCLUDE come back (≤ live files;
    * rows for dead files and other columns are dropped executor-side,
    * never collected). */
  @volatile private[graft] var lastBloomProbeCollected: Int = -1

  private def readPrunedBloomImpl(spark: SparkSession, path: String,
      column: String, asOf: Long, vs: Seq[Any], pred: Column,
      probe: (org.apache.spark.util.sketch.BloomFilter, Seq[Any]) => Boolean)
      : DataFrame = {
    import spark.implicits._
    val full = read(spark, path, asOf)
    if (vs.isEmpty) return full.filter(lit(false))
    val bp = bloomPath(path)
    if (currentVersion(bp) < 0) return full.filter(pred)
    val live = snapshotFiles(path, asOf)
    val colLc = column.toLowerCase
    // The probe runs inside tasks; only names of live files whose
    // bloom PROVES absence reach the driver (a file with no bloom row
    // — new since the last build, or a dead file's leftover row — is
    // conservatively kept / ignored without ever being collected).
    // kept = live \ excluded reproduces the verdict-map semantics
    // exactly: getOrElse(f, true) kept unindexed files, and an indexed
    // file was dropped iff its probe said definitely-absent.
    val liveSet = live.toSet
    val excluded: Set[String] = read(spark, bp)
      .filter(lower(col("col")) === colLc)
      .select(col("file"), col("bloom"))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.filter { case (f, bytes) =>
          liveSet.contains(f) && !probe(
            org.apache.spark.util.sketch.BloomFilter
              .readFrom(new java.io.ByteArrayInputStream(bytes)), vs)
        }.map(_._1)
      }.collect().toSet
    lastBloomProbeCollected = excluded.size
    val kept = live.filterNot(excluded)
    if (kept.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], full.schema)
    else applyDv(spark, path, asOf,
      snapshotReader(spark, path, asOf).parquet(
        kept.map(f => localRoot(path).resolve(f).toString): _*),
      keepFname = false).filter(pred)
  }

  /** MIXED-TYPE box read: one STRING range dimension conjoined with
    * any number of long/timestamp/date range dimensions — the box
    * shape a (source, n_chars)-style layout serves. The kept set is
    * the INTERSECTION of the per-type prunes (string bounds from the
    * string index, physical-int64 bounds from the long index — both
    * log-stats-first with per-file footer fallback), so the read is
    * ≤ every single-dimension prune; ONE scan of the intersection
    * with every residual predicate applied (and pushed into kept
    * files' row groups). Files without stats on a dimension are
    * conservatively kept for that dimension, like every pruned read. */
  def readPrunedBoxMixed(spark: SparkSession, path: String,
      strCol: String, strLo: String, strHi: String,
      dims: Seq[(String, Long, Long)], asOf: Long = -1L): DataFrame = {
    val full = read(spark, path, asOf)
    val keptStr = stringStatsIndexFor(spark, path, asOf, strCol)
      .filter(col("mn").isNull || col("mx").isNull ||
        (col("mn") <= strHi && col("mx") >= strLo))
      .select(col("file")).collect().map(_.getString(0)).toSet
    val keptLong =
      if (dims.isEmpty) keptStr
      else {
        val keepCond = dims.zipWithIndex.map { case ((_, lo, hi), i) =>
          val mn = col("mins").getItem(i)
          val mx = col("maxs").getItem(i)
          mn.isNull || mx.isNull || (mn <= hi && mx >= lo)
        }.reduce(_ && _)
        statsIndexFor(spark, path, asOf, dims.map(_._1))
          .filter(keepCond)
          .select(col("file")).collect().map(_.getString(0)).toSet
      }
    val kept = (keptStr intersect keptLong).toSeq.sorted
    val pred = dims.map { case (c, lo, hi) =>
      physicalBetween(full, c, lo, hi)
    }.foldLeft(col(strCol).between(lit(strLo), lit(strHi)))(_ && _)
    if (kept.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], full.schema)
    else applyDv(spark, path, asOf,
      snapshotReader(spark, path, asOf).parquet(kept: _*),
      keepFname = false).filter(pred)
  }

  /** The residual row predicate for a physical-int64 bound on `c`:
    * bounds live in the column's PHYSICAL footer-stats value space —
    * the plain value for integral columns, epoch MICROSECONDS for
    * timestamps (parquet TIMESTAMP(MICROS) is INT64). The timestamp
    * literal form keeps the predicate foldable, so it still pushes
    * into the parquet scan for row-group skipping inside kept files. */
  private def physicalBetween(df: DataFrame, c: String,
      lo: Long, hi: Long): Column =
    physicalBetweenType(df.schema(c).dataType, c, lo, hi)

  private def physicalBetweenType(
      dt: org.apache.spark.sql.types.DataType, c: String,
      lo: Long, hi: Long): Column =
    dt match {
      case org.apache.spark.sql.types.TimestampType =>
        col(c).between(timestamp_micros(lit(lo)), timestamp_micros(lit(hi)))
      case org.apache.spark.sql.types.DateType =>
        // parquet DATE is INT32 days since epoch — bounds are unix days;
        // toIntExact so an out-of-range bound fails loudly instead of
        // wrapping into a residual predicate that disagrees with the
        // file-level prune
        col(c).between(date_from_unix_date(lit(Math.toIntExact(lo))),
          date_from_unix_date(lit(Math.toIntExact(hi))))
      case _ => col(c).between(lo, hi)
    }

  /** [[readPruned]] in TWO dimensions — the serving read for
    * [[compactClustered]]'s z-ordered layout: rows with `colA` ∈
    * [loA, hiA] AND `colB` ∈ [loB, hiB], scanning only live files whose
    * footer boxes intersect the query box. A z-ordered file owns a
    * compact range in BOTH columns, so box pruning multiplies the two
    * dimensions' selectivities where single-column pruning gets only
    * one — the point of paying the z-order shuffle. Files missing
    * stats for either column are conservatively kept.
    *
    * Bounds are in each column's physical int64 space (micros for
    * timestamp columns — see [[physicalBetween]]), so a time-range ×
    * key box works the same as a key × key box. The box intersect is a
    * DataFrame filter; only kept file NAMES are collected. */
  def readPrunedBox(spark: SparkSession, path: String,
      colA: String, loA: Long, hiA: Long,
      colB: String, loB: Long, hiB: Long, asOf: Long = -1L): DataFrame =
    readPrunedBoxN(spark, path,
      Seq((colA, loA, hiA), (colB, loB, hiB)), asOf)

  /** The N-dimensional box read: rows with EVERY `(column, lo, hi)`
    * bound satisfied, scanning only live files whose footer ranges
    * intersect all of them — the serving read for [[compactClustered]]
    * (2-d) and [[compactClustered3]] (3-d) layouts, and for any
    * conjunction of range predicates over a clustered table. Bounds
    * live in each column's physical int64 space ([[physicalBetween]]);
    * files missing stats on a dimension are conservatively kept for
    * that dimension; the intersect is a DataFrame filter and only kept
    * file NAMES are collected. */
  def readPrunedBoxN(spark: SparkSession, path: String,
      dims: Seq[(String, Long, Long)], asOf: Long = -1L): DataFrame = {
    require(dims.nonEmpty, "at least one box dimension")
    val full = read(spark, path, asOf)
    val keepCond = dims.zipWithIndex.map { case ((_, lo, hi), i) =>
      val mn = col("mins").getItem(i)
      val mx = col("maxs").getItem(i)
      mn.isNull || mx.isNull || (mn <= hi && mx >= lo)
    }.reduce(_ && _)
    val kept = statsIndexFor(spark, path, asOf, dims.map(_._1))
      .filter(keepCond)
      .select(col("file")).collect().map(_.getString(0)).toSeq
    val pred = dims.map { case (c, lo, hi) =>
      physicalBetween(full, c, lo, hi)
    }.reduce(_ && _)
    if (kept.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], full.schema)
    else applyDv(spark, path, asOf,
      snapshotReader(spark, path, asOf).parquet(kept: _*),
      keepFname = false).filter(pred)
  }

  /** CHANGE DATA FEED between two readable versions: the keyed
    * row-level diff (insert/delete/update — [[graft.operators.
    * SnapshotDiff]] semantics, unchanged keys absent) computed from
    * ONLY the files that changed between the versions. An unchanged
    * file contributes identical rows to both sides and therefore no
    * diff row — so at 100 TB, where a day of commits touches ~1% of
    * files, this reads that 1% instead of two full snapshots (rows
    * carried through a rewrite appear on both sides and cancel as
    * `unchanged`, exactly as in the full diff — equality with the
    * full-snapshot diff is asserted in-run by the s17 gate). Requires
    * the table to be keyed on `keyCols` (≤ 1 row per key), the same
    * contract as SnapshotDiff itself. Schema-evolved tables diff under
    * each version's recorded schema; the payload columns must match.
    */
  /** [[diffVersions]] addressed by wall-clock instants ("what changed
    * between yesterday 09:00 and now") — both endpoints resolve
    * through [[versionAt]], same fences. */
  def diffBetweenTimestamps(spark: SparkSession, path: String,
      fromTs: Long, toTs: Long, keyCols: Seq[String]): DataFrame =
    diffVersions(spark, path, versionAt(path, fromTs),
      versionAt(path, toTs), keyCols)

  /** The row-level delta between two versions as two MULTISETS —
    * (removed rows, added rows, scoped absolute file paths): rows come
    * ONLY from files that left/entered the snapshot (or whose
    * deletion-vector assignment moved), each side with its version's
    * DV applied. KEY-FREE: an update surfaces as one removed plus one
    * added row — exactly what a fold-style consumer (count/sum/min/max
    * view maintenance) needs, with no row-identity contract. The keyed
    * [[diffVersions]]/[[diffVersionsImages]] ride on the same scoping.
    */
  def changedRowSides(spark: SparkSession, path: String, fromV: Long,
      toV: Long): (DataFrame, DataFrame, Set[String]) = {
    val top = currentVersion(path)
    val earliest = earliestVersion(path)
    require(fromV <= toV && toV <= top && fromV >= earliest,
      s"diffVersions: need $earliest <= fromV <= toV <= $top, " +
        s"got [$fromV, $toV]")
    val before = snapshotFiles(path, fromV)
    val after = snapshotFiles(path, toV)
    // a file carried by BOTH versions whose deletion-vector assignment
    // moved still changed logically (a dvdelete touched it): diff it on
    // both sides — each side's applyDv subtracts that version's DV, so
    // MOR-deleted rows surface as `delete` diff rows exactly like a
    // copy-on-write rewrite's
    val (dvB, dvA) = (snapshotDvs(path, fromV), snapshotDvs(path, toV))
    val dvChanged = before.toSet.intersect(after.toSet)
      .filter(f => dvB.get(f) != dvA.get(f))
    val removed = (before.toSet -- after.toSet) ++ dvChanged
    val added = (after.toSet -- before.toSet) ++ dvChanged
    def side(files: Set[String], v: Long): DataFrame =
      if (files.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          read(spark, path, v).schema)
      else applyDv(spark, path, v, snapshotReader(spark, path, v).parquet(
        files.toSeq.map(f => localRoot(path).resolve(f).toString): _*),
        keepFname = false)
    (side(removed, fromV), side(added, toV),
      (removed ++ added).map(f => localRoot(path).resolve(f).toString))
  }

  def diffVersions(spark: SparkSession, path: String, fromV: Long,
      toV: Long, keyCols: Seq[String]): DataFrame = {
    val (rm, ad, _) = changedRowSides(spark, path, fromV, toV)
    graft.operators.SnapshotDiff.diff(rm, ad, keyCols)
  }

  /** [[diffVersions]] with BOTH row images (`before`/`after` payload
    * structs — [[graft.operators.SnapshotDiff.diffImages]]): the CDF
    * shape incremental view maintenance needs, since a delete's or
    * update's OLD values are what a downstream aggregate subtracts.
    * Same file scoping, fences, and keyed contract. */
  def diffVersionsImages(spark: SparkSession, path: String, fromV: Long,
      toV: Long, keyCols: Seq[String]): DataFrame = {
    val (rm, ad, _) = changedRowSides(spark, path, fromV, toV)
    graft.operators.SnapshotDiff.diffImages(rm, ad, keyCols)
  }

}
