package graft.core

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.SparkSession

/** ALL-OR-NOTHING multi-table write groups — the saga/marker pattern.
  *
  * Every TxnTable verb is single-table atomic; a curation pipeline
  * writing kept-docs + index + stats (the st16 shape) gets
  * exactly-once per table but no cross-table outcome guarantee. This
  * is the missing piece, with HONEST semantics:
  *
  *  - NOT snapshot-atomic: each step's commit is individually atomic
  *    and immediately visible — a reader between steps sees table A's
  *    new state and table B's old one (exactly what per-table
  *    snapshot isolation promises, no more).
  *  - ALL-OR-NOTHING EVENTUAL OUTCOME: if any step fails, or the
  *    process dies mid-group, every already-committed table is ROLLED
  *    BACK (a [[TxnTable.restore]] commit to its pre-group version) —
  *    by the failing [[run]] itself, or by [[recover]] replaying the
  *    durable INTENT marker after a crash. Either every table ends
  *    with the group's writes or none does.
  *
  * The intent is ONE create-exclusive [[Store.putIfAbsent]] object
  * under `groupDir` (object-store portable: a conditional PUT), named
  * by the group id and listing each table's pre-group version — the
  * only durable coordinator state. Completion deletes it.
  *
  * ROLLBACK SAFETY is proven, not assumed: every step must commit
  * with ops carrying the group's tag (the `op` string [[Step.write]]
  * receives — all TxnTable verbs accept an op). Rollback restores a
  * table only when EVERY commit above its pre-version carries the
  * tag; a foreign commit (a legitimate concurrent writer) makes the
  * rollback unsafe, so that table is reported as a CONFLICT for
  * manual reconciliation instead of silently reverting another
  * writer's data, and its intent is retained.
  *
  * Caveats (documented contract): steps must be DATA writes — table
  * properties/constraints ride the log as fold-state that a restore
  * commit does not revert; tables must pre-exist (a created table has
  * no pre-version to restore to).
  */
object TxnGroup {

  /** One table's write inside a group. `write(spark, op)` MUST pass
    * `op` (optionally with a suffix appended) as the commit op of
    * every commit it makes — the tag is what proves rollback safe. */
  final case class Step(path: String, write: (SparkSession, String) => Long)

  /** A table recovery could not safely roll back: a commit above the
    * pre-group version does not carry the group tag. */
  final case class Conflict(groupId: String, path: String,
      version: Long, op: String)

  final class GroupFailedException(
      val cause: Throwable,
      val rolledBack: Seq[String],
      val conflicts: Seq[Conflict])
    extends RuntimeException(
      s"transaction group failed (${cause.getMessage}); rolled back " +
        s"${rolledBack.size} table(s)" +
        (if (conflicts.isEmpty) ""
         else s"; ${conflicts.size} table(s) need manual " +
           s"reconciliation: ${conflicts.mkString(", ")}"), cause)

  private def intentFile(groupDir: String, id: String): Path =
    Paths.get(groupDir, s"$id.json")

  private def tagOf(id: String): String = s"txngroup:$id:"

  /** Run `steps` as one group. Returns each step's committed version
    * on success; on any failure rolls back every tagged table and
    * throws [[GroupFailedException]] carrying what happened. */
  def run(spark: SparkSession, groupDir: String,
      steps: Seq[Step]): Seq[Long] = {
    require(steps.nonEmpty, "TxnGroup.run: no steps")
    // nesting fence: an inner group's commits would carry the INNER
    // tag, so the outer rollback would classify them as foreign
    // conflicts — there is no sound composition, refuse up front
    require(TxnTable.activeOpTag.isEmpty,
      "write groups do not nest — a step is already running inside " +
        s"group tag ${TxnTable.activeOpTag.getOrElse("")}")
    require(steps.map(_.path).distinct.size == steps.size,
      "TxnGroup.run: one step per table — order inside a table is the "
        + "step's own business")
    val pre = steps.map(s => s.path -> TxnTable.currentVersion(s.path))
    pre.foreach { case (p, v) => require(v >= 0,
      s"TxnGroup.run: $p is not a TxnTable — groups write to existing "
        + "tables (a created table has no pre-version to restore to)") }
    val id = java.util.UUID.randomUUID().toString.replace("-", "")
    Files.createDirectories(Paths.get(groupDir))
    val intent = intentJson(id, pre)
    require(Store.putIfAbsent(intentFile(groupDir, id), intent),
      s"TxnGroup.run: intent id collision for $id")
    val done = scala.collection.mutable.ArrayBuffer[Long]()
    try {
      steps.foreach { s => done += s.write(spark, tagOf(id)) }
      Files.deleteIfExists(intentFile(groupDir, id))
      done.toSeq
    } catch {
      case scala.util.control.NonFatal(e) =>
        val (rolled, conflicts) = rollback(spark, id, pre.toMap)
        if (conflicts.isEmpty) Files.deleteIfExists(intentFile(groupDir, id))
        throw new GroupFailedException(e, rolled, conflicts)
    }
  }

  /** Replay every outstanding intent under `groupDir` (a crashed
    * [[run]] left it): roll its tables back to their pre-group
    * versions where the tag proves it safe. Fully-recovered intents
    * are deleted; an intent with conflicts is RETAINED (the operator
    * resolves it manually, then deletes the marker). Returns the
    * recovered group ids and every conflict found. Idempotent. */
  def recover(spark: SparkSession, groupDir: String)
      : (Seq[String], Seq[Conflict]) = {
    val recovered = scala.collection.mutable.ArrayBuffer[String]()
    val allConflicts = scala.collection.mutable.ArrayBuffer[Conflict]()
    listIntents(groupDir).foreach { case (id, pre) =>
      val (_, conflicts) = rollback(spark, id, pre)
      if (conflicts.isEmpty) {
        Files.deleteIfExists(intentFile(groupDir, id))
        recovered += id
      } else allConflicts ++= conflicts
    }
    (recovered.toSeq, allConflicts.toSeq)
  }

  /** Outstanding (crashed or conflicted) intents under `groupDir`:
    * (group id, table → pre-group version), id-sorted. Metadata-only —
    * one directory listing plus one small JSON read per intent. */
  def listIntents(groupDir: String): Seq[(String, Map[String, Long])] = {
    val dir = Paths.get(groupDir)
    if (!Files.isDirectory(dir)) return Nil
    val files = {
      val s = Files.list(dir)
      try {
        val it = s.iterator()
        val b = scala.collection.mutable.ArrayBuffer[Path]()
        while (it.hasNext) { val p = it.next()
          if (p.getFileName.toString.endsWith(".json")) b += p }
        b.toSeq
      } finally s.close()
    }
    files.flatMap(parseIntent(_)).sortBy(_._1)
  }

  /** Roll every advanced, cleanly-tagged table back to its pre
    * version; return (restored paths, conflicts). */
  private def rollback(spark: SparkSession, id: String,
      pre: Map[String, Long]): (Seq[String], Seq[Conflict]) = {
    val tag = tagOf(id)
    val rolled = scala.collection.mutable.ArrayBuffer[String]()
    val conflicts = scala.collection.mutable.ArrayBuffer[Conflict]()
    pre.toSeq.sortBy(_._1).foreach { case (p, v0) =>
      val cur = TxnTable.currentVersion(p)
      if (cur > v0) {
        val foreign = ((v0 + 1) to cur).flatMap { v =>
          val op = TxnTable.commitInfo(p, v).op
          if (op.startsWith(tag)) None else Some(Conflict(id, p, v, op))
        }
        if (foreign.isEmpty) { TxnTable.restore(spark, p, v0); rolled += p }
        else conflicts ++= foreign
      }
    }
    (rolled.toSeq, conflicts.toSeq)
  }

  private def intentJson(id: String,
      pre: Seq[(String, Long)]): String = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    JsonMethods.compact(JsonMethods.render(JObject(
      "id" -> JString(id),
      "tables" -> JArray(pre.toList.map { case (p, v) =>
        JObject("path" -> JString(p), "pre" -> JLong(v)) }))))
  }

  private def parseIntent(f: Path): Option[(String, Map[String, Long])] =
    try {
      import org.json4s._
      import org.json4s.jackson.JsonMethods
      implicit val fmts: Formats = DefaultFormats
      val j = JsonMethods.parse(
        new String(Files.readAllBytes(f), "UTF-8"))
      val id = (j \ "id").extract[String]
      val tables = (j \ "tables").extract[Seq[JValue]].map(t =>
        (t \ "path").extract[String] -> (t \ "pre").extract[Long]).toMap
      Some((id, tables))
    } catch { case _: Exception => None }
}
