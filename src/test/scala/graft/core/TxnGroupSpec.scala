package graft.core

import java.nio.file.Files

import graft.SparkSpecBase

/** The multi-table write group's contract, pinned:
  *  - success commits every step and clears the durable intent;
  *  - a failing step rolls every committed table back to its
  *    pre-group version (an ordinary restore commit — history stays
  *    readable) and the cause propagates with the rollback summary;
  *  - an outstanding intent (crashed run) recovers the same way;
  *  - a FOREIGN commit above the pre-version makes rollback unsafe:
  *    the table is reported as a conflict, never silently reverted,
  *    and the intent is retained for manual reconciliation.
  */
class TxnGroupSpec extends SparkSpecBase {
  import spark.implicits._
  import TxnTable._

  private def freshRoot(): String =
    Files.createTempDirectory("graft_group").toString

  private def mk(root: String, name: String, hi: Long): String = {
    val p = s"$root/$name"
    create(spark, p, (0L until hi).map(i => (i, i * 10)).toDF("id", "v"))
    p
  }

  private def rows(p: String): Set[(Long, Long)] =
    read(spark, p).as[(Long, Long)].collect().toSet

  test("success commits every step and clears the intent") {
    val root = freshRoot()
    val (a, b) = (mk(root, "a", 5), mk(root, "b", 3))
    val vs = TxnGroup.run(spark, s"$root/groups", Seq(
      TxnGroup.Step(a, (s, op) =>
        append(s, a, Seq((100L, 1L)).toDF("id", "v"), op = op + "docs")),
      TxnGroup.Step(b, (s, op) =>
        overwrite(s, b, Seq((200L, 2L)).toDF("id", "v"),
          op = op + "stats"))))
    assert(vs == Seq(1L, 1L))
    assert(rows(a).contains((100L, 1L)) && rows(b) == Set((200L, 2L)))
    assert(commits(a).last.op.startsWith("txngroup:") &&
      commits(b).last.op.startsWith("txngroup:"))
    assert(new java.io.File(s"$root/groups").list().isEmpty,
      "a completed group must clear its intent")
  }

  test("a failing step rolls back every committed table; the cause " +
    "propagates with the rollback summary") {
    val root = freshRoot()
    val (a, b) = (mk(root, "a", 5), mk(root, "b", 3))
    val before = (rows(a), rows(b))
    val e = intercept[TxnGroup.GroupFailedException] {
      TxnGroup.run(spark, s"$root/groups", Seq(
        TxnGroup.Step(a, (s, op) =>
          append(s, a, Seq((100L, 1L)).toDF("id", "v"), op = op + "x")),
        TxnGroup.Step(b, (_, _) => sys.error("downstream model refused"))))
    }
    assert(e.cause.getMessage.contains("downstream model refused"))
    assert(e.rolledBack == Seq(a) && e.conflicts.isEmpty)
    assert((rows(a), rows(b)) == before,
      "every table must end at its pre-group content")
    // the rollback is an ordinary restore commit — history readable
    assert(commits(a).last.op.startsWith("restore:"))
    assert(new java.io.File(s"$root/groups").list().isEmpty,
      "a fully rolled-back group must clear its intent")
    // a later group over the same tables works normally
    TxnGroup.run(spark, s"$root/groups", Seq(
      TxnGroup.Step(a, (s, op) =>
        append(s, a, Seq((101L, 1L)).toDF("id", "v"), op = op))))
    assert(rows(a).contains((101L, 1L)))
  }

  test("crash recovery replays the intent: tagged tables roll back; " +
    "a foreign commit becomes a conflict and retains the intent") {
    val root = freshRoot()
    val (a, b) = (mk(root, "a", 5), mk(root, "b", 3))
    val before = rows(a)
    // simulate a crashed run: durable intent + one tagged commit
    val id = "deadbeef"
    val intent = s"""{"id":"$id","tables":[""" +
      s"""{"path":"$a","pre":0},{"path":"$b","pre":0}]}"""
    Files.createDirectories(java.nio.file.Paths.get(s"$root/groups"))
    assert(Store.putIfAbsent(
      java.nio.file.Paths.get(s"$root/groups/$id.json"), intent))
    append(spark, a, Seq((100L, 1L)).toDF("id", "v"),
      op = s"txngroup:$id:docs")
    val (recovered, conflicts) = TxnGroup.recover(spark, s"$root/groups")
    assert(recovered == Seq(id) && conflicts.isEmpty)
    assert(rows(a) == before, "the tagged commit must roll back")
    assert(new java.io.File(s"$root/groups").list().isEmpty)
    // idempotent on an empty dir
    assert(TxnGroup.recover(spark, s"$root/groups") == (Nil, Nil))
    // foreign-commit case: tagged commit + an UNtagged writer above it
    val id2 = "cafebabe"
    val intent2 = s"""{"id":"$id2","tables":[{"path":"$b","pre":0}]}"""
    assert(Store.putIfAbsent(
      java.nio.file.Paths.get(s"$root/groups/$id2.json"), intent2))
    append(spark, b, Seq((300L, 3L)).toDF("id", "v"),
      op = s"txngroup:$id2:x")
    append(spark, b, Seq((400L, 4L)).toDF("id", "v")) // foreign
    val (r2, c2) = TxnGroup.recover(spark, s"$root/groups")
    assert(r2.isEmpty && c2.exists(c =>
      c.path == b && c.op == "append" && c.groupId == id2),
      s"the foreign commit must surface as a conflict: $c2")
    assert(rows(b).contains((400L, 4L)) && rows(b).contains((300L, 3L)),
      "an unsafe rollback must never run")
    assert(new java.io.File(s"$root/groups").list().toSeq ==
      Seq(s"$id2.json"), "a conflicted intent is retained")
  }
}
