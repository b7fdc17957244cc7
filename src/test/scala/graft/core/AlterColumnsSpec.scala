package graft.core

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** ALTER TABLE ADD/DROP COLUMNS as metadata-only commits: O(1) at any
  * table size, null-fill on old files, drop keeps the bytes (restore
  * recovers the column with its data), rewrites materialize
  * progressively, constraint references refuse the drop. */
class AlterColumnsSpec extends SparkSpecBase {
  import spark.implicits._

  private def mk(): String = {
    val t = Files.createTempDirectory("graft_alter").toString + "/t"
    TxnTable.create(spark, t,
      Seq((1L, 10L, "a"), (2L, 20L, "b"), (3L, 30L, "c"))
        .toDF("id", "v", "s"))
    t
  }

  test("addColumns: metadata-only widen, old rows null-fill, new " +
    "tranches carry the column") {
    val t = mk()
    val v = TxnTable.addColumns(spark, t,
      Seq("note" -> org.apache.spark.sql.types.StringType,
        "score" -> org.apache.spark.sql.types.LongType))
    assert(v == 1L)
    val c = TxnTable.commits(t).last
    assert(c.op == "alter:add:note,score" &&
      c.adds.isEmpty && c.removes.isEmpty, "widen must be metadata-only")
    // old rows read back with nulls in the new columns
    val head = TxnTable.read(spark, t)
    assert(head.columns.toSeq == Seq("id", "v", "s", "note", "score"))
    assert(head.filter(col("note").isNull).count() == 3)
    // a new tranche fills them; the old tranche still nulls
    TxnTable.append(spark, t,
      Seq((4L, 40L, "d", "fresh", 9L)).toDF("id", "v", "s", "note", "score"))
    assert(TxnTable.read(spark, t).filter(col("note") === "fresh")
      .count() == 1)
    // an old-shape append now fails loudly (schema drift)
    intercept[TxnTable.SchemaMismatchException] {
      TxnTable.append(spark, t, Seq((5L, 50L, "e")).toDF("id", "v", "s"))
    }
    // duplicate add refused
    intercept[IllegalArgumentException] {
      TxnTable.addColumns(spark, t,
        Seq("NOTE" -> org.apache.spark.sql.types.StringType))
    }
  }

  test("dropColumns: metadata-only, time travel + restore recover the " +
    "column WITH its data, rewrites materialize") {
    val t = mk()
    val v = TxnTable.dropColumns(spark, t, Seq("s"))
    assert(v == 1L)
    val c = TxnTable.commits(t).last
    assert(c.adds.isEmpty && c.removes.isEmpty, "drop must rewrite nothing")
    assert(TxnTable.read(spark, t).columns.toSeq == Seq("id", "v"))
    // the bytes are still there: time travel sees the column and data
    assert(TxnTable.read(spark, t, 0L).filter(col("s") === "b").count() == 1)
    // restore across the drop recovers column AND data
    TxnTable.restore(spark, t, 0L)
    assert(TxnTable.read(spark, t).filter(col("s").isNotNull).count() == 3)
    // drop again, then a rewrite materializes the narrow shape
    TxnTable.dropColumns(spark, t, Seq("s"))
    TxnTable.deleteWhere(spark, t, col("id") === 1L)
    val rewritten = TxnTable.commits(t).last.adds
    assert(rewritten.nonEmpty)
    val surv = spark.read.parquet(
      rewritten.map(a => java.nio.file.Paths.get(t).resolve(a.path)
        .toString): _*)
    assert(surv.columns.toSeq == Seq("id", "v"),
      "survivor rewrite must materialize the dropped shape")
    assert(TxnTable.read(spark, t).count() == 2)
    // guards: unknown column, last column, constraint reference
    intercept[IllegalArgumentException] {
      TxnTable.dropColumns(spark, t, Seq("nope"))
    }
    intercept[IllegalArgumentException] {
      TxnTable.dropColumns(spark, t, Seq("id", "v"))
    }
    TxnTable.addConstraint(spark, t, "v_pos", "v > 0")
    intercept[IllegalArgumentException] {
      TxnTable.dropColumns(spark, t, Seq("v"))
    }
  }

  test("metadata aggregates and pruned reads survive an ALTER cycle") {
    val t = mk()
    TxnTable.addColumns(spark, t,
      Seq("w" -> org.apache.spark.sql.types.LongType))
    TxnTable.append(spark, t,
      Seq((10L, 100L, "z", 7L)).toDF("id", "v", "s", "w"))
    // countRange on a column that predates the ALTER still answers
    // (pre-ALTER files lack "w" stats → they scan; post-ALTER file is
    // metadata); count on "v" stays fully metadata-only
    val (cv, sv, _) = TxnTable.countRange(spark, t, "v", 0L, 1000L)
    assert(cv == 4L && sv == 0,
      s"v-count must stay metadata-only after ALTER, got ($cv,$sv)")
    val (cw, _, _) = TxnTable.countRange(spark, t, "w", 0L, 100L)
    assert(cw == 1L, "old files must count as zero non-null w rows")
  }
}
