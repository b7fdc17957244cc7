package graft.crawler

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.operators.Layout

class SkippingIndexSpec extends SparkSpecBase {

  private lazy val laidOut: (String, org.apache.spark.sql.DataFrame) = {
    val li = graft.core.Lake.table(spark, sf0001, "lineitem")
    val tmp = Files.createTempDirectory("graft_skipspec").toString
    Layout.zorderPartitions(li, col("l_partkey"), col("l_suppkey"), 8)
      .write.mode("overwrite").parquet(tmp)
    (tmp, li)
  }

  test("footer counts sum to the table count without scanning data") {
    val (tmp, li) = laidOut
    val idx = SkippingIndex.build(spark, tmp, Seq("l_partkey"))
    assert(idx.agg(sum("row_count")).head().getLong(0) === li.count())
  }

  test("index bounds contain every row's value (skipping is lossless by construction)") {
    val (tmp, _) = laidOut
    val idx = SkippingIndex.build(spark, tmp, Seq("l_partkey", "l_suppkey"))
      .collect()
    idx.foreach { r =>
      val f = r.getString(0)
      val mins = r.getSeq[Option[Long]](2)
      val actual = spark.read.parquet(f)
        .agg(min("l_partkey"), max("l_partkey"), min("l_suppkey"), max("l_suppkey"))
        .head()
      assert(r.getSeq[Any](2).head == actual.getLong(0), s"min pk in $f vs $mins")
      assert(r.getSeq[Any](3).head == actual.getLong(1))
      assert(r.getSeq[Any](2)(1) == actual.getLong(2))
      assert(r.getSeq[Any](3)(1) == actual.getLong(3))
    }
  }

  test("z-ordered layout: a narrow box selects a strict subset of files, and the pruned read is exact") {
    val (tmp, li) = laidOut
    val idx = SkippingIndex.build(spark, tmp, Seq("l_partkey", "l_suppkey"))
    val total = idx.count()
    val files = SkippingIndex.selectFiles(idx, 0, 1L, 20L)
    assert(files.size < total, s"selected ${files.size} of $total files — no pruning")
    val pruned = spark.read.parquet(files: _*)
      .filter(col("l_partkey").between(1, 20)).count()
    val full = li.filter(col("l_partkey").between(1, 20)).count()
    assert(pruned === full)
  }

  test("files without stats for the column are conservatively kept") {
    import spark.implicits._
    val idx = Seq(
      ("f1", 10L, Seq(Option(5L)), Seq(Option(9L))),
      ("f2", 10L, Seq(Option.empty[Long]), Seq(Option.empty[Long])))
      .toDF("file", "row_count", "mins", "maxs")
    assert(SkippingIndex.selectFiles(idx, 0, 100L, 200L) === Seq("f2"))
  }
}
