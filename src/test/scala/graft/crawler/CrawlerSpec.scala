package graft.crawler

import graft.SparkSpecBase

class CrawlerSpec extends SparkSpecBase {

  test("C1: discovers exactly the 10 corpus datasets, all parquet") {
    val infos = LakeCrawler.discover(spark, sf0001)
    assert(infos.map(_.name) == Seq("customer", "documents", "embeddings",
      "events", "lineitem", "nation", "orders", "part", "region", "supplier"))
    assert(infos.forall(_.format == "parquet"))
    assert(infos.forall(_.sizeBytes > 0))
  }

  test("C1: format sniffing identifies extensionless orc/parquet by magic bytes") {
    import org.apache.hadoop.fs.Path
    val tmp = java.nio.file.Files.createTempDirectory("graft_sniff")
    val df = graft.core.Lake.table(spark, sf0001, "nation")
    df.coalesce(1).write.mode("overwrite").orc(s"$tmp/o")
    df.coalesce(1).write.mode("overwrite").parquet(s"$tmp/p")
    def strip(dir: String, ext: String): Path = {
      val f = new java.io.File(dir).listFiles()
        .find(_.getName.endsWith(ext)).get
      val bare = new java.io.File(dir, "datafile")
      assert(f.renameTo(bare))
      new Path(bare.getAbsolutePath)
    }
    assert(LakeCrawler.detectFormat(spark, strip(s"$tmp/o", ".orc")) == "orc")
    assert(LakeCrawler.detectFormat(spark, strip(s"$tmp/p", ".parquet")) == "parquet")
  }

  test("C6: compaction reduces file count, preserves rows, and is idempotent") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val df = graft.core.Lake.table(spark, sf0001, "nation")
    df.repartition(10).write.mode("overwrite").parquet(s"$tmp/nation10")
    def info = LakeCrawler.discover(spark, tmp).find(_.name == "nation10").get
    assert(info.numFiles == 10)
    val n = Compactor.compact(spark, info, targetFileBytes = info.sizeBytes)
    assert(n == 1 || n == 2) // ceil(size/size)=1 file (+possible empty split)
    assert(spark.read.parquet(s"$tmp/nation10").count() == 25)
    // Idempotent: already at/below target → untouched.
    val n2 = Compactor.compact(spark, info, targetFileBytes = info.sizeBytes)
    assert(n2 == info.numFiles)
    assert(Compactor.targetFileCount(1000, 300) == 4)
    assert(Compactor.targetFileCount(0, 300) == 1)
  }

  test("C6: compaction recovers a dataset stranded under __old by a crash") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_crash").toString
    val df = graft.core.Lake.table(spark, sf0001, "nation")
    df.repartition(10).write.mode("overwrite").parquet(s"$tmp/t")
    // Simulate a crash between the two swap renames: only __old exists.
    assert(new java.io.File(s"$tmp/t").renameTo(new java.io.File(s"$tmp/.t__old")))
    val info = DatasetInfo(name = "t", path = s"$tmp/t", format = "parquet",
      numFiles = 10, sizeBytes = 10000, modifiedMs = 0L)
    Compactor.compact(spark, info, targetFileBytes = Long.MaxValue)
    assert(spark.read.parquet(s"$tmp/t").count() == 25,
      "the __old copy must be restored, not deleted")
    assert(!new java.io.File(s"$tmp/.t__old").exists())
  }

  test("C2: events schema normalizes ns timestamp to TimestampType") {
    val info = LakeCrawler.discover(spark, sf0001).find(_.name == "events").get
    val sch = LakeCrawler.extractSchema(spark, info)
    assert(sch("ts").dataType == org.apache.spark.sql.types.TimestampType)
    assert(sch("event_id").dataType == org.apache.spark.sql.types.LongType)
  }

  test("C3: nation profile is exact and complete") {
    val info = LakeCrawler.discover(spark, sf0001).find(_.name == "nation").get
    val profs = Profiler.profile(spark, LakeCrawler.open(spark, info), "nation")
    val byCol = profs.map(p => p.column -> p).toMap
    assert(byCol("n_nationkey").cnt == 25)
    assert(byCol("n_nationkey").ndistinct == 25)
    assert(byCol("n_nationkey").distinctIsExact)
    assert(byCol("n_nationkey").nulls == 0)
    assert(byCol("n_nationkey").min_s.contains("0"))
    assert(byCol("n_nationkey").max_s.contains("24"))
  }

  test("C3: profiler skips min/max for array columns but counts them") {
    val info = LakeCrawler.discover(spark, sf0001).find(_.name == "embeddings").get
    val profs = Profiler.profile(spark, LakeCrawler.open(spark, info), "embeddings")
    val e = profs.find(_.column == "embedding").get
    assert(e.cnt == 500 && e.min_s.isEmpty && e.max_s.isEmpty)
  }

  test("C5: diff flags size/mtime changes and additions/removals") {
    val a = DatasetInfo("t1", "/x/t1", "parquet", 1, 100, 1000)
    val b = DatasetInfo("t2", "/x/t2", "parquet", 1, 200, 1000)
    val c = DatasetInfo("t3", "/x/t3", "parquet", 1, 300, 1000)
    val d = CatalogStore.diff(
      prev = Seq(a, b, c),
      cur = Seq(a, b.copy(sizeBytes = 999), DatasetInfo("t4", "/x/t4", "csv", 1, 1, 1)))
    assert(d.unchanged == Seq("t1"))
    assert(d.changed == Seq("t2"))
    assert(d.added == Seq("t4"))
    assert(d.removed == Seq("t3"))
  }

  test("schema evolution: mergeSchema read yields the superset schema") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_evolve").toString
    Seq((1L, "a")).toDF("id", "name").write.parquet(s"$dir/part1")
    Seq((2L, 9.5)).toDF("id", "score").write.parquet(s"$dir/part2")
    val merged = spark.read.option("mergeSchema", "true")
      .parquet(s"$dir/part1", s"$dir/part2")
    assert(merged.schema.fieldNames.sorted.toSeq == Seq("id", "name", "score"))
    assert(merged.count() == 2)
    val row = merged.filter(org.apache.spark.sql.functions.col("id") === 1L)
      .select("score").head()
    assert(row.isNullAt(0)) // evolved column null for old files
  }

  test("topK returns most frequent values first") {
    val df = spark.createDataFrame(Seq(
      Tuple1("a"), Tuple1("a"), Tuple1("a"), Tuple1("b"), Tuple1("b"), Tuple1("c")
    )).toDF("v")
    val top = Profiler.topK(df, "v", 2).collect()
    assert(top.map(_.getString(0)).toSeq == Seq("a", "b"))
    assert(top.map(_.getLong(1)).toSeq == Seq(3L, 2L))
  }

  test("Compactor routes engine-managed layouts to their own safe paths") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val lake = java.nio.file.Files.createTempDirectory("graft_cmpspec")
      .toString
    // a fragmented txn table + a multi-tranche index + a plain dataset
    val t = s"$lake/txn"
    graft.core.TxnTable.create(spark,
      t, (0 until 200).map(i => (i.toLong, s"r$i")).toDF("id", "s"),
      partitions = 20)
    (0 until 3).foreach(b => graft.core.TxnTable.append(spark, t,
      (200 + b * 10 until 210 + b * 10).map(i => (i.toLong, s"r$i"))
        .toDF("id", "s"), partitions = 5))
    val docs = (0 until 40).map(i =>
      (i.toLong, s"maintenance doc $i alpha tail$i")).toDF("doc_id", "text")
    graft.operators.Keywords.buildIndex(docs.filter(col("doc_id") < 20),
      "doc_id", "text", s"$lake/idx", nBuckets = 4)
    graft.operators.Keywords.appendToIndex(docs.filter(col("doc_id") >= 20),
      "doc_id", "text", s"$lake/idx")
    val infos = LakeCrawler.discover(spark, lake)
    // ONE sweep compacts both through their own safe paths
    infos.foreach(i => Compactor.compact(spark, i, targetFileBytes = 1 << 26))
    // txn: content + history intact, fewer live files, log still works
    assert(graft.core.TxnTable.read(spark, t).count() == 230)
    assert(graft.core.TxnTable.snapshotFiles(t).size < 35)
    assert(graft.core.TxnTable.commits(t).last.op == "compact")
    // index: served answers unchanged, tranches folded (the stats dir
    // resolves through the CURRENT pointer after a compaction)
    assert(spark.read.parquet(
      s"$lake/idx/${graft.operators.Keywords.liveDirs(s"$lake/idx")._2}")
      .count() == 1)
    assert(graft.operators.Keywords
      .bm25TopKIndexed(spark, s"$lake/idx", Seq("alpha"), 5).count() == 5)
  }

  test("a txn table with deletion vectors crawls DV-aware: logical " +
    "rows exclude MOR deletes, sizing includes the DV sidecar") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val lake = java.nio.file.Files.createTempDirectory("graft_dvcrawl")
      .toString
    val t = s"$lake/txn"
    graft.core.TxnTable.create(spark, t,
      (0 until 100).map(i => (i.toLong, s"r$i")).toDF("id", "s"),
      partitions = 4)
    val sizeBefore = LakeCrawler.discover(spark, lake).head.sizeBytes
    graft.core.TxnTable.deleteWhereMor(spark, t, col("id") < 10L)
    val infos = LakeCrawler.discover(spark, lake)
    assert(infos.head.format == "graft-txn")
    assert(infos.head.sizeBytes > sizeBefore,
      "the DV sidecar must count toward the dataset's physical size " +
        s"(${infos.head.sizeBytes} vs $sizeBefore)")
    // opened frame applies the DV (logical content, not raw files)
    assert(LakeCrawler.open(spark, infos.head).count() == 90)
    // and the incremental re-crawl saw the dvdelete as a change
    assert(infos.head.modifiedMs > 0)
  }

  test("C15: a text-index layout discovers as ONE graft-index dataset") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val lake = java.nio.file.Files.createTempDirectory("graft_c15spec")
      .toString
    val docs = (0 until 40).map(i =>
      (i.toLong, s"spec document $i alpha beta tail$i")).toDF("doc_id", "text")
    docs.coalesce(1).write.parquet(s"$lake/plaindocs")
    graft.operators.Keywords.buildIndex(docs, "doc_id", "text",
      s"$lake/idx", nBuckets = 4)
    graft.core.TxnTable.create(spark, s"$lake/txn",
      Seq((1L, "x")).toDF("id", "s"))
    val infos = LakeCrawler.discover(spark, lake)
    assert(infos.map(i => i.name -> i.format).toMap ==
      Map("plaindocs" -> "parquet", "idx" -> "graft-index",
        "txn" -> "graft-txn"),
      s"got $infos")
    val idx = infos.find(_.name == "idx").get
    // sized from the WHOLE layout (postings tree + stats), not one dir
    assert(idx.numFiles >= 5 && idx.sizeBytes > 0)
    // opened as the logical postings frame — tokenization round-trips
    val opened = LakeCrawler.open(spark, idx)
    assert(opened.columns.contains("term") && opened.columns.contains("bucket"))
    assert(opened.filter(col("term") === "alpha").count() == 40)
    // and the profiler can take it (array positions column included)
    assert(Profiler.profile(spark, opened, "idx").nonEmpty)
  }

  test("coincidental postings/+stats/ user data is NOT an index; legacy is") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val lake = java.nio.file.Files.createTempDirectory("graft_idxguard")
      .toString
    // a user dataset that merely reuses the index's directory names —
    // routing it through compactIndex would destroy it
    Seq((1L, "x")).toDF("a", "b").coalesce(1)
      .write.parquet(s"$lake/fake/postings/bucket=0")
    Seq((2L, 3L)).toDF("a", "b").coalesce(1)
      .write.parquet(s"$lake/fake/stats")
    val docs = (0 until 20).map(i =>
      (i.toLong, s"guard doc $i alpha beta tail$i")).toDF("doc_id", "text")
    graft.operators.Keywords.buildIndex(docs, "doc_id", "text",
      s"$lake/legacyidx", nBuckets = 4)
    // a legacy layout predates the marker file — structural + stats
    // schema detection must still classify it
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(s"$lake/legacyidx/_graft_index"))
    val infos = LakeCrawler.discover(spark, lake)
    assert(!infos.exists(i =>
      i.name == "fake" && i.format == "graft-index"),
      s"coincidental shape classified as index: $infos")
    assert(infos.find(_.name == "legacyidx")
      .exists(_.format == "graft-index"),
      s"legacy pre-marker index lost its classification: $infos")
    // the marked index (normal build) is of course still detected
    graft.operators.Keywords.buildIndex(docs, "doc_id", "text",
      s"$lake/markedidx", nBuckets = 4)
    assert(LakeCrawler.discover(spark, lake).find(_.name == "markedidx")
      .exists(_.format == "graft-index"))
  }

  test("profileNested: struct leaves, array elements, null handling") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // struct with a null leaf, primitive array with a null element and
    // a null/empty array, array<struct>, top-level flat column
    val df = Seq(
      (1L, ("a", Option(10L)), Seq[Option[Long]](Some(1L), None, Some(3L)),
        Seq((1L, 5.0))),
      (2L, ("b", None), Seq[Option[Long]](Some(7L)), Seq((2L, 6.0), (3L, 6.0))),
      (3L, ("a", Option(30L)), Seq.empty[Option[Long]], Seq.empty[(Long, Double)])
    ).toDF("id", "s", "arr", "items")
      .select(col("id"),
        col("s").cast("struct<tag:string,v:bigint>").as("s"),
        col("arr"),
        col("items").cast("array<struct<k:bigint,x:double>>").as("items"))
    val profs = Profiler.profileNested(spark, df, "t")
      .map(p => p.column -> p).toMap
    // flat + struct leaves in the single pass
    assert(profs("id").cnt == 3 && profs("id").ndistinct == 3)
    assert(profs("s.tag").cnt == 3 && profs("s.tag").ndistinct == 2)
    assert(profs("s.v").cnt == 2 && profs("s.v").nulls == 1,
      "null struct leaf must count as a null")
    // primitive array: 4 elements, one null element; empty arrays
    // contribute nothing
    assert(profs("arr[]").cnt == 3 && profs("arr[]").nulls == 1)
    assert(profs("arr[]").min_s.contains("1") &&
      profs("arr[]").max_s.contains("7"))
    // array<struct>: per-field element stats with element distincts
    assert(profs("items[].k").cnt == 3 && profs("items[].k").ndistinct == 3)
    assert(profs("items[].x").ndistinct == 2,
      "element-level distinct must dedup across rows")
    // no rows for the container columns themselves
    assert(!profs.contains("s") && !profs.contains("arr") &&
      !profs.contains("items"))
  }
}
