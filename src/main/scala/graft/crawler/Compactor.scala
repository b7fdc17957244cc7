package graft.crawler

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction (C6) — the lake-maintenance operation a crawler
  * exists to flag. Streaming sinks and incremental ingests leave datasets
  * as thousands of KB-sized files; each costs a task, a footer read and a
  * namenode round-trip, so at 100 TB a 10⁶-file table is scan-bound on
  * metadata, not bytes. Compaction rewrites a dataset into
  * ceil(bytes / targetFileBytes) files and atomically swaps directories.
  *
  * The rewrite is one distributed job (read → repartition(n) → write to a
  * temp sibling, then two renames); content is preserved exactly — gated
  * by `s9_compaction`, whose oracle reads the ORIGINAL layout.
  */
object Compactor {

  /** Number of output files a dataset should compact to. */
  def targetFileCount(sizeBytes: Long, targetFileBytes: Long): Int =
    math.max(1, math.ceil(sizeBytes.toDouble / targetFileBytes).toInt)

  private def countDeepDataFiles(
      filesystem: org.apache.hadoop.fs.FileSystem, p: Path): Int =
    filesystem.listStatus(p)
      // `__list=` partition dirs are data despite the underscore prefix
      .filterNot(s => (s.getPath.getName.startsWith("_") &&
          !s.getPath.getName.startsWith("__list=")) ||
        s.getPath.getName.startsWith("."))
      .map(s => if (s.isFile) 1 else countDeepDataFiles(filesystem, s.getPath))
      .sum

  /** Compact `info`'s directory into ~targetFileBytes files. Returns the
    * new file count. Only directory-backed parquet/orc datasets qualify
    * (single files and text formats are left alone).
    */
  def compact(
      spark: SparkSession,
      info: DatasetInfo,
      targetFileBytes: Long): Int = {
    // Engine-managed layouts compact through their OWN safe paths — a
    // raw directory swap under a commit log or a bucket tree would
    // corrupt them. This is what lets one maintenance sweep walk a
    // discover() listing and compact everything it finds.
    if (info.format == "graft-txn") {
      val n = targetFileCount(info.sizeBytes, targetFileBytes)
      if (n >= info.numFiles) return info.numFiles
      graft.core.TxnTable.compact(spark, info.path, n)
      return graft.core.TxnTable.snapshotFiles(info.path).size
    }
    if (info.format == "graft-index") {
      graft.operators.Keywords.compactIndex(spark, info.path)
      val fsys = new Path(info.path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      return countDeepDataFiles(fsys, new Path(info.path))
    }
    require(info.format == "parquet" || info.format == "orc" ||
      info.format == "graft-ann",
      s"compaction supports columnar datasets, not ${info.format}")
    val n = targetFileCount(info.sizeBytes, targetFileBytes)
    if (n >= info.numFiles) return info.numFiles // already compact enough

    val src = new Path(info.path)
    val fs = src.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(src.getParent, s".${src.getName}__compacting")
    val old = new Path(src.getParent, s".${src.getName}__old")
    // Crash recovery, not cleanup: if a previous run died between the two
    // swap renames, __old holds the ONLY copy — restore it, never delete
    // it blindly. A leftover __old alongside a live src is a completed
    // swap's debris and safe to drop; a leftover tmp is always partial.
    if (fs.exists(old) && !fs.exists(src)) {
      if (!fs.rename(old, src)) sys.error(s"recovery of $src from $old failed")
    }
    fs.delete(tmp, true); fs.delete(old, true)
    require(fs.getFileStatus(src).isDirectory,
      s"compaction target must be a directory: ${info.path}")

    if (info.format == "graft-ann") {
      // LAYOUT-PRESERVING: rewrite through partitionBy so the __list
      // partition pruning (the read-time probe that makes the layout an
      // index) survives compaction. Hash-partitioning on __list puts
      // each list in exactly one task → one file per list.
      import org.apache.spark.sql.functions.col
      spark.read.parquet(info.path)
        .repartition(math.max(1, n), col("__list"))
        .write.partitionBy("__list").parquet(tmp.toString)
    } else {
      val df = spark.read.format(info.format).load(info.path)
      df.repartition(n).write.format(info.format).save(tmp.toString)
    }

    // Swap: src -> old, tmp -> src, drop old. Readers holding an open
    // dataset see a complete directory either way; a NEW reader in the
    // instant between the two renames sees a missing path (HDFS-style
    // filesystems have no atomic directory exchange) — the crash-recovery
    // above makes that window safe, not invisible.
    if (!fs.rename(src, old)) sys.error(s"compaction swap failed for $src")
    if (!fs.rename(tmp, src)) { fs.rename(old, src); sys.error(s"swap-in failed for $src") }
    fs.delete(old, true)
    if (info.format == "graft-ann") countDeepDataFiles(fs, src)
    else fs.listStatus(src).count(s =>
      s.isFile && !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
  }
}
