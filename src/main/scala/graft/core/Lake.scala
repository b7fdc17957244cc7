package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table access for a scale-factor directory of the driver-generated corpus.
  *
  * One parquet file per table (TESTDATA.md:13-15; FIXTURES.md row counts).
  * The reference checkout was empty at survey time (SURVEY.md §0), so the
  * data contract here is grounded in driver artifacts, not reference code.
  *
  * Scale notes: `spark.read.parquet` on a directory of files behaves the
  * same as on a single file; at 100 TB each "table" becomes a directory of
  * many row-group-sized files (optionally hive-partitioned), and everything
  * downstream — vectorized scan, pushdown, pruning — is unchanged.
  */
object Lake {
  /** All tables present in every sf dir (8 documented + documents/embeddings). */
  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  /** Per-session cache of table DataFrames: the file listing + footer
    * schema read costs ~100 ms per spark.read.parquet call, and every
    * query would otherwise pay it again (the DuckDB oracle likewise
    * creates its views once per session). Eviction is explicit, not weak:
    * a cached DataFrame strongly references its session (via
    * queryExecution), so a WeakHashMap keyed by session could never
    * collect an entry — instead, entries whose underlying SparkContext
    * has stopped are dropped on every access.
    */
  private val tableCache =
    new java.util.HashMap[SparkSession,
      scala.collection.mutable.Map[(String, String), DataFrame]]()

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    tableCache.synchronized {
      val it = tableCache.keySet().iterator()
      while (it.hasNext) if (it.next().sparkContext.isStopped) it.remove()
      tableCache.computeIfAbsent(spark,
          _ => scala.collection.mutable.Map.empty[(String, String), DataFrame])
        .getOrElseUpdate((dir, name), load(spark, dir, name))
    }

  /** Read one table. `events.ts` is physically TIMESTAMP(NANOS), which
    * Spark 4.1 reads natively as TimestampType (µs truncation on scan —
    * PLANS.md r8 pinned the plan change; earlier Spark 4 releases needed
    * a legacy long-read + manual ns→µs divide here). DuckDB applies the
    * same ns→µs truncation, so both engines agree (and the corpus has
    * zero sub-µs parts; FIXTURES.md events).
    */
  private def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // Uniform TimestampType (LTZ) ingest; with the session pinned to UTC
    // this is value-identical to NTZ and keeps the catalog's type surface
    // consistent (SURVEY.md §1.2).
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark.read.parquet(path(dir, name))
  }

  /** Register all tables as temp views named after the files, for spark.sql. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    tableNames.foreach(n => table(spark, dir, n).createOrReplaceTempView(n))
}
