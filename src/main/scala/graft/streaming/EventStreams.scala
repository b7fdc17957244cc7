package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType}

import graft.core.Lake

/** Structured-Streaming pipelines over the `events` stream table
  * (SURVEY.md §2.9 ST1–ST4). Batch/stream unification is the point:
  * every transform here is the same DataFrame expression the batch
  * queries use, so results are checkable against the batch oracle
  * (Structured Streaming's batch-equivalence property).
  *
  * At scale these run against a file/Kafka source with RocksDB state
  * stores; watermarks bound state. Locally the tests drive them with
  * finite file sources and MemoryStream.
  */
object EventStreams {

  /** The events table's on-disk schema with ts as raw nanos (long). */
  private def rawSchema(spark: SparkSession, dir: String): StructType = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    StructType(spark.read.parquet(Lake.path(dir, "events")).schema.fields)
  }

  /** Open `events` as a streaming DataFrame (file source), with the same
    * ns→µs timestamp normalization the batch reader applies.
    */
  def readEventsStream(spark: SparkSession, dir: String): DataFrame = {
    val sch = rawSchema(spark, dir)
    // The file streaming source requires a directory; point it at the sf
    // dir and glob-filter to the events table file.
    val raw = spark.readStream.schema(sch)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
    if (sch("ts").dataType == LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }

  /** Open `documents` as a streaming DataFrame (file source) — the
    * ingest side of a streaming curation pipeline. */
  def readDocsStream(spark: SparkSession, dir: String): DataFrame = {
    val sch = spark.read
      .option("pathGlobFilter", "documents.parquet").parquet(dir).schema
    spark.readStream.schema(sch)
      .option("pathGlobFilter", "documents.parquet").parquet(dir)
  }

  /** ST1: tumbling 1-hour window counts/sums per event_type, watermarked. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("c"),
        (sum(round(col("value") * 100).cast("long")) / 100.0).as("s"))
      .select(col("window.start").as("h"), col("event_type"), col("c"), col("s"))

  /** ST2: sliding 1-hour window, 15-minute slide. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("c"))
      .select(col("window.start").as("ws"), col("event_type"), col("c"))

  /** ST3: 30-minute-gap session windows per user. */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n"), min(col("ts")).as("st"), max(col("ts")).as("en"))
      .select(col("user_id"), col("st"), col("en"), col("n"))

  /** ST4: stateful exact-once dedup on event_id. */
  def dedup(events: DataFrame): DataFrame = events.dropDuplicates("event_id")

  /** ST8 (trending feed): daily tumbling counts per event_type — the
    * streaming half of a trending top-k; the rank-and-cut runs on the
    * sink output (dashboard side), keeping stream state to O(windows ×
    * types) counters.
    */
  def dailyTypeCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("c"))
      .select(col("window.start").as("d"), col("event_type"), col("c"))

  /** ST6: stream-stream inner join — each purchase matched to the same
    * user's clicks within the preceding 6 hours. BOTH sides carry
    * watermarks and the join condition bounds event-time distance, which
    * is what makes the join state finite: Spark evicts click state older
    * than watermark − 6 h and purchase state at the watermark. Without
    * the time-range condition a stream-stream join must buffer one side
    * forever — the unbounded-state mistake this operator exists to avoid
    * at 100 TB/day rates.
    */
  def purchaseClickJoin(purchases: DataFrame, clicks: DataFrame): DataFrame = {
    val p = purchases.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "10 minutes")
    val c = clicks.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"),
        col("user_id").as("c_user"), col("ts").as("c_ts"))
      .withWatermark("c_ts", "10 minutes")
    p.join(c,
        col("p_user") === col("c_user") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 6 HOURS") &&
          col("c_ts") <= col("p_ts"))
      .select(col("purchase_id"), col("click_id"),
        (unix_micros(col("p_ts")) - unix_micros(col("c_ts"))).as("gap_us"))
  }

  /** ST9: stream-static enrichment join — the other join shape a pipeline
    * needs besides stream-stream: each event enriched with a BATCH
    * dimension row. The static side needs no watermark and no state (it
    * is re-resolved per micro-batch, broadcast when small — exactly how a
    * slowly-changing dim behaves under Structured Streaming); only the
    * downstream aggregate is stateful. Inner join: un-enrichable events
    * drop, the standard dimension-conformance semantics.
    */
  def enrichWithDim(events: DataFrame, dim: DataFrame): DataFrame =
    events
      .join(broadcast(dim), Seq("user_id"))
      .groupBy(col("segment"), col("event_type"))
      .agg(count(lit(1)).as("c"),
        (sum(round(col("value") * 100).cast("long")) / 100.0).as("s"))

  /** GATE/TEST HARNESS ONLY — not a production pattern: drains a finite
    * streaming DataFrame through a memory sink and collects the whole sink
    * table to the driver (fine for the gates' few-thousand aggregated
    * rows; wrong for any data-sized stream). Production queries sink to
    * files with a checkpoint — see `startTumblingFileSink`.
    */
  def runToMemoryForGate(
      spark: SparkSession,
      stream: DataFrame,
      name: String,
      outputMode: String): DataFrame = {
    val q = stream.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(outputMode)
      .start()
    try {
      q.processAllAvailable()
    } finally q.stop()
    val result = spark.table(name)
    spark.createDataFrame(
      new java.util.ArrayList(java.util.Arrays.asList(result.collect(): _*)),
      result.schema)
  }

  /** ST7: streaming CDC apply / materialized-view maintenance. Each
    * micro-batch of events is merged into a keyed parquet snapshot
    * (latest row per user) with `Dedup.applyUpserts` inside
    * `foreachBatch`, alternating between two snapshot directories so a
    * reader always sees a complete snapshot. Because the merge is
    * version-resolved (unix_micros(ts)), the final state is independent
    * of batch boundaries and arrival order — which is what the batch
    * oracle checks. At scale the snapshot write is the same one-pass
    * keyed merge as any CDC sink; state lives in the table, not the
    * stream, so there is no growing operator state at all.
    */
  def runUpsertSnapshot(
      spark: SparkSession,
      staging: String,
      workDir: String,
      maxFilesPerTrigger: Int = 2): String = {
    val sch = spark.read.parquet(staging).schema
    val stream = spark.readStream.schema(sch)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(staging)
      .filter(col("event_type") =!= SentinelType)
    val dirs = Array(s"$workDir/snap_a", s"$workDir/snap_b")
    var cur = -1 // index of the current snapshot dir, -1 = none yet
    val q = stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val updates = batch
          .select(col("user_id"), col("ts"), col("value"))
          .withColumn("version", unix_micros(col("ts")))
        val base =
          if (cur < 0) updates.limit(0)
          else batch.sparkSession.read.parquet(dirs(cur))
        val next = (cur + 1 + dirs.length) % dirs.length
        graft.operators.Dedup.applyUpserts(
            base, updates, Seq("user_id"), "version")
          .write.mode("overwrite").parquet(dirs(next))
        cur = next
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    require(cur >= 0, "stream produced no batches")
    dirs(cur)
  }

  /** Sentinel event_type used to push the watermark past the last real
    * window so APPEND-mode sinks flush everything on finite input.
    */
  val SentinelType = "__sentinel"

  /** Stage `events` as a sequence of TIME-RANGE parquet files (µs
    * timestamps) plus one trailing sentinel row 2 h after the last real
    * event.
    *
    * The slices are written one by one in ascending time order, so their
    * mod-times ascend and the file streaming source replays the month in
    * rough event-time order — which is what a watermark requires: a
    * replay whose files each span the whole range would advance the
    * watermark to the global max after batch 1 and DROP every later batch
    * as late data (measured: 472 of 868 windows survive). Real backfills
    * face the same choice — time-partitioned replay or a watermark as
    * wide as the disorder. The sentinel lands last, pushing the final
    * watermark past every real 1-hour window so append mode flushes them.
    */
  def stageEventsWithSentinel(
      spark: SparkSession,
      dir: String,
      staging: String,
      nFiles: Int = 8): Unit = {
    val ev = Lake.table(spark, dir, "events")
    val mm = ev.agg(min(col("ts")).as("mn"), max(col("ts")).as("mx")).head()
    val (minMs, maxMs) = (mm.getTimestamp(0).getTime, mm.getTimestamp(1).getTime)
    val step = math.max(1L, (maxMs - minMs) / nFiles + 1)
    (0 until nFiles).foreach { i =>
      val lo = new java.sql.Timestamp(minMs + i * step)
      val hi = new java.sql.Timestamp(minMs + (i + 1) * step)
      val slice = ev.filter(col("ts") >= lit(lo) && col("ts") < lit(hi)).coalesce(1)
      slice.write.mode(if (i == 0) "overwrite" else "append").parquet(staging)
    }
    val sentinelTs = new java.sql.Timestamp(maxMs + 2 * 3600 * 1000L)
    ev.limit(1).select(
        lit(-1L).as("event_id"),
        lit(sentinelTs).as("ts"),
        lit(-1L).as("user_id"),
        lit(SentinelType).as("event_type"),
        lit(0.0).as("value"),
        lit("{}").as("props"))
      .write.mode("append").parquet(staging)
  }

  /** PRODUCTION-SHAPED streaming pipeline: file source → watermarked
    * tumbling aggregation → parquet FILE sink with a checkpoint, append
    * mode. Exactly-once comes from the checkpoint's offset log + the file
    * sink's _spark_metadata commit log (readers only see committed
    * files); killing and restarting with the same checkpoint resumes
    * without loss or duplication — proven in StreamingRecoverySpec.
    */
  def startTumblingFileSink(
      spark: SparkSession,
      staging: String,
      outPath: String,
      checkpoint: String,
      maxFilesPerTrigger: Int = 4): org.apache.spark.sql.streaming.StreamingQuery = {
    val sch = spark.read.parquet(staging).schema
    val stream = spark.readStream.schema(sch)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(staging)
    tumblingCounts(stream).writeStream
      .format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .start()
  }
}
