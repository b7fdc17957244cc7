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

  /** Run a finite streaming DataFrame to completion into a memory sink and
    * return its rows as a plain local DataFrame (detached from the sink so
    * later queries can reuse the name).
    */
  def runToMemory(
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
}
