package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpecBase

case class Ev(event_id: Long, ts: Timestamp, user_id: Long, value: Double)

/** MemoryStream-driven checks of the stateful streaming semantics the
  * batch-equivalence gate can't see: multi-batch incremental processing,
  * watermark-based late-data dropping (ST4's second half), and dedup
  * state across batches.
  */
class StreamingSpec extends SparkSpecBase {
  import spark.implicits._

  private def t(minutes: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minutes / 60}%02d:${minutes % 60}%02d:00")

  test("windowed agg in append mode drops events later than the watermark") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Ev]
    val agg = mem.toDF()
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("c"))
      .select(col("window.start").as("h"), col("c"))
    val q = agg.writeStream.format("memory").queryName("late_test")
      .outputMode("append").start()
    try {
      // batch 1: three events in hour 0, watermark ends up at 0:50
      mem.addData(Ev(1, t(5), 1, 1.0), Ev(2, t(30), 1, 1.0), Ev(3, t(60 * 5), 1, 1.0))
      q.processAllAvailable()
      // batch 2: a LATE event for hour 0 (watermark has passed 1:00 after
      // batch 1's max 5:00 − 10m) — must be dropped, not re-open the window
      mem.addData(Ev(4, t(10), 1, 1.0))
      q.processAllAvailable()
      // batch 3: advance watermark far so everything flushes
      mem.addData(Ev(5, t(60 * 10), 1, 1.0))
      q.processAllAvailable()
      val rows = spark.table("late_test")
        .collect().map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
      assert(rows(t(0)) == 2, s"late event was not dropped: $rows")
    } finally q.stop()
  }

  test("dropDuplicates holds state across batches") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Ev]
    val out = mem.toDF().dropDuplicates("event_id")
    val q = out.writeStream.format("memory").queryName("dedup_test")
      .outputMode("append").start()
    try {
      mem.addData(Ev(1, t(0), 1, 1.0), Ev(2, t(1), 1, 1.0))
      q.processAllAvailable()
      mem.addData(Ev(2, t(2), 1, 9.9), Ev(3, t(3), 1, 1.0)) // 2 is a dup
      q.processAllAvailable()
      assert(spark.table("dedup_test").count() == 3)
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark bounds state yet dedups in-window") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Ev]
    val out = mem.toDF()
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
    val q = out.writeStream.format("memory").queryName("ddw_test")
      .outputMode("append").start()
    try {
      // batch 1: two events + an in-batch duplicate — one survivor each.
      mem.addData(Ev(1, t(0), 1, 1.0), Ev(1, t(0), 1, 1.0), Ev(2, t(5), 1, 1.0))
      q.processAllAvailable()
      // batch 2: duplicate of id 1 arriving within the watermark — dropped.
      mem.addData(Ev(1, t(6), 1, 2.0))
      q.processAllAvailable()
      assert(spark.table("ddw_test").count() == 2,
        "in-window duplicate not dropped")
      // batch 3: far-future event expires old state (watermark passes
      // t(0)+10min); the operator guarantees dedup only WITHIN the
      // watermark, so state for ids 1/2 may now be evicted — the point
      // is bounded state, proven by the state-store metrics.
      mem.addData(Ev(3, t(600), 1, 1.0))
      q.processAllAvailable()
      val rowsInState = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(rowsInState <= 2,
        s"state not bounded by watermark: $rowsInState rows retained")
    } finally q.stop()
  }

  test("stream-stream join matches across micro-batches, within the range") {
    implicit val sc = spark.sqlContext
    val pm = MemoryStream[Ev]
    val cm = MemoryStream[Ev]
    def typed(df: org.apache.spark.sql.DataFrame, tpe: String) =
      df.withColumn("event_type", lit(tpe)).withColumn("props", lit("{}"))
    val joined = EventStreams.purchaseClickJoin(
      typed(pm.toDF(), "purchase"), typed(cm.toDF(), "click"))
    val q = joined.writeStream.format("memory").queryName("ssj_test")
      .outputMode("append").start()
    try {
      // batch 1: one click at 0:10
      cm.addData(Ev(100, t(10), 7, 1.0))
      q.processAllAvailable()
      // batch 2: purchase at 1:00 (same user) — must match the click
      // BUFFERED from the earlier batch; a different-user purchase and an
      // out-of-range purchase (7h later) must not match anything.
      pm.addData(Ev(200, t(60), 7, 1.0), Ev(201, t(60), 8, 1.0),
        Ev(202, t(60 * 7 + 20), 7, 1.0))
      q.processAllAvailable()
      val got = spark.table("ssj_test").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === Set((200L, 100L)))
    } finally q.stop()
  }

  test("sliding windows assign each event to window/slide windows") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Ev]
    val agg = mem.toDF()
      .groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("c"))
    val q = agg.writeStream.format("memory").queryName("slide_test")
      .outputMode("complete").start()
    try {
      mem.addData(Ev(1, t(20), 1, 1.0))
      q.processAllAvailable()
      assert(spark.table("slide_test").count() == 4) // 60/15 windows
    } finally q.stop()
  }
}
