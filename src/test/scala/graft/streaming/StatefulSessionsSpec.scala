package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.core.Lake

/** The hand-rolled flatMapGroupsWithState sessionizer must agree EXACTLY
  * with the batch lag/running-sum formulation (q16's oracle) over the
  * real sf0.001 events — the strongest equivalence available for custom
  * state code.
  */
class StatefulSessionsSpec extends SparkSpecBase {
  import spark.implicits._

  test("stateful sessionizer == batch window-function sessions on sf0.001") {
    // batch truth: lag/running-sum sessionization, no limit
    Lake.registerAll(spark, sf0001)
    val batch = spark.sql(
      """WITH g AS (SELECT user_id, ts,
        |  CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |       OR unix_micros(ts) - unix_micros(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) > 1800000000
        |       THEN 1 ELSE 0 END AS ns FROM events),
        |     s AS (SELECT user_id, ts, sum(ns) OVER (PARTITION BY user_id ORDER BY ts) AS sid FROM g)
        |SELECT user_id, min(ts) st, max(ts) en, count(*) n
        |FROM s GROUP BY user_id, sid""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
      .toSet

    // streaming: batch 1 = all real events; batch 2 = far-future sentinel
    // for a ghost user to push the watermark past every open session
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[SessionEvent]
    val out = StatefulSessions.sessionize(mem.toDS(), gapMinutes = 30)
    val q = out.writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      val evs = Lake.table(spark, sf0001, "events")
        .select(col("user_id"), col("ts")).as[SessionEvent].collect()
      mem.addData(evs.toIndexedSeq: _*)
      q.processAllAvailable()
      mem.addData(SessionEvent(-1L, Timestamp.valueOf("2030-01-01 00:00:00")))
      q.processAllAvailable()
      val streamed = spark.table("sess_out")
        .filter(col("user_id") =!= -1L)
        .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
        .toSet
      assert(streamed == batch,
        s"missing=${(batch -- streamed).take(3)} extra=${(streamed -- batch).take(3)} " +
          s"sizes s=${streamed.size} b=${batch.size}")
    } finally q.stop()
  }

  test("sessions split exactly at the gap boundary across batches") {
    implicit val sc = spark.sqlContext
    def t(min: Int) = Timestamp.valueOf(f"2024-01-01 ${min / 60}%02d:${min % 60}%02d:00")
    val mem = MemoryStream[SessionEvent]
    val q = StatefulSessions.sessionize(mem.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sess_gap")
      .outputMode("append").start()
    try {
      mem.addData(SessionEvent(1, t(0)), SessionEvent(1, t(29)))   // one session
      q.processAllAvailable()
      mem.addData(SessionEvent(1, t(60)))                           // gap 31min → new
      q.processAllAvailable()
      mem.addData(SessionEvent(-1, t(600)))                         // flush
      q.processAllAvailable()
      val sessions = spark.table("sess_gap").filter(col("user_id") === 1)
        .orderBy("st").collect().map(r => (r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
      assert(sessions.toSeq == Seq((t(0), t(29), 2L), (t(60), t(60), 1L)))
    } finally q.stop()
  }
}
