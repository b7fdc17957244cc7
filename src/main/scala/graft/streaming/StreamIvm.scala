package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.core.TxnTable
import graft.operators.IncrementalView

/** CONTINUOUS incremental view maintenance: a Structured-Streaming
  * query follows a TxnTable's commit log ([[TxnLogSourceProvider]])
  * and folds each new version's file-scoped change images into a
  * materialized min/max/count/sum view stored as its OWN TxnTable —
  * the capstone of the S17 (change data feed) + S18 (IVM fold) pair.
  *
  * Exactly-once without two-phase anything:
  *  - the SOURCE offset (last seen log version) is checkpointed by
  *    Structured Streaming, so a restarted query re-reads from the
  *    last committed batch;
  *  - the SINK records the source version each view state reflects as
  *    a per-stream transaction marker (`stream:ivm:<srcVersion>` op,
  *    [[TxnTable.streamHighWater]]) — a redelivered batch sees
  *    `applied >= target` and no-ops, the same marker discipline as
  *    [[TxnTable.appendStreamBatch]].
  * Together: each source version is folded into the view exactly once,
  * whatever crashes or redeliveries happen between them.
  *
  * Scale: per batch, ONE [[TxnTable.diffVersionsImages]] spanning the
  * batch's whole version range (file-scoped — reads only files that
  * changed), one fold, and a recompute of only extreme-affected groups
  * via pruned reads ([[IncrementalView]]). The view table write is
  * O(groups). The stream itself carries only (version, op) metadata.
  */
object StreamIvm {

  /** The commit-log change stream of `tablePath`: one `(version, op)`
    * row per commit, micro-batched from the checkpointed offset.
    * `startingVersion` (a version number, or `"latest"` for
    * tail-follow) sets where a FRESH checkpoint starts — absent means
    * the whole history from v0. */
  def changesStream(spark: SparkSession, tablePath: String,
      startingVersion: Option[String] = None): DataFrame = {
    val r = spark.readStream.format(classOf[TxnLogSourceProvider].getName)
      .option("path", tablePath)
    startingVersion.fold(r)(s => r.option("startingVersion", s)).load()
  }

  private val StreamId = "ivm"
  private def marker(srcV: Long) = s"stream:$StreamId:$srcV"

  /** Source version the view at `viewPath` currently reflects. */
  def appliedVersion(viewPath: String): Option[Long] =
    TxnTable.streamHighWater(viewPath, StreamId)

  /** Bring the view up to `target`: first call materializes directly,
    * later calls fold `applied → target` incrementally; `applied >=
    * target` no-ops (redelivery). Returns the step's pruned-read stats
    * (None when nothing was folded). */
  def applyUpTo(spark: SparkSession, tablePath: String, viewPath: String,
      target: Long, keyCols: Seq[String], groupCol: String,
      valueCol: String): Option[IncrementalView.StepStats] =
    appliedVersion(viewPath) match {
      case None =>
        val state0 = IncrementalView.materializeMinMax(
          TxnTable.read(spark, tablePath, target), groupCol, valueCol)
        TxnTable.create(spark, viewPath, state0, op = marker(target))
        None
      case Some(a) if a >= target => None
      case Some(a) =>
        val (next, stats) = IncrementalView.maintainMinMaxStep(spark,
          tablePath, TxnTable.read(spark, viewPath), a, target,
          keyCols, groupCol, valueCol)
        TxnTable.overwrite(spark, viewPath, next, op = marker(target))
        Some(stats)
    }

  /** Run one Trigger.AvailableNow maintenance pass: drain every commit
    * of `tablePath` not yet reflected in `viewPath`, folding per
    * micro-batch, then return. Call again (same `checkpointDir`) after
    * more commits — or wire the same writeStream with a continuous
    * trigger for an always-on maintainer. */
  def maintainMinMaxView(spark: SparkSession, tablePath: String,
      viewPath: String, keyCols: Seq[String], groupCol: String,
      valueCol: String, checkpointDir: String): Unit = {
    val q = changesStream(spark, tablePath).writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
         _: Long) =>
          val mx = batch.agg(max(col("version"))).head()
          if (!mx.isNullAt(0)) {
            applyUpTo(batch.sparkSession, tablePath, viewPath,
              mx.getLong(0), keyCols, groupCol, valueCol)
            ()
          }
      }
      .start()
    try q.awaitTermination() finally q.stop()
  }
}
