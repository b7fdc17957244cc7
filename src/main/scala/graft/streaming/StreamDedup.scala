package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.TxnTable
import graft.operators.Dedup

/** Streaming near-duplicate suppression at ingest — the incremental
  * form of L2's MinHash banding, with TxnTable as the signature store
  * (the one LLM-pipeline shape batch operators can't cover: the corpus
  * grows micro-batch by micro-batch and each batch must dedup against
  * EVERYTHING already accepted, without rescanning it).
  *
  * Protocol per micro-batch:
  *  1. band the batch's documents (md5-derived MinHash, so signatures
  *     are engine-reproducible and stable across sessions/restarts);
  *  2. one (band, key) equi-join against the COMMITTED signature store
  *     drops any document colliding with a lower-id document from an
  *     earlier batch; a same-batch self-join applies the identical
  *     lower-id-wins rule inside the batch;
  *  3. survivors land in the kept table, and the batch's signatures
  *     (kept AND dropped — the drop rule is "collides with any earlier
  *     document", which keeps the result independent of how the stream
  *     was batched) land in the store — both via
  *     [[TxnTable.appendStreamBatch]], so a redelivered batch is a
  *     no-op on each table independently (the two commits are not
  *     atomic together, but each is idempotent, so a crash between
  *     them heals on redelivery).
  *
  * The result equals the batch rule "drop d iff some document with a
  * smaller id shares a band" — StreamDedupSpec pins that the kept set
  * is IDENTICAL whether the corpus arrives as 1, 3, or 5 micro-batches,
  * provided ingest order follows ids (the monotonic-id arrival real
  * ingest pipelines have; out-of-order arrival would need the store
  * join's `<` guard plus a reconciliation pass, which is the same
  * compaction-style repair any late-data design needs).
  *
  * Scale shape: the store join is keyed on (band, key) — broadcast
  * while the batch is small, shuffle-keyed at web scale; the store
  * itself is an append-only TxnTable (metadata commits, immutable
  * parquet), so "state" costs one pruned read per batch and zero
  * executor memory between batches, unlike mapGroupsWithState whose
  * state must fit the cluster.
  */
object StreamDedup {

  /** Start-to-drain a docs stream through the near-dup gate.
    * @return the kept table path (== `keptPath`). */
  def runNearDupStream(
      spark: SparkSession,
      streamDocs: DataFrame,
      storePath: String,
      keptPath: String,
      streamId: String,
      shingleLen: Int = 3,
      numHashes: Int = 12,
      bands: Int = 4): Unit = {
    val q = streamDocs.writeStream
      .outputMode("append")
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
            batchId: Long) =>
          processBatch(spark, batch.toDF(), batchId, storePath, keptPath,
            streamId, shingleLen, numHashes, bands)
      }
      .start()
    try q.processAllAvailable()
    finally q.stop()
  }

  /** One micro-batch of the protocol above (public so specs can drive
    * batches deterministically without a stream). */
  def processBatch(
      spark: SparkSession,
      batch: DataFrame,
      batchId: Long,
      storePath: String,
      keptPath: String,
      streamId: String,
      shingleLen: Int = 3,
      numHashes: Int = 12,
      bands: Int = 4): Unit = {
    val idCol = "doc_id"
    val sigs = Dedup.minHashBandKeys(batch, "text", idCol,
      shingleLen, numHashes, bands)
      .select(col("id"), col("band"), col("key"))
    // collides with a lower-id document of the SAME batch…
    val batchHits = sigs.as("a")
      .join(sigs.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("b.id") < col("a.id"), "left_semi")
      .select(col("a.id"))
    // …or of an EARLIER batch (committed signature store)
    val dropIds = (if (TxnTable.currentVersion(storePath) < 0) batchHits
      else {
        val store = TxnTable.read(spark, storePath)
        batchHits.unionAll(
          sigs.join(store
              .select(col("band").as("s_band"), col("key").as("s_key"),
                col("id").as("s_id")),
            col("band") === col("s_band") && col("key") === col("s_key") &&
              col("s_id") < col("id"), "left_semi")
            .select(col("id")))
      }).distinct()
    val kept = batch.join(dropIds.withColumnRenamed("id", idCol),
      Seq(idCol), "left_anti")
    appendOrCreate(spark, keptPath, kept, s"$streamId-kept", batchId)
    appendOrCreate(spark, storePath, sigs, s"$streamId-sigs", batchId)
  }

  /** Reconciliation pass for OUT-OF-ORDER arrival — the compaction-style
    * repair the monotonic-id contract otherwise requires. Ingest order
    * can only err in one direction: every drop decision cites a
    * genuinely lower-id collider (so nothing is ever wrongly dropped),
    * but a document kept early can be invalidated by a LATER-arriving
    * lower-id collider. The repair is therefore a pure kept-table
    * delete: one self-join of the committed signature store finds every
    * kept id that collides with any lower-id signature, and
    * [[TxnTable.deleteMatching]] removes those docs in one commit —
    * distributive end to end (the doomed set is a DataFrame, never a
    * driver-side list). After reconcile, the kept table equals the
    * batch rule regardless of arrival order (st12b gate + spec).
    *
    * Scale shape: the self-join is the SAME (band, key) equi-join every
    * batch already pays, once, over the accumulated store; idempotent
    * (a second run deletes nothing), so it can ride any maintenance
    * schedule.
    */
  def reconcile(spark: SparkSession, storePath: String,
      keptPath: String): Long = {
    val store = TxnTable.read(spark, storePath)
    val doomed = store.as("a")
      .join(store.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("b.id") < col("a.id"), "left_semi")
      .select(col("a.id").as("doc_id")).distinct()
    TxnTable.deleteMatching(spark, keptPath, doomed, Seq("doc_id"))
  }

  /** Exactly-once append that also creates the table on first sight.
    * The create commits the SCHEMA only (zero rows), so every data
    * batch — including the first — goes through appendStreamBatch and
    * is replay-protected by its recorded batch id; a lost create race
    * just falls through. */
  private def appendOrCreate(spark: SparkSession, path: String,
      df: DataFrame, streamId: String, batchId: Long): Unit = {
    if (TxnTable.currentVersion(path) < 0) {
      try TxnTable.create(spark, path, df.limit(0))
      catch { case _: TxnTable.TxnConflictException => () }
    }
    TxnTable.appendStreamBatch(spark, path, df, streamId, batchId)
    ()
  }
}
