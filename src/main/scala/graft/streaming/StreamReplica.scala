package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.core.TxnTable

/** Streaming CDC REPLICATION: keep a second TxnTable (`dstPath`) as a
  * live row-level replica of a source table by following the source's
  * commit log ([[TxnLogSourceProvider]]) and applying each batch's
  * file-scoped change images — the downstream half of the change data
  * feed (S17) that every lake-to-lake / lake-to-serving sync needs.
  *
  * Per micro-batch: ONE [[TxnTable.diffVersionsImages]] spanning the
  * batch's version range (reads only files that changed at the
  * source), then ONE [[TxnTable.applyChanges]] commit at the replica —
  * changed keys deleted, after-images of inserts/updates re-inserted,
  * and the applied source version recorded as a `stream:replica:<v>`
  * marker ON THAT SAME COMMIT, so apply+marker is atomic and a
  * redelivered batch no-ops ([[TxnTable.streamHighWater]] — the same
  * exactly-once discipline as [[StreamIvm]]). A version range whose
  * net row diff is empty (compactions, vacuums, self-cancelling
  * rewrites) advances the marker with a metadata-only
  * [[TxnTable.commitMarker]].
  *
  * Scale: replica work per batch is O(source files changed) reads +
  * O(changed keys) rewrite at the replica (the keyed rewrite prunes to
  * hit files) — a 100 TB replica tracking 1% daily churn pays ~1%
  * per day, never a full copy. `clusterBy` keeps the replica's files
  * key-clustered so its own pruned reads stay tight.
  */
object StreamReplica {

  private val StreamId = "replica"
  private def marker(srcV: Long) = s"stream:$StreamId:$srcV"

  /** Source version the replica currently reflects. */
  def appliedVersion(dstPath: String): Option[Long] =
    TxnTable.streamHighWater(dstPath, StreamId)

  /** Bring the replica up to source version `target` (first call
    * copies the snapshot; later calls apply only the change images;
    * `applied >= target` no-ops). */
  def applyUpTo(spark: SparkSession, srcPath: String, dstPath: String,
      target: Long, keyCols: Seq[String],
      clusterBy: Seq[String] = Nil, mor: Boolean = false): Unit =
    appliedVersion(dstPath) match {
      case None =>
        TxnTable.create(spark, dstPath,
          TxnTable.read(spark, srcPath, target), op = marker(target))
      case Some(a) if a >= target => ()
      case Some(a) =>
        val d = TxnTable.diffVersionsImages(spark, srcPath, a, target,
          keyCols).persist()
        try {
          if (d.isEmpty) { TxnTable.commitMarker(dstPath, marker(target)); () }
          else {
            // restore the table's column order from the after-images
            val cols = TxnTable.read(spark, srcPath, target).columns.toSeq
            val upserts = d.filter(col("op") =!= "delete")
              .select(cols.map(c =>
                if (keyCols.contains(c)) col(c)
                else col(s"after.`$c`").as(c)): _*)
            // mor: changed keys marked dead by DELETION VECTOR +
            // after-images appended — the replica's per-batch cost
            // drops to O(changed rows); apply+marker stays ONE commit
            if (mor)
              TxnTable.applyChangesMor(spark, dstPath,
                d.select(keyCols.map(col): _*), upserts, keyCols,
                op = marker(target))
            else
              TxnTable.applyChanges(spark, dstPath,
                d.select(keyCols.map(col): _*), upserts, keyCols,
                clusterBy = clusterBy.map(col), op = marker(target))
            ()
          }
        } finally { d.unpersist(); () }
    }

  /** [[applyUpTo]] ACROSS SCHEMA CHANGES: segments the version range
    * at every schema-recording source commit, replays each segment's
    * row images under its own (stable) schema, and at each boundary
    * applies the SAME DDL to the replica — derived from the source
    * commit's op string (add / drop / rename / widen, top-level and
    * struct-leaf), so a RENAME preserves the replica's data exactly
    * like the source's column mapping does (a name-diff heuristic
    * would drop-and-re-add, nulling the column). Idempotent on
    * redelivery: a boundary whose schema the replica already has
    * skips the DDL and only re-advances the marker; a crash between
    * the DDL and the marker re-enters through that check. Schema+data
    * single commits stay refused (no single-schema image shape —
    * same contract as the change feed); renaming a KEY column is
    * refused (the replication keys would silently stop binding). */
  def applyUpToFollow(spark: SparkSession, srcPath: String,
      dstPath: String, target: Long, keyCols: Seq[String],
      clusterBy: Seq[String] = Nil, mor: Boolean = false): Unit = {
    if (appliedVersion(dstPath).isEmpty) {
      TxnTable.create(spark, dstPath,
        TxnTable.read(spark, srcPath, target), op = marker(target))
      return
    }
    val applied0 = appliedVersion(dstPath).get
    if (applied0 >= target) return
    val boundaries = TxnTable.commits(srcPath, target).filter(c =>
      c.version > applied0 && c.version > 0 && c.schema.isDefined)
    boundaries.foreach { c =>
      if (c.adds.nonEmpty || c.removes.nonEmpty || c.dvs.nonEmpty)
        throw new IllegalStateException(
          s"replica cannot replay version ${c.version} of $srcPath: " +
            "the commit changed the schema AND data rows in one " +
            "version. Re-materialize the replica from a snapshot at " +
            "or after this version.")
      applyUpTo(spark, srcPath, dstPath, c.version - 1, keyCols,
        clusterBy, mor)
      applyDdl(spark, dstPath, c, keyCols)
      TxnTable.commitMarker(dstPath, marker(c.version))
    }
    applyUpTo(spark, srcPath, dstPath, target, keyCols, clusterBy, mor)
  }

  private def applyDdl(spark: SparkSession, dstPath: String,
      c: graft.core.TxnCommit, keyCols: Seq[String]): Unit = {
    import org.apache.spark.sql.types._
    val want = DataType.fromJson(c.schema.get).asInstanceOf[StructType]
    // name+type signature, nested nullability/metadata erased — the
    // redelivery check (a replica already carrying this shape skips)
    def norm(dt: DataType): DataType = dt match {
      case st: StructType => StructType(st.fields.map(f =>
        StructField(f.name.toLowerCase, norm(f.dataType),
          nullable = true)))
      case ArrayType(et, _) => ArrayType(norm(et), containsNull = true)
      case MapType(k, v, _) =>
        MapType(norm(k), norm(v), valueContainsNull = true)
      case other => other
    }
    def sig(s: StructType): Seq[(String, DataType)] =
      s.fields.toSeq.map(f => (f.name.toLowerCase, norm(f.dataType)))
    val cur = TxnTable.currentSchema(dstPath).getOrElse(
      TxnTable.read(spark, dstPath).schema)
    if (sig(cur) == sig(want)) return // redelivered boundary: DDL done
    def typeAt(dotted: String): DataType =
      dotted.split('.').foldLeft(want: DataType) { (dt, seg) =>
        dt.asInstanceOf[StructType].fields
          .find(_.name.equalsIgnoreCase(seg)).getOrElse(
            throw new IllegalStateException(
              s"source schema commit lacks $dotted")).dataType
      }
    c.op match {
      case op if op.startsWith("alter:add:") =>
        val names = op.stripPrefix("alter:add:").split(',').toSeq
        TxnTable.addColumns(spark, dstPath,
          names.map(n => n -> typeAt(n)))
      case op if op.startsWith("alter:drop:") =>
        TxnTable.dropColumns(spark, dstPath,
          op.stripPrefix("alter:drop:").split(',').toSeq)
      case op if op.startsWith("alter:rename:") =>
        val Array(from, to) =
          op.stripPrefix("alter:rename:").split(':')
        require(!keyCols.exists(_.equalsIgnoreCase(from)),
          s"replica follow: source renamed KEY column $from — " +
            "re-anchor the replication with the new key names")
        TxnTable.renameColumn(spark, dstPath, from, to)
      case op if op.startsWith("alter:widen:") =>
        val name = op.stripPrefix("alter:widen:").split(':').head
        TxnTable.widenColumnType(spark, dstPath, name, typeAt(name))
      case op if op.startsWith("alter:addnested:") =>
        val dotted = op.stripPrefix("alter:addnested:")
        TxnTable.addStructField(spark, dstPath, dotted, typeAt(dotted))
      case op if op.startsWith("alter:widennested:") =>
        val dotted = op.stripPrefix("alter:widennested:")
          .split(':').head
        TxnTable.widenStructFieldType(spark, dstPath, dotted,
          typeAt(dotted))
      case op if op.startsWith("alter:dropnested:") =>
        TxnTable.dropStructField(spark, dstPath,
          op.stripPrefix("alter:dropnested:"))
      case other => throw new IllegalStateException(
        s"replica cannot replay schema commit '$other' — only the " +
          "ALTER family (add/drop/rename/widen, top-level and " +
          "struct-leaf) maps onto replica DDL. Re-materialize the " +
          "replica from a snapshot at or after this version.")
    }
    ()
  }

  /** [[replicate]] that survives source ALTERs: the same AvailableNow
    * pass routed through [[applyUpToFollow]]. */
  def replicateFollow(spark: SparkSession, srcPath: String,
      dstPath: String, keyCols: Seq[String], checkpointDir: String,
      clusterBy: Seq[String] = Nil, mor: Boolean = false): Unit = {
    val q = StreamIvm.changesStream(spark, srcPath).writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
         _: Long) =>
          val mx = batch.agg(max(col("version"))).head()
          if (!mx.isNullAt(0))
            applyUpToFollow(batch.sparkSession, srcPath, dstPath,
              mx.getLong(0), keyCols, clusterBy, mor)
      }
      .start()
    try q.awaitTermination() finally q.stop()
  }

  /** One Trigger.AvailableNow replication pass: drain every source
    * commit not yet applied to the replica, then return. Re-call (same
    * `checkpointDir`) after more source commits, or wire a continuous
    * trigger for an always-on replicator. */
  def replicate(spark: SparkSession, srcPath: String, dstPath: String,
      keyCols: Seq[String], checkpointDir: String,
      clusterBy: Seq[String] = Nil, mor: Boolean = false): Unit = {
    val q = StreamIvm.changesStream(spark, srcPath).writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
         _: Long) =>
          val mx = batch.agg(max(col("version"))).head()
          if (!mx.isNullAt(0))
            applyUpTo(batch.sparkSession, srcPath, dstPath,
              mx.getLong(0), keyCols, clusterBy, mor)
      }
      .start()
    try q.awaitTermination() finally q.stop()
  }
}
