package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed snapshot diff — CDC extraction between two versions of a table
  * (SURVEY §2.7 widening): given OLD and NEW snapshots and a key, emit
  * one row per changed key with op ∈ insert | delete | update. This is
  * the inverse of `Dedup.applyUpserts` (which APPLIES a change feed);
  * together they round-trip: applyUpserts(old, diff(old,new)) == new.
  *
  * Scale notes: one hash shuffle per side on the key (the join), and the
  * payload comparison happens on a fixed-width md5 per row computed
  * map-side — wide rows never face a column-by-column comparison after
  * the shuffle. No driver state; output is proportional to the DELTA,
  * not the table.
  */
object SnapshotDiff {

  /** md5 over an UNAMBIGUOUS row encoding: JSON of the payload struct
    * with null fields kept. Separator/sentinel concatenation schemes
    * stay ambiguous for values containing the separator or sentinel
    * bytes; JSON's quoting and explicit nulls rule every collision out
    * (and handle binary/array payload columns for free).
    */
  private def payloadHash(cols: Seq[String]) =
    md5(to_json(struct(cols.map(col): _*),
      Map("ignoreNullFields" -> "false")))

  /** Diff `newDf` against `oldDf` on `keyCols`. Both sides must be keyed
    * (at most one row per key; enforce upstream with `Dedup.exactDedup`).
    * Output: keyCols ++ (op, payload columns from the NEW side — null for
    * deletes). Unchanged keys are absent.
    */
  def diff(oldDf: DataFrame, newDf: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column")
    val payload = newDf.columns.filterNot(keyCols.contains).toSeq
    require(payload == oldDf.columns.filterNot(keyCols.contains).toSeq,
      "old and new snapshots must share the same payload columns")
    val o = oldDf.select(
      keyCols.map(col) :+ payloadHash(payload).as("__old_hash"): _*)
    val n = newDf.select(
      keyCols.map(col) ++ payload.map(col) :+ payloadHash(payload).as("__new_hash"): _*)
    o.join(n, keyCols, "full_outer")
      .withColumn("op",
        when(col("__old_hash").isNull, lit("insert"))
          .when(col("__new_hash").isNull, lit("delete"))
          .when(col("__old_hash") =!= col("__new_hash"), lit("update"))
          .otherwise(lit("unchanged")))
      .filter(col("op") =!= "unchanged")
      .select(keyCols.map(col) ++ Seq(col("op")) ++ payload.map(col): _*)
  }

  /** [[diff]] with BOTH row images — the change-data-feed shape
    * incremental consumers need (a delete's or update's OLD values are
    * what a downstream aggregate must subtract; the plain diff carries
    * only the new side). Output: keyCols ++ (op, before, after) where
    * `before`/`after` are payload structs, null for inserts/deletes
    * respectively. Same keyed contract and the same one-shuffle,
    * hash-compared shape as [[diff]].
    */
  def diffImages(oldDf: DataFrame, newDf: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column")
    val payload = newDf.columns.filterNot(keyCols.contains).toSeq
    require(payload == oldDf.columns.filterNot(keyCols.contains).toSeq,
      "old and new snapshots must share the same payload columns")
    val o = oldDf.select(
      keyCols.map(col) :+ struct(payload.map(col): _*).as("before") :+
        payloadHash(payload).as("__old_hash"): _*)
    val n = newDf.select(
      keyCols.map(col) :+ struct(payload.map(col): _*).as("after") :+
        payloadHash(payload).as("__new_hash"): _*)
    o.join(n, keyCols, "full_outer")
      .withColumn("op",
        when(col("__old_hash").isNull, lit("insert"))
          .when(col("__new_hash").isNull, lit("delete"))
          .when(col("__old_hash") =!= col("__new_hash"), lit("update"))
          .otherwise(lit("unchanged")))
      .filter(col("op") =!= "unchanged")
      .select(keyCols.map(col) ++
        Seq(col("op"), col("before"), col("after")): _*)
  }
}
