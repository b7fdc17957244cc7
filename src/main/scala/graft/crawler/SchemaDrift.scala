package graft.crawler

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Schema-drift detection between two catalog snapshots (crawler surface
  * widening, SURVEY §2.8): given two per-column schema tables of the
  * shape (dataset, col_name, dtype, position) — exactly what
  * `LakeCrawler.extractSchema` flattens to — report every column that was
  * added, removed, or retyped, plus positional moves.
  *
  * Scale notes: schema tables are metadata-sized (O(datasets × columns)),
  * so the full-outer join is trivially cheap; the operator still avoids
  * any driver-side set logic so the same code serves a 100k-dataset lake.
  */
object SchemaDrift {

  /** Flatten a crawled lake dir into the canonical schema table. */
  def schemaTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    LakeCrawler.discover(spark, dir).flatMap { info =>
      LakeCrawler.extractSchema(spark, info).fields.zipWithIndex.map {
        case (f, i) => (info.name, f.name, f.dataType.simpleString, i)
      }
    }.toDF("dataset", "col_name", "dtype", "position")
  }

  /** Diff two schema tables. Output one row per drifted column:
    * (dataset, col_name, change ∈ added|removed|retyped|moved,
    *  old_type, new_type, old_pos, new_pos). Unchanged columns are
    * omitted. A column both retyped and moved reports `retyped` (the
    * type change is the breaking one).
    */
  def diff(oldSchema: DataFrame, newSchema: DataFrame): DataFrame = {
    val o = oldSchema.select(col("dataset"), col("col_name"),
      col("dtype").as("old_type"), col("position").as("old_pos"))
    val n = newSchema.select(col("dataset"), col("col_name"),
      col("dtype").as("new_type"), col("position").as("new_pos"))
    o.join(n, Seq("dataset", "col_name"), "full_outer")
      .withColumn("change",
        when(col("old_type").isNull, lit("added"))
          .when(col("new_type").isNull, lit("removed"))
          .when(col("old_type") =!= col("new_type"), lit("retyped"))
          .when(col("old_pos") =!= col("new_pos"), lit("moved"))
          .otherwise(lit("unchanged")))
      .filter(col("change") =!= "unchanged")
      .select("dataset", "col_name", "change", "old_type", "new_type",
        "old_pos", "new_pos")
  }

  /** DATA drift (the companion to schema drift): per-bucket row-count
    * comparison of a numeric column between two snapshots over a FIXED
    * equi-width grid, plus the per-bucket absolute difference (the L1
    * drift mass — integer-exact, unlike PSI/KL whose logs invite
    * cross-engine float noise). One aggregation per side over O(buckets)
    * groups; alert when `sum(l1)/rows` exceeds a threshold.
    */
  def dataDrift(oldDf: DataFrame, newDf: DataFrame, column: String,
      lo: Double, hi: Double, buckets: Int): DataFrame = {
    require(buckets > 0 && hi > lo)
    def bucketed(df: DataFrame, out: String): DataFrame = {
      val v = col(column).cast("double")
      val b = least(greatest(
        floor((v - lo) * buckets / (hi - lo)).cast("long"), lit(0L)),
        lit(buckets - 1L))
      df.filter(v.isNotNull).groupBy(b.as("bucket"))
        .agg(count(lit(1)).as(out))
    }
    bucketed(oldDf, "old_n")
      .join(bucketed(newDf, "new_n"), Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("old_n"), lit(0L)).as("old_n"),
        coalesce(col("new_n"), lit(0L)).as("new_n"))
      .withColumn("l1", abs(col("old_n") - col("new_n")))
  }
}
