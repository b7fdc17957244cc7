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
}
