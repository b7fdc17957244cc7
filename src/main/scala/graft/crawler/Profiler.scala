package graft.crawler

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-column profile emitted by the crawler (SURVEY.md §2.8 C3). */
case class ColumnProfile(
    dataset: String,
    column: String,
    dtype: String,
    cnt: Long,
    nulls: Long,
    ndistinct: Long,
    distinctIsExact: Boolean,
    min_s: Option[String],
    max_s: Option[String])

/** Column profiling: ONE wide aggregation pass computes row count,
  * per-column non-null counts, HLL distinct estimates and min/max; a
  * second (cheap) pass upgrades the distinct count to exact for columns
  * whose estimate is below the threshold. The driver only ever receives
  * O(columns) values — never data — so the same plan profiles a 100 TB
  * dataset (the wide agg is a partial-aggregated scan, no shuffle of rows,
  * one shuffle of a single row of sketch buffers).
  */
object Profiler {

  /** Can this type be min/max'd and rendered stably as a string? */
  private def orderable(dt: DataType): Boolean = dt match {
    case _: ArrayType | _: MapType | _: StructType | BinaryType => false
    case _ => true
  }

  def profile(
      spark: SparkSession,
      df: DataFrame,
      dataset: String,
      exactDistinctThreshold: Long = 100000L): Seq[ColumnProfile] = {
    val fields = df.schema.fields.toSeq
    val aggs: Seq[Column] =
      count(lit(1)).as("__total") +: fields.flatMap { f =>
        val c = col(s"`${f.name}`")
        Seq(
          count(c).as(s"cnt__${f.name}"),
          approx_count_distinct(c).as(s"adist__${f.name}")) ++
          (if (orderable(f.dataType))
            Seq(min(c).cast("string").as(s"min__${f.name}"),
              max(c).cast("string").as(s"max__${f.name}"))
          else Nil)
      }
    val row: Row = df.agg(aggs.head, aggs.tail: _*).head()
    val total = row.getAs[Long]("__total")

    val approx = fields.map(f => f.name -> row.getAs[Long](s"adist__${f.name}")).toMap
    // Second pass: exact distinct where the estimate says it's affordable.
    val exactCols = fields.filter(f => approx(f.name) <= exactDistinctThreshold * 2)
    val exact: Map[String, Long] =
      if (exactCols.isEmpty) Map.empty
      else {
        val exAggs = exactCols.map(f =>
          countDistinct(col(s"`${f.name}`")).as(s"d__${f.name}"))
        val exRow = df.agg(exAggs.head, exAggs.tail: _*).head()
        exactCols.map(f => f.name -> exRow.getAs[Long](s"d__${f.name}")).toMap
      }

    fields.map { f =>
      val isExact = exact.contains(f.name)
      ColumnProfile(
        dataset = dataset,
        column = f.name,
        dtype = f.dataType.simpleString,
        cnt = row.getAs[Long](s"cnt__${f.name}"),
        nulls = total - row.getAs[Long](s"cnt__${f.name}"),
        ndistinct = exact.getOrElse(f.name, approx(f.name)),
        distinctIsExact = isExact,
        min_s = if (orderable(f.dataType))
          Option(row.getAs[String](s"min__${f.name}")) else None,
        max_s = if (orderable(f.dataType))
          Option(row.getAs[String](s"max__${f.name}")) else None)
    }
  }

  def profileDF(spark: SparkSession, df: DataFrame, dataset: String,
      exactDistinctThreshold: Long = 100000L): DataFrame = {
    import spark.implicits._
    profile(spark, df, dataset, exactDistinctThreshold).toDF()
  }

  /** Exact top-k most frequent values of one column (for small-cardinality
    * string columns; at scale swap in a count-min sketch before this).
    */
  def topK(df: DataFrame, column: String, k: Int): DataFrame =
    df.groupBy(col(s"`$column`").cast("string").as("value"))
      .agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("value"))
      .limit(k)
}
