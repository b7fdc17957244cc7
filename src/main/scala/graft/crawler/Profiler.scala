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

/** Column profiling: ONE wide aggregation pass — a single scan of the
  * dataset — computes row count, per-column non-null counts, min/max, an
  * HLL distinct estimate AND an exact-below-threshold distinct count (the
  * capped BoundedDistinct aggregate: exact while ≤ threshold distinct
  * values, null → fall back to the HLL estimate once over). The driver
  * only ever receives O(columns) values — never data — so the same plan
  * profiles a 100 TB dataset: a partial-aggregated scan with O(threshold)
  * worst-case aggregation state per column, one shuffle of a single row
  * of sketch buffers, and no second scan (the previous design re-scanned
  * the table to upgrade small-cardinality columns with countDistinct).
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
    val cap = exactDistinctThreshold.min(Int.MaxValue.toLong).toInt
    val aggs: Seq[Column] =
      count(lit(1)).as("__total") +: fields.flatMap { f =>
        val c = col(s"`${f.name}`")
        Seq(
          count(c).as(s"cnt__${f.name}"),
          approx_count_distinct(c).as(s"adist__${f.name}"),
          graft.plans.BoundedDistinct.bounded_distinct(c, cap)
            .as(s"bdist__${f.name}")) ++
          (if (orderable(f.dataType))
            Seq(min(c).cast("string").as(s"min__${f.name}"),
              max(c).cast("string").as(s"max__${f.name}"))
          else Nil)
      }
    val row: Row = df.agg(aggs.head, aggs.tail: _*).head()
    val total = row.getAs[Long]("__total")

    fields.map { f =>
      val bIdx = row.fieldIndex(s"bdist__${f.name}")
      val exact: Option[Long] =
        if (row.isNullAt(bIdx)) None else Some(row.getLong(bIdx))
      ColumnProfile(
        dataset = dataset,
        column = f.name,
        dtype = f.dataType.simpleString,
        cnt = row.getAs[Long](s"cnt__${f.name}"),
        nulls = total - row.getAs[Long](s"cnt__${f.name}"),
        ndistinct = exact.getOrElse(row.getAs[Long](s"adist__${f.name}")),
        distinctIsExact = exact.isDefined,
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

  /** [[profile]] extended to NESTED leaves (SURVEY §2.8 C3 residual:
    * the s12-shaped datasets the crawler discovers deserve more than
    * hollow top-level rows for their struct/array columns):
    *  - **struct leaves** (any nesting depth) join the SAME single wide
    *    pass as top-level columns — each is just a dotted projection
    *    (`cust.c_mktsegment`), so flattening costs zero extra scans and
    *    the parquet reader prunes to exactly the profiled leaves;
    *  - **array elements** are profiled per element leaf (`items[]` for
    *    primitive elements, `items[].l_quantity` for struct elements)
    *    via ONE column-pruned explode pass PER ARRAY COLUMN — the only
    *    shape that yields true element-level distinct counts; the scan
    *    reads only that array column (ReadSchema prunes the rest), so
    *    at 100 TB each pass is O(that column's bytes), not O(table).
    *    `cnt` counts non-null ELEMENTS; `nulls` counts null elements
    *    (rows with null/empty arrays contribute none);
    *  - maps and arrays nested INSIDE structs/arrays stay skipped
    *    (unbounded key spaces / no stable leaf path) — same contract as
    *    [[orderable]]'s conservatism.
    */
  def profileNested(
      spark: SparkSession,
      df: DataFrame,
      dataset: String,
      exactDistinctThreshold: Long = 100000L): Seq[ColumnProfile] = {
    def structLeaves(prefix: String, dt: DataType): Seq[String] = dt match {
      case st: StructType => st.fields.toSeq.flatMap(f =>
        structLeaves(s"$prefix.${f.name}", f.dataType))
      case _: ArrayType | _: MapType => Nil
      case _ => Seq(prefix)
    }
    val flatPaths = df.schema.fields.toSeq.flatMap { f =>
      f.dataType match {
        case st: StructType => structLeaves(f.name, st)
        case _: ArrayType | _: MapType => Nil
        case _ => Seq(f.name)
      }
    }
    val flatPass =
      if (flatPaths.isEmpty) Nil
      else profile(spark,
        df.select(flatPaths.map(p => col(p).as(p)): _*),
        dataset, exactDistinctThreshold)
    val arrayPasses = df.schema.fields.toSeq.flatMap { f =>
      f.dataType match {
        case ArrayType(st: StructType, _) =>
          val leaves = st.fields.toSeq.flatMap(g =>
            structLeaves(g.name, g.dataType))
          if (leaves.isEmpty) Nil
          else profile(spark,
            df.select(explode(col(f.name)).as("__e"))
              .select(leaves.map(p =>
                col(s"__e.$p").as(s"${f.name}[].$p")): _*),
            dataset, exactDistinctThreshold)
        case ArrayType(_: ArrayType | _: MapType, _) => Nil
        case _: ArrayType =>
          profile(spark,
            df.select(explode(col(f.name)).as(s"${f.name}[]")),
            dataset, exactDistinctThreshold)
        case _ => Nil
      }
    }
    flatPass ++ arrayPasses
  }

  def profileNestedDF(spark: SparkSession, df: DataFrame, dataset: String,
      exactDistinctThreshold: Long = 100000L): DataFrame = {
    import spark.implicits._
    profileNested(spark, df, dataset, exactDistinctThreshold).toDF()
  }

  /** Exact top-k most frequent values of one column (for small-cardinality
    * string columns; at scale swap in a count-min sketch before this).
    */
  def topK(df: DataFrame, column: String, k: Int): DataFrame =
    df.groupBy(col(s"`$column`").cast("string").as("value"))
      .agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("value"))
      .limit(k)

  /** Equi-depth histogram of a numeric column: boundaries at exact
    * i/buckets quantiles (one aggregate — O(buckets) values), bucket id =
    * number of boundaries strictly below the value (a broadcast of one
    * row + a map-side expression), per-bucket count/min/max. The
    * ANALYZE-style statistic a catalog stores for selectivity
    * estimation; swap `percentile` for `approx_percentile` at 100 TB.
    */
  def equiDepthHistogram(df: DataFrame, column: String, buckets: Int): DataFrame = {
    require(buckets >= 2 && buckets <= 1000)
    val v = col(s"`$column`").cast("double")
    val qAggs = (1 until buckets).map(i =>
      percentile(v, lit(i.toDouble / buckets)).as(s"__q$i"))
    val qs = df.agg(qAggs.head, qAggs.tail: _*)
    val bucketId = (1 until buckets)
      .map(i => (v > col(s"__q$i")).cast("long"))
      .reduce(_ + _)
    // null values have no bucket (quantiles ignore them too) — exclude
    // them rather than emitting a meaningless bucket=null group
    df.filter(v.isNotNull).crossJoin(broadcast(qs))
      .withColumn("bucket", bucketId)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("c"), min(v).as("lo"), max(v).as("hi"))
      .orderBy(col("bucket"))
  }
}
