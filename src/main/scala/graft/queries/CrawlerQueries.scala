package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.crawler.{CatalogStore, LakeCrawler, Profiler}

/** Gate entries for the crawler/catalog surface (SURVEY.md §2.8 C1–C5).
  * C1/C2/C5 are checked against constant oracles (the corpus is fixed and
  * known); C3 is checked against a computed DuckDB profile of the same
  * table — a genuine cross-engine profiling oracle.
  */
object CrawlerQueries {

  /** C1: lake walk + format detection over the sf dir. */
  def c1Discover(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    LakeCrawler.discover(spark, dir)
      .map(i => (i.name, i.format, i.numFiles))
      .toDF("name", "format", "num_files")
      .orderBy(col("name"))
  }

  /** C2: extracted ingest schema of every discovered dataset. */
  def c2Schemas(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    LakeCrawler.discover(spark, dir).flatMap { info =>
      LakeCrawler.extractSchema(spark, info).fields.zipWithIndex.map {
        case (f, i) => (info.name, f.name, f.dataType.simpleString, i)
      }
    }.toDF("dataset", "col_name", "dtype", "position")
      .orderBy(col("dataset"), col("position"))
  }

  /** C3: single-pass column profile of `customer`, cross-checked against
    * DuckDB computing the same statistics.
    */
  def c3ProfileCustomer(spark: SparkSession, dir: String): DataFrame = {
    val customer = graft.core.Lake.table(spark, dir, "customer")
    Profiler.profileDF(spark, customer, "customer")
      .select(col("column").as("col_name"), col("cnt"), col("nulls"),
        col("ndistinct"), col("min_s"), col("max_s"))
      .orderBy(col("col_name"))
  }

  /** C3 (top-k frequent values): exact top-3 most frequent customer
    * market segments from the profiler's topK, cross-engine checked.
    */
  def c3TopkMktsegment(spark: SparkSession, dir: String): DataFrame =
    Profiler.topK(graft.core.Lake.table(spark, dir, "customer"), "c_mktsegment", 3)

  /** C4+C5: full crawl → snapshot → incremental re-crawl over the
    * unchanged lake must show zero drift. Exercises catalog write + read
    * + diff end-to-end; the oracle is the invariant (10,0,0,0).
    */
  def c5Incremental(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val snap1 = Files.createTempDirectory("graft_snap1").toString
    val snap2 = Files.createTempDirectory("graft_snap2").toString
    CatalogStore.crawl(spark, dir, snap1)
    val d = CatalogStore.incrementalCrawl(spark, dir, snap1, snap2)
    Seq((d.unchanged.size.toLong, d.changed.size.toLong,
        d.added.size.toLong, d.removed.size.toLong))
      .toDF("unchanged", "changed", "added", "removed")
  }

  val all: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "c1_discover"         -> (c1Discover _),
    "c2_schemas"          -> (c2Schemas _),
    "c3_profile_customer" -> (c3ProfileCustomer _),
    "c3_topk_mktsegment"  -> (c3TopkMktsegment _),
    "c5_incremental"      -> (c5Incremental _))

  private val expectedSchemas: Seq[(String, Seq[(String, String)])] = Seq(
    "customer" -> Seq("c_custkey" -> "bigint", "c_name" -> "string",
      "c_nationkey" -> "int", "c_acctbal" -> "double", "c_mktsegment" -> "string"),
    "documents" -> Seq("doc_id" -> "bigint", "text" -> "string",
      "lang" -> "string", "source" -> "string", "n_chars" -> "bigint"),
    "embeddings" -> Seq("vec_id" -> "bigint", "embedding" -> "array<float>",
      "label" -> "int"),
    "events" -> Seq("event_id" -> "bigint", "ts" -> "timestamp",
      "user_id" -> "bigint", "event_type" -> "string", "value" -> "double",
      "props" -> "string"),
    "lineitem" -> Seq("l_orderkey" -> "bigint", "l_partkey" -> "bigint",
      "l_suppkey" -> "bigint", "l_linenumber" -> "int", "l_quantity" -> "double",
      "l_extendedprice" -> "double", "l_discount" -> "double", "l_tax" -> "double",
      "l_returnflag" -> "string", "l_linestatus" -> "string",
      "l_shipdate" -> "timestamp"),
    "nation" -> Seq("n_nationkey" -> "int", "n_name" -> "string",
      "n_regionkey" -> "int"),
    "orders" -> Seq("o_orderkey" -> "bigint", "o_custkey" -> "bigint",
      "o_orderstatus" -> "string", "o_totalprice" -> "double",
      "o_orderdate" -> "timestamp", "o_orderpriority" -> "string"),
    "part" -> Seq("p_partkey" -> "bigint", "p_name" -> "string",
      "p_brand" -> "string", "p_type" -> "string", "p_size" -> "int",
      "p_retailprice" -> "double"),
    "region" -> Seq("r_regionkey" -> "int", "r_name" -> "string"),
    "supplier" -> Seq("s_suppkey" -> "bigint", "s_name" -> "string",
      "s_nationkey" -> "int", "s_acctbal" -> "double"))

  private val c2Values: String = expectedSchemas.flatMap { case (ds, cols) =>
    cols.zipWithIndex.map { case ((c, t), i) => s"('$ds','$c','$t',$i)" }
  }.mkString(", ")

  private def profBlock(c: String): String =
    s"""SELECT '$c' AS col_name, count($c) AS cnt,
       | count(*) - count($c) AS nulls, count(DISTINCT $c) AS ndistinct,
       | CAST(min($c) AS VARCHAR) AS min_s, CAST(max($c) AS VARCHAR) AS max_s
       |FROM customer""".stripMargin

  val oracle: Map[String, String] = Map(
    "c1_discover" ->
      ("""SELECT * FROM (VALUES """ +
        Seq("customer", "documents", "embeddings", "events", "lineitem",
          "nation", "orders", "part", "region", "supplier")
          .map(n => s"('$n','parquet',1)").mkString(", ") +
        """) t(name, format, num_files) ORDER BY name"""),
    "c2_schemas" ->
      (s"""SELECT * FROM (VALUES $c2Values)
         | t(dataset, col_name, dtype, position)
         |ORDER BY dataset, position""".stripMargin),
    "c3_profile_customer" ->
      Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
        .map(profBlock).mkString("", "\nUNION ALL\n", "\nORDER BY col_name"),
    "c3_topk_mktsegment" ->
      """SELECT CAST(c_mktsegment AS VARCHAR) AS value, count(*) AS freq
        |FROM customer GROUP BY 1 ORDER BY freq DESC, value LIMIT 3""".stripMargin,
    "c5_incremental" ->
      """SELECT CAST(10 AS BIGINT) AS unchanged, CAST(0 AS BIGINT) AS changed,
        | CAST(0 AS BIGINT) AS added, CAST(0 AS BIGINT) AS removed""".stripMargin)
}
