package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Lake

/** Gate entries closing the remaining SURVEY.md §2 rows: E2 (UNION ALL /
  * EXCEPT), S6 (partitioned sink round-trip with partition pruning), and
  * A3 (HLL approx distinct, checked as a within-5%-of-exact property that
  * the oracle can verify without reproducing the sketch).
  */
object ExtraQueries {

  /** E2: UNION ALL bag semantics + EXCEPT set semantics. */
  def e2UnionExcept(spark: SparkSession, dir: String): DataFrame = {
    val customer = Lake.table(spark, dir, "customer")
    val supplier = Lake.table(spark, dir, "supplier")
    val orders   = Lake.table(spark, dir, "orders")
    customer.filter(col("c_acctbal") > 8000).select(col("c_custkey").as("k"))
      .unionAll(supplier.filter(col("s_acctbal") > 8000).select(col("s_suppkey").as("k")))
      .except(orders.filter(col("o_orderstatus") === "F").select(col("o_custkey").as("k")))
      .orderBy(col("k"))
      .limit(100)
  }

  /** S6: hive-style partitioned sink → partition-discovery re-read →
    * pruned scan. The oracle computes the same result straight from the
    * source table, so the round-trip (write, discover, prune, read) must
    * be lossless. At 100 TB this is the layout that makes partition
    * pruning work; the written dir uses one subdir per event_type.
    */
  def s6PartitionedSink(spark: SparkSession, dir: String): DataFrame = {
    val out = Files.createTempDirectory("graft_psink").toString
    Lake.table(spark, dir, "events")
      .write.mode("overwrite").partitionBy("event_type").parquet(out)
    val back = spark.read.parquet(out)
    back.filter(col("event_type") === "click")
      .agg(
        count(lit(1)).as("c"),
        (sum(round(col("value") * 100).cast("long")) / 100.0).as("s"),
        countDistinct(col("user_id")).as("du"))
  }

  /** A3: approx_count_distinct (HLL++) — sketches differ across engines,
    * so the gate checks the PROPERTY (relative error ≤ 5% vs exact, per
    * event_type) rather than the estimate. Both engines agree on the
    * exact side; the boolean encodes the sketch-quality contract.
    */
  def a3ApproxDistinct(spark: SparkSession, dir: String): DataFrame =
    Lake.table(spark, dir, "events")
      .groupBy(col("event_type"))
      .agg(
        countDistinct(col("user_id")).as("exact_du"),
        approx_count_distinct(col("user_id")).as("approx_du"))
      .select(col("event_type"), col("exact_du"),
        (abs(col("approx_du") - col("exact_du")).cast("double") /
          col("exact_du") <= 0.05).as("within5"))
      .orderBy(col("event_type"))

  val all: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "e2_union_except"     -> (e2UnionExcept _),
    "s6_partitioned_sink" -> (s6PartitionedSink _),
    "a3_approx_distinct"  -> (a3ApproxDistinct _))

  val oracle: Map[String, String] = Map(
    "e2_union_except" ->
      """SELECT k FROM (
        |  SELECT c_custkey AS k FROM customer WHERE c_acctbal > 8000
        |  UNION ALL SELECT s_suppkey AS k FROM supplier WHERE s_acctbal > 8000
        |  EXCEPT SELECT o_custkey AS k FROM orders WHERE o_orderstatus='F')
        |ORDER BY k LIMIT 100""".stripMargin,
    "s6_partitioned_sink" ->
      """SELECT count(*) AS c, sum(CAST(round(value*100) AS BIGINT)) / 100.0 AS s,
        | count(DISTINCT user_id) AS du
        |FROM events WHERE event_type = 'click'""".stripMargin,
    "a3_approx_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS exact_du, true AS within5
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)
}
