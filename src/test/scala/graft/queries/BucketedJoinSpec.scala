package graft.queries

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.core.Lake

/** The point of bucketing: a join of two tables bucketed on the join key
  * plans with ZERO shuffle exchanges — each task reads matching buckets
  * from both sides. At 100 TB that converts every fact-fact join on the
  * bucket key from a full re-shuffle into a co-located scan.
  */
class BucketedJoinSpec extends SparkSpecBase {

  test("join of co-bucketed tables plans with zero shuffle exchanges") {
    val root = java.nio.file.Files.createTempDirectory("graft_bkt").toString
    Lake.table(spark, sf0001, "orders")
      .write.mode("overwrite").option("path", s"$root/orders_bs")
      .bucketBy(4, "o_custkey").sortBy("o_custkey").saveAsTable("orders_bs")
    Lake.table(spark, sf0001, "customer")
      .write.mode("overwrite").option("path", s"$root/customer_bs")
      .bucketBy(4, "c_custkey").sortBy("c_custkey").saveAsTable("customer_bs")

    // Force the sort-merge path (broadcast would hide the exchange
    // question entirely — and is the wrong model for two fact tables).
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("orders_bs")
        .join(spark.table("customer_bs"), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("c"))

      val exchanges = joined.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      // The join itself must be exchange-free; the only shuffle allowed
      // in the whole plan is the groupBy's aggregation exchange.
      assert(exchanges.length <= 1,
        s"expected at most the agg exchange, got ${exchanges.length}:\n" +
          joined.queryExecution.executedPlan)

      // and the result equals the plain-layout join
      val bucketed = joined.orderBy(col("c_mktsegment")).collect().map(_.toString)
      val plain = Lake.table(spark, sf0001, "orders")
        .join(Lake.table(spark, sf0001, "customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("c"))
        .orderBy(col("c_mktsegment")).collect().map(_.toString)
      assert(bucketed.sameElements(plain))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
