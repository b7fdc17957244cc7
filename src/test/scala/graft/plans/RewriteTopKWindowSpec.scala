package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.core.Lake

/** RewriteTopKWindow: result equivalence with the window form on total
  * orderings (asc/desc, multi-key, nulls, residual predicates, rn = 1),
  * plan-shape proof that the Window is gone, and every decline guard.
  */
class RewriteTopKWindowSpec extends SparkSpecBase {

  private def withRule[A](body: => A): A = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ RewriteTopKWindow
    try body
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == RewriteTopKWindow)
  }

  private def hasWindow(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collect { case w: LWindow => w }.nonEmpty
  private def hasTopKAgg(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collect {
      case a: Aggregate if a.aggregateExpressions.exists(
        _.collectFirst { case t: TopKRowsAgg => t }.nonEmpty) => a
    }.nonEmpty

  private lazy val orders = Lake.table(spark, sf0001, "orders").cache()

  // (custkey, orderkey) is a total ordering, so the window and heap forms
  // must agree exactly, row for row.
  private def topkDf(k: Int): DataFrame = orders
    .withColumn("rn", row_number().over(
      Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_custkey").desc, col("o_orderkey"))))
    .filter(col("rn") <= k)
    .select(col("o_orderpriority"), col("o_custkey"), col("o_orderkey"), col("rn"))

  test("rewritten grouped top-k equals the window plan row-for-row") {
    val expected = topkDf(7).collect().map(_.toSeq).sortBy(_.toString)
    val (plan, got) = withRule {
      val df = topkDf(7)
      (df, df.collect().map(_.toSeq).sortBy(_.toString))
    }
    assert(!hasWindow(plan) && hasTopKAgg(plan),
      "expected the Window to be rewritten to the heap aggregate")
    assert(got.toSeq === expected.toSeq)
  }

  test("rn = 1, residual predicate, and SQL text all rewrite") {
    orders.createOrReplaceTempView("__topk_orders")
    val text =
      """SELECT * FROM (
        |  SELECT o_orderpriority, o_custkey,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |                       ORDER BY o_custkey, o_orderkey) AS rn
        |  FROM __topk_orders) WHERE rn = 1 AND o_custkey > 10
        |""".stripMargin
    val expected = spark.sql(text).collect().map(_.toSeq).sortBy(_.toString)
    withRule {
      val df = spark.sql(text)
      assert(!hasWindow(df) && hasTopKAgg(df))
      assert(df.collect().map(_.toSeq).sortBy(_.toString).toSeq === expected.toSeq)
    }
  }

  test("null order keys follow the window's null ordering") {
    import spark.implicits._
    val df0 = Seq(
      (1, Some(5L), 10L), (1, None, 11L), (1, Some(7L), 12L), (1, Some(1L), 13L),
      (2, None, 20L), (2, None, 21L), (2, Some(3L), 22L))
      .toDF("g", "s", "id")
      .select(col("g"), when(col("s").isNotNull, col("s")).as("s"), col("id"))
    def q(): DataFrame = df0
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("g")).orderBy(col("s").desc_nulls_last, col("id"))))
      .filter(col("rn") <= 2)
    val expected = q().collect().map(_.toSeq).sortBy(_.toString)
    withRule {
      val df = q()
      assert(!hasWindow(df) && hasTopKAgg(df))
      assert(df.collect().map(_.toSeq).sortBy(_.toString).toSeq === expected.toSeq)
    }
  }

  test("guards decline: rank(), k over MaxK, rn = 2, global window") {
    withRule {
      val ranked = orders.withColumn("rn", rank().over(
        Window.partitionBy(col("o_orderpriority")).orderBy(col("o_custkey"))))
        .filter(col("rn") <= 3)
      assert(hasWindow(ranked) && !hasTopKAgg(ranked))

      val hugeK = topkDf(RewriteTopKWindow.MaxK + 1)
      assert(hasWindow(hugeK) && !hasTopKAgg(hugeK))

      val exactly2 = orders.withColumn("rn", row_number().over(
        Window.partitionBy(col("o_orderpriority")).orderBy(col("o_custkey"))))
        .filter(col("rn") === 2)
      assert(hasWindow(exactly2) && !hasTopKAgg(exactly2))

      val global = orders.withColumn("rn", row_number().over(
        Window.orderBy(col("o_custkey"), col("o_orderkey"))))
        .filter(col("rn") <= 3)
      assert(hasWindow(global) && !hasTopKAgg(global))
    }
  }

  test("the rewrite survives a partial/final split across partitions") {
    // 8-partition input with every group present in every partition, so
    // the merge path (heap-union at the exchange) is genuinely exercised.
    import spark.implicits._
    val wide = spark.range(0, 4000, 1, 8)
      .select((col("id") % 5).as("g"), (col("id") * 2654435761L % 9973).as("v"),
        col("id"))
    def q(): DataFrame = wide
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("g")).orderBy(col("v").desc, col("id"))))
      .filter(col("rn") <= 10)
    val expected = q().collect().map(_.toSeq).sortBy(_.toString)
    withRule {
      val df = q()
      assert(hasTopKAgg(df))
      assert(df.collect().map(_.toSeq).sortBy(_.toString).toSeq === expected.toSeq)
    }
  }
}
