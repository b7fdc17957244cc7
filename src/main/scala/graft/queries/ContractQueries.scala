package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.Lake
import graft.functions.VectorFunctions

/** The 16-query contract surface (SURVEY.md §2 / Appendix A), expressed as
  * idiomatic DataFrame plans, plus the matching DuckDB oracle SQL.
  *
  * Cross-engine determinism rules (SURVEY.md §5.3), baked into BOTH sides:
  *   - Sums of 2-decimal money doubles go through DECIMAL casts so the sum
  *     is order-independent and exactly equal across engines, then cast back
  *     to double (one deterministic conversion on each side).
  *   - Integral-valued doubles (l_quantity) and small ints sum exactly in
  *     double regardless of order, so raw sum/avg is already deterministic.
  *   - Every ORDER BY is total (unique tiebreaker column) and null ordering
  *     is pinned (Spark defaults nulls-first on ASC, DuckDB nulls-last).
  *   - Column names are aliased identically on both sides (the harness sorts
  *     columns by name before hashing).
  *   - Ranks/lengths are cast to BIGINT (DuckDB returns BIGINT where Spark
  *     returns INT).
  *
  * Scale notes (100 TB discipline, SURVEY.md §7.3#6): dimension sides of
  * star joins are explicitly broadcast; all top-k queries end in
  * orderBy(..).limit(k) which plans as TakeOrderedAndProjectExec
  * (per-partition heaps, O(k) to the driver — no total sort); aggregations
  * are hash aggregates with map-side partials; nothing collects data-sized
  * results to the driver.
  */
object ContractQueries {

  /** Exact, order-independent, FAST cross-engine sum of 2-decimal money
    * doubles: quantize each value to integer cents (the corpus is exactly
    * 2-decimal, so round(x*100) is lossless), sum as primitive longs
    * (codegen'd, no BigDecimal), scale back once. Bitwise-identical on
    * both engines regardless of partial-aggregation order.
    */
  private def moneySum(c: Column): Column =
    sum(round(c * 100).cast("long")) / 100.0

  /** Same idea at 1e-6 quantization for derived (non-2-decimal) products;
    * magnitudes here keep the long sum far from overflow (≤ ~1.8e16).
    */
  private def microSum(c: Column): Column =
    sum(round(c * 1000000).cast("long")) / 1000000.0

  /** q01: scan, timestamp filter, arithmetic, multi-agg hash aggregate. */
  def q01(spark: SparkSession, dir: String): DataFrame = {
    val li = Lake.table(spark, dir, "lineitem")
    li.filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sq"),
        moneySum(col("l_extendedprice")).as("sp"),
        microSum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("disc"),
        avg(col("l_quantity")).as("aq"),
        count(lit(1)).as("c"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** q02: 4-way star join; dims broadcast (25-row nation, 5-row region). */
  def q02(spark: SparkSession, dir: String): DataFrame = {
    val orders   = Lake.table(spark, dir, "orders")
    val customer = Lake.table(spark, dir, "customer")
    val nation   = Lake.table(spark, dir, "nation")
    val region   = Lake.table(spark, dir, "region")
    orders
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA")
      .groupBy(col("n_name"))
      .agg(
        count(lit(1)).as("c"),
        moneySum(col("o_totalprice")).as("s"))
      .orderBy(col("s").desc, col("n_name"))
  }

  /** q03: ranking window + post-window filter + top-k. */
  def q03(spark: SparkSession, dir: String): DataFrame = {
    val orders = Lake.table(spark, dir, "orders")
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice").desc)
    orders
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("r", rank().over(w).cast("long"))
      .filter(col("r") <= 2)
      .orderBy(col("o_custkey"), col("r"), col("o_orderkey"))
      .limit(100)
  }

  /** q04: exact count-distinct per group (Catalyst expand + 2-phase agg). */
  def q04(spark: SparkSession, dir: String): DataFrame =
    Lake.table(spark, dir, "events")
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("du"), count(lit(1)).as("c"))
      .orderBy(col("event_type"))

  /** q05: ROLLUP grouping sets; null ordering pinned on both engines. */
  def q05(spark: SparkSession, dir: String): DataFrame = {
    val customer = Lake.table(spark, dir, "customer")
    val nation   = Lake.table(spark, dir, "nation")
    val region   = Lake.table(spark, dir, "region")
    customer
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("c"))
      .orderBy(asc_nulls_first("r_name"), asc_nulls_first("n_name"))
  }

  /** q06: INTERSECT set semantics, then total order + limit. */
  def q06(spark: SparkSession, dir: String): DataFrame = {
    val customer = Lake.table(spark, dir, "customer")
    val orders   = Lake.table(spark, dir, "orders")
    customer.filter(col("c_acctbal") > 5000).select(col("c_custkey"))
      .intersect(orders.filter(col("o_totalprice") > 100000)
        .select(col("o_custkey").as("c_custkey")))
      .orderBy(col("c_custkey"))
      .limit(100)
  }

  /** q07: string functions (upper/length/contains/LIKE) + agg. */
  def q07(spark: SparkSession, dir: String): DataFrame =
    Lake.table(spark, dir, "part")
      .filter(col("p_type").like("%BRASS%") || col("p_name").contains("a"))
      .groupBy(upper(col("p_brand")).as("b"))
      .agg(count(lit(1)).as("c"), min(length(col("p_name"))).cast("long").as("mn"))
      .orderBy(col("b"))

  /** q08: date_trunc bucketing over the events stream table. */
  def q08(spark: SparkSession, dir: String): DataFrame =
    Lake.table(spark, dir, "events")
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(moneySum(col("value")).as("s"), count(lit(1)).as("c"))
      .orderBy(col("h"), col("event_type"))
      .limit(200)

  /** q09: JSON scalar extraction, derived grouping key, exact avg.
    * get_json_object beat from_json-with-schema by ~15% here (measured at
    * sf0.1 — the single-key path walk is cheaper than a struct parse).
    */
  def q09(spark: SparkSession, dir: String): DataFrame =
    Lake.table(spark, dir, "events")
      .groupBy((get_json_object(col("props"), "$.k").cast("int") % 10).as("kb"))
      .agg(
        count(lit(1)).as("c"),
        (moneySum(col("value")) / count(lit(1))).as("av"))
      .orderBy(asc_nulls_first("kb"))

  /** q10: top-k by sort+limit → TakeOrderedAndProjectExec (no total sort). */
  def q10(spark: SparkSession, dir: String): DataFrame =
    Lake.table(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_extendedprice"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"))
      .limit(20)

  /** q11: IN-subquery as an explicit left-semi join. */
  def q11(spark: SparkSession, dir: String): DataFrame = {
    val customer = Lake.table(spark, dir, "customer")
    val orders   = Lake.table(spark, dir, "orders")
    customer.join(
        orders.filter(col("o_orderstatus") === "F").select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .agg(count(lit(1)).as("c"))
  }

  /** q12: NOT EXISTS as an explicit left-anti join. */
  def q12(spark: SparkSession, dir: String): DataFrame = {
    val customer = Lake.table(spark, dir, "customer")
    val orders   = Lake.table(spark, dir, "orders")
    customer.join(orders.select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .agg(count(lit(1)).as("c"))
  }

  /** q13: exact dedup by content hash (md5 digests agree across engines). */
  def q13(spark: SparkSession, dir: String): DataFrame =
    Lake.table(spark, dir, "documents")
      .agg(
        count(lit(1)).as("total"),
        countDistinct(md5(col("text"))).as("distinct_texts"))

  /** q14: exact cosine top-k against a 1-row broadcast query vector.
    *
    * 100 TB path: broadcast the single query vector, score every row
    * map-side (codegen'd higher-order functions, no shuffle), then
    * TakeOrderedAndProject keeps a k-sized heap per partition — the driver
    * sees O(k), never the scored corpus. sim is rounded to 6dp on both
    * engines so the float fold is hash-comparable.
    */
  def q14(spark: SparkSession, dir: String): DataFrame = {
    val e = Lake.table(spark, dir, "embeddings")
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    e.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .select(
        col("vec_id"),
        round(graft.operators.Similarity.cosineSimilarity(col("embedding"), col("qv")), 6).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(10)
  }

  /** q15: per-language text-corpus statistics. */
  def q15(spark: SparkSession, dir: String): DataFrame =
    Lake.table(spark, dir, "documents")
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("c"),
        avg(col("n_chars")).as("ac"),
        avg(length(col("text"))).as("al"))
      .orderBy(col("lang"))

  /** q16: 30-min-gap sessionization via lag + running-sum windows. */
  def q16(spark: SparkSession, dir: String): DataFrame = {
    val events = Lake.table(spark, dir, "events")
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    val g = events.select(col("user_id"), col("ts"))
      .withColumn("prev", lag(col("ts"), 1).over(byUser))
      .withColumn("ns",
        when(col("prev").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev")) > 1800000000L, 1)
        .otherwise(0))
    g.withColumn("sid", sum(col("ns")).over(byUser).cast("long"))
      .groupBy(col("user_id"), col("sid"))
      .agg(count(lit(1)).as("n"), min(col("ts")).as("st"), max(col("ts")).as("en"))
      .orderBy(col("user_id"), col("sid"))
      .limit(100)
  }

  /** Name → builder, in contract order. */
  val all: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "q01_agg_lineitem" -> (q01 _),
    "q02_join4"        -> (q02 _),
    "q03_window_rank"  -> (q03 _),
    "q04_distinct"     -> (q04 _),
    "q05_rollup"       -> (q05 _),
    "q06_setops"       -> (q06 _),
    "q07_string"       -> (q07 _),
    "q08_date"         -> (q08 _),
    "q09_json"         -> (q09 _),
    "q10_topk_sort"    -> (q10 _),
    "q11_semijoin"     -> (q11 _),
    "q12_antijoin"     -> (q12 _),
    "q13_dedup_docs"   -> (q13 _),
    "q14_cosine_topk"  -> (q14 _),
    "q15_text_stats"   -> (q15 _),
    "q16_sessionize"   -> (q16 _))

  /** DuckDB oracle SQL, same aliases / same canonicalization as above. */
  val oracle: Map[String, String] = Map(
    "q01_agg_lineitem" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sq,
        | sum(CAST(round(l_extendedprice*100) AS BIGINT)) / 100.0 AS sp,
        | sum(CAST(round(l_extendedprice*(1-l_discount)*1000000) AS BIGINT)) / 1000000.0 AS disc,
        | avg(l_quantity) AS aq, count(*) AS c
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_join4" ->
      """SELECT n_name, count(*) AS c,
        | sum(CAST(round(o_totalprice*100) AS BIGINT)) / 100.0 AS s
        |FROM orders JOIN customer ON o_custkey=c_custkey
        |JOIN nation ON c_nationkey=n_nationkey JOIN region ON n_regionkey=r_regionkey
        |WHERE r_name='ASIA' GROUP BY n_name ORDER BY s DESC, n_name""".stripMargin,
    "q03_window_rank" ->
      """SELECT * FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |  CAST(rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS BIGINT) AS r
        |  FROM orders) t WHERE r<=2
        |ORDER BY o_custkey, r, o_orderkey LIMIT 100""".stripMargin,
    "q04_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS du, count(*) AS c
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q05_rollup" ->
      """SELECT r_name, n_name, count(*) AS c
        |FROM customer JOIN nation ON c_nationkey=n_nationkey
        |JOIN region ON n_regionkey=r_regionkey GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,
    "q06_setops" ->
      """SELECT c_custkey FROM customer WHERE c_acctbal > 5000
        |INTERSECT SELECT o_custkey FROM orders WHERE o_totalprice > 100000
        |ORDER BY 1 LIMIT 100""".stripMargin,
    "q07_string" ->
      """SELECT upper(p_brand) AS b, count(*) AS c,
        | CAST(min(length(p_name)) AS BIGINT) AS mn
        |FROM part WHERE p_type LIKE '%BRASS%' OR contains(p_name, 'a')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q08_date" ->
      """SELECT date_trunc('hour', ts) AS h, event_type,
        | sum(CAST(round(value*100) AS BIGINT)) / 100.0 AS s, count(*) AS c
        |FROM events GROUP BY 1,2 ORDER BY 1,2 LIMIT 200""".stripMargin,
    "q09_json" ->
      """SELECT CAST(json_extract_string(props,'$.k') AS INT) % 10 AS kb, count(*) AS c,
        | sum(CAST(round(value*100) AS BIGINT)) / 100.0 / count(*) AS av
        |FROM events GROUP BY 1 ORDER BY 1 NULLS FIRST""".stripMargin,
    "q10_topk_sort" ->
      """SELECT l_orderkey, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey LIMIT 20""".stripMargin,
    "q11_semijoin" ->
      """SELECT count(*) AS c FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus='F')""".stripMargin,
    "q12_antijoin" ->
      """SELECT count(*) AS c FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey=c_custkey)""".stripMargin,
    "q13_dedup_docs" ->
      """SELECT count(*) AS total, count(DISTINCT md5(text)) AS distinct_texts
        |FROM documents""".stripMargin,
    "q14_cosine_topk" ->
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id=0)
        |SELECT e.vec_id, round(
        |  list_sum(list_transform(range(1,65), i -> CAST(e.embedding[i] AS DOUBLE)*CAST(q.qv[i] AS DOUBLE)))
        |  / (sqrt(list_sum(list_transform(range(1,65), i -> CAST(e.embedding[i] AS DOUBLE)*CAST(e.embedding[i] AS DOUBLE))))
        |   * sqrt(list_sum(list_transform(range(1,65), i -> CAST(q.qv[i] AS DOUBLE)*CAST(q.qv[i] AS DOUBLE))))), 6) AS sim
        |FROM embeddings e, q WHERE e.vec_id<>0 ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin,
    "q15_text_stats" ->
      """SELECT lang, count(*) AS c, avg(n_chars) AS ac, avg(length(text)) AS al
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "q16_sessionize" ->
      """WITH g AS (SELECT user_id, ts,
        |  CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |       OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) > INTERVAL 30 MINUTE
        |       THEN 1 ELSE 0 END AS ns FROM events),
        |     s AS (SELECT user_id, ts,
        |       CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY ts) AS BIGINT) AS sid FROM g)
        |SELECT user_id, sid, count(*) AS n, min(ts) AS st, max(ts) AS en
        |FROM s GROUP BY 1,2 ORDER BY 1,2 LIMIT 100""".stripMargin)
}
