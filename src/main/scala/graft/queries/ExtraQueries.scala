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

  /** J8: FULL OUTER join — both sides constructed to have unmatched rows
    * (high-balance customers vs F-status order counts), null-safe
    * accounting of matched / left-only / right-only. Plans as a standard
    * shuffled join; at dimension scale Spark picks broadcast-full-outer.
    */
  def j8FullOuter(spark: SparkSession, dir: String): DataFrame = {
    val cust = Lake.table(spark, dir, "customer")
      .filter(col("c_acctbal") > 7000)
      .select(col("c_custkey"), col("c_acctbal"))
    val ords = Lake.table(spark, dir, "orders")
      .filter(col("o_orderstatus") === "F")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"))
    cust.join(ords, cust("c_custkey") === ords("o_custkey"), "full_outer")
      .select(
        when(col("c_custkey").isNotNull && col("o_custkey").isNotNull, "both")
          .when(col("c_custkey").isNotNull, "left_only")
          .otherwise("right_only").as("side"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        round(coalesce(col("c_acctbal"), lit(0.0)) * 100).cast("long").as("bal_cents"))
      .groupBy(col("side"))
      .agg(count(lit(1)).as("c"),
        sum(col("n_orders")).as("orders_sum"),
        (sum(col("bal_cents")) / 100.0).as("bal_sum"))
      .orderBy(col("side"))
  }

  /** E3: INTERSECT ALL / EXCEPT ALL — multiset semantics (each duplicate
    * occurrence counts). Catalyst plans both as aggregate+generate over
    * per-key counts — no join blow-up.
    */
  def e3MultisetOps(spark: SparkSession, dir: String): DataFrame = {
    val li = Lake.table(spark, dir, "lineitem")
    val a = li.filter(col("l_discount") >= 0.05).select(col("l_quantity").as("q"))
    val b = li.filter(col("l_tax") >= 0.05).select(col("l_quantity").as("q"))
    // coalesce: an empty multiset must sum to 0, not NULL, on both
    // engines (pandas would read a NULL sum as float64 NaN).
    a.intersectAll(b).groupBy().agg(
        count(lit(1)).as("inter_all_n"),
        coalesce(sum(round(col("q") * 100).cast("long")), lit(0L))
          .as("inter_all_cents"))
      .crossJoin(
        a.exceptAll(b).groupBy().agg(
          count(lit(1)).as("except_all_n"),
          coalesce(sum(round(col("q") * 100).cast("long")), lit(0L))
            .as("except_all_cents")))
  }

  /** W6: row_number / rank / dense_rank side-by-side over a NON-unique
    * order (value ties exist), where the three functions provably differ;
    * the tie-broken secondary sort pins output order only, not rank
    * values.
    */
  def w6RankVariants(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_type")).orderBy(col("user_id"))
    Lake.table(spark, dir, "events")
      .filter(col("user_id") < 4)
      .select(col("event_id"), col("event_type"),
        row_number().over(
          Window.partitionBy(col("event_type"))
            .orderBy(col("user_id"), col("event_id"))).as("rn"),
        rank().over(w).as("rk"),
        dense_rank().over(w).as("drk"))
      .orderBy(col("event_id"))
  }

  /** Q18: correlated subqueries through the SQL surface — EXISTS, NOT
    * EXISTS, and IN, the VERBATIM text run on both engines. Catalyst
    * rewrites them to semi/anti joins (never a per-row subquery loop),
    * which is exactly the 100 TB-safe plan; the scalar subquery uses max
    * (exact) rather than a float avg. EP2 parity by construction.
    */
  def q18Subqueries(spark: SparkSession, dir: String): DataFrame = {
    Seq("customer", "orders").foreach(t =>
      Lake.table(spark, dir, t).createOrReplaceTempView(t))
    spark.sql(SubqueriesSql)
  }

  private val SubqueriesSql =
    """SELECT c_mktsegment, count(*) AS c,
      |  CAST(sum(CASE WHEN EXISTS (SELECT 1 FROM orders o
      |      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
      |    THEN 1 ELSE 0 END) AS BIGINT) AS has_f,
      |  CAST(sum(CASE WHEN NOT EXISTS (SELECT 1 FROM orders o
      |      WHERE o.o_custkey = c.c_custkey)
      |    THEN 1 ELSE 0 END) AS BIGINT) AS no_orders,
      |  CAST(sum(CASE WHEN c_custkey IN (SELECT o_custkey FROM orders
      |      WHERE o_orderstatus = 'P') THEN 1 ELSE 0 END) AS BIGINT) AS has_p,
      |  CAST(sum(CASE WHEN c_acctbal * 100 >
      |      (SELECT max(o_totalprice) FROM orders)
      |    THEN 1 ELSE 0 END) AS BIGINT) AS rich
      |FROM customer c
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** F14: the portable string-function family — lpad/rpad, translate,
    * substring_index≡split_part, instr≡strpos, left/right, repeat,
    * reverse, concat_ws — pinned by value under min/max (binary UTF8
    * ordering on both engines) and integer sums.
    */
  def f14StringFuncs(spark: SparkSession, dir: String): DataFrame =
    Lake.table(spark, dir, "part")
      .groupBy(col("p_brand"))
      .agg(
        count(lit(1)).as("c"),
        min(lpad(col("p_name"), 30, ".")).as("min_lpad"),
        max(rpad(col("p_type"), 12, "_")).as("max_rpad"),
        max(translate(col("p_name"), "aeiou", "AEIOU")).as("max_trans"),
        min(substring_index(col("p_name"), " ", 1)).as("min_first_word"),
        sum(instr(col("p_name"), "a")).cast("long").as("a_pos_sum"),
        max(reverse(substring(col("p_name"), 1, 5))).as("max_rev5"),
        min(concat_ws("|", col("p_name").substr(lit(1), lit(3)),
          repeat(lit("x"), 2))).as("min_cw"))
      .orderBy(col("p_brand"))

  /** J10: fuzzy (similarity) self-join — all supplier-name pairs within
    * Levenshtein distance 1, via q-gram blocked candidates + exact
    * rerank (operators.FuzzyJoin), NOT an all-pairs product. The oracle
    * is the brute-force formulation, so the gate proves the blocking
    * scheme loses no pairs on real data; grouped by distance. The
    * hot-gram guard is ON: every supplier name shares the "Supplier#"
    * template prefix, exactly the corpus-frequent-gram profile the guard
    * reroutes through length bands — so the driver checks the guarded
    * path end-to-end.
    */
  def j10FuzzyJoin(spark: SparkSession, dir: String): DataFrame = {
    val s = Lake.table(spark, dir, "supplier")
      .select(col("s_suppkey").as("id"), col("s_name").as("nm"))
    graft.operators.FuzzyJoin.join(s, "id", "nm", s, "id", "nm", maxDist = 1,
        hotGramDf = 50L)
      .filter(col("id_l") < col("id_r"))
      .groupBy(col("dist"))
      .agg(count(lit(1)).as("pairs"),
        sum(col("id_l") + col("id_r")).as("id_checksum"))
      .orderBy(col("dist"))
  }

  /** J11: bloom-prefiltered semi-join — lineitem against the small-size
    * part subset. The bloom prefilter drops non-matching fact rows
    * MAP-SIDE before the join shuffle (the 100 TB lever); the exact join
    * on survivors makes the result identical to a plain semi-join, which
    * is exactly what the oracle checks. Prefilter effectiveness and
    * false-positive bounds are BloomJoinSpec's job.
    */
  def j11BloomSemijoin(spark: SparkSession, dir: String): DataFrame = {
    val small = Lake.table(spark, dir, "part").filter(col("p_size") <= 5)
    graft.operators.BloomJoin.semiJoin(
        Lake.table(spark, dir, "lineitem"), "l_partkey",
        small, "p_partkey", expectedKeys = 20000L)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("c"),
        sum(col("l_quantity").cast("long")).as("qty"),
        sum(col("l_partkey")).as("key_checksum"))
      .orderBy(col("l_returnflag"))
  }

  /** J13: salted skew join — the explicit hot-key spreading path
    * (row-hash salt on the large side × salt-exploded small side),
    * checked value-exact against the plain-join oracle. The when-to-salt
    * economics are measured in SkewBench (BASELINE.md); this gate makes
    * the path itself driver-visible.
    */
  def j13SaltedJoin(spark: SparkSession, dir: String): DataFrame =
    graft.operators.SkewJoin.saltedInnerJoin(
        Lake.table(spark, dir, "lineitem")
          .select(col("l_orderkey"), col("l_partkey"), col("l_quantity")),
        Lake.table(spark, dir, "part")
          .select(col("p_partkey").as("l_partkey"), col("p_brand")),
        keys = Seq("l_partkey"), salts = 8)
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("c"),
        sum(col("l_quantity").cast("long")).as("q"),
        sum(col("l_orderkey")).as("ok_sum"))
      .orderBy(col("p_brand"))

  /** Q19: LATERAL correlated derived table — top-2 lineitems per order
    * via a correlated ORDER BY/LIMIT subquery in FROM. The SAME SQL text
    * runs on both engines (EP2 parity); Catalyst plans the lateral as a
    * correlated join.
    */
  private val LateralSql =
    """SELECT o.o_orderkey, l.l_linenumber,
      |  CAST(round(l.l_quantity) AS BIGINT) AS qty
      |FROM orders o, LATERAL (
      |  SELECT l_linenumber, l_quantity FROM lineitem
      |  WHERE l_orderkey = o.o_orderkey
      |  ORDER BY l_quantity DESC, l_linenumber LIMIT 2) l
      |WHERE o.o_orderkey < 60
      |ORDER BY 1, 2, 3""".stripMargin

  def q19Lateral(spark: SparkSession, dir: String): DataFrame = {
    Seq("orders", "lineitem").foreach(t =>
      Lake.table(spark, dir, t).createOrReplaceTempView(t))
    spark.sql(LateralSql)
  }

  val all: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "q19_lateral"         -> (q19Lateral _),
    "q18_subqueries"      -> (q18Subqueries _),
    "j10_fuzzy_join"       -> (j10FuzzyJoin _),
    "j11_bloom_semijoin"   -> (j11BloomSemijoin _),
    "j13_salted_join"      -> (j13SaltedJoin _),
    "f14_string_funcs"    -> (f14StringFuncs _),
    "e2_union_except"     -> (e2UnionExcept _),
    "s6_partitioned_sink" -> (s6PartitionedSink _),
    "a3_approx_distinct"  -> (a3ApproxDistinct _),
    "j8_full_outer"       -> (j8FullOuter _),
    "e3_multiset_ops"     -> (e3MultisetOps _),
    "w6_rank_variants"    -> (w6RankVariants _))

  val oracle: Map[String, String] = Map(
    "j13_salted_join" ->
      """SELECT p_brand, count(*) AS c,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q,
        |  CAST(sum(l_orderkey) AS BIGINT) AS ok_sum
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "j11_bloom_semijoin" ->
      """SELECT l_returnflag, count(*) AS c,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
        |  CAST(sum(l_partkey) AS BIGINT) AS key_checksum
        |FROM lineitem
        |WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size <= 5)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "j10_fuzzy_join" ->
      """SELECT CAST(levenshtein(a.s_name, b.s_name) AS BIGINT) AS dist,
        |  count(*) AS pairs,
        |  CAST(sum(a.s_suppkey + b.s_suppkey) AS BIGINT) AS id_checksum
        |FROM supplier a JOIN supplier b ON a.s_suppkey < b.s_suppkey
        |WHERE levenshtein(a.s_name, b.s_name) <= 1
        |GROUP BY 1 ORDER BY 1""".stripMargin,
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
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "j8_full_outer" ->
      """WITH c AS (SELECT c_custkey, c_acctbal FROM customer
        |           WHERE c_acctbal > 7000),
        |o AS (SELECT o_custkey, count(*) AS n_orders FROM orders
        |      WHERE o_orderstatus = 'F' GROUP BY 1),
        |j AS (SELECT
        |    CASE WHEN c.c_custkey IS NOT NULL AND o.o_custkey IS NOT NULL
        |           THEN 'both'
        |         WHEN c.c_custkey IS NOT NULL THEN 'left_only'
        |         ELSE 'right_only' END AS side,
        |    coalesce(o.n_orders, 0) AS n_orders,
        |    CAST(round(coalesce(c.c_acctbal, 0.0) * 100) AS BIGINT) AS bal_cents
        |  FROM c FULL OUTER JOIN o ON c.c_custkey = o.o_custkey)
        |SELECT side, count(*) AS c,
        |  CAST(sum(n_orders) AS BIGINT) AS orders_sum,
        |  CAST(sum(bal_cents) AS BIGINT) / 100.0 AS bal_sum
        |FROM j GROUP BY side ORDER BY side""".stripMargin,
    "e3_multiset_ops" ->
      """WITH a AS (SELECT l_quantity AS q FROM lineitem WHERE l_discount >= 0.05),
        |b AS (SELECT l_quantity AS q FROM lineitem WHERE l_tax >= 0.05),
        |ia AS (SELECT q FROM a INTERSECT ALL SELECT q FROM b),
        |ea AS (SELECT q FROM a EXCEPT ALL SELECT q FROM b),
        |s1 AS (SELECT count(*) AS inter_all_n,
        |  CAST(coalesce(sum(CAST(round(q*100) AS BIGINT)), 0) AS BIGINT)
        |    AS inter_all_cents FROM ia),
        |s2 AS (SELECT count(*) AS except_all_n,
        |  CAST(coalesce(sum(CAST(round(q*100) AS BIGINT)), 0) AS BIGINT)
        |    AS except_all_cents FROM ea)
        |SELECT * FROM s1 CROSS JOIN s2""".stripMargin,
    // Verbatim the same SQL text the Spark side runs (EP2 parity).
    "q18_subqueries" -> SubqueriesSql,
    "q19_lateral" -> LateralSql,
    "f14_string_funcs" ->
      """SELECT p_brand, count(*) AS c,
        |  min(lpad(p_name, 30, '.')) AS min_lpad,
        |  max(rpad(p_type, 12, '_')) AS max_rpad,
        |  max(translate(p_name, 'aeiou', 'AEIOU')) AS max_trans,
        |  min(split_part(p_name, ' ', 1)) AS min_first_word,
        |  CAST(sum(strpos(p_name, 'a')) AS BIGINT) AS a_pos_sum,
        |  max(reverse(substring(p_name, 1, 5))) AS max_rev5,
        |  min(concat_ws('|', substring(p_name, 1, 3), repeat('x', 2))) AS min_cw
        |FROM part GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "w6_rank_variants" ->
      """SELECT event_id, event_type,
        |  row_number() OVER (PARTITION BY event_type
        |                     ORDER BY user_id, event_id) AS rn,
        |  rank() OVER w AS rk,
        |  dense_rank() OVER w AS drk
        |FROM events WHERE user_id < 4
        |WINDOW w AS (PARTITION BY event_type ORDER BY user_id)
        |ORDER BY event_id""".stripMargin)
}
