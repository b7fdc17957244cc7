package graft.queries

import org.apache.spark.sql.DataFrame

import graft.SparkSpecBase
import graft.core.Lake

/** EP2 parity: the SQL surface and the DataFrame surface are the same
  * engine — running the contract queries as SQL TEXT over the registered
  * views must produce exactly the rows the DataFrame builders produce.
  * (SQL adapted only where DuckDB's dialect differs from Spark SQL:
  * json_extract_string → get_json_object; money-cents casts unchanged.)
  */
class SqlParitySpec extends SparkSpecBase {

  private def assertSame(sql: String, df: DataFrame): Unit = {
    Lake.registerAll(spark, sf0001)
    val a = spark.sql(sql).collect().map(_.toSeq).toSeq
    val b = df.collect().map(_.toSeq).toSeq
    assert(a == b, s"SQL vs DataFrame mismatch: sql=${a.take(2)} df=${b.take(2)}")
  }

  test("q01 parity") {
    assertSame(
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sq,
        | sum(CAST(round(l_extendedprice*100) AS BIGINT)) / CAST(100.0 AS DOUBLE) AS sp,
        | sum(CAST(round(l_extendedprice*(1-l_discount)*1000000) AS BIGINT)) / CAST(1000000.0 AS DOUBLE) AS disc,
        | avg(l_quantity) AS aq, count(*) AS c
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
      ContractQueries.q01(spark, sf0001))
  }

  test("q02 parity") {
    assertSame(
      """SELECT n_name, count(*) AS c,
        | sum(CAST(round(o_totalprice*100) AS BIGINT)) / CAST(100.0 AS DOUBLE) AS s
        |FROM orders JOIN customer ON o_custkey=c_custkey
        |JOIN nation ON c_nationkey=n_nationkey JOIN region ON n_regionkey=r_regionkey
        |WHERE r_name='ASIA' GROUP BY n_name ORDER BY s DESC, n_name""".stripMargin,
      ContractQueries.q02(spark, sf0001))
  }

  test("q05 parity (ROLLUP + null order)") {
    assertSame(
      """SELECT r_name, n_name, count(*) AS c
        |FROM customer JOIN nation ON c_nationkey=n_nationkey
        |JOIN region ON n_regionkey=r_regionkey GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,
      ContractQueries.q05(spark, sf0001))
  }

  test("q09 parity (JSON extraction)") {
    assertSame(
      """SELECT CAST(get_json_object(props,'$.k') AS INT) % 10 AS kb, count(*) AS c,
        | sum(CAST(round(value*100) AS BIGINT)) / CAST(100.0 AS DOUBLE) / count(*) AS av
        |FROM events GROUP BY 1 ORDER BY 1 NULLS FIRST""".stripMargin,
      ContractQueries.q09(spark, sf0001))
  }

  test("q11/q12 parity (IN / NOT EXISTS subquery rewrites to semi/anti join)") {
    assertSame(
      """SELECT count(*) AS c FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus='F')""".stripMargin,
      ContractQueries.q11(spark, sf0001))
    assertSame(
      """SELECT count(*) AS c FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey=c_custkey)""".stripMargin,
      ContractQueries.q12(spark, sf0001))
  }

  test("q16 parity (windowed sessionization SQL)") {
    assertSame(
      """WITH g AS (SELECT user_id, ts,
        |  CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |       OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) > INTERVAL 30 MINUTE
        |       THEN 1 ELSE 0 END AS ns FROM events),
        |     s AS (SELECT user_id, ts,
        |       CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY ts) AS BIGINT) AS sid FROM g)
        |SELECT user_id, sid, count(*) AS n, min(ts) AS st, max(ts) AS en
        |FROM s GROUP BY 1,2 ORDER BY 1,2 LIMIT 100""".stripMargin,
      ContractQueries.q16(spark, sf0001))
  }
}
