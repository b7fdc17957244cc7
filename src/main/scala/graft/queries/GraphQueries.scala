package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Lake
import graft.operators.Graph

/** Graph-analytics gates over the part–supplier co-supply graph derived
  * from lineitem (nodes: suppliers, parts offset by 10^9 (clear of any plausible suppkey range); edges both
  * directions, so the graph is symmetric and dangling-free). Fixed-point
  * integer arithmetic makes every iteration DuckDB-reproducible.
  */
object GraphQueries {

  private def coSupplyEdges(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Lake.table(spark, dir, "lineitem")
      .select(col("l_suppkey").as("s"), (col("l_partkey") + 1000000000L).as("p"))
      .distinct()
    pairs.select(col("s").as("src"), col("p").as("dst"))
      .unionAll(pairs.select(col("p").as("src"), col("s").as("dst")))
  }

  /** G1: 3 iterations of fixed-point PageRank, top-15 nodes. */
  def g1Pagerank(spark: SparkSession, dir: String): DataFrame =
    Graph.pageRankInt(spark, coSupplyEdges(spark, dir), iterations = 3)
      .orderBy(col("rank").desc, col("node"))
      .limit(15)

  /** G2: degree profile — heaviest 20 nodes by total degree. */
  def g2Degrees(spark: SparkSession, dir: String): DataFrame =
    Graph.degrees(coSupplyEdges(spark, dir))
      .orderBy(col("total_deg").desc, col("node"))
      .limit(20)

  /** G3: multi-source BFS — hop distance from suppliers {0,1,2} over the
    * co-supply graph, 3 hops, rolled up per level. The oracle unrolls
    * the same frontier recurrence in SQL.
    */
  def g3Bfs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val seeds = Seq(0L, 1L, 2L).toDF("node")
    Graph.bfsHops(coSupplyEdges(spark, dir), seeds, maxHops = 3)
      .groupBy(col("hops"))
      .agg(count(lit(1)).as("n"), sum(col("node")).as("cks"))
      .orderBy(col("hops"))
  }

  val all: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "g1_pagerank" -> (g1Pagerank _),
    "g2_degrees"  -> (g2Degrees _),
    "g3_bfs"      -> (g3Bfs _))

  private val edgesCte =
    """e0 AS (SELECT DISTINCT l_suppkey AS s, l_partkey + 1000000000 AS p
      |    FROM lineitem),
      |edges AS (SELECT s AS src, p AS dst FROM e0
      |          UNION ALL SELECT p, s FROM e0)""".stripMargin

  // CAST(sum(...) AS BIGINT): DuckDB sums BIGINT into HUGEINT, which
  // pandas would materialize as float64 and fail the dtype-aware hash.
  private def iterCte(prev: String, cur: String): String =
    s"""c$cur AS (SELECT e.dst AS node,
       |    CAST(sum(r.rank // d.d) AS BIGINT) AS contrib
       |  FROM edges e JOIN r$prev r ON e.src = r.node
       |  JOIN deg d ON e.src = d.src GROUP BY 1),
       |r$cur AS (SELECT n.node,
       |    CAST(150000 + (850000 * coalesce(c.contrib, 0)) // 1000000
       |      AS BIGINT) AS rank
       |  FROM nodes n LEFT JOIN c$cur c USING (node))""".stripMargin

  val oracle: Map[String, String] = Map(
    "g1_pagerank" ->
      s"""WITH $edgesCte,
         |nodes AS (SELECT DISTINCT src AS node FROM edges),
         |deg AS (SELECT src, count(*) AS d FROM edges GROUP BY 1),
         |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank FROM nodes),
         |${iterCte("0", "1")},
         |${iterCte("1", "2")},
         |${iterCte("2", "3")}
         |SELECT node, rank FROM r3
         |ORDER BY rank DESC, node LIMIT 15""".stripMargin,
    "g3_bfs" ->
      s"""WITH $edgesCte,
         |v0 AS (SELECT CAST(v AS BIGINT) AS node FROM (VALUES (0),(1),(2)) t(v)),
         |h1 AS (SELECT DISTINCT e.dst AS node FROM edges e
         |  JOIN v0 ON e.src = v0.node
         |  WHERE e.dst NOT IN (SELECT node FROM v0)),
         |h2 AS (SELECT DISTINCT e.dst AS node FROM edges e
         |  JOIN h1 ON e.src = h1.node
         |  WHERE e.dst NOT IN (SELECT node FROM v0)
         |    AND e.dst NOT IN (SELECT node FROM h1)),
         |h3 AS (SELECT DISTINCT e.dst AS node FROM edges e
         |  JOIN h2 ON e.src = h2.node
         |  WHERE e.dst NOT IN (SELECT node FROM v0)
         |    AND e.dst NOT IN (SELECT node FROM h1)
         |    AND e.dst NOT IN (SELECT node FROM h2))
         |SELECT hops, count(*) AS n, CAST(sum(node) AS BIGINT) AS cks FROM (
         |  SELECT CAST(0 AS BIGINT) AS hops, node FROM v0
         |  UNION ALL SELECT 1, node FROM h1
         |  UNION ALL SELECT 2, node FROM h2
         |  UNION ALL SELECT 3, node FROM h3)
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "g2_degrees" ->
      s"""WITH $edgesCte,
         |o AS (SELECT src AS node, count(*) AS out_deg FROM edges GROUP BY 1),
         |i AS (SELECT dst AS node, count(*) AS in_deg FROM edges GROUP BY 1)
         |SELECT coalesce(o.node, i.node) AS node,
         |  coalesce(out_deg, 0) AS out_deg, coalesce(in_deg, 0) AS in_deg,
         |  coalesce(out_deg, 0) + coalesce(in_deg, 0) AS total_deg
         |FROM o FULL OUTER JOIN i ON o.node = i.node
         |ORDER BY total_deg DESC, node LIMIT 20""".stripMargin)
}
