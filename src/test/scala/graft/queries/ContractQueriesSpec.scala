package graft.queries

import graft.SparkSpecBase
import graft.SparkEntry

/** Smoke + determinism for every gate entry at sf0.001. Full value
  * correctness is enforced by the DuckDB oracle gate (scripts/
  * check_correctness.py); these tests catch regressions fast and offline.
  */
class ContractQueriesSpec extends SparkSpecBase {

  test("all declared queries run and return rows at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf0001).count()
      assert(n > 0, s"$name returned no rows")
    }
  }

  test("every oracle key has a matching query") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet.diff(qs)
    assert(orphans.isEmpty, s"oracle SQL without a query: $orphans")
  }

  test("q13 spot values: 500 docs, 500 distinct texts at sf0.001") {
    val row = ContractQueries.q13(spark, sf0001).head()
    assert(row.getLong(0) == 500 && row.getLong(1) == 500)
  }

  test("q01 is deterministic across runs") {
    val a = ContractQueries.q01(spark, sf0001).collect().toSeq
    val b = ContractQueries.q01(spark, sf0001).collect().toSeq
    assert(a == b)
  }

  test("q14 sims are in [-1, 1] and sorted descending") {
    val sims = ContractQueries.q14(spark, sf0001).collect().map(_.getDouble(1))
    assert(sims.forall(s => s >= -1.0 && s <= 1.0))
    assert(sims.sameElements(sims.sorted.reverse))
  }
}
