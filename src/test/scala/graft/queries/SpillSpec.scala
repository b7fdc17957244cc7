package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

import graft.SparkSpecBase

/** Memory-pressure execution proof: the 100 TB story leans on operators
  * degrading gracefully when their hash/buffer state outgrows executor
  * memory — HashAggregate falling back to sort-based aggregation with an
  * external (spilling) sorter, and window buffers spilling row arrays to
  * disk — without changing a single output row. Nothing in the sf-scale
  * gates forces those paths, so this spec does, via the engine's own
  * pressure knobs:
  *
  *  - `spark.sql.TungstenAggregate.testFallbackStartsAt` switches the
  *    aggregate hash map to the sort-based external path after N keys,
  *    which is exactly the code path a map that exhausts its memory
  *    budget takes (destruct map → UnsafeKVExternalSorter → spill files
  *    → merge-based aggregation).
  *  - `spark.sql.windowExec.buffer.{in.memory,spill}.threshold` push the
  *    per-partition window buffer from an in-memory row array into an
  *    UnsafeExternalSorter and then onto disk.
  *
  * Each test runs a REAL contract gate query both ways and asserts (a)
  * the spilled plan reports spillSize > 0 on the operator, and (b) the
  * collected rows are identical to the unpressured run — same data,
  * same order, byte-for-byte `Row.toString` equality (the gates are
  * deterministically ordered).
  */
class SpillSpec extends SparkSpecBase {

  /** Execute and sum the `spillSize` SQL metric across the final
    * (post-AQE) plan's operators. Metric accumulators are merged on the
    * driver as part of task completion, so reading them right after
    * collect() is race-free.
    */
  private def collectWithSpill(df: DataFrame): (Seq[String], Long) = {
    val rows = df.collect().map(_.toString).toSeq
    // AQE hides materialized stages behind QueryStageExec leaves
    // (children = Nil), so a plain collect() sees only the result
    // stage — recurse through stage and adaptive boundaries.
    def gather(p: SparkPlan): Seq[SparkPlan] =
      p +: (p.children ++ (p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case _ => Nil
      })).flatMap(gather)
    val spilled = gather(df.queryExecution.executedPlan).collect {
      case n if n.metrics.contains("spillSize") => n.metrics("spillSize").value
    }.sum
    (rows, spilled)
  }

  private def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      pairs.foreach { case (k, v) => spark.conf.set(k, v) }
      body
    } finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  private def gate(name: String): DataFrame =
    graft.SparkEntry.queries(name)(spark, sf0001)

  test("hash aggregate falls back to spilling sort-based agg, rows unchanged") {
    val (baseline, _) = collectWithSpill(gate("q01_agg_lineitem"))
    withConfs("spark.sql.TungstenAggregate.testFallbackStartsAt" -> "2,3") {
      val (pressured, spilled) = collectWithSpill(gate("q01_agg_lineitem"))
      assert(spilled > 0,
        "fallback aggregation should have spilled the hash map to disk")
      assert(pressured == baseline,
        "sort-fallback aggregation changed the query result")
    }
  }

  test("high-cardinality distinct agg survives the spill path, rows unchanged") {
    val (baseline, _) = collectWithSpill(gate("q04_distinct"))
    withConfs("spark.sql.TungstenAggregate.testFallbackStartsAt" -> "2,3") {
      val (pressured, spilled) = collectWithSpill(gate("q04_distinct"))
      assert(spilled > 0, "distinct aggregation never hit the spill path")
      assert(pressured == baseline, "spilled distinct agg changed the result")
    }
  }

  test("window buffers spill per-partition state to disk, rows unchanged") {
    val (baseline, _) = collectWithSpill(gate("q16_sessionize"))
    withConfs(
      "spark.sql.windowExec.buffer.in.memory.threshold" -> "16",
      "spark.sql.windowExec.buffer.spill.threshold" -> "16") {
      val (pressured, spilled) = collectWithSpill(gate("q16_sessionize"))
      assert(spilled > 0, "window buffer never spilled despite 16-row cap")
      assert(pressured == baseline, "spilled window changed the query result")
    }
  }
}
