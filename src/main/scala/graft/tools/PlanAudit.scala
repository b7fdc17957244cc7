package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.queries.ContractQueries

/** Diagnostic main: measures the per-action scheduling floor and dumps the
  * formatted physical plan of every contract query at the given sf dir.
  * Usage: runMain graft.tools.PlanAudit [sfDir] [outFile]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "/tmp/plans.md"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Per-action floor: ONE-task job (range with numPartitions=1 — the
    // default 32-partition range would measure task fan-out, not floor),
    // warmed, median of 20.
    (1 to 5).foreach(_ => spark.range(0, 1, 1, 1).count())
    val floors = (1 to 20).map { _ =>
      val t0 = System.nanoTime()
      spark.range(0, 1, 1, 1).count()
      (System.nanoTime() - t0) / 1e9
    }.sorted
    val floor = floors(floors.length / 2)

    val sb = new StringBuilder
    sb.append(s"# Physical plans @ $sfDir\n\n")
    sb.append(f"Per-action floor (median of 20 `spark.range(1).count()`): $floor%.4f s\n\n")
    ContractQueries.all.foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      df.collect() // ensure AQE final plan
      sb.append(s"## $name\n\n```\n")
      sb.append(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      sb.append("\n```\n\n")
    }
    Files.writeString(Paths.get(out), sb.toString)
    println(s"floor=$floor wrote $out")
    spark.stop()
  }
}
