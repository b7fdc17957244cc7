package graft.tools

import org.apache.spark.sql.SparkSession

import graft.queries.ContractQueries

/** Phase breakdown for one contract query: DataFrame construction,
  * analysis, physical planning, first execution, re-execution of the same
  * DataFrame, and fresh-DataFrame execution. Identifies whether bench time
  * is planning-bound or execution-bound.
  */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val name = if (args.length > 1) args(1) else "q01_agg_lineitem"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    // Extra configs: SPARK_GRAFT_CONF="k=v;k=v"
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(';').filter(_.contains('='))
      .foreach { kv => val Array(k, v) = kv.split("=", 2); builder.config(k, v) })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = ContractQueries.all.toMap.apply(name)

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $label%-28s ${(System.nanoTime() - t0) / 1e6}%9.1f ms"); r
    }
    (1 to 3).foreach { i =>
      println(s"-- iteration $i --")
      val df = t("build DataFrame")(fn(spark, sfDir))
      t("analyze (schema)")(df.schema)
      t("physical plan")(df.queryExecution.executedPlan)
      t("collect #1")(df.collect())
      t("collect #2 (same df)")(df.collect())
      val df2 = t("build fresh df")(fn(spark, sfDir))
      t("fresh optimize+plan")(df2.queryExecution.executedPlan)
      t("fresh collect (planned)")(df2.collect())
      t("fresh collect again")(df2.collect())
    }
    spark.stop()
  }
}
