package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures the scan-parallelism effect of table layout: the q01
  * aggregation over sf0.1 lineitem stored as ONE parquet file (the corpus
  * layout — one row group, scan parallelism 1) vs a 16-file layout of the
  * same rows. Records the number SCALING.md asserts: multi-file layouts
  * fan the scan out across cores.
  */
object MultifileBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val out = "/root/repo/target/gatedata/lineitem16_bench"
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .repartition(16).write.mode("overwrite").parquet(out)

    def q01over(li: DataFrame): DataFrame =
      li.filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sq"),
          (sum(round(col("l_extendedprice") * 100).cast("long")) / 100.0).as("sp"),
          avg(col("l_quantity")).as("aq"),
          count(lit(1)).as("c"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))

    def time(label: String, mk: () => DataFrame): Double = {
      (1 to 2).foreach(_ => mk().collect()) // warm
      val best = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); mk().collect(); (System.nanoTime() - t0) / 1e9
      }.min
      println(f"$label%-14s min-of-5 $best%.3f s")
      best
    }

    val single = time("single-file", () => q01over(spark.read.parquet(s"$sfDir/lineitem.parquet")))
    val multi = time("16-file", () => q01over(spark.read.parquet(out)))
    val rows1 = q01over(spark.read.parquet(s"$sfDir/lineitem.parquet")).collect().map(_.toString)
    val rows16 = q01over(spark.read.parquet(out)).collect().map(_.toString)
    println(s"results identical: ${rows1.sameElements(rows16)}")
    println(f"speedup: ${single / multi}%.2fx")
    spark.stop()
  }
}
