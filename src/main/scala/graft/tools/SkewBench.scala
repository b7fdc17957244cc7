package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.SkewJoin

/** Measures what actually helps on a skewed join: a planted-skew fact
  * table (30% of rows on ONE hot key, the rest uniform) joined to a dim
  * too large to broadcast, run three ways — sort-merge with AQE's
  * skew-join split, sort-merge without AQE, and the explicit salted join.
  *
  * Auto-broadcast is disabled to model the 100 TB case (the dim exceeds
  * any broadcast threshold); at bench scale the dim would otherwise
  * broadcast and mask the skew entirely.
  */
object SkewBench {
  def main(args: Array[String]): Unit = {
    val factRows = if (args.length > 0) args(0).toLong else 10000000L
    val dimRows = 100000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // 30% of fact rows hit key 0; the rest spread uniformly. Deterministic.
    def fact: DataFrame = spark.range(factRows).select(
      when(pmod(xxhash64(col("id")), lit(10)) < 3, 0L)
        .otherwise(pmod(xxhash64(col("id"), lit(7)), lit(dimRows))).as("k"),
      col("id").as("v"))
    def dim: DataFrame = spark.range(dimRows).select(
      col("id").as("k"), (col("id") * 2).as("dv"))

    // Aggregate to a single row so collect() is O(1); sums pin correctness.
    def run(df: DataFrame): (Double, String) = {
      val out = df.agg(count(lit(1)).as("c"), sum(col("v") + col("dv")).as("s"))
      val t0 = System.nanoTime()
      val r = out.collect()(0)
      ((System.nanoTime() - t0) / 1e9, r.toString)
    }
    def bench(label: String, aqe: Boolean, mk: () => DataFrame): (Double, String) = {
      spark.conf.set("spark.sql.adaptive.enabled", aqe.toString)
      run(mk()) // warm
      val (times, sums) = (1 to 3).map(_ => run(mk())).unzip
      println(f"$label%-28s min-of-3 ${times.min}%6.2f s   $label")
      (times.min, sums.head)
    }

    val (tNoAqe, s1) = bench("sort-merge, AQE off", aqe = false,
      () => fact.join(dim, "k"))
    val (tAqe, s2) = bench("sort-merge, AQE skew-split", aqe = true,
      () => fact.join(dim, "k"))
    val (tSalt, s3) = bench("salted join (8 salts)", aqe = true,
      () => SkewJoin.saltedInnerJoin(fact, dim, Seq("k"), salts = 8))
    println(s"results agree: ${s1 == s2 && s2 == s3}  ($s1)")
    println(f"AQE speedup over no-AQE: ${tNoAqe / tAqe}%.2fx; salted vs AQE: ${tAqe / tSalt}%.2fx")
    spark.stop()
  }
}
