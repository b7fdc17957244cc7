package graft.tools

import org.apache.spark.sql.SparkSession

import graft.core.Lake
import graft.operators.Similarity

/** Times topSimilarPairs (all-pairs cosine) with the native codegen
  * expression vs the higher-order-function scorer at the given sf dir.
  * Usage: runMain graft.tools.CosineBench [sfDir]
  */
object CosineBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Lake.table(spark, sfDir, "embeddings")
    println(s"vectors: ${emb.count()}")

    def time(label: String, native: Boolean): Unit = {
      Similarity.useNativeCosine = native
      Similarity.topSimilarPairs(emb, 20).collect() // warm
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        Similarity.topSimilarPairs(emb, 20).collect()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-8s min=${times.min}%.3f s  runs=${times.map(t => f"$t%.3f").mkString(",")}")
    }
    time("hof", native = false)
    time("native", native = true)
    Similarity.useNativeCosine = true
    spark.stop()
  }
}
