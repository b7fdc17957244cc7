package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan-audit helper: print the formatted physical plan of one or more
  * gates (by name prefix) against a given sf dir. Usage:
  *   runMain graft.tools.ExplainGate <sfDir> <prefix>[,<prefix>...]
  */
object ExplainGate {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, prefixes) = args
    val wanted = prefixes.split(",").toSeq
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries
      .filter(kv => wanted.exists(kv._1.startsWith))
      .toSeq.sortBy(_._1)
      .foreach { case (name, fn) =>
        println(s"==== $name ====")
        fn(spark, sfDir).explain("formatted")
      }
    spark.stop()
  }
}
