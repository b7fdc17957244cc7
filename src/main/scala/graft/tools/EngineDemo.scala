package graft.tools

import org.apache.spark.sql.SparkSession

import graft.GraftEngine

/** Drives the user-facing engine surface, including the session-reuse
  * path: a plain session exists first (no extensions), then
  * GraftEngine.session must still deliver cosine_sim in SQL.
  * Usage: runMain graft.tools.EngineDemo [sfDir]
  */
object EngineDemo {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    // simulate an application that already built a session WITHOUT graft
    val pre = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    pre.sparkContext.setLogLevel("WARN")
    val eng = GraftEngine.open(dir, GraftEngine.session("local[8]"))
    println("q01-style SQL rows: " + eng.sql(
      "SELECT l_returnflag, count(*) c FROM lineitem GROUP BY 1 ORDER BY 1").count())
    println("cosine_sim(self)=" + eng.sql(
      "SELECT cosine_sim(embedding, embedding) FROM embeddings WHERE vec_id=1")
      .head().getDouble(0))
    val snap = java.nio.file.Files.createTempDirectory("eng_demo").toString
    println("crawl datasets: " + eng.crawl(dir, snap).size)
    eng.spark.stop()
  }
}
