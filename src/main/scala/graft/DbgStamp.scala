package graft
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Dataset, Row}
import org.apache.spark.sql.streaming.Trigger
import graft.core.TxnTable
import graft.streaming.StreamChanges
object DbgStamp {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("dbg").toString
    val t = s"$root/t"
    TxnTable.create(spark, t, Seq((1L,10L),(2L,20L)).toDF("id","v"))
    def drain(): Unit = {
      val q = StreamChanges.readChangesStream(spark, t, s"$root/spool",
        s"$root/pc", Seq("id"))
        .writeStream.option("checkpointLocation", s"$root/uc")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: Dataset[Row], _: Long) => b.count(); () }
        .start()
      try q.awaitTermination() finally q.stop()
    }
    drain()
    println("stamp after drain1: " + new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$root/spool/_schema.json"))))
    TxnTable.addColumns(spark, t, Seq(("w", org.apache.spark.sql.types.LongType)))
    TxnTable.append(spark, t, Seq((3L,30L,300L)).toDF("id","v","w"))
    try { drain(); println("NO THROW") }
    catch { case e: Throwable =>
      var x: Throwable = e
      while (x != null) { println("CHAIN: " + x.getMessage.take(120)); x = x.getCause }
    }
    spark.stop()
  }
}
