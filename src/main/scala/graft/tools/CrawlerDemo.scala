package graft.tools

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.SparkSession

import graft.crawler.{CatalogStore, LakeCrawler}

/** Demo/diagnostic main: builds a small mixed-format lake in a temp dir
  * (csv, json, an extensionless parquet file for magic-byte sniffing),
  * crawls it, prints the catalog, mutates a file, and shows the
  * incremental diff. Usage: runMain graft.tools.CrawlerDemo
  */
object CrawlerDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val lake = Files.createTempDirectory("graft_demo_lake")
    Files.writeString(lake.resolve("people.csv"),
      "id,name,score\n1,ada,9.5\n2,linus,8.0\n3,grace,9.9\n")
    Files.writeString(lake.resolve("clicks.json"),
      """{"user":"ada","n":3}
        |{"user":"grace","n":7}
        |""".stripMargin)
    // extensionless parquet → format must come from the PAR1 magic bytes
    Files.copy(Paths.get("/root/testdata/sf0.001/region.parquet"),
      lake.resolve("regions"), StandardCopyOption.REPLACE_EXISTING)

    val snap1 = Files.createTempDirectory("graft_demo_snap1").toString
    val infos = CatalogStore.crawl(spark, lake.toString, snap1)
    println("== discovered ==")
    infos.foreach(i => println(s"  ${i.name} format=${i.format} files=${i.numFiles} bytes=${i.sizeBytes}"))
    println("== schemas ==")
    infos.foreach { i =>
      println(s"  ${i.name}: " + LakeCrawler.extractSchema(spark, i).map(f =>
        s"${f.name}:${f.dataType.simpleString}").mkString(", "))
    }
    println("== profiles (from snapshot parquet) ==")
    CatalogStore.readProfiles(spark, snap1)
      .orderBy("dataset", "column").show(50, truncate = false)

    // mutate the lake → incremental crawl must see exactly one change
    Files.writeString(lake.resolve("people.csv"),
      "id,name,score\n1,ada,9.5\n2,linus,8.0\n3,grace,9.9\n4,edsger,7.7\n")
    val snap2 = Files.createTempDirectory("graft_demo_snap2").toString
    val d = CatalogStore.incrementalCrawl(spark, lake.toString, snap1, snap2)
    println(s"== incremental after touch: unchanged=${d.unchanged} changed=${d.changed} added=${d.added} removed=${d.removed}")
    println("== merged profile of changed dataset ==")
    CatalogStore.readProfiles(spark, snap2)
      .filter(org.apache.spark.sql.functions.col("dataset") === "people")
      .show(10, truncate = false)
    spark.stop()
  }
}
