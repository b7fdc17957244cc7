package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.TxnTable
import graft.sql.GraftSql

/** Round-16 probes (SCALING.md):
  *  1. ALTER COLUMN TYPE widening is O(1) at any table size — the
  *     metadata-only commit must not grow with the data: widen wall on
  *     a 1M-row vs a 4M-row clustered table, then a zero-footer
  *     metadata COUNT over the widened MIXED-generation snapshot.
  *  2. Formatted COPY INTO cost tracks SOURCE BYTES (the materialize
  *     job) while parquet COPY INTO tracks FILE COUNT (footer harvest
  *     only): CSV loads at 1× vs 2× bytes, against the parquet adopt
  *     of the same rows.
  *  3. Persistent catalog: 200 registrations = 200 serialized metadata
  *     commits (per-commit wall reported), and a FRESH session's
  *     enableCatalog reload is checkpoint-amortized, not O(entries ×
  *     commits).
  * Usage: runMain graft.tools.R16Bench
  */
object R16Bench {
  private def loadavg: String =
    scala.util.Try(java.nio.file.Files.readString(
      java.nio.file.Paths.get("/proc/loadavg")).trim.split(" ").take(3)
      .mkString(",")).getOrElse("?")

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(s"loadavg_start=$loadavg")
    val root = java.nio.file.Files.createTempDirectory("r16bench").toString

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    // -- probe 1: widen is metadata-only at any size ----------------------
    for (rows <- Seq(1000000L, 4000000L)) {
      val t = s"$root/widen_$rows"
      TxnTable.createClustered(spark, t,
        spark.range(0, rows).select(col("id").cast("int").as("k"),
          (col("id") * 3).as("pay")),
        Seq(col("k")), targetFiles = 8)
      val (_, w) = time(TxnTable.widenColumnType(spark, t, "k",
        org.apache.spark.sql.types.LongType))
      // a beyond-int32 tranche, then the zero-footer metadata COUNT
      TxnTable.append(spark, t, spark.range(0, 1000)
        .select((col("id") + 5000000000L).as("k"), col("id").as("pay")))
      val f0 = graft.crawler.SkippingIndex.footerReads.get()
      val ((cnt, scanned, total), cw) = time(
        TxnTable.countRange(spark, t, "k", 0L, 10000000000L))
      require(cnt == rows + 1000 && scanned == 0 &&
        graft.crawler.SkippingIndex.footerReads.get() == f0,
        s"widened COUNT must be exact and zero-footer: $cnt/$scanned")
      println(f"widen rows=$rows wall=$w%.3f countRange wall=$cw%.3f " +
        s"files=$total load=$loadavg")
    }

    // -- probe 2: formatted COPY INTO tracks source bytes -----------------
    for (mult <- Seq(1, 2)) {
      val rows = 500000L * mult
      val land = s"$root/land_$mult"
      spark.range(0, rows).select(col("id"),
        (col("id") % 97).as("v"), concat(lit("row-"), col("id")).as("s"))
        .repartition(8).write.option("header", "true").csv(land)
      val bytes = {
        val w = java.nio.file.Files.walk(java.nio.file.Paths.get(land))
        try {
          var b = 0L
          w.iterator().forEachRemaining(p =>
            if (java.nio.file.Files.isRegularFile(p))
              b += java.nio.file.Files.size(p))
          b
        } finally w.close()
      }
      val t = s"$root/csv_$mult"
      TxnTable.create(spark, t, spark.range(0).select(col("id"),
        col("id").as("v"), col("id").cast("string").as("s")))
      val (_, w1) = time(TxnTable.copyIntoFormat(spark, t, land, "csv"))
      require(TxnTable.read(spark, t).count() == rows)
      // the same rows as parquet: adopt-by-reference (footer harvest)
      val pland = s"$root/pland_$mult"
      spark.range(0, rows).select(col("id"), (col("id") % 97).as("v"),
        concat(lit("row-"), col("id")).as("s"))
        .repartition(8).write.parquet(pland)
      val t2 = s"$root/pq_$mult"
      TxnTable.create(spark, t2, spark.range(0).select(col("id"),
        col("id").as("v"), col("id").cast("string").as("s")))
      val (_, w2) = time(TxnTable.copyInto(spark, t2, pland))
      require(TxnTable.read(spark, t2).count() == rows)
      println(f"copy mult=$mult srcMB=${bytes / 1e6}%.1f " +
        f"csv_wall=$w1%.2f parquet_adopt_wall=$w2%.2f load=$loadavg")
    }

    // -- probe 3: persistent catalog at 200 entries ------------------------
    GraftSql.setWarehouse(s"$root/wh")
    GraftSql.enableCatalog(spark)
    import spark.implicits._
    val seed = s"$root/seed"
    TxnTable.create(spark, seed, Seq((1L, 1L)).toDF("id", "v"))
    val (_, regW) = time {
      (0 until 200).foreach(i => GraftSql.register(s"cat_t$i", seed))
    }
    GraftSql.execute(spark,
      s"CREATE VIEW cat_v AS SELECT count(*) AS c FROM cat_t0")
    // a FRESH session: registry cleared, reload from the catalog table
    GraftSql.resetSession()
    val (_, loadW) = time(GraftSql.enableCatalog(spark))
    val served = GraftSql.query(spark, "SELECT c FROM cat_v")
      .head().getLong(0)
    require(served == 1L, "the reloaded view must serve")
    println(f"catalog register200 wall=$regW%.2f " +
      f"(per-commit ${regW / 200 * 1000}%.1f ms) reload wall=$loadW%.2f " +
      s"load=$loadavg")
    GraftSql.disableCatalog()
    spark.stop()
  }
}
