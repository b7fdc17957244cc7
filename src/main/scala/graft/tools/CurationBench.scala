package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Curation, Keywords, Multimodal, Sampling}

/** Measures the round-3 curation operators at corpus scale (default
  * sf0.1 documents) plus a synthetic 20× blow-up, to show cost growth is
  * linear in rows — the property that matters at 100 TB. Each op prints
  * min-of-3 wall seconds and a result checksum (so the JIT can't dead-code
  * the work).
  */
object CurationBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = graft.core.Lake.table(spark, sfDir, "documents").cache()
    val nDocs = docs.count()

    // 20x blow-up with perturbed ids/text so dedup work is real, not
    // 20 identical copies collapsing in the first partial aggregate.
    val big = docs
      .crossJoin(spark.range(20).select(col("id").as("rep")))
      .select((col("doc_id") * 20 + col("rep")).as("doc_id"),
        concat(col("text"), lit(" rep"), col("rep")).as("text"),
        col("lang"), col("source"), col("n_chars"))
      .cache()
    val nBig = big.count()

    def time(name: String, n: Long)(body: => Long): Unit = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val sum = body
        ((System.nanoTime() - t0) / 1e9, sum)
      }
      println(f"[curbench] $name%-28s rows=$n%8d min=${runs.map(_._1).min}%7.3f s checksum=${runs.head._2}")
    }

    for ((label, d, n) <- Seq(("sf0.1", docs, nDocs), ("sf0.1 x20", big, nBig))) {
      time(s"domainQuota $label", n) {
        Curation.domainQuota(d, col("source"), col("n_chars"), col("doc_id"), 10)
          .agg(sum(col("doc_id"))).head().getLong(0)
      }
      time(s"chunkDedup $label", n) {
        Curation.chunkDedup(d, "doc_id", "text", 10)
          .agg(sum(col("chunks_kept"))).head().getLong(0)
      }
      time(s"contamination $label", n) {
        Curation.contaminationFlags(d, "doc_id", "text", col("doc_id") % 97 === 0, 5)
          .agg(sum(when(col("contaminated"), 1L).otherwise(0L))).head().getLong(0)
      }
      time(s"md5 decode+features $label", n) {
        Multimodal.extractFeatures(Multimodal.decodeImages(
            Multimodal.mediaFromDocuments(spark, d)))
          .toDF().agg(count(lit(1))).head().getLong(0)
      }
      time(s"weightedSample $label", n) {
        Sampling.weightedSample(d, col("n_chars"), col("doc_id"), 100)
          .agg(sum(col("doc_id"))).head().getLong(0)
      }
      time(s"lengthHistogram $label", n) {
        Curation.lengthHistogram(d, col("n_chars"), 50)
          .agg(sum(col("c"))).head().getLong(0)
      }
      time(s"invertedIndex $label", n) {
        Keywords.invertedIndex(d, "doc_id", "text")
          .agg(sum(col("tf_total"))).head().getLong(0)
      }
      time(s"packBins $label", n) {
        Curation.packBins(d.withColumn("tok",
              (col("n_chars") / 5 + 1).cast("long")),
            col("source"), col("tok"), col("doc_id"), 2048L)
          .agg(sum(col("bin"))).head().getLong(0)
      }
      time(s"mixtureSample $label", n) {
        val srcs = d.select(col("source")).distinct()
          .orderBy(col("source")).collect().map(_.getString(0))
        val weights = srcs.zipWithIndex.map { case (s, i) =>
          s -> (if (i == 0) 0.4 else 0.6 / (srcs.length - 1))
        }.toMap
        Curation.mixtureSample(d, "source", "doc_id", weights)
          .agg(count(lit(1))).head().getLong(0)
      }
    }
    spark.stop()
  }
}
