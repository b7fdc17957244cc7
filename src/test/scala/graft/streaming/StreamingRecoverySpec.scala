package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.core.Lake

/** Exactly-once file-sink recovery: kill a checkpointed streaming query
  * mid-stream, restart it on the SAME checkpoint + sink path, and the
  * final output must equal the batch truth — no lost windows, no
  * duplicated windows. This is the production property st5 rides on
  * (offset log replays uncommitted batches; _spark_metadata hides
  * uncommitted sink files from readers).
  */
class StreamingRecoverySpec extends SparkSpecBase {

  test("file sink + checkpoint: kill mid-stream, restart, exactly-once output") {
    val staging = Files.createTempDirectory("graft_rec_in").toString
    val outP = Files.createTempDirectory("graft_rec_out").toString
    val ckpt = Files.createTempDirectory("graft_rec_ck").toString
    EventStreams.stageEventsWithSentinel(spark, sf0001, staging)

    // Phase 1: small micro-batches; stop as soon as at least one batch
    // has committed (mid-stream kill — some input processed, some not).
    val q1 = EventStreams.startTumblingFileSink(spark, staging, outP, ckpt,
      maxFilesPerTrigger = 2)
    val deadline = System.currentTimeMillis() + 60000
    while (q1.recentProgress.count(_.numInputRows > 0) < 1 &&
        System.currentTimeMillis() < deadline) {
      Thread.sleep(50)
    }
    q1.stop()
    q1.awaitTermination()
    assert(q1.recentProgress.nonEmpty, "first run never committed a batch")

    // Phase 2: restart on the same checkpoint; drain to completion.
    val q2 = EventStreams.startTumblingFileSink(spark, staging, outP, ckpt,
      maxFilesPerTrigger = 2)
    try q2.processAllAvailable() finally q2.stop()

    val streamed = spark.read.parquet(outP)
      .filter(col("event_type") =!= EventStreams.SentinelType)
      .select(col("h"), col("event_type"), col("c"), col("s"))
      .collect().map(_.toString).sorted
    val batch = Lake.table(spark, sf0001, "events")
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("c"),
        (sum(round(col("value") * 100).cast("long")) / 100.0).as("s"))
      .collect().map(_.toString).sorted

    assert(streamed.length == batch.length,
      s"window count diverged: streamed ${streamed.length} vs batch ${batch.length}")
    assert(streamed.sameElements(batch), "restarted stream output != batch truth")
  }
}
