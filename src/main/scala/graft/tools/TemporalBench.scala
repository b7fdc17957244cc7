package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.TemporalJoins

/** Scale evidence for TemporalJoins: the operators' work must stay
  * O(n + matches), not O(n²).
  *
  * - as-of join at 10M×10M rows: the union-window formulation shuffles
  *   |L|+|R| rows once; a range-join formulation would explode to
  *   |events per key|² candidates (≈n²/K) before the max — unrunnable at
  *   this size, which is the point. We time the operator and, at a small
  *   n where it IS runnable, prove the naive plan's blowup factor.
  * - proximity join at 10M points: candidate pairs are bounded by bucket
  *   co-residency; the naive cross filter at the same density is O(n²).
  */
object TemporalBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 10000000L
    val keys = 100000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Deterministic synthetic series: rows over `nKeys` keys, timestamps
    // spread over ~rows microseconds with per-row jitter.
    def series(salt: Int, idName: String, rows: Long, nKeys: Long): DataFrame =
      spark.range(rows).select(
        pmod(xxhash64(col("id"), lit(salt)), lit(nKeys)).as("k" + salt),
        (col("id") * 3 + pmod(xxhash64(col("id"), lit(salt + 1)), lit(1000)))
          .as("t" + salt),
        col("id").as(idName))

    def timed(label: String)(f: => Long): Double = {
      val out = f // warm
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-34s min-of-3 ${times.min}%7.2f s   (result rows: $out%,d)")
      times.min
    }

    val left = series(11, "lid", n, keys)
    val right = series(23, "rid", n, keys)

    timed(s"asofJoin  ${n / 1000000}M x ${n / 1000000}M") {
      TemporalJoins.asofJoin(left, right, "k11", "k23", "t11", "t23",
        "rid", Seq("rid")).agg(count(col("rid"))).collect()(0).getLong(0)
    }

    timed(s"proximityJoin ${n / 1000000}M, tol=5") {
      TemporalJoins.proximityJoin(
        left.select(col("t11").as("ap"), col("lid")),
        right.select(col("t23").as("bp"), col("rid")),
        "ap", "bp", 5L).count()
    }

    // Naive-formulation blowup proof at a size where it still finishes:
    // same as-of semantics as a range join + max aggregation, on a series
    // with realistic per-key density (2 000 events/key — a quiet ticker;
    // a hot key at 100 TB has millions, where the naive plan simply
    // dies: candidates grow as rows·density while the operator's work
    // stays rows·log(rows)).
    val small = 200000L
    val sl = series(11, "lid", small, 100L)
    val sr = series(23, "rid", small, 100L)
    val tOp = timed(s"asofJoin  ${small / 1000}k (operator)") {
      TemporalJoins.asofJoin(sl, sr, "k11", "k23", "t11", "t23",
        "rid", Seq("rid")).agg(count(col("rid"))).collect()(0).getLong(0)
    }
    val tNaive = timed(s"asofJoin  ${small / 1000}k (naive range)") {
      sl.join(sr, col("k11") === col("k23") && col("t23") <= col("t11"), "left")
        .groupBy(col("lid"))
        .agg(max(struct(col("t23"), col("rid"))).as("m"))
        .agg(count(col("m.rid"))).collect()(0).getLong(0)
    }
    println(f"naive/operator at ${small / 1000}k rows: ${tNaive / tOp}%.1fx " +
      "(naive candidate set grows ~n^2/K; operator stays linear)")

    // Hot-key skew: 50% of both sides on ONE key. Plain asofJoin
    // serializes that key into a single window task; the chunked variant
    // bounds every task to one (key, chunk).
    def skewed(salt: Int, idName: String): DataFrame =
      spark.range(n).select(
        when(pmod(xxhash64(col("id"), lit(salt + 2)), lit(2)) === 0, lit(0L))
          .otherwise(pmod(xxhash64(col("id"), lit(salt)), lit(keys))).as("k" + salt),
        (col("id") * 3 + pmod(xxhash64(col("id"), lit(salt + 1)), lit(1000)))
          .as("t" + salt),
        col("id").as(idName))
    val skl = skewed(11, "lid")
    val skr = skewed(23, "rid")
    val tPlain = timed(s"asofJoin  ${n / 1000000}M skewed (1 hot key)") {
      TemporalJoins.asofJoin(skl, skr, "k11", "k23", "t11", "t23",
        "rid", Seq("rid")).agg(count(col("rid"))).collect()(0).getLong(0)
    }
    val tChunk = timed(s"asofJoinChunked same, span=n/64") {
      TemporalJoins.asofJoinChunked(skl, skr, "k11", "k23", "t11", "t23",
        "rid", Seq("rid"), chunkSpan = math.max(1L, n * 3 / 64))
        .agg(count(col("rid"))).collect()(0).getLong(0)
    }
    println(f"chunked speedup on hot key: ${tPlain / tChunk}%.2fx")
    spark.stop()
  }
}
