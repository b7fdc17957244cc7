package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

class FuzzyJoinSpec extends SparkSpecBase {
  import spark.implicits._

  /** Brute-force truth: all cross pairs within maxDist. */
  private def brute(
      l: Seq[(Long, String)], r: Seq[(Long, String)], d: Int): Set[(Long, Long, Long)] =
    (for {
      (il, sl) <- l
      (ir, sr) <- r
      dist = levDist(sl, sr) if dist <= d
    } yield (il, ir, dist.toLong)).toSet

  private def levDist(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
        dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    dp(a.length)(b.length)
  }

  private def run(
      l: Seq[(Long, String)], r: Seq[(Long, String)], d: Int): Set[(Long, Long, Long)] =
    FuzzyJoin.join(l.toDF("id", "s"), "id", "s", r.toDF("id", "s"), "id", "s", d)
      .as[(Long, Long, Long)].collect().toSet

  test("matches brute force on mixed short/boundary/long strings") {
    // maxDist=2, q=3 → minLen=9, boundary zone [9, 11): include lengths
    // straddling every regime, incl. short-vs-boundary pairs the q-gram
    // bound alone would miss.
    val rows = Seq(
      1L -> "ab",              // short
      2L -> "abc",             // short
      3L -> "abcdefg",         // short (7)
      4L -> "abcdefghi",       // boundary (9)
      5L -> "abcdefghij",      // boundary (10)
      6L -> "abcdefghijk",     // long (11)
      7L -> "abcdefghijklmno", // long (15)
      8L -> "xbcdefghijklmno", // 1 sub from 7
      9L -> "zzzzzzzzzzzzzzz", // unrelated long
      10L -> "")               // empty
    val got = run(rows, rows, 2)
    assert(got == brute(rows, rows, 2))
  }

  test("asymmetric join, maxDist=1") {
    val l = Seq(1L -> "Supplier#0001", 2L -> "Supplier#0010", 3L -> "other")
    val r = Seq(10L -> "Supplier#0002", 11L -> "Suplier#0001", 12L -> "word")
    val got = run(l, r, 1)
    assert(got == brute(l, r, 1))
  }

  test("maxDist=0 degenerates to exact string equality") {
    val l = Seq(1L -> "same-string", 2L -> "ab", 3L -> "x")
    val r = Seq(4L -> "same-string", 5L -> "ab", 6L -> "y")
    val got = run(l, r, 0)
    assert(got == Set((1L, 4L, 0L), (2L, 5L, 0L)))
  }

  test("randomized brute-force equivalence (seeded, 3 rounds, d=1..2)") {
    // Small alphabet forces dense near-matches; lengths 0..14 straddle
    // the short/boundary/long key regimes for both d values.
    val rnd = new scala.util.Random(20260812L)
    for (round <- 0 until 3; d <- 1 to 2) {
      val rows = (0 until 60).map { i =>
        val len = rnd.nextInt(15)
        (i.toLong, Seq.fill(len)("abc" (rnd.nextInt(3))).mkString)
      }
      val got = run(rows, rows, d)
      assert(got == brute(rows, rows, d),
        s"round $round d=$d: blocked join diverged from brute force")
    }
  }

  /** Block-join volume = Σ over keys of |left block| × |right block| —
    * the row count the candidate join materializes before any filter.
    */
  private def blockVolume(
      l: Seq[(Long, String)], r: Seq[(Long, String)], d: Int, hotDf: Long): Long = {
    val (lk, rk) = FuzzyJoin.keyedSides(
      l.toDF("id", "s"), "id", "s", r.toDF("id", "s"), "id", "s", d, 3, hotDf)
    lk.groupBy("_key").count().withColumnRenamed("count", "nl")
      .join(rk.groupBy("_key").count().withColumnRenamed("count", "nr"), "_key")
      .agg(sum(col("nl") * col("nr"))).as[Long].head()
  }

  test("hot-gram guard: planted hot gram stays exact with bounded block volume") {
    // Every string shares the template prefix "COMMONHDR-" (8 hot 3-grams
    // over 60 rows) but tails vary in length — the profile where one
    // corpus-frequent gram makes a single blocking key quadratic.
    val rows = (0 until 60).map { i =>
      (i.toLong, "COMMONHDR-" + ("x" * (i % 20)) + f"$i%02d")
    }
    for (d <- 1 to 2) {
      val guarded = FuzzyJoin.join(rows.toDF("id", "s"), "id", "s",
          rows.toDF("id", "s"), "id", "s", d, 3, hotGramDf = 10)
        .as[(Long, Long, Long)].collect().toSet
      assert(guarded == brute(rows, rows, d),
        s"d=$d: hot-gram guard changed the result")
      val vGuard = blockVolume(rows, rows, d, hotDf = 10)
      val vPlain = blockVolume(rows, rows, d, hotDf = 0)
      // Unguarded: every hot prefix gram contributes a 60×60 block.
      // Guarded: hot-gram rows reroute to length bands (≤ ~2·(d+1) rows
      // per band here), so the volume collapses by an order of magnitude.
      assert(vGuard * 5 < vPlain,
        s"d=$d: guard left block volume $vGuard vs unguarded $vPlain")
    }
  }

  test("hot-gram guard is a no-op on a corpus with no hot grams") {
    val l = Seq(1L -> "Supplier#0001", 2L -> "Supplier#0010", 3L -> "other")
    val r = Seq(10L -> "Supplier#0002", 11L -> "Suplier#0001", 12L -> "word")
    val got = FuzzyJoin.join(l.toDF("id", "s"), "id", "s",
        r.toDF("id", "s"), "id", "s", 1, 3, hotGramDf = 50)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == brute(l, r, 1))
  }

  test("finds corpus near-dup supplier names (self-join, diagonal dropped)") {
    val names = (1 to 30).map(i => (i.toLong, f"Supplier#$i%09d"))
    val pairs = FuzzyJoin.join(
        names.toDF("id", "s"), "id", "s", names.toDF("id", "s"), "id", "s", 1)
      .filter(col("id_l") < col("id_r"))
      .as[(Long, Long, Long)].collect().toSet
    val expected = brute(names, names, 1).filter(t => t._1 < t._2)
    assert(pairs == expected)
    assert(pairs.nonEmpty, "single-digit-diff names must pair at dist 1")
  }
}
