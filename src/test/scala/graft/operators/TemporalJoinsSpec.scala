package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpecBase

class TemporalJoinsSpec extends SparkSpecBase {
  import spark.implicits._

  // Hand-checkable fixture: key, time, id. Includes a tie (two right rows
  // at t=10 for key 1) and an exact boundary (left at t=10).
  private lazy val left = Seq(
    (1L, 10L, 100L), // boundary: right rows exist at exactly t=10
    (1L, 25L, 101L),
    (2L, 5L, 102L),  // no right row at or before t=5 for key 2
    (3L, 50L, 103L)  // key with no right rows at all
  ).toDF("k", "t", "lid")

  private lazy val right = Seq(
    (1L, 10L, 7L), (1L, 10L, 9L), (1L, 20L, 11L), (1L, 30L, 13L),
    (2L, 6L, 21L), (2L, 4L, 23L)
  ).toDF("rk", "rt", "rid")

  test("asofJoin inclusive: max (time, tie) at-or-before, left outer") {
    val out = TemporalJoins.asofJoin(left, right,
        "k", "rk", "t", "rt", "rid", Seq("rid"))
      .select("lid", "rt", "rid").collect().map(r =>
        (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Long]),
          Option(r.get(2)).map(_.asInstanceOf[Long]))).toSet
    assert(out === Set(
      (100L, Some(10L), Some(9L)), // tie at t=10 broken by max rid
      (101L, Some(20L), Some(11L)),
      (102L, Some(4L), Some(23L)),
      (103L, None, None)))
  }

  test("asofJoin exclusive: strictly-before drops the boundary row") {
    val out = TemporalJoins.asofJoin(left, right,
        "k", "rk", "t", "rt", "rid", Seq("rid"), inclusive = false)
      .select("lid", "rid").collect().map(r =>
        (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Long]))).toSet
    assert(out === Set(
      (100L, None),          // t=10 rows excluded, nothing earlier
      (101L, Some(11L)),
      (102L, Some(23L)),
      (103L, None)))
  }

  test("asofJoin equals naive per-row computation on random data") {
    val rnd = new scala.util.Random(42)
    val ldata = (1 to 300).map(i =>
      (rnd.nextInt(10).toLong, rnd.nextInt(100).toLong, i.toLong))
    val rdata = (1 to 300).map(i =>
      (rnd.nextInt(10).toLong, rnd.nextInt(100).toLong, (1000 + i).toLong))
    val l = ldata.toDF("k", "t", "lid")
    val r = rdata.toDF("rk", "rt", "rid")
    val got = TemporalJoins.asofJoin(l, r, "k", "rk", "t", "rt", "rid", Seq("rid"))
      .select("lid", "rid").collect()
      .map(x => (x.getLong(0), Option(x.get(1)).map(_.asInstanceOf[Long]))).toMap
    val want = ldata.map { case (k, t, lid) =>
      val cand = rdata.filter(rr => rr._1 == k && rr._2 <= t)
      lid -> (if (cand.isEmpty) None
              else Some(cand.maxBy(rr => (rr._2, rr._3))._3))
    }.toMap
    assert(got === want)
  }

  test("proximityJoin equals naive cross filter, incl. exact boundary") {
    val rnd = new scala.util.Random(7)
    // Mix tight clusters and negatives so buckets -1/0/+1 all matter.
    val adata = (1 to 200).map(i => (i.toLong, rnd.nextLong() % 500L))
    val bdata = (1 to 200).map(i => ((1000 + i).toLong, rnd.nextLong() % 500L))
    val tol = 37L
    val a = adata.toDF("a_id", "a_pos")
    val b = bdata.toDF("b_id", "b_pos")
    val got = TemporalJoins.proximityJoin(a, b, "a_pos", "b_pos", tol)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (for {
      (ai, ap) <- adata; (bi, bp) <- bdata
      if math.abs(ap - bp) <= tol
    } yield (ai, bi)).toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("asofJoinChunked equals asofJoin for every chunk size") {
    val rnd = new scala.util.Random(99)
    // Dense keys + sparse keys + a key whose matches must carry across
    // many empty chunks.
    val ldata = (1 to 400).map(i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong, i.toLong))
    val rdata = (1 to 400).map(i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong, (5000 + i).toLong)) :+
      ((9L, 3L, 9999L)) // lone right row: later left rows carry across chunks
    val lx = ldata :+ ((9L, 950L, 500L))
    val l = lx.toDF("k", "t", "lid")
    val r = rdata.toDF("rk", "rt", "rid")
    val want = TemporalJoins.asofJoin(l, r, "k", "rk", "t", "rt", "rid", Seq("rid"))
      .select("lid", "rt", "rid").collect()
      .map(x => (x.getLong(0), Option(x.get(1)), Option(x.get(2)))).toSet
    for (span <- Seq(1L, 7L, 64L, 1000L, 100000L)) {
      val got = TemporalJoins.asofJoinChunked(
          l, r, "k", "rk", "t", "rt", "rid", Seq("rid"), chunkSpan = span)
        .select("lid", "rt", "rid").collect()
        .map(x => (x.getLong(0), Option(x.get(1)), Option(x.get(2)))).toSet
      assert(got === want, s"chunkSpan=$span diverged from asofJoin")
    }
  }

  test("asofJoinChunked handles timestamp time columns at full precision") {
    val l = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00.000501"), 1L))
      .toDF("k", "t", "lid")
    val r = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00.000500"), 10L),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00.000502"), 11L)
    ).toDF("rk", "rt", "rid")
    // A seconds-precision cast would see all three at t=0 and match rid=11.
    val got = TemporalJoins.asofJoinChunked(
        l, r, "k", "rk", "t", "rt", "rid", Seq("rid"), chunkSpan = 1000L)
      .select("rid").collect().map(_.getLong(0)).toSeq
    assert(got === Seq(10L))
  }

  test("proximityJoin produces each pair exactly once") {
    val a = Seq((1L, 100L)).toDF("a_id", "a_pos")
    val b = Seq((2L, 100L), (3L, 137L), (4L, 63L), (5L, 138L)).toDF("b_id", "b_pos")
    val rows = TemporalJoins.proximityJoin(a, b, "a_pos", "b_pos", 37L)
      .select("b_id").collect().map(_.getLong(0)).toSeq.sorted
    assert(rows === Seq(2L, 3L, 4L)) // 138 is outside |Δ|<=37
  }

  test("proximityJoin is exact at the top of the long range (no 2^53 loss)") {
    // Above 2^53 a double division computes wrong bucket ids; integral
    // `div` must keep adjacent positions joinable and far ones excluded.
    val top = Long.MaxValue - 100L
    val a = Seq((1L, top)).toDF("a_id", "a_pos")
    val b = Seq((2L, top - 7L), (3L, top + 9L), (4L, top - 50L))
      .toDF("b_id", "b_pos")
    val rows = TemporalJoins.proximityJoin(a, b, "a_pos", "b_pos", 10L)
      .select("b_id").collect().map(_.getLong(0)).toSeq.sorted
    assert(rows === Seq(2L, 3L))
  }

  test("asofJoinForward inclusive: min (time, tie) at-or-after, left outer") {
    val l = Seq((1L, 100L, 10L), (1L, 250L, 11L), (2L, 50L, 12L))
      .toDF("k", "t", "lid")
    val r = Seq(
      (1L, 100L, 20L), (1L, 100L, 21L), // equal time, two ties -> min rid 20
      (1L, 300L, 22L), (9L, 1L, 23L))
      .toDF("rk", "rt", "rid")
    val got = TemporalJoins.asofJoinForward(
        l, r, "k", "rk", "t", "rt", "rid", Seq("rid"))
      .orderBy("lid").collect()
      .map(x => (x.getLong(2), if (x.isNullAt(4)) -1L else x.getLong(4))).toSeq
    assert(got === Seq((10L, 20L), (11L, 22L), (12L, -1L)))
  }

  test("asofJoinForward exclusive drops the equal-time boundary row") {
    val l = Seq((1L, 100L, 10L)).toDF("k", "t", "lid")
    val r = Seq((1L, 100L, 20L), (1L, 150L, 21L)).toDF("rk", "rt", "rid")
    val got = TemporalJoins.asofJoinForward(
        l, r, "k", "rk", "t", "rt", "rid", Seq("rid"), inclusive = false)
      .head().getLong(4)
    assert(got === 21L)
  }

  test("asofJoinForward equals naive per-row computation on random data") {
    val n = 500
    val l = (0 until n).map(i => ((i * 13) % 7L, ((i * 37) % 97).toLong, i.toLong))
      .toDF("k", "t", "lid")
    val r = (0 until n).map(i => ((i * 11) % 7L, ((i * 29) % 97).toLong, (1000 + i).toLong))
      .toDF("rk", "rt", "rid")
    val got = TemporalJoins.asofJoinForward(
        l, r, "k", "rk", "t", "rt", "rid", Seq("rid"))
      .collect().map(x => x.getLong(2) -> (if (x.isNullAt(4)) -1L else x.getLong(4))).toMap
    val rRows = r.collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    l.collect().foreach { row =>
      val (k, t, lid) = (row.getLong(0), row.getLong(1), row.getLong(2))
      val cand = rRows.filter(c => c._1 == k && c._2 >= t)
      val want = if (cand.isEmpty) -1L
        else { val mt = cand.map(_._2).min; cand.filter(_._2 == mt).map(_._3).min }
      assert(got(lid) === want, s"lid=$lid")
    }
  }

  test("intervalOverlapJoin matches brute force and emits each pair once") {
    val a = Seq((1L, 0L, 100L), (2L, 50L, 250L), (3L, 300L, 310L))
      .toDF("a_id", "s_a", "e_a")
    val b = Seq((10L, 90L, 160L), (11L, 240L, 400L), (12L, 500L, 600L))
      .toDF("b_id", "s_b", "e_b")
    // chunk far smaller than spans: pairs overlap MANY buckets — the
    // canonical-bucket rule must still emit each exactly once
    val got = TemporalJoins
      .intervalOverlapJoin(a, b, "s_a", "e_a", "s_b", "e_b", chunk = 7L)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    val brute = a.crossJoin(b)
      .filter(col("s_a") <= col("e_b") && col("s_b") <= col("e_a"))
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(got === brute)
    assert(got === Seq((1L, 10L), (2L, 10L), (2L, 11L), (3L, 11L)))
  }

  test("intervalOverlapJoin boundary semantics: touching endpoints overlap, gaps do not") {
    val a = Seq((1L, 0L, 10L)).toDF("a_id", "s_a", "e_a")
    val b = Seq((2L, 10L, 20L), (3L, 11L, 20L)).toDF("b_id", "s_b", "e_b")
    val got = TemporalJoins
      .intervalOverlapJoin(a, b, "s_a", "e_a", "s_b", "e_b", chunk = 100L)
      .select("b_id").collect().map(_.getLong(0)).toSeq
    assert(got === Seq(2L)) // [0,10] touches [10,20]; [11,20] is disjoint
  }

  test("intervalOverlapJoin drops inverted (end < start) intervals") {
    // sequence(hi, lo) silently steps -1, so without the guard an
    // inverted row still generates candidate buckets: [10,5] vs [3,12]
    // would pass both the overlap filter and the canonical-bucket rule.
    val a = Seq((1L, 10L, 5L), (2L, 0L, 20L)).toDF("a_id", "s_a", "e_a")
    val b = Seq((10L, 3L, 12L), (11L, 30L, 25L)).toDF("b_id", "s_b", "e_b")
    val got = TemporalJoins
      .intervalOverlapJoin(a, b, "s_a", "e_a", "s_b", "e_b", chunk = 7L)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq((2L, 10L))) // only the two well-formed rows pair
  }

  test("keyed intervalOverlapJoin never crosses keys") {
    val a = Seq(("x", 1L, 0L, 100L), ("y", 2L, 0L, 100L))
      .toDF("k", "a_id", "s_a", "e_a")
    val b = Seq(("x", 10L, 50L, 60L)).toDF("k", "b_id", "s_b", "e_b")
    val got = TemporalJoins.intervalOverlapJoin(
        a, b, "s_a", "e_a", "s_b", "e_b", chunk = 10L, keyCols = Seq("k"))
      .select("a_id").collect().map(_.getLong(0)).toSeq
    assert(got === Seq(1L))
  }
}
