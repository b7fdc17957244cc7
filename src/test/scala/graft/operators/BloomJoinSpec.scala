package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.plans.{BloomMightContain, BloomUtil}

class BloomJoinSpec extends SparkSpecBase {
  import spark.implicits._

  test("no false negatives: every inserted key probes true") {
    val keys = (0L until 5000L).map(_ * 2654435761L) // spread-out keys
    val buf = new Array[Byte](BloomUtil.sizing(5000, 10)._1)
    keys.foreach(BloomUtil.setBits(buf, _, 7))
    assert(keys.forall(BloomUtil.mightContain(buf, _, 7)))
  }

  test("false-positive rate at 10 bits/key is near the theoretical ~0.8%") {
    val buf = new Array[Byte](BloomUtil.sizing(10000, 10)._1)
    (0L until 10000L).foreach(v => BloomUtil.setBits(buf, BloomUtil.fmix64(v), 7))
    val probes = (1000000L until 1020000L).map(BloomUtil.fmix64)
    val fp = probes.count(BloomUtil.mightContain(buf, _, 7))
    assert(fp < probes.size * 0.03, s"fpp ${fp.toDouble / probes.size}")
  }

  test("distributed build == serial build (merge is bitwise OR)") {
    val df = spark.range(0, 2000).select(col("id"))
    val serial = BloomJoin.buildBloom(df.coalesce(1), col("id"), 2000)
    val dist = BloomJoin.buildBloom(df.repartition(13), col("id"), 2000)
    assert(java.util.Arrays.equals(serial, dist))
  }

  test("semiJoin equals plain left_semi on real tables") {
    val lineitem = graft.core.Lake.table(spark, sf0001, "lineitem")
    val dim = graft.core.Lake.table(spark, sf0001, "part")
      .filter(col("p_size") <= 5)
    val viaBloom = BloomJoin.semiJoin(lineitem, "l_partkey", dim, "p_partkey", 3000)
    val plain = lineitem.join(dim, col("l_partkey") === col("p_partkey"), "left_semi")
    assert(viaBloom.count() === plain.count())
    assert(viaBloom.exceptAll(plain).count() === 0)
  }

  test("prefilter passes all matches and prunes most non-matches") {
    val lineitem = graft.core.Lake.table(spark, sf0001, "lineitem")
    val dim = graft.core.Lake.table(spark, sf0001, "part").filter(col("p_size") <= 5)
    val bloom = BloomJoin.buildBloom(dim, col("p_partkey"), 3000)
    val kept = BloomJoin.prefilter(lineitem, col("l_partkey"), bloom)
    val matches = lineitem.join(dim, col("l_partkey") === col("p_partkey"), "left_semi")
    val (total, keptN, matchN) = (lineitem.count(), kept.count(), matches.count())
    assert(keptN >= matchN) // never drops a true match
    // the prefilter must actually prune: survivors well under total
    assert(keptN < total, s"prefilter kept all $total rows")
    assert(keptN - matchN < math.max(50L, (total - matchN) / 10),
      s"false positives $keptN-$matchN out of ${total - matchN} non-matches")
  }

  test("probe expression runs inside whole-stage codegen") {
    val dim = spark.range(0, 100).toDF()
    val bloom = BloomJoin.buildBloom(dim, col("id"), 100)
    val probe = spark.range(0, 10000)
      .filter(BloomMightContain.bloom_might_contain(lit(bloom), xxhash64(col("id"))))
    // the "*(n)" prefix marks operators fused into a WholeStageCodegen stage
    val plan = probe.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Filter bloommightcontain""".r.findFirstIn(plan).isDefined, plan)
    assert(probe.count() >= 100)
  }

  test("semiJoin works when probe and build share the key NAME") {
    import org.apache.spark.sql.functions.col
    val probe = spark.range(0, 1000).toDF("id")
    val build = spark.range(0, 50).toDF("id")
    val got = BloomJoin.semiJoin(probe, "id", build, "id", 50)
    assert(got.count() === 50)
    assert(got.columns.toSeq === Seq("id"))
    assert(got.filter(col("id") >= 50).count() === 0)
  }

  test("semiJoin is exact across mixed integer key widths (int vs bigint)") {
    // The equi-join matches int-vs-bigint via implicit cast, but
    // xxhash64(int) != xxhash64(bigint) for the same value — without the
    // common-type widening the prefilter would silently drop every match.
    val probe = spark.range(0, 1000).select(col("id").cast("int").as("k"))
    val build = spark.range(0, 1000, 3).select(col("id").as("bk")) // bigint
    val viaBloom = BloomJoin.semiJoin(probe, "k", build, "bk", 400)
    val plain = probe.join(build, col("k") === col("bk"), "left_semi")
    assert(viaBloom.count() === plain.count())
    assert(plain.count() === 334)
    assert(viaBloom.exceptAll(plain).count() === 0)
  }

  test("semiJoin rejects keys outside one hash-type class") {
    val probe = Seq("1", "2").toDF("k")
    val build = Seq(1L, 2L).toDF("bk")
    val e = intercept[IllegalArgumentException] {
      BloomJoin.semiJoin(probe, "k", build, "bk", 10)
    }
    assert(e.getMessage.contains("same type class"))
  }

  test("null keys neither break the build nor probe true") {
    val dim = Seq(Option(1L), Option(2L), Option.empty[Long]).toDF("k")
    val bloom = BloomJoin.buildBloom(dim, col("k"), 10)
    val probe = Seq(Option(1L), Option(3L), Option.empty[Long]).toDF("k")
    val kept = BloomJoin.prefilter(probe, col("k"), bloom)
      .collect().map(_.getAs[Any]("k")).toSet
    assert(kept.contains(1L))
    // null probe keys can never equi-match; prefilter drops them explicitly
    assert(!kept.contains(null))
  }
}
