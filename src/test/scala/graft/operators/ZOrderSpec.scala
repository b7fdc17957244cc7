package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.plans.ZOrderInterleave

class ZOrderSpec extends SparkSpecBase {
  import spark.implicits._

  private def referenceInterleave(x: Long, y: Long): Long =
    (0 until 31).foldLeft(0L) { (acc, i) =>
      acc | (((x >> i) & 1L) << (2 * i + 1)) | (((y >> i) & 1L) << (2 * i))
    }

  test("interleave matches the bit-by-bit reference on boundary and random values") {
    val cases = Seq[(Long, Long)](
      (0, 0), (1, 0), (0, 1), (1, 1), ((1L << 31) - 1, 0), (0, (1L << 31) - 1),
      ((1L << 31) - 1, (1L << 31) - 1), (12345, 67890), (0x55555555L, 0x2AAAAAAAL))
    cases.foreach { case (x, y) =>
      assert(ZOrderInterleave.interleave(x, y) === referenceInterleave(x, y), s"($x,$y)")
    }
  }

  test("out-of-range input throws instead of silently truncating") {
    intercept[IllegalArgumentException](ZOrderInterleave.interleave(1L << 31, 0))
    intercept[IllegalArgumentException](ZOrderInterleave.interleave(0, -1))
  }

  test("z-locality: interleaved ordering interleaves both dimensions' bits monotonically") {
    // within one quadrant, z respects each dimension's ordering
    assert(ZOrderInterleave.interleave(2, 2) < ZOrderInterleave.interleave(3, 3))
    assert(ZOrderInterleave.interleave(0, 0) < ZOrderInterleave.interleave(0, 1))
    assert(ZOrderInterleave.interleave(0, 1) < ZOrderInterleave.interleave(1, 0)) // x is the high bit
  }

  test("normalizeToBits maps range ends to 0 and 2^bits-1, constant columns to 0") {
    val df = Seq(0.0, 50.0, 100.0).toDF("v")
    val got = df.select(Layout.normalizeToBits(col("v"), 0.0, 100.0, 8)).as[Long].collect()
    assert(got(0) === 0L && got(2) === 255L)
    // the midpoint may land on either side of the scale's float rounding
    assert(got(1) === 127L || got(1) === 128L)
    val const = Seq(7.0, 7.0).toDF("v")
      .select(Layout.normalizeToBits(col("v"), 7.0, 7.0, 8)).as[Long].collect()
    assert(const.toSeq === Seq(0L, 0L))
  }

  test("box-query pruning: z-order partitions beat a linear sort layout") {
    // 64x64 grid, one row per cell; 16 partitions; box = one 16x16 corner.
    val grid = spark.range(0, 64L * 64L)
      .select((col("id") % 64).as("x"), (col("id") / 64).cast("long").as("y"))
    def overlapping(df: org.apache.spark.sql.DataFrame): Long = df
      .select(spark_partition_id().as("p"), col("x"), col("y"))
      .groupBy("p")
      .agg(min("x").as("x0"), max("x").as("x1"), min("y").as("y0"), max("y").as("y1"))
      // file-skipping model: a partition is read iff its min/max box
      // intersects the query box x,y in [0,16)
      .filter(col("x0") < 16 && col("y0") < 16)
      .count()
    val zLayout = Layout.zorderPartitions(grid, col("x"), col("y"), 16)
    val linear = grid.repartitionByRange(16, col("x")).sortWithinPartitions("x")
    val (zHit, linHit) = (overlapping(zLayout), overlapping(linear))
    // linear-on-x layout: every partition spans all y, so ~1/4 of
    // partitions (those with x<16) are read; z-order confines the box
    // to its quadrant's partitions.
    assert(zHit < linHit, s"z=$zHit linear=$linHit")
    assert(zHit <= 4, s"z-order should isolate the corner box, got $zHit")
  }

  test("zorderPartitions on an empty frame returns empty, not an NPE") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("x", "y")
    assert(Layout.zorderPartitions(empty, col("x"), col("y"), 4).count() === 0)
  }

  test("zorderPartitions preserves the exact row multiset") {
    val li = graft.core.Lake.table(spark, sf0001, "lineitem")
    val laid = Layout.zorderPartitions(li, col("l_partkey"), col("l_suppkey"), 8)
    assert(laid.count() === li.count())
    assert(laid.exceptAll(li).count() === 0)
  }
}
