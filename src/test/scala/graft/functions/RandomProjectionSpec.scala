package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

class RandomProjectionSpec extends SparkSpecBase {
  import spark.implicits._

  test("sign matrix is deterministic, ±1, and balanced-ish") {
    val m1 = VectorFunctions.signMatrix(8, 64)
    val m2 = VectorFunctions.signMatrix(8, 64)
    assert(m1.map(_.toSeq).toSeq === m2.map(_.toSeq).toSeq)
    assert(m1.flatten.forall(s => s == 1L || s == -1L))
    val pos = m1.flatten.count(_ == 1L)
    assert(pos > 512 / 4 && pos < 512 * 3 / 4) // not degenerate
  }

  test("projection matches a hand-computed reference on a known vector") {
    val vec = Array.tabulate(64)(i => (i - 32).toFloat / 32f)
    val df = Seq(Tuple1(vec)).toDF("v")
    val got = df.select(
      VectorFunctions.randomProjectInt(col("v"), 64, 8)).head()
      .getSeq[Long](0)
    // reference: quantize then multiply in plain Scala. Spark's round()
    // is HALF_UP (away from zero), NOT math.round (half toward +inf) —
    // they differ on negative .5 boundaries, which this vector hits.
    def roundHalfAway(v: Double): Long =
      (if (v >= 0) math.floor(v + 0.5) else math.ceil(v - 0.5)).toLong
    val mx = vec.map(x => math.abs(x.toDouble)).max
    val q = vec.map(x => roundHalfAway(x.toDouble * 127.0 / mx))
    val m = VectorFunctions.signMatrix(8, 64)
    val want = m.map(row => row.zip(q).map { case (s, x) => s * x }.sum).toSeq
    assert(got === want)
  }

  test("zero vector projects to zeros; projection is linear in the quantized domain") {
    val df = Seq(Tuple1(Array.fill(64)(0f))).toDF("v")
    val got = df.select(VectorFunctions.randomProjectInt(col("v"), 64, 8))
      .head().getSeq[Long](0)
    assert(got === Seq.fill(8)(0L))
  }

  test("projection preserves relative distances roughly (JL sanity, real vectors)") {
    val e = graft.core.Lake.table(spark, sf0001, "embeddings").limit(40).cache()
    val proj = e.select(col("vec_id"),
      VectorFunctions.randomProjectInt(col("embedding"), 64, 16).as("p"))
    val pairs = proj.as("a").crossJoin(proj.as("b"))
      .filter(col("a.vec_id") < col("b.vec_id"))
      .select(
        aggregate(zip_with(col("a.p"), col("b.p"), (x, y) => (x - y) * (x - y)),
          lit(0L), (acc, v) => acc + v).cast("double").as("d2"))
      .collect().map(_.getDouble(0))
    // distances must not collapse: spread between min and max nonzero
    val nz = pairs.filter(_ > 0)
    assert(nz.nonEmpty && nz.max > nz.min)
  }
}
