package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

class SamplingSpec extends SparkSpecBase {
  import spark.implicits._

  private def items(n: Int) =
    spark.range(n).select(col("id"), (col("id") % 100 + 1).as("w"))

  test("weightedSample returns exactly k rows, deterministically") {
    val df = items(500)
    val a = Sampling.weightedSample(df, col("w"), col("id"), 50)
      .select("id").as[Long].collect().toSeq
    val b = Sampling.weightedSample(df, col("w"), col("id"), 50)
      .select("id").as[Long].collect().toSeq
    assert(a.size == 50)
    assert(a == b, "same data + seed must reproduce the same sample")
  }

  test("weightedSample keys are valid A-ES draws in (0,1], ordered desc") {
    val keys = Sampling.weightedSample(items(200), col("w"), col("id"), 20)
      .select("_es_key").as[Double].collect().toSeq
    assert(keys.forall(k => k > 0.0 && k <= 1.0))
    assert(keys == keys.sorted.reverse, "output is ordered by key desc")
  }

  test("weightedSample biases toward heavy rows (E-S inclusion property)") {
    // Weights 1..100 cycling over 2000 rows; corpus mean weight = 50.5.
    // An exact weighted sample's mean selected weight must sit well above
    // the uniform mean — with w spanning 1..100, far above even 1 stddev.
    val sampled = Sampling.weightedSample(items(2000), col("w"), col("id"), 100)
      .agg(avg(col("w"))).as[Double].head()
    assert(sampled > 60.0,
      s"mean sampled weight $sampled should exceed the uniform mean 50.5")
  }

  test("zero-weight-like rows lose: tiny weight almost never beats huge") {
    // One row with weight 10^6 among 1000 rows of weight 1: u^(1/1e6) is
    // essentially 1, so it must be drawn into any k>=1 sample.
    val df = spark.range(1000)
      .select(col("id"), when(col("id") === 777, 1000000L).otherwise(1L).as("w"))
    val top = Sampling.weightedSample(df, col("w"), col("id"), 5)
      .select("id").as[Long].collect().toSet
    assert(top.contains(777L))
  }

  test("weightedSamplePerGroup keeps k rows per group") {
    val df = spark.range(300)
      .select(col("id"), (col("id") % 3).as("g"), (col("id") % 7 + 1).as("w"))
    val out = Sampling.weightedSamplePerGroup(df, col("g"), col("w"), col("id"), 10)
      .groupBy("g").agg(count(lit(1)).as("c"))
      .select("c").as[Long].collect().toSeq
    assert(out == Seq(10L, 10L, 10L))
  }

  test("hashSplit partitions every row, near the requested fractions") {
    val df = spark.range(2000).toDF("id")
    val out = Sampling.hashSplit(df, col("id"),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .groupBy("split").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.values.sum == 2000L, "splits must partition the rows")
    assert(out("train") > 1500 && out("train") < 1700,
      s"train=${out("train")} should be near 1600 (binomial, ±5σ≈90)")
    assert(out.keySet == Set("train", "val", "test"))
  }

  test("hashSplit assignment is stable under appends and repartitioning") {
    val base = spark.range(500).toDF("id")
    val frac = Seq("a" -> 0.5, "b" -> 0.5)
    val before = Sampling.hashSplit(base, col("id"), frac)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val after = Sampling.hashSplit(spark.range(1000).toDF("id").repartition(7), col("id"), frac)
      .filter(col("id") < 500)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(before == after,
      "new rows and layout changes must not flip existing assignments")
  }

  test("seededUniform is tag-sensitive (independent sample draws)") {
    val df = spark.range(100).toDF("id")
    val u1 = df.select(Sampling.seededUniform(col("id"), "a").as("u"))
      .as[Double].collect().toSeq
    val u2 = df.select(Sampling.seededUniform(col("id"), "b").as("u"))
      .as[Double].collect().toSeq
    assert(u1 != u2)
    assert(u1.forall(u => u > 0.0 && u < 1.0))
  }
}
