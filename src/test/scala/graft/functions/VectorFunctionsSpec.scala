package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

class VectorFunctionsSpec extends SparkSpecBase {
  import spark.implicits._

  private def quantize(v: Seq[Float]): Seq[Int] =
    Seq(Tuple1(v)).toDF("v")
      .select(VectorFunctions.quantizeInt8(col("v")).as("q"))
      .as[Seq[Int]].head()

  test("quantizeInt8: max-magnitude element maps to ±127, zeros to 0") {
    assert(quantize(Seq(1.0f, -0.5f, 0.0f)) == Seq(127, -64, 0))
    assert(quantize(Seq(-2.0f, 1.0f)) == Seq(-127, 64))
  }

  test("quantizeInt8: all-zero vector stays all zeros") {
    assert(quantize(Seq(0.0f, 0.0f, 0.0f)) == Seq(0, 0, 0))
  }

  test("quantize→dequantize reconstruction error is bounded by m/254") {
    val df = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("embedding").as("v"))
    val bad = df.select(
        VectorFunctions.maxAbs(col("v")).as("m"),
        VectorFunctions.dequantizeInt8(
          VectorFunctions.quantizeInt8(col("v")),
          VectorFunctions.maxAbs(col("v"))).as("r"),
        col("v"))
      .select(aggregate(
        zip_with(col("v"), col("r"), (x, y) => abs(x.cast("double") - y)),
        lit(0.0), (acc, e) => greatest(acc, e)).as("max_err"), col("m"))
      .filter(col("max_err") > col("m") / 254.0 + 1e-12)
      .count()
    assert(bad == 0L, "every element must reconstruct within half a step")
  }

  test("quantized values fit int8 range") {
    val out = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(explode(VectorFunctions.quantizeInt8(col("embedding"))).as("q"))
      .agg(min(col("q")), max(col("q"))).as[(Int, Int)].head()
    assert(out._1 >= -127 && out._2 <= 127)
  }
}
