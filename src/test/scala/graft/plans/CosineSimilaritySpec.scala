package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.core.Lake
import graft.functions.VectorFunctions

class CosineSimilaritySpec extends SparkSpecBase {

  private lazy val emb = Lake.table(spark, sf0001, "embeddings")

  test("native expression is BITWISE-identical to the HOF formulation") {
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val joined = emb.crossJoin(broadcast(q))
    val both = joined.select(
      col("vec_id"),
      GraftFunctions.cosine_sim(col("embedding"), col("qv")).as("native"),
      VectorFunctions.cosineSimilarity(col("embedding"), col("qv")).as("hof"))
      .collect()
    assert(both.length == 500)
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(2)),
        s"vec ${r.getLong(0)}: ${r.getDouble(1)} != ${r.getDouble(2)}")
    }
  }

  test("registered SQL function works and runs inside WholeStageCodegen") {
    GraftFunctions.register(spark)
    Lake.table(spark, sf0001, "embeddings").createOrReplaceTempView("emb_cs")
    val df = spark.sql(
      """SELECT a.vec_id, cosine_sim(a.embedding, b.embedding) AS s
        |FROM emb_cs a JOIN emb_cs b ON b.vec_id = 0 WHERE a.vec_id < 5""".stripMargin)
    val rows = df.collect()
    assert(rows.length == 5)
    assert(math.abs(rows.find(_.getLong(0) == 0L).get.getDouble(1) - 1.0) < 1e-12)
    // "*(n)" prefixes mark WholeStageCodegen stages in the plan string;
    // the expression must appear inside one (no CodegenFallback).
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(") && plan.contains("cosinesimilarity"),
      s"cosine_sim not inside a codegen stage:\n$plan")
  }

  test("self-similarity is 1.0 for every vector") {
    val selfs = emb.select(
      GraftFunctions.cosine_sim(col("embedding"), col("embedding")).as("s"))
      .collect().map(_.getDouble(0))
    assert(selfs.forall(s => math.abs(s - 1.0) < 1e-12))
  }

  test("type check rejects non-array inputs at analysis time") {
    val err = intercept[Exception] {
      emb.select(GraftFunctions.cosine_sim(col("vec_id"), col("embedding"))).collect()
    }
    assert(err.getMessage.toLowerCase.contains("cosine_sim") ||
      err.getMessage.toLowerCase.contains("data type"))
  }
}
