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

  test("zero-norm vectors yield null, not NaN — in both eval and codegen") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(0f, 0f, 0f), Seq(1f, 2f, 3f)), // zero left
      (2L, Seq(1f, 2f, 3f), Seq(0f, 0f, 0f)), // zero right
      (3L, Seq.empty[Float], Seq(1f, 2f, 3f)), // empty
      (4L, Seq(1f, 0f, 0f), Seq(1f, 0f, 0f))  // normal
    ).toDF("id", "a", "b")
    // codegen path (DataFrame pipeline) ...
    val rows = df.select(col("id"), GraftFunctions.cosine_sim(col("a"), col("b")).as("s"))
      .orderBy(col("id")).collect()
    assert(rows(0).isNullAt(1) && rows(1).isNullAt(1) && rows(2).isNullAt(1))
    assert(math.abs(rows(3).getDouble(1) - 1.0) < 1e-12)
    // ... and the interpreted eval path directly
    val expr = CosineSimilarity(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(0f, 0f), org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(1f, 2f), org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)))
    assert(expr.eval(null) == null)
  }

  test("top_k_by_score skips NaN scores and rejects wrong input types") {
    import spark.implicits._
    // NaN scores must never enter the heap
    val scored = Seq((1L, 0.9), (2L, Double.NaN), (3L, 0.5))
      .toDF("id", "s")
      .agg(TopKByScore.top_k_by_score(col("s"), col("id"), 2).as("top"))
      .select(explode(col("top")).as("h")).select(col("h.id"), col("h.score"))
      .collect()
    assert(scored.map(_.getLong(0)).toSeq == Seq(1L, 3L))
    // float score / int id → analysis-time failure, not executor crash
    val err = intercept[Exception] {
      Seq((1, 0.5f)).toDF("id", "s")
        .agg(TopKByScore.top_k_by_score(col("s"), col("id"), 2)).collect()
    }
    assert(err.getMessage.toLowerCase.contains("top_k_by_score") ||
      err.getMessage.toLowerCase.contains("data type"))
    val err2 = intercept[Exception] {
      Seq((1, 2)).toDF("id", "h")
        .agg(BottomKHashes.bottom_k_hashes(col("h"), 2)).collect()
    }
    assert(err2.getMessage.toLowerCase.contains("bottom_k_hashes") ||
      err2.getMessage.toLowerCase.contains("data type"))
  }
}
