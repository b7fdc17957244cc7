package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.core.Lake

class SkewJoinSpec extends SparkSpecBase {

  test("salted join equals the plain join on a real star join") {
    val orders = Lake.table(spark, sf0001, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val customer = Lake.table(spark, sf0001, "customer")
      .withColumnRenamed("c_custkey", "o_custkey")
      .select("o_custkey", "c_name")
    val plain = orders.join(customer, Seq("o_custkey"), "inner")
      .select("o_orderkey", "o_custkey", "c_name")
      .collect().map(_.toSeq).toSet
    val salted = SkewJoin.saltedInnerJoin(orders, customer, Seq("o_custkey"), salts = 4)
      .select("o_orderkey", "o_custkey", "c_name")
      .collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(plain.nonEmpty)
  }

  test("salted join handles a pathologically skewed key") {
    import spark.implicits._
    // 10k rows all sharing one key + a long tail
    val large = ((1 to 10000).map(i => (1L, i)) ++ (1 to 100).map(i => (i.toLong + 1, i)))
      .toDF("k", "payload")
    val small = (1L to 101L).map(k => (k, s"dim$k")).toDF("k", "name")
    val out = SkewJoin.saltedInnerJoin(large, small, Seq("k"), salts = 8)
    assert(out.count() == 10100)
    assert(out.filter(col("k") === 1L).count() == 10000)
  }

  test("salting is deterministic across runs") {
    val orders = Lake.table(spark, sf0001, "orders").limit(200)
    val customer = Lake.table(spark, sf0001, "customer")
      .withColumnRenamed("c_custkey", "o_custkey")
    val a = SkewJoin.saltedInnerJoin(orders, customer, Seq("o_custkey"))
      .collect().map(_.toSeq).toSet
    val b = SkewJoin.saltedInnerJoin(orders, customer, Seq("o_custkey"))
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }
}
