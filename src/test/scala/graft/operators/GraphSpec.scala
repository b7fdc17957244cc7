package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

class GraphSpec extends SparkSpecBase {
  import spark.implicits._

  private def ranksOf(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    Graph.pageRankInt(spark, edges.toDF("src", "dst"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("symmetric pair: ranks converge to the scale and stay equal") {
    // a<->b: each node's rank is fed entirely to the other; fixed point
    // at 150000 + 850000*rank/1e6 — equal ranks by symmetry.
    val r = ranksOf(Seq((1L, 2L), (2L, 1L)), 3)
    assert(r(1L) === r(2L))
    assert(r(1L) > 800000L && r(1L) <= 1000000L)
  }

  test("hub receives more rank than leaves (star graph)") {
    // leaves 2..5 all point at 1; 1 points back at all of them.
    val edges = (2L to 5L).flatMap(l => Seq((l, 1L), (1L, l)))
    val r = ranksOf(edges, 3)
    assert((2L to 5L).forall(l => r(1L) > r(l)))
    assert((2L to 5L).map(r).distinct.size === 1) // leaves identical
  }

  test("dangling nodes keep the base rank") {
    // 1 -> 2, 2 has no outgoing edges: 2's rank leaks (simplified variant)
    val r = ranksOf(Seq((1L, 2L)), 2)
    assert(r(1L) === 150000L) // nothing points at 1 after iter 1
    assert(r(2L) > r(1L)) // 2 receives 1's contribution
  }

  test("deterministic across partitionings (integer arithmetic, no float folds)") {
    val edges = (0L until 300L).map(i => (i % 50, (i * 7) % 50)).toDF("src", "dst")
    val a = Graph.pageRankInt(spark, edges.coalesce(1), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val b = Graph.pageRankInt(spark, edges.repartition(13), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(a === b)
  }

  test("20+ iterations: checkpoint bounds plan depth, values unchanged") {
    val edges = (0L until 200L).map(i => (i % 40, (i * 13 + 7) % 40)).toDF("src", "dst")
    val deep = Graph.pageRankInt(spark, edges, 24, checkpointEvery = 5)
    val depth = {
      def d(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Int =
        if (p.children.isEmpty) 1 else 1 + p.children.map(d).max
      d(deep.queryExecution.optimizedPlan)
    }
    // Un-checkpointed, 24 iterations stack 24 join+agg blocks (>100 plan
    // levels); each checkpoint restarts the plan from a leaf, so only the
    // last ≤5 iterations of lineage remain.
    assert(depth < 40, s"plan depth $depth — lineage not truncated")
    // Checkpointing is only a materialization point: values must equal a
    // run that checkpoints at a different cadence.
    val a = deep.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val b = Graph.pageRankInt(spark, edges, 24, checkpointEvery = 11)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(a === b)
  }

  test("bfsHops: line graph distances, unreachable nodes absent, min-hop wins") {
    // 1->2->3->4 and a shortcut 1->3; 9->10 disconnected
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 3L), (9L, 10L))
      .toDF("src", "dst")
    val got = Graph.bfsHops(edges, Seq(1L).toDF("node"), 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L)) // 3 via shortcut, not hop 2
  }

  test("bfsHops at 20+ hops: checkpoint bounds plan depth, hops unchanged") {
    // A 25-node ring walked from one seed: the frontier advances one node
    // per hop, so 24 hops exercise the full union chain.
    val ring = (0L until 25L).map(i => (i, (i + 1) % 25)).toDF("src", "dst")
    val seeds = Seq(0L).toDF("node")
    val deep = Graph.bfsHops(ring, seeds, 24, checkpointEvery = 5)
    def d(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Int =
      if (p.children.isEmpty) 1 else 1 + p.children.map(d).max
    val depth = d(deep.queryExecution.optimizedPlan)
    assert(depth < 40, s"plan depth $depth — lineage not truncated")
    val got = deep.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === (0L until 25L).map(i => i -> i).toMap)
  }

  test("bfsHops: maxHops bounds the frontier, seeds are deduped") {
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val got = Graph.bfsHops(edges, Seq(1L, 1L).toDF("node"), 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 0L, 2L -> 1L)) // 3 is 2 hops away: absent
  }

  test("degrees counts both directions and zero-fills") {
    val d = Graph.degrees(Seq((1L, 2L), (1L, 3L), (2L, 1L)).toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(d(1L) === ((2L, 1L, 3L)))
    assert(d(2L) === ((1L, 1L, 2L)))
    assert(d(3L) === ((0L, 1L, 1L))) // in-only node zero-filled on out
  }

  test("total rank mass is conserved up to damping leakage (sanity at sf0.001)") {
    val pairs = graft.core.Lake.table(spark, sf0001, "lineitem")
      .select(col("l_suppkey").as("s"), (col("l_partkey") + 1000000L).as("p")).distinct()
    val edges = pairs.select(col("s").as("src"), col("p").as("dst"))
      .unionAll(pairs.select(col("p").as("src"), col("s").as("dst")))
    val ranks = Graph.pageRankInt(spark, edges, 2)
    val n = ranks.count()
    val total = ranks.agg(sum("rank")).head().getLong(0)
    // symmetric graph, no dangling: total stays within [0.9, 1.0]·n·scale
    // (div truncation only ever loses mass)
    assert(total <= n * 1000000L)
    assert(total >= (n * 1000000L * 9) / 10)
  }
}
