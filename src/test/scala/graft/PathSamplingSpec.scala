package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.algo.PathSampling
import graft.model.LinkGraph

/** Sampled-path machinery: interior extraction, determinism, greedy coverage. */
class PathSamplingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def graphOf(edges: Seq[(Long, Long, Double)], n: Long): LinkGraph =
    LinkGraph.fromEdges(spark, TestSpark.directed(edges),
      Some(spark.range(n).select(col("id"))))

  test("pathHyperedges: interior nodes only, lex-min path on a diamond") {
    val s = spark
    import s.implicits._
    // Path 0-1-2-3-4 plus the diamond 0-5-2 (two shortest 0→2 paths via 1 or 5).
    val g = graphOf(Seq((0L, 1L, 1.0), (1L, 2L, 1.0), (2L, 3L, 1.0), (3L, 4L, 1.0),
      (0L, 5L, 1.0), (5L, 2L, 1.0)), 6L)
    val pairs = Seq((0L, 0L, 4L), (1L, 0L, 2L)).toDF("j", "s", "t")
    val h = PathSampling.pathHyperedges(spark, g, pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // Pair 0: 0→4 interiors {1,2,3} (min-id predecessor picks 1 over 5 at node 2).
    // Pair 1: 0→2 interior {1} (lex-min of {1,5}).
    assert(h == Set((0L, 1L), (0L, 2L), (0L, 3L), (1L, 1L)), h.toString)
  }

  test("betweennessEstimate: deterministic; endpoints excluded; star center wins") {
    val star = graphOf((1L to 6L).map(i => (0L, i, 1.0)), 7L)
    val a = PathSampling.betweennessEstimate(spark, star, samples = 32, seed = 7L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val b = PathSampling.betweennessEstimate(spark, star, samples = 32, seed = 7L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(a == b)
    // Every leaf-to-leaf path passes the hub and nothing else.
    assert((1L to 6L).forall(i => a(i) == 0L))
    assert(a(0L) > 0L)
  }

  test("approxGroupBetweenness: hub picked first, gains non-increasing") {
    val g = graphOf(Seq((0L, 1L, 1.0), (1L, 2L, 1.0), (2L, 3L, 1.0), (3L, 4L, 1.0),
      (4L, 5L, 1.0), (5L, 6L, 1.0)), 7L)
    val res = PathSampling.approxGroupBetweenness(spark, g, k = 3, samples = 32,
      seed = 11L).orderBy("ord").collect()
    assert(res.length == 3)
    val gains = res.map(_.getLong(2))
    assert(gains.sliding(2).forall(p => p(0) >= p(1)), gains.mkString(","))
  }
}
