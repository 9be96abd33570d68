package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.algo.{Betweenness, TopCloseness}
import graft.model.LinkGraph

/** Round-5 operators: exact top-k closeness with upper-bound pruning. */
class Round5Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def karate: LinkGraph = LinkGraph.fromEdges(spark,
    TestSpark.directed(Fixtures.karateEdges.map(e => (e._1, e._2, 1.0))))

  test("top closeness: equals the brute-force ranking on karate (incl. tie order)") {
    val g = karate
    val brute = Betweenness.closenessHarmonic(spark, g, g.vertices)
      .select("id", "sumdist").collect()
      .map(r => (r.getLong(1), r.getLong(0))).sorted // (sumdist asc, id asc)
    for (k <- Seq(1, 5, 11)) {
      val got = TopCloseness.run(spark, g, k, batch = 4) // tiny batch → several rounds
        .select("id", "sumdist").collect()
        .map(r => (r.getLong(1), r.getLong(0))).sorted
      assert(got.toSeq == brute.take(k).toSeq, s"k=$k")
    }
  }

  test("top closeness: disconnected graph with fewer positive nodes than k") {
    // Edge 0-1 plus isolated nodes 2, 3: closeness(0)=closeness(1)=1, then zeros by id.
    val g = LinkGraph.fromEdges(spark,
      TestSpark.directed(Seq((0L, 1L, 1.0))),
      Some(spark.range(4).toDF("id")))
    val got = TopCloseness.run(spark, g, k = 3, batch = 2)
      .orderBy(desc("closeness"), asc("id"))
      .collect().map(r => (r.getLong(0), r.getAs[Double]("closeness")))
    assert(got.toSeq == Seq((0L, 1.0), (1L, 1.0), (2L, 0.0)))
  }

  test("random edge score: deterministic, in [0,1), one row per undirected edge") {
    val g = karate
    val a = graft.algo.EdgeScores.randomEdgeScore(spark, g).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getAs[Double]("score"))).toMap
    val b = graft.algo.EdgeScores.randomEdgeScore(spark, g).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getAs[Double]("score"))).toMap
    assert(a == b && a.size == 78)
    assert(a.values.forall(s => s >= 0.0 && s < 1.0))
    // Different seed → different draw (spot check).
    val c = graft.algo.EdgeScores.randomEdgeScore(spark, g, seed = 7L).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getAs[Double]("score"))).toMap
    assert(c != a)
  }

  test("sf0.01 %7 subgraph BFS depth stays within the oracle's unroll (28)") {
    val g = LinkGraph.forSf(spark, "/root/testdata/sf0.01")
    val sub = g.subgraphFromNodes(g.vertices.filter(col("id") % 7 === 0))
    val (_, levels) = Betweenness.msBfs(spark, sub, sub.vertices)
    assert(levels <= 28, s"subgraph BFS depth $levels exceeds oracle unroll")
  }
}
