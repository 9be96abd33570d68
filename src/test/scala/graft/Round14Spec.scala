package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.algo.{Distances, Electrical}
import graft.model.LinkGraph

/** Round-3 tail: bounded Dijkstra ball + current-flow group closeness. */
class Round14Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def graphOf(edges: Seq[(Long, Long, Double)], n: Long): LinkGraph =
    LinkGraph.fromEdges(spark, TestSpark.directed(edges),
      Some(spark.range(n).select(col("id"))))

  test("incompleteDijkstra: settled ball equals the filtered full SSSP") {
    // Weighted path 0-1-2-3-4-5 with w = 1 + (src+dst) % 5.
    val g = graphOf((0L to 4L).map(i => (i, i + 1, 1.0)), 6L)
    val w = lit(1L) + pmod(col("src") + col("dst"), lit(5L))
    val bound = 6L
    val ball = Distances.incompleteDijkstra(spark, g, 0L, w, bound)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val full = Distances.weightedSssp(spark, g, 0L, w)
      .filter(col("dist") >= 0L && col("dist") <= bound)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(ball == full)
    assert(ball.contains(0L) && ball.values.forall(_ <= bound))
    assert(ball.size < 6, "bound must actually exclude the far end")
  }

  test("currentFlowGroupCloseness: distinct picks, non-increasing gains, determinism") {
    // Two K4 clusters joined by one bridge — resistance distances are small
    // in-cluster, ~1 across; a good group spans both sides.
    val k4a = for (i <- 0L to 3L; j <- (i + 1) to 3L) yield (i, j, 1.0)
    val k4b = for (i <- 4L to 7L; j <- (i + 1) to 7L) yield (i, j, 1.0)
    val g = graphOf(k4a ++ k4b ++ Seq((3L, 4L, 1.0)), 8L)
    val res = Electrical.currentFlowGroupCloseness(spark, g, k = 2, poolMod = 1L,
      targetMod = 1L, probes = 24, iters = 120).orderBy("ord").collect()
    val ids = res.map(_.getLong(1))
    assert(ids.distinct.length == 2)
    val gains = res.map(_.getLong(2))
    assert(gains(0) >= gains(1), gains.mkString(","))
    // The two picks cover both clusters (one per side).
    assert(ids.count(_ <= 3L) == 1 && ids.count(_ >= 4L) == 1, ids.mkString(","))
    val res2 = Electrical.currentFlowGroupCloseness(spark, g, k = 2, poolMod = 1L,
      targetMod = 1L, probes = 24, iters = 120).orderBy("ord").collect()
    assert(res.map(_.toSeq).toSeq == res2.map(_.toSeq).toSeq)
  }
}
