package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.algo.Curveball
import graft.model.LinkGraph

/** Uniform-trade Curveball: degree preservation, simplicity, determinism, rewiring. */
class UniformCurveballSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val g = LinkGraph.forSf(spark, "/root/testdata/sf0.001")

  private def degrees(edges: org.apache.spark.sql.DataFrame) =
    edges.select(col("src").as("id")).union(edges.select(col("dst").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))

  test("preserves the degree sequence exactly and stays simple") {
    val rnd = Curveball.uniformCurveball(spark, g, rounds = 3,
      tradesPerRound = (g.n / 2).toInt)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val orig = degrees(g.canonicalUndirected.filter(col("src") =!= col("dst")))
    val after = degrees(rnd)
    assert(after.exceptAll(orig).count() == 0 && orig.exceptAll(after).count() == 0)
    // Simple: no self-loops, no parallel edges, canonical orientation.
    assert(rnd.filter(col("src") >= col("dst")).count() == 0)
    assert(rnd.count() == rnd.distinct().count())
    rnd.unpersist()
  }

  test("deterministic at any parallelism; trades actually rewire") {
    val a = Curveball.uniformCurveball(spark, g, 2, 200, seed = 7L)
    val b = Curveball.uniformCurveball(spark, g, 2, 200, seed = 7L)
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
    val orig = g.canonicalUndirected.filter(col("src") =!= col("dst"))
      .select("src", "dst")
    assert(a.exceptAll(orig).count() > 0) // some edges moved
  }
}
