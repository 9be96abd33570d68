package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.algo.EdgeScores
import graft.model.LinkGraph

/** Quadrangle counts re-express the reference's own GTest fixtures
  * (edgescores/test/ChibaNishizekiQuadrangleEdgeScoreGTest.cpp:16-78);
  * normalizer/blender/as-weight are hand-checked. */
class EdgeScoreUtilSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def graphOf(edges: Seq[(Long, Long)], n: Long) =
    LinkGraph.fromEdges(spark,
      TestSpark.directed(edges.map(e => (e._1, e._2, 1.0))),
      Some(spark.range(n).select(col("id"))))

  private def quadMap(g: LinkGraph): Map[(Long, Long), Long] =
    EdgeScores.quadrangleEdgeScore(spark, g).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("quadrangle counts: trivial 4-cycle (reference GTest fixture)") {
    val q = quadMap(graphOf(Seq((0L, 1L), (0L, 2L), (1L, 3L), (2L, 3L)), 5))
    assert(q == Map((0L, 1L) -> 1L, (0L, 2L) -> 1L, (1L, 3L) -> 1L, (2L, 3L) -> 1L))
  }

  test("quadrangle counts: 7-node graph (reference GTest fixture)") {
    val q = quadMap(graphOf(Seq(
      (0L, 1L), (0L, 3L), (0L, 4L), (0L, 6L), (1L, 2L), (1L, 3L), (2L, 3L),
      (3L, 5L), (3L, 6L), (4L, 5L)), 7))
    assert(q == Map(
      (0L, 1L) -> 2L, (0L, 3L) -> 2L, (0L, 4L) -> 1L, (0L, 6L) -> 1L,
      (1L, 2L) -> 1L, (1L, 3L) -> 1L, (2L, 3L) -> 1L,
      (3L, 5L) -> 1L, (3L, 6L) -> 1L, (4L, 5L) -> 1L))
  }

  test("quadrangle counts: triangle has none, K4 has one per edge") {
    val tri = quadMap(graphOf(Seq((0L, 1L), (1L, 2L), (0L, 2L)), 3))
    assert(tri.values.forall(_ == 0L))
    val k4 = quadMap(graphOf(Seq(
      (0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L), (2L, 3L)), 4))
    // Each K4 edge lies on exactly 2 of the 3 distinct 4-cycles.
    assert(k4.values.forall(_ == 2L))
  }

  test("normalizeScore maps min->lower, max->upper; invert flips") {
    import spark.implicits._
    val scored = Seq((0L, 1L, 2L), (1L, 2L, 6L), (2L, 3L, 4L)).toDF("src", "dst", "s")
    val n = EdgeScores.normalizeScore(scored, "s")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(n((0L, 1L)) == 0.0 && n((1L, 2L)) == 1.0 && n((2L, 3L)) == 0.5)
    val inv = EdgeScores.normalizeScore(scored, "s", invert = true)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(inv((0L, 1L)) == 1.0 && inv((1L, 2L)) == 0.0 && inv((2L, 3L)) == 0.5)
  }

  test("blendScores picks score1 where selected") {
    import spark.implicits._
    val s0 = Seq((0L, 1L, 10.0), (1L, 2L, 20.0)).toDF("src", "dst", "a")
    val s1 = Seq((0L, 1L, 99.0), (1L, 2L, 88.0)).toDF("src", "dst", "b")
    val sel = Seq((0L, 1L, true), (1L, 2L, false)).toDF("src", "dst", "pick")
    val b = EdgeScores.blendScores(s0, s1, sel)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(b == Map((0L, 1L) -> 99.0, (1L, 2L) -> 20.0))
  }

  test("scoreAsWeight re-weights the graph with offset + factor*score(^2)") {
    import spark.implicits._
    val g = graphOf(Seq((0L, 1L), (1L, 2L)), 3)
    val scored = Seq((0L, 1L, 3.0), (1L, 2L, 5.0)).toDF("src", "dst", "s")
    val gw = EdgeScores.scoreAsWeight(spark, g, scored, "s",
      squared = true, offset = 1.0, factor = 2.0)
    val w = gw.edges.collect().map(r =>
      (r.getAs[Long]("src"), r.getAs[Long]("dst")) -> r.getAs[Double]("weight")).toMap
    assert(w((0L, 1L)) == 19.0 && w((1L, 2L)) == 51.0)
  }
}
