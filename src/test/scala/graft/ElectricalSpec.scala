package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.algo.Electrical
import graft.model.LinkGraph

/** Electrical family against closed-form resistances: series path (R = hops),
  * triangle (R = 2/3), bridge edge dominance for SEC, star-center dominance for
  * electrical closeness. The integer Jacobi solve is approximate-by-design; the
  * assertions use physics tolerances, the oracle handles cross-engine exactness. */
class ElectricalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def graphOf(edges: Seq[(Long, Long, Double)], n: Long): LinkGraph =
    LinkGraph.fromEdges(spark, TestSpark.directed(edges),
      Some(spark.range(n).select(col("id"))))

  private def rOf(g: LinkGraph, u: Long, v: Long, iters: Int): Double = {
    val s = spark
    import s.implicits._
    val pairs = Seq((0L, u, v)).toDF("q", "u", "v")
    Electrical.effectiveResistance(spark, g, pairs, iters)
      .select("r").head().getDouble(0)
  }

  test("path: series resistances add up (R(0,3) = 3), commute = 2mR") {
    val g = graphOf(Seq((0L, 1L, 1.0), (1L, 2L, 1.0), (2L, 3L, 1.0)), 4L)
    val r = rOf(g, 0L, 3L, iters = 150)
    assert(math.abs(r - 3.0) < 0.05, s"r=$r")
    val c = {
      val s = spark; import s.implicits._
      Electrical.effectiveResistance(spark, g,
        Seq((0L, 0L, 3L)).toDF("q", "u", "v"), 150)
        .select("commute").head().getDouble(0)
    }
    assert(math.abs(c - 2.0 * 3 * 3.0) < 0.5, s"commute=$c")
  }

  test("triangle: parallel paths (R = 2/3); adjacent path nodes R = 1") {
    val tri = graphOf(Seq((0L, 1L, 1.0), (1L, 2L, 1.0), (2L, 0L, 1.0)), 3L)
    val r = rOf(tri, 1L, 2L, iters = 150)
    assert(math.abs(r - 2.0 / 3.0) < 0.02, s"r=$r")
    val p2 = graphOf(Seq((0L, 1L, 1.0)), 2L)
    assert(math.abs(rOf(p2, 0L, 1L, 150) - 1.0) < 0.02)
  }

  test("spanning-edge centrality: the bridge dominates (sec ~ 1), cycle edges lower") {
    // Two triangles joined by a bridge 2-3: bridge R_eff = 1 (every spanning tree
    // uses it); triangle edges R_eff = 2/3.
    val g = graphOf(Seq(
      (0L, 1L, 1.0), (1L, 2L, 1.0), (2L, 0L, 1.0),
      (2L, 3L, 1.0),
      (3L, 4L, 1.0), (4L, 5L, 1.0), (5L, 3L, 1.0)), 6L)
    val byName = Electrical.spanningEdgeCentrality(spark, g, k = 48, iters = 150)
      .select("src", "dst", "sec").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val bridge = byName((2L, 3L))
    assert(byName.size == 7)
    assert(bridge > 0.8 && bridge < 1.3, s"bridge sec=$bridge")
    byName.foreach { case (e, v) =>
      if (e != (2L, 3L)) assert(v < bridge, s"edge $e sec=$v !< bridge $bridge")
    }
  }

  test("electrical closeness: star center dominates; deterministic") {
    val star = graphOf((1L to 5L).map(i => (0L, i, 1.0)), 6L)
    val cl = Electrical.electricalCloseness(spark, star, k = 32, iters = 120)
      .select("id", "closeness").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert((1L to 5L).forall(i => cl(0L) > cl(i)), cl.toString)
    val cl2 = Electrical.electricalCloseness(spark, star, k = 32, iters = 120)
      .select("id", "closeness").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(cl == cl2)
  }
}
