package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.algo.PathSampling
import graft.model.LinkGraph

/** Adaptive-KADABRA twin (PathSampling.kadabraAdaptive): the two-phase ω/τ/δ-guess
  * schedule from KadabraBetweenness.cpp run()/computeDeltaGuess/computeFinished,
  * deterministically re-expressed (round-doubling checks, power-of-two δ budgets).
  * The sf0.01 oracle gate is q_kadabra_est; these specs pin the schedule mechanics
  * at both ends: the cap ω binding (as in the reference's absolute mode on real
  * graphs) and a genuine early stop when the Chernoff bounds certify ε before ω. */
class KadabraSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def graphOf(edges: Seq[(Long, Long, Double)], n: Long): LinkGraph =
    LinkGraph.fromEdges(spark, TestSpark.directed(edges),
      Some(spark.range(n).select(col("id"))))

  test("kadabraAdaptive: deterministic; cap ω binds on a path graph; cnt/t_star") {
    val g = graphOf(Seq((0L, 1L, 1.0), (1L, 2L, 1.0), (2L, 3L, 1.0), (3L, 4L, 1.0)), 5L)
    val run1 = PathSampling.kadabraAdaptive(spark, g, maxSamples = 64, seed = 42L)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    val run2 = PathSampling.kadabraAdaptive(spark, g, maxSamples = 64, seed = 42L)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(run1 == run2)
    // ω is capped at 64 here; with n=5 the per-node budgets can't certify ε=0.1
    // before the cap, exactly like the reference's absolute mode — t* = ω.
    val tStar = run1(0L)._2
    assert(tStar == 64L, s"expected cap to bind, t_star=$tStar")
    // Path interiors carry all the counts; endpoints of each sampled pair excluded.
    assert(run1.values.forall { case (cnt, t, bc) => bc == cnt.toDouble / t })
    assert((1L to 3L).map(run1(_)._1).sum > 0L)
    // Degree-1 terminals are never path interiors.
    assert(run1(0L)._1 == 0L && run1(4L)._1 == 0L)
  }

  test("kadabraAdaptive: early stop — bounds certify ε before ω on a 1-edge graph") {
    // Two nodes, one edge: every sampled path has NO interior, all counts stay 0,
    // so errL = 0 and errU shrinks as 2L(ω/t + 1/3)/t. With ε = 0.015, δ = 0.5
    // (lnHalfInvDelta = ln(1) = 0, lnTwoInvDelta = ln 4): ω = ⌈0.5/ε²⌉ = 2223-ish,
    // τ = ω/100, and the bound certifies at a doubling point strictly below ω.
    val g = graphOf(Seq((0L, 1L, 1.0)), 2L)
    val res = PathSampling.kadabraAdaptive(spark, g,
      err = 0.015, lnHalfInvDelta = 0.0, lnTwoInvDelta = 1.3862943611198906,
      maxSamples = 4096, seed = 42L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val omega = math.ceil((0.5 / (0.015 * 0.015)) * (0 + 1 + 0.0)).toLong
    val tStar = res.head._3
    assert(tStar < omega, s"expected early stop, t_star=$tStar omega=$omega")
    assert(res.forall(_._2 == 0L)) // no interiors on a single edge
    assert(res.forall(_._4 == 0.0))
    // t* sits on the round-doubling schedule seeded at τ = ω/100.
    val tau = math.max(1L, omega / 100L)
    assert(Iterator.iterate(tau)(_ * 2L).takeWhile(_ < omega).contains(tStar))
  }

  test("kadabraAdaptive: vd <= 1 early-out yields zeros with t_star = 0") {
    val g = graphOf(Seq.empty, 3L) // no edges: two-sweep diameter lower bound 0
    val res = PathSampling.kadabraAdaptive(spark, g, maxSamples = 32, seed = 1L)
      .collect()
    assert(res.length == 3)
    assert(res.forall(r => r.getLong(1) == 0L && r.getLong(2) == 0L && r.getDouble(3) == 0.0))
  }
}
