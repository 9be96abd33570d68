package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.model.LinkGraph
import graft.algo.{Electrical, Multigrid}

/** LAMG-style multilevel solver (numerics/LAMG/MultiLevelSetup.cpp + SolverLamg.cpp
  * re-expressed as matching-aggregation + Galerkin-by-contraction + integer Jacobi
  * V-cycles). The path-graph gate is the multigrid acid test: plain Jacobi moves
  * information one hop per sweep, so a 128-node path is far outside its reach at a
  * 40-sweep budget, while the multilevel cycle solves it. */
class MultigridSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val scale = Multigrid.Scale

  private def pathGraph(n: Int): LinkGraph = {
    val s = spark; import s.implicits._
    LinkGraph.fromEdges(spark,
      (0 until n - 1).map(i => (i.toLong, i.toLong + 1, 1.0)).toDF("src", "dst", "weight"))
  }

  private def pairProbe(v: Long): org.apache.spark.sql.DataFrame = {
    val s = spark; import s.implicits._
    Seq((0L, 1L, 1L), (v, 1L, -1L)).toDF("id", "q", "b")
  }

  test("path graph: V-cycles solve where equal-fine-work Jacobi stalls") {
    val n = 128
    val g = pathGraph(n)
    val exact = scale * (n - 1).toDouble // R(0, n-1) = n-1 on a unit path
    val mg = Multigrid.solve(spark, g, pairProbe(n - 1L), levels = 7,
      matchRounds = 3, nu1 = 2, nu2 = 2, coarseIters = 32, cycles = 8)
      .filter(col("id") === (n - 1L)).head().getLong(2)
    // Equal fine-level sweep budget: 8 cycles × (ν1 + ν2 + residual) = 40 sweeps.
    val jac = Electrical.solveBatch(spark, g, pairProbe(n - 1L), iters = 40)
      .filter(col("id") === (n - 1L)).head().getLong(2)
    val mgErr = math.abs(-mg - exact) / exact
    val jacErr = math.abs(-jac - exact) / exact
    // The truncating-integer V(2,2) with 3/2 over-correction plateaus around 13%
    // on a pure 1D chain (measured; ×2 correction is the 1D-exact factor but
    // unstable under recursion) — still an order of magnitude past Jacobi here.
    assert(mgErr < 0.2, s"multigrid relative error $mgErr (x=$mg, exact=-$exact)")
    assert(jacErr > 0.5, s"Jacobi should stall on the path at this budget (err $jacErr)")
    assert(mgErr < jacErr / 3, s"multigrid ($mgErr) should beat Jacobi ($jacErr)")
  }

  test("deterministic: identical output across runs") {
    val g = LinkGraph.fromEdges(spark,
      TestSpark.directed(Fixtures.karateEdges.map(e => (e._1, e._2, 1.0))))
    def run() = Multigrid.solve(spark, g, pairProbe(33L), levels = 2,
      matchRounds = 2, nu1 = 2, nu2 = 2, coarseIters = 16, cycles = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1).toSeq
    assert(run() == run())
  }

  test("Galerkin operator = contracted weighted graph (karate, level 1)") {
    val g = LinkGraph.fromEdges(spark,
      TestSpark.directed(Fixtures.karateEdges.map(e => (e._1, e._2, 1.0))))
    val lvls = Multigrid.buildHierarchy(spark, g, levels = 2, matchRounds = 2)
    val part = lvls(1).part.get.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // ground stays a singleton aggregate
    assert(part(0L) == 0L && part.count(_._2 == 0L) == 1)
    // aggregates are matched pairs or singletons (size <= 2), labeled by min member
    part.groupBy(_._2).foreach { case (label, members) =>
      assert(members.size <= 2)
      assert(members.map(_._1).min == label)
    }
    val fine = lvls(0).und.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = fine
      .map { case (s, t, w) => ((part(s) min part(t), part(s) max part(t)), w) }
      .filter { case ((a, b), _) => a != b }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val coarse = lvls(1).und.collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(coarse == expected)
    Multigrid.releaseHierarchy(lvls)
  }

  test("karate: multigrid agrees with a long-run Jacobi reference on R(0, 33)") {
    val g = LinkGraph.fromEdges(spark,
      TestSpark.directed(Fixtures.karateEdges.map(e => (e._1, e._2, 1.0))))
    val mg = Multigrid.solve(spark, g, pairProbe(33L), levels = 3,
      matchRounds = 3, nu1 = 2, nu2 = 2, coarseIters = 32, cycles = 6)
      .filter(col("id") === 33L).head().getLong(2)
    // 400 Jacobi sweeps ≈ converged reference (80 sweeps is still ~9% off — the
    // multigrid beats that with 30 fine sweeps; measured in the tuning sweep).
    val jac = Electrical.solveBatch(spark, g, pairProbe(33L), iters = 400)
      .filter(col("id") === 33L).head().getLong(2)
    assert(jac != 0L)
    val rel = math.abs(mg - jac).toDouble / math.abs(jac).toDouble
    assert(rel < 0.03, s"mg=$mg jacobi400=$jac rel=$rel")
  }
}
