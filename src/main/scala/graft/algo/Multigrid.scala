package graft.algo

import graft.DataFrameLineageOps

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.model.LinkGraph

/** LAMG-style multilevel Laplacian solver — revisiting the SURVEY §7.5 "LAMG /
  * algebraic multigrid" non-goal Spark-first.
  *
  * Reference: /root/reference/networkit/cpp/numerics/LAMG/MultiLevelSetup.cpp:13-247
  * (aggregation-based hierarchy construction, Galerkin coarse operators) and
  * SolverLamg.cpp:24-349 (multilevel cycles with pre/post smoothing, coarsest-level
  * direct solve). The reference builds the hierarchy from test-vector affinities and
  * solves levels with Gauss–Seidel; both are inherently sequential per node. The
  * Spark-first re-expression keeps LAMG's two structural ideas and swaps the
  * sequential machinery:
  *
  *   - **Aggregation → heavy-edge matching.** Levels coarsen by piecewise-constant
  *     aggregation exactly as in LAMG, but the aggregates come from the engine's
  *     deterministic LocalMaxMatcher rounds ([[Matching.matchEdges]] — the same
  *     coarsening the reference itself ships as coarsening/MatchingCoarsening and
  *     uses inside its multilevel community/layout pipelines). Matching rounds are
  *     mutual-dominant-edge aggregations: fully distributed, no RNG, replayable.
  *   - **Galerkin = graph coarsening.** For piecewise-constant P the Galerkin triple
  *     product PᵀLP is EXACTLY the Laplacian of the weight-summed contracted graph
  *     (self-loops vanish in L), so each coarse operator is one groupBy-sum over the
  *     matched-pair map — no sparse matrix algebra (MultiLevelSetup.cpp:110-140's
  *     galerkinOperator collapses to the engine's coarsening).
  *   - **Smoother = damped truncating-integer weighted Jacobi**, the same
  *     one-edge-join-plus-partial-aggregation round as [[Electrical.solveBatch]] and
  *     PageRank — one m-row exchange per sweep, hub-safe via map-side combine. Jacobi
  *     (not Gauss–Seidel) because it is order-free and its integer update replays
  *     bit-exactly in the DuckDB oracle (Spark `div` ≡ DuckDB `//` truncation).
  *   - **Coarsest solve = a fixed budget of the same smoother** (the coarsest system
  *     is a few hundred rows; the reference LU-factorizes — a driver-side dense solve
  *     would work at scale too, but the fixed smoother keeps the whole cycle
  *     cross-engine exact).
  *
  * The grounded (Dirichlet) trick from [[Electrical]] carries through the hierarchy:
  * the ground vertex is pinned out of the matching so it stays a singleton aggregate,
  * which makes "Galerkin of the grounded Laplacian" equal "grounded Laplacian of the
  * coarsened graph" level by level.
  *
  * State is (id, q, x) scaled int64 batched over probes q, like the whole electrical
  * family. Right-hand sides are carried PRE-SCALED (rhs = scale·b at the finest
  * level; restricted residuals keep those units downward), so one smoother formula
  * serves every level:
  *
  *   x'_i = (x_i + (rhs_i + Σ_j w_ij x_j) div wdeg_i) div 2,  x'_ground = 0.
  *
  * Scale story: a V(ν₁,ν₂)-cycle costs (ν₁+ν₂+1) m-row exchanges at the finest level
  * plus geometrically shrinking coarse work — same per-cycle cost shape as a handful
  * of PageRank rounds, while converging where plain Jacobi stalls (long-path modes:
  * see MultigridSpec's path-graph gate). Hierarchy construction is a few matching
  * rounds + one contraction groupBy per level, all frontier/m-row bounded.
  */
object Multigrid {

  val Scale = 16384L

  /** One hierarchy level: simple weighted undirected edges (src<dst, integer w),
    * vertex set, and (for every level but the finest) the fine→this aggregation map
    * (id, label) from the PREVIOUS level's vertices. All persisted. */
  final case class MgLevel(und: DataFrame, verts: DataFrame, part: Option[DataFrame])

  /** Build `levels` levels by repeated (matching → contraction). Level 0 is the unit
    * Laplacian of the graph's simple undirected view (one row per logical edge,
    * w = 1 — the same operator the rest of the electrical family solves). `ground`
    * is excluded from every matching so it remains a singleton aggregate. */
  /** Hierarchy frames are lineage-CUT (localCheckpoint), not merely persisted:
    * level k's logical plan would otherwise contain level k−1's plan twice (two
    * part-joins), nesting exponentially in the level count — and every downstream
    * action re-analyzes and stringifies that tree on the driver. Checkpointing makes
    * each level a LogicalRDD leaf, so all V-cycle plans stay constant-size. */
  def buildHierarchy(spark: SparkSession, g: LinkGraph, levels: Int,
                     matchRounds: Int, ground: Long = 0L): Vector[MgLevel] = {
    val und0 = g.canonicalUndirected.select(col("src"), col("dst"), lit(1L).as("w"))
      .cutLineage
    var out = Vector(MgLevel(und0, g.vertices, None))
    var k = 1
    while (k < levels) {
      val fine = out.last
      // Equal weights serialize local-max matching along chains (one matched pair
      // per round on a path) — the reference's LocalMaxMatcher jitters weights with
      // an RNG for exactly this reason (matching/LocalMaxMatcher.cpp:36). We jitter
      // deterministically with the shared LCG draw so the DuckDB twin replays it:
      // key = least(w, 2³¹−1)·2³¹ + draw(src,dst), i.e. lexicographic (w, draw)
      // order with the weight clamped so the key stays < 2^62 no matter how much
      // aggregated coarse weight accumulates across levels (ADVICE r3: unclamped,
      // a coarse weight ≥ 2^32 wraps int64 in Spark while DuckDB raises). Ordering
      // only needs a deterministic total order; above the clamp, `draw` decides.
      val matchable = fine.und
        .filter(col("src") =!= ground && col("dst") =!= ground)
        .select(col("src"), col("dst"),
          (least(col("w"), lit(graft.synth.GraphSpec.M - 1L)) * lit(graft.synth.GraphSpec.M) +
            expr(graft.synth.Generators.drawSql("src * 1000003 + dst * 31 + 7",
              duck = false))).as("w"))
      val matched = Matching.matchEdges(matchable, matchRounds)
      val pairMap = matched.select(col("src").as("id"), col("src").as("label"))
        .union(matched.select(col("dst").as("id"), col("src").as("label")))
      val part = fine.verts
        .join(pairMap, Seq("id"), "left")
        .select(col("id"), coalesce(col("label"), col("id")).as("label"))
        .cutLineage
      val ce = fine.und
        .join(part.select(col("id").as("src"), col("label").as("ls")), Seq("src"))
        .join(part.select(col("id").as("dst"), col("label").as("ld")), Seq("dst"))
        .filter(col("ls") =!= col("ld"))
        .groupBy(least(col("ls"), col("ld")).as("src"),
                 greatest(col("ls"), col("ld")).as("dst"))
        .agg(sum("w").as("w"))
        .cutLineage
      val cverts = part.select(col("label").as("id")).distinct().cutLineage
      out = out :+ MgLevel(ce, cverts, Some(part))
      k += 1
    }
    out
  }

  def releaseHierarchy(lvls: Vector[MgLevel]): Unit = lvls.foreach { l =>
    l.und.releaseState(); l.part.foreach(_.releaseState())
    if (l.part.isDefined) l.verts.releaseState() // level-0 verts belong to the graph
  }

  /** Per-level smoother base: (id, q, wdeg) for every vertex × probe. */
  private def smootherBase(lvl: MgLevel, qs: DataFrame): DataFrame = {
    val wdeg = lvl.und.select(col("src").as("id"), col("w"))
      .union(lvl.und.select(col("dst").as("id"), col("w")))
      .groupBy("id").agg(sum("w").as("wdeg"))
    lvl.verts.crossJoin(broadcast(qs))
      .join(wdeg, Seq("id"), "left")
      .select(col("id"), col("q"), coalesce(col("wdeg"), lit(0L)).as("wdeg"))
  }

  /** Weighted neighbor mass Σ_j w_ij x_j keyed by (id, q) — one m-row exchange. */
  private def mass(biw: DataFrame, x: DataFrame): DataFrame =
    x.join(biw, x("id") === biw("a"))
      .groupBy(col("b").as("id"), col("q"))
      .agg(sum(col("w") * col("x")).as("m"))

  /** `steps` damped Jacobi sweeps of (base ⋈ rhs) from state `x`. `rhs` is (id,q,rhs)
    * in pre-scaled units; absent rows = 0. */
  private def smooth(base: DataFrame, biw: DataFrame, rhs: DataFrame, x0: DataFrame,
                     steps: Int, ground: Long): DataFrame = {
    var x = x0
    var s = 0
    while (s < steps) {
      val prev = x
      x = base
        .join(prev.withColumnRenamed("x", "xp"), Seq("id", "q"))
        .join(rhs, Seq("id", "q"), "left")
        .join(mass(biw, prev), Seq("id", "q"), "left")
        .select(col("id"), col("q"),
          when(col("id") === ground || col("wdeg") === 0L, lit(0L))
            .otherwise(expr("(xp + (coalesce(rhs, 0L) + coalesce(m, 0L)) div wdeg) div 2"))
            .as("x"))
        .cutLineage
      prev.releaseState()
      s += 1
    }
    x
  }

  /** Exact integer residual r = rhs − Lx (0 at ground / isolated rows). */
  private def residual(base: DataFrame, biw: DataFrame, rhs: DataFrame,
                       x: DataFrame, ground: Long): DataFrame =
    base
      .join(x, Seq("id", "q"))
      .join(rhs, Seq("id", "q"), "left")
      .join(mass(biw, x), Seq("id", "q"), "left")
      .select(col("id"), col("q"),
        when(col("id") === ground || col("wdeg") === 0L, lit(0L))
          .otherwise(coalesce(col("rhs"), lit(0L)) - col("wdeg") * col("x")
            + coalesce(col("m"), lit(0L)))
          .as("rhs"))

  /** Solve L x = scale·b multigrid-style: `cycles` V(ν₁,ν₂)-cycles over the built
    * hierarchy, coarsest level smoothed `coarseIters` times from zero. `b` is
    * (id, q, b) integer rows, consistent per component; returns (id, q, x) over
    * every vertex × probe with x ≈ scale·potential, x(ground,·) = 0. */
  /** `overNum`/`overDen`: the coarse-grid correction is scaled by overNum/overDen
    * (integer multiply-then-truncate) before being added. Piecewise-constant pairwise
    * aggregation systematically understates smooth-mode corrections — on a 1D chain
    * the Galerkin conductance between size-2 aggregates is exactly 2× the true
    * series conductance — and the standard aggregation-AMG remedy is over-correction
    * by ≈ the aggregate size (Blaheta/Vaněk's scaled aggregation). 3/2 is a robust
    * general-graph default; 2/1 is exact-in-the-limit for chain-like regions. */
  def solve(spark: SparkSession, g: LinkGraph, b: DataFrame, levels: Int,
            matchRounds: Int, nu1: Int, nu2: Int, coarseIters: Int, cycles: Int,
            scale: Long = Scale, ground: Long = 0L,
            overNum: Long = 3L, overDen: Long = 2L): DataFrame = {
    val lvls = buildHierarchy(spark, g, levels, matchRounds, ground)
    val qs = b.select("q").distinct().persist(StorageLevel.MEMORY_AND_DISK)
    qs.count()
    val bases = lvls.map { l =>
      val d = smootherBase(l, qs).persist(StorageLevel.MEMORY_AND_DISK)
      d.count(); d
    }
    val biws = lvls.map { l =>
      val biw = l.und.select(col("src").as("a"), col("dst").as("b"), col("w"))
        .union(l.und.select(col("dst").as("a"), col("src").as("b"), col("w")))
        .persist(StorageLevel.MEMORY_AND_DISK)
      biw.count(); biw
    }
    val rhs0 = b.select(col("id"), col("q"), (col("b") * scale).as("rhs"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    rhs0.count()

    def zeros(k: Int): DataFrame =
      bases(k).select(col("id"), col("q"), lit(0L).as("x")).cutLineage

    /** One V-cycle at level k from state x with right-hand side rhs. */
    def vc(k: Int, x0: DataFrame, rhs: DataFrame): DataFrame = {
      if (k == lvls.length - 1) {
        smooth(bases(k), biws(k), rhs, x0, coarseIters, ground)
      } else {
        val xs = smooth(bases(k), biws(k), rhs, x0, nu1, ground)
        val r = residual(bases(k), biws(k), rhs, xs, ground)
        val part = lvls(k + 1).part.get
        val rc = r.join(part, Seq("id"))
          .groupBy(col("label").as("id"), col("q"))
          .agg(sum("rhs").as("rhs"))
          .cutLineage
        val e = vc(k + 1, zeros(k + 1), rc)
        val corrected = xs
          .join(part, Seq("id"))
          .join(e.select(col("id").as("label"), col("q"), col("x").as("e")),
            Seq("label", "q"), "left")
          .select(col("id"), col("q"),
            (col("x") + expr(s"(coalesce(e, 0L) * $overNum) div $overDen")).as("x"))
          .cutLineage
        xs.releaseState(); rc.releaseState(); e.releaseState()
        val out = smooth(bases(k), biws(k), rhs, corrected, nu2, ground)
        out
      }
    }

    var x = zeros(0)
    var c = 0
    while (c < cycles) {
      val prev = x
      x = vc(0, prev, rhs0)
      c += 1
    }
    // x is already checkpointed by the last smooth step — safe to drop supports.
    bases.foreach(_.unpersist()); biws.foreach(_.unpersist())
    rhs0.unpersist(); qs.unpersist(); releaseHierarchy(lvls)
    x
  }

  /** Plain damped-Jacobi reference run with the SAME smoother (for the spec's
    * equal-fine-work comparison). */
  def jacobiOnly(spark: SparkSession, g: LinkGraph, b: DataFrame, iters: Int,
                 scale: Long = Scale, ground: Long = 0L): DataFrame =
    Electrical.solveBatch(spark, g, b, iters, scale, ground)
}
