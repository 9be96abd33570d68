package graft.numerics

import graft.DataFrameLineageOps

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.model.LinkGraph

/** Conjugate Gradient on the graph Laplacian — the reference's generic linear-solver
  * entry point (/root/reference/networkit/cpp/numerics/ConjugateGradient.h:23-80,
  * there over CSRMatrix with a preconditioner; the LAMG multigrid stack itself stays a
  * declared non-goal).
  *
  * Distributed shape: the vector state (x, r, p) lives in ONE co-partitioned
  * DataFrame keyed by vertex; each iteration is exactly one matvec
  * (edge-table join + aggregate — the same exchange as a PageRank step) plus two
  * scalar dot products (partial-aggregated). The driver holds only α/β — the classic
  * "CG is BSP-friendly" decomposition, which is why it scales where Gauss-Seidel's
  * sequential sweeps (numerics/GaussSeidelRelaxation.h) don't; Jacobi-style smoothing
  * already lives in the Electrical family's integer solver.
  *
  * The Laplacian is singular, so the system is GROUNDED: row/column `ground` is
  * removed (x[ground] pinned to 0) making L̃ SPD on connected graphs — the standard
  * grounding the reference's solver clients use for effective-resistance systems.
  */
object ConjugateGradient {

  /** Solve L̃ x = b on the grounded Laplacian of g (unit edge weights unless a
    * weight column exists and `useWeights`). `b`: (id, b) over vertices except
    * `ground` (missing ids → 0). Returns (id, x) with x[ground] = 0 included. */
  def solveLaplacian(spark: SparkSession, g: LinkGraph, b: DataFrame, ground: Long,
                     iters: Int = 200, tol: Double = 1e-12,
                     useWeights: Boolean = false): DataFrame = {
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val w = if (useWeights) col("weight").cast("double") else lit(1.0)
    val bi0 = g.bidirected.select(col("src"), col("dst"), w.as("w"))
    // degrees INCLUDE ground-incident edges (they stay on the diagonal); off-diagonal
    // terms to/from ground are dropped (its x is 0).
    val degAll = bi0.groupBy(col("src").as("id")).agg(sum("w").as("deg"))
    val bi = bi0.filter(col("src") =!= ground && col("dst") =!= ground)
      .repartition(parts, col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    bi.count()

    // state (id, deg, x, r, p) for all vertices != ground
    var st = g.vertices.filter(col("id") =!= ground)
      .join(degAll, Seq("id"), "left")
      .join(b.select(col("id"), col("b").cast("double")), Seq("id"), "left")
      .select(col("id"), coalesce(col("deg"), lit(0.0)).as("deg"),
        lit(0.0).as("x"),
        coalesce(col("b"), lit(0.0)).as("r"),
        coalesce(col("b"), lit(0.0)).as("p"))
      .repartition(parts, col("id"))
      .cutLineage

    var rr = st.agg(sum(col("r") * col("r"))).head().getDouble(0)
    var it = 0
    while (it < iters && rr > tol * tol) {
      // Ap = deg·p − Σ_{v~u} w·p(v)
      val msg = bi.join(st.select(col("id").as("src"), col("p").as("ps")).hint("shuffle_hash"), "src")
        .groupBy(col("dst").as("id")).agg(sum(col("w") * col("ps")).as("np"))
      val withAp = st.join(msg.hint("shuffle_hash"), Seq("id"), "left")
        .select(col("id"), col("deg"), col("x"), col("r"), col("p"),
          (col("deg") * col("p") - coalesce(col("np"), lit(0.0))).as("ap"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val pAp = withAp.agg(sum(col("p") * col("ap"))).head().getDouble(0)
      if (pAp <= 0.0) { // numerically singular direction — stop
        withAp.unpersist()
        it = iters
      } else {
        val alpha = rr / pAp
        val next = withAp.select(col("id"), col("deg"),
          (col("x") + lit(alpha) * col("p")).as("x"),
          (col("r") - lit(alpha) * col("ap")).as("r"),
          col("p"))
          .cutLineage
        withAp.unpersist()
        val rr2 = next.agg(sum(col("r") * col("r"))).head().getDouble(0)
        val beta = rr2 / rr
        val prev = st
        st = next.select(col("id"), col("deg"), col("x"), col("r"),
          (col("r") + lit(beta) * col("p")).as("p"))
          .cutLineage
        prev.releaseState(); next.releaseState()
        rr = rr2
        it += 1
      }
    }
    bi.unpersist()
    val s = spark
    import s.implicits._
    st.select(col("id"), col("x"))
      .union(Seq((ground, 0.0)).toDF("id", "x"))
  }

  /** L̃ x for a given x (the grounded-Laplacian matvec) — exposed for specs and
    * residual checks. `x`: (id, x) without the ground row. */
  def applyLaplacian(spark: SparkSession, g: LinkGraph, x: DataFrame, ground: Long,
                     useWeights: Boolean = false): DataFrame = {
    val w = if (useWeights) col("weight").cast("double") else lit(1.0)
    val bi0 = g.bidirected.select(col("src"), col("dst"), w.as("w"))
    val degAll = bi0.groupBy(col("src").as("id")).agg(sum("w").as("deg"))
    val bi = bi0.filter(col("src") =!= ground && col("dst") =!= ground)
    val msg = bi.join(x.select(col("id").as("src"), col("x").as("xs")), "src")
      .groupBy(col("dst").as("id")).agg(sum(col("w") * col("xs")).as("nx"))
    g.vertices.filter(col("id") =!= ground)
      .join(degAll, Seq("id"), "left")
      .join(x, Seq("id"), "left")
      .join(msg, Seq("id"), "left")
      .select(col("id"),
        (coalesce(col("deg"), lit(0.0)) * coalesce(col("x"), lit(0.0))
          - coalesce(col("nx"), lit(0.0))).as("b"))
  }
}
