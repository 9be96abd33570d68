package graft.algo

import graft.DataFrameLineageOps

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.model.LinkGraph

/** Algebraic distance (/root/reference/networkit/cpp/distance/AlgebraicDistance.cpp:
  * 23-120; one of the NodeDistance.h pairwise-distance implementations, like
  * JaccardDistance): K independent "load" systems are smoothed over the graph —
  * x'(u) = (1−ω)·x(u) + ω·(Σ_v w(u,v)·x(v)) / wdeg(u) — and the distance between
  * adjacent nodes is the L1 gap of their converged loads: structurally close nodes
  * (many short paths) end up with similar loads, so small distance = strong tie. Used
  * as a sparsification/coarsening affinity score.
  *
  * Spark shape: the K systems are K plain long columns (one row per vertex), each
  * iteration is ONE `groupBy(dst).agg(sum…)` over the bidirected edges + a state join —
  * the PageRank plan, one m-row shuffle per iteration, so it scales identically.
  *
  * Deterministic integer twin (differences from the reference, by design):
  *   - loads are scaled integers seeded by the shared LCG (not ambient RNG);
  *   - ω is fixed to 1/2 so the update collapses to floor divisions:
  *     x' = (x + (Σ x_v) div deg) div 2 — exact, order-independent int64, replayable
  *     bit-for-bit by the DuckDB twin (OracleSql.algebraicDistance);
  *   - loads stay UN-normalized (the reference min-max-normalizes per system before
  *     the Lp distance; a rank-preserving affine map — the induced edge ORDER per
  *     system is unchanged).
  * Unweighted view (weight folds into the neighbor sum for weighted graphs).
  */
object AlgebraicDistance {

  val K = 4
  val InitScale = 1000000000L // initial loads in [0, 1e9)

  private def lcgCol(x: Column): Column = {
    import graft.synth.GraphSpec.{A, C, M}
    (lit(A) * ((lit(A) * pmod(x, lit(M)) + C) % M) + C) % M
  }

  /** Converged per-node loads after `iters` smoothing rounds: (id, x0..x{K−1}),
    * exact int64 — shared by the per-edge score and the per-pair
    * AlgebraicDistanceIndex (linkprediction/AlgebraicDistanceIndex.cpp:20-46, whose
    * preprocess() is exactly this smoothing loop). */
  def loads(spark: SparkSession, g: LinkGraph, iters: Int = 5,
            seed: Long = 42L): DataFrame = {
    val cols = (0 until K).map(j => s"x$j")
    val bi = g.bidirected.select("src", "dst").persist(StorageLevel.MEMORY_AND_DISK)
    val deg = bi.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    deg.count()

    var x = g.vertices.select(
      col("id") +: (0 until K).map(j =>
        (lcgCol(col("id") * K + j + seed * 1000003L) % InitScale).as(s"x$j")): _*)
      .cutLineage
    var it = 0
    while (it < iters) {
      val sums = bi.join(x.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id"))
        .agg(sum(cols.head).as(cols.head), cols.tail.map(c => sum(c).as(c)): _*)
      val next = x.as("a")
        .join(sums.as("b"), Seq("id"), "left")
        .join(deg, Seq("id"), "left")
        .select(col("id") +: cols.map(c =>
          when(col("deg").isNull, col(s"a.$c")) // isolated: load unchanged
            .otherwise(expr(s"(a.$c + (b.$c div deg)) div 2")).as(c)): _*)
        .cutLineage
      x.releaseState()
      x = next
      it += 1
    }
    bi.unpersist(); deg.unpersist()
    x
  }

  /** L1 load gap between two id columns of `pairs` — the distance kernel shared by
    * edge scores and pair indices. */
  private def l1Gap(pairs: DataFrame, x: DataFrame,
                    left: String, right: String): DataFrame = {
    val cols = (0 until K).map(j => s"x$j")
    pairs
      .join(x.select(col("id").as(left) +: cols.map(c => col(c).as(s"s_$c")): _*), left)
      .join(x.select(col("id").as(right) +: cols.map(c => col(c).as(s"d_$c")): _*), right)
      .select(col(left), col(right),
        cols.map(c => abs(col(s"s_$c") - col(s"d_$c"))).reduce(_ + _).as("ad"))
  }

  /** Per-edge algebraic distance after `iters` smoothing rounds: (src, dst, ad) per
    * canonical undirected edge, ad = Σ_sys |x(src) − x(dst)| (exact int64). */
  def edgeScores(spark: SparkSession, g: LinkGraph, iters: Int = 5,
                 seed: Long = 42L): DataFrame =
    l1Gap(g.canonicalUndirected.select("src", "dst"),
      loads(spark, g, iters, seed), "src", "dst")

  /** AlgebraicDistanceIndex (linkprediction/AlgebraicDistanceIndex.cpp:40-46): the
    * same converged loads evaluated on arbitrary candidate pairs (u, v) — here the
    * distance-2 non-adjacent set sharded by `uMod`, matching the other predictors.
    * Output (u, v, ad). */
  def pairScores(spark: SparkSession, g: LinkGraph, iters: Int = 5,
                 seed: Long = 42L, uMod: Long = 1L): DataFrame = {
    val bi = g.bidirected.select("src", "dst")
    val wu = bi.select(col("src").as("z"), col("dst").as("u"))
      .filter(pmod(col("u"), lit(uMod)) === 0L)
    val wv = bi.select(col("src").as("z"), col("dst").as("v"))
    val und = g.canonicalUndirected.select(col("src").as("u"), col("dst").as("v"))
    val pairs = wu.join(wv, "z")
      .filter(col("u") < col("v"))
      .select("u", "v").distinct()
      .join(und, Seq("u", "v"), "left_anti")
    l1Gap(pairs, loads(spark, g, iters, seed), "u", "v")
  }
}
