package graft.algo

import graft.DataFrameLineageOps

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.model.LinkGraph
import graft.synth.GraphSpec

/** KPathCentrality (/root/reference/networkit/cpp/centrality/KPathCentrality
  * .cpp:32-100): Monte-Carlo estimator — t self-avoiding random walks, each of random
  * length ≤ k from a random start; every visit increments the node's counter;
  * score(v) = k·n·counter(v)/t. Reference t = 2k²·n^(1−2α)·ln n off a global RNG.
  *
  * Distributed twin: ALL t walks advance simultaneously, one frontier round per step
  * (≤ k rounds total) — per round one neighbor expansion + one per-walk argmin. Every
  * random choice is a pure LCG function of (walk, node, step, seed): deterministic
  * under any partitioning, reproducible across runs. Walk state is (walk, visited)
  * rows — t·k rows max, independent of n.
  */
object KPath {

  private def lcgCol(x: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import GraphSpec.{A, C, M}
    (lit(A) * ((lit(A) * pmod(x, lit(M)) + C) % M) + C) % M
  }

  /** (id, score) for every vertex. `walks` caps the reference's t (the full
    * 2k²·n^(1−2α)·ln n budget is the default, capped at `maxWalks` — at cluster scale
    * raise the cap; the estimator just gets tighter). */
  def run(spark: SparkSession, g: LinkGraph, alpha: Double = 0.2, kIn: Int = 0,
          seed: Long = 42L, maxWalks: Int = 8192): DataFrame = {
    require(alpha >= -0.5 && alpha <= 0.5, "alpha must lie in [-0.5, 0.5]")
    val n = g.n
    val k = if (kIn > 0) kIn else math.max(1, math.log((n + g.m).toDouble).toInt)
    val t = math.min(maxWalks.toLong,
      math.max(1L, (2.0 * k * k * math.pow(n.toDouble, 1 - 2 * alpha) *
        math.log(n.toDouble)).toLong))
    val bi = g.bidirected.select("src", "dst").persist(StorageLevel.MEMORY_AND_DISK)
    // Map walk i to a uniform start node by dense rank (vertex ids need not be dense).
    val vr = graft.layout.Layout.zipWithRank(g.vertices.select("id"), "id", "vrk")
    val starts = spark.range(t).select(col("id").as("wid"),
        (lcgCol(col("id") * 31L + lit(seed)) % n).as("vrk"),
        (lit(1L) + lcgCol(col("id") * 131L + lit(seed + 7L)) % k).as("len"))
      .join(vr, "vrk")
      .select(col("wid"), col("id").as("cur"), col("len"))
      .cutLineage
    vr.unpersist() // one-shot layout frame (ownership contract, Layout.zipWithRankBy)
    var frontier = starts
    var visited = starts.select(col("wid"), col("cur").as("node")).cutLineage
    var counts = spark.range(0).select(col("id").as("node")) // visit events (dups kept)
      .cutLineage
    var j = 1L
    var active = frontier.count()
    while (active > 0 && j <= k) {
      val cand = bi.join(frontier.filter(col("len") >= j)
          .withColumnRenamed("cur", "src"), "src")
        .join(visited.withColumnRenamed("node", "dst"), Seq("wid", "dst"), "left_anti")
        .select(col("wid"), col("dst").as("x"), col("len"),
          lcgCol(col("wid") * 99991L + col("dst") * 31L + lit(seed + j * 10007L)).as("r"))
      // uniform unexplored neighbor: argmin by (r, x) — one aggregation per step
      val chosen = cand.groupBy("wid")
        .agg(min(struct(col("r"), col("x"), col("len"))).as("c"))
        .select(col("wid"), col("c.x").as("cur"), col("c.len").as("len"))
        .cutLineage
      val prevV = visited
      visited = visited.union(chosen.select(col("wid"), col("cur").as("node"))).cutLineage
      prevV.releaseState()
      val prevC = counts
      counts = counts.union(chosen.select(col("cur").as("node"))).cutLineage
      prevC.releaseState()
      val prevF = frontier
      frontier = chosen
      prevF.releaseState()
      active = frontier.count()
      j += 1
    }
    bi.unpersist()
    val visits = counts.groupBy("node").agg(count(lit(1)).as("c"))
    g.vertices
      .join(visits.withColumnRenamed("node", "id"), Seq("id"), "left")
      .select(col("id"),
        (lit(k.toDouble * n) * coalesce(col("c"), lit(0L)) / t.toDouble).as("score"))
  }
}
