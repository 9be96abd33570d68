package graft.algo

import graft.DataFrameLineageOps

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.model.LinkGraph

/** Shortest-path distances (/root/reference/networkit/cpp/distance/BFS.cpp and the
  * BFSfrom combinator, graph/Graph.h:1523-1575) as level-synchronous frontier joins:
  * per level, expand the frontier through the (bidirected) edge table, keep newly
  * discovered nodes, assign level+1. One shuffle per level; frontier size bounds the
  * join's build side, unreached vertices are never touched — the textbook distributed
  * BFS.
  */
object Distances {

  /** Hop distance from `source` over the undirected view; unreachable vertices get -1.
    * Output (id, dist). */
  def bfsHops(spark: SparkSession, g: LinkGraph, source: Long): DataFrame = {
    val bi = g.bidirected.select("src", "dst").persist(StorageLevel.MEMORY_AND_DISK)
    bi.count()
    var visited = g.vertices.filter(col("id") === source)
      .select(col("id"), lit(0L).as("dist")).cutLineage
    var frontier = visited
    var level = 1L
    var more = frontier.count() > 0
    while (more) {
      val next = bi.join(frontier.withColumnRenamed("id", "src").select("src"), "src")
        .select(col("dst").as("id")).distinct()
        .join(visited.select("id"), Seq("id"), "left_anti")
        .select(col("id"), lit(level).as("dist"))
        .cutLineage
      more = next.count() > 0
      if (more) {
        visited = visited.union(next).cutLineage
        frontier = next
        level += 1
      }
    }
    bi.unpersist()
    g.vertices.join(visited, Seq("id"), "left")
      .select(col("id"), coalesce(col("dist"), lit(-1L)).as("dist"))
  }

  /** Eccentricity of `source` + reachable-count (Diameter building block,
    * distance/Eccentricity.cpp): one row (ecc, reached). */
  def eccentricity(spark: SparkSession, g: LinkGraph, source: Long): DataFrame =
    bfsHops(spark, g, source)
      .agg(max(col("dist")).as("ecc"),
        sum(when(col("dist") >= 0L, 1L).otherwise(0L)).as("reached"))

  /** Diameter bounds by the classic double sweep (the lower-bound seed of the
    * reference's iFub, distance/Diameter.cpp:1-324 estimatedRange): BFS from `start`,
    * take the farthest node u (ties: smallest id), BFS from u; lb = ecc(u) <= diameter
    * <= 2*ecc(u) = ub. Two BFS passes regardless of graph size. One row (lb, ub). */
  def diameterTwoSweep(spark: SparkSession, g: LinkGraph, start: Long = 0L): DataFrame = {
    val d1 = bfsHops(spark, g, start)
    val u = d1.filter(col("dist") >= 0L)
      .orderBy(desc("dist"), asc("id")).select("id").head().getLong(0)
    bfsHops(spark, g, u)
      .agg(max("dist").as("lb"))
      .select(col("lb"), (col("lb") * 2L).as("ub"))
  }

  /** Weighted single-source shortest paths (distance/Dijkstra.cpp semantics) as a
    * distributed Bellman-Ford: iterate dist' = min(dist, min over in-neighbors
    * (dist[v] + w)) until fixpoint — priority queues don't distribute, min-plus
    * relaxation does (one shuffle per round, rounds <= longest shortest-path edge
    * count). Integer weights keep the state exact. Unreachable => -1. */
  def weightedSssp(spark: SparkSession, g: LinkGraph, source: Long,
                   weight: org.apache.spark.sql.Column,
                   maxRounds: Int = 200): DataFrame = {
    val inf = 999999999L
    val bi = g.bidirected.select(col("src"), col("dst"), weight.cast("long").as("w"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    bi.count()
    var dist = g.vertices
      .select(col("id"), when(col("id") === source, 0L).otherwise(inf).as("dist"))
      .cutLineage
    var round = 0
    var changed = 1L
    while (changed > 0 && round < maxRounds) {
      val relax = bi.join(dist.select(col("id").as("src"), col("dist").as("ds")), "src")
        .filter(col("ds") < inf)
        .groupBy(col("dst").as("id")).agg(min(col("ds") + col("w")).as("cand"))
      val next = dist.join(relax, Seq("id"), "left")
        .select(col("id"),
          least(col("dist"), coalesce(col("cand"), col("dist"))).as("dist"),
          (col("cand") < col("dist")).as("changed"))
        .cutLineageLazy
      changed = next.filter(col("changed")).count()
      val prev = dist
      dist = next.select("id", "dist").cutLineage
      prev.releaseState(); next.releaseState()
      round += 1
    }
    bi.unpersist()
    dist.select(col("id"), when(col("dist") >= inf, -1L).otherwise(col("dist")).as("dist"))
  }

  /** EXACT diameter by iFub (/root/reference/networkit/cpp/distance/Diameter.cpp:1-324,
    * the iFUB algorithm): two-sweep from `start` picks the far node u (ties: smallest
    * id); BFS levels from u order the candidates; then walk fringes top-down — the
    * eccentricities of all level-i nodes (ONE batched msBFS per level) raise the lower
    * bound, and lb > 2*(i-1) certifies no deeper pair can beat it. Terminates after
    * the top few levels on small-world graphs; each fringe batch is the same
    * one-shuffle-per-level harness as everything else (no per-node BFS loop).
    *
    * Connected-component semantics: the diameter OF THE COMPONENT CONTAINING `start`
    * (the reference's exact path requires connectedness; on the web graph run it on
    * the giant component). One row (diameter). */
  def diameterExact(spark: SparkSession, g: LinkGraph, start: Long = 0L): DataFrame = {
    import spark.implicits._
    val d1 = bfsHops(spark, g, start)
    val u = d1.filter(col("dist") >= 0L)
      .orderBy(desc("dist"), asc("id")).select("id").head().getLong(0)
    val d2 = bfsHops(spark, g, u).persist(StorageLevel.MEMORY_AND_DISK)
    var lb = d2.agg(max("dist")).head().getLong(0)
    var i = lb
    var done = lb <= 0L
    while (!done && i > 0L) {
      val fringe = d2.filter(col("dist") === i).select("id")
      if (fringe.limit(1).count() > 0) {
        val (state, _) = Betweenness.msBfs(spark, g, fringe)
        val fringeMax = state.agg(max("dist")).head().getLong(0)
        lb = math.max(lb, fringeMax)
      }
      if (lb > 2L * (i - 1L)) done = true // certified: deeper fringes can't exceed lb
      else i -= 1L
    }
    d2.unpersist()
    Seq(lb).toDF("diameter")
  }

  /** APSP (/root/reference/networkit/cpp/distance/APSP.cpp — per-source BFS loop),
    * re-architected as ONE batched multi-source BFS (the Betweenness forward harness):
    * output (s, id, dist) for every (source, reached node) pair. With `sources` = all
    * vertices this is exact APSP (Θ(n·reach) output — only for small n); the scale
    * path is a sampled source set (distance-sketch style), which is the same call with
    * a filtered source table. Unreached pairs are absent (the reference stores +inf). */
  def apsp(spark: SparkSession, g: LinkGraph, sources: DataFrame): DataFrame =
    Betweenness.msBfs(spark, g, sources)._1.select("s", "id", "dist")
}
