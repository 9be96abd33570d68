package graft.algo

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
      .select(col("id"), lit(0L).as("dist")).localCheckpoint(true)
    var frontier = visited
    var level = 1L
    var more = frontier.count() > 0
    while (more) {
      val next = bi.join(frontier.withColumnRenamed("id", "src").select("src"), "src")
        .select(col("dst").as("id")).distinct()
        .join(visited.select("id"), Seq("id"), "left_anti")
        .select(col("id"), lit(level).as("dist"))
        .localCheckpoint(true)
      more = next.count() > 0
      if (more) {
        visited = visited.union(next).localCheckpoint(true)
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
}
