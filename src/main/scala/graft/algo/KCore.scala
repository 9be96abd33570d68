package graft.algo

import graft.DataFrameLineageOps

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.model.LinkGraph

/** k-core decomposition (/root/reference/networkit/cpp/centrality/CoreDecomposition
  * .cpp:26-150, ParK bucket-peeling): iteratively remove nodes of degree < k; the k-core
  * is the fixpoint; coreness(v) = largest k whose core contains v.
  *
  * Distributed shape: each peel round is one aggregation over the surviving subgraph
  * (degree recompute) + one filter — no collect, no driver state beyond the loop
  * counter. The survivor set shrinks monotonically, so per-round shuffle volume decays;
  * at web scale rounds are bounded by the degeneracy ordering depth (small for
  * power-law graphs).
  */
object KCore {

  /** Vertices of the k-core (fixpoint of peeling at threshold k). */
  def kCore(spark: SparkSession, g: LinkGraph, k: Int, maxRounds: Int = 1000): DataFrame = {
    val bi = g.bidirected.select("src", "dst").persist(StorageLevel.MEMORY_AND_DISK)
    bi.count()
    var alive = g.vertices.select(col("id")).cutLineage
    var n = alive.count()
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      val deg = bi
        .join(alive.withColumnRenamed("id", "src"), "src")
        .join(alive.withColumnRenamed("id", "dst"), "dst")
        .groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
      val next = deg.filter(col("deg") >= k).select("id").cutLineage
      val m = next.count()
      converged = m == n
      alive = next
      n = m
      round += 1
    }
    bi.unpersist()
    alive
  }

  /** Coreness per vertex in ONE ascending-k peel (the ParK shape,
    * CoreDecomposition.cpp:45-150): maintain the surviving subgraph; at stage k remove
    * nodes of residual degree < k to a fixpoint — everything removed at stage k has
    * coreness k-1. Each vertex is peeled exactly once, so total work is the peel
    * sequence, not maxK full re-peels. Isolated vertices get coreness 0. */
  def coreness(spark: SparkSession, g: LinkGraph, maxK: Int = 1 << 20): DataFrame = {
    val bi = g.bidirected.select("src", "dst").persist(StorageLevel.MEMORY_AND_DISK)
    bi.count()
    var alive = g.vertices.select(col("id")).cutLineage
    var out = g.vertices.filter(lit(false))
      .select(col("id"), lit(0L).as("coreness")) // empty, typed
    var n = alive.count()
    var k = 1
    while (n > 0 && k <= maxK) {
      var stable = false
      while (!stable && n > 0) {
        val deg = bi
          .join(alive.withColumnRenamed("id", "src"), "src")
          .join(alive.withColumnRenamed("id", "dst"), "dst")
          .groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
        val survivors = deg.filter(col("deg") >= k).select("id")
        val dead = alive.join(survivors, Seq("id"), "left_anti").cutLineage
        val d = dead.count()
        if (d == 0) stable = true
        else {
          val prevOut = out
          out = out.union(dead.select(col("id"), lit((k - 1).toLong).as("coreness")))
            .cutLineage
          prevOut.releaseState()
          val prevAlive = alive
          alive = alive.join(dead, Seq("id"), "left_anti").cutLineage
          prevAlive.releaseState()
          n -= d
        }
      }
      k += 1
    }
    bi.unpersist()
    out
  }
}
