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

  /** Coreness per vertex: run [[kCore]] for k = 1.. until empty; coreness = max k whose
    * core contains the node (0 for isolated vertices). */
  def coreness(spark: SparkSession, g: LinkGraph, maxK: Int = 64): DataFrame = {
    var out = g.vertices.select(col("id"), lit(0L).as("coreness"))
    var k = 1
    var done = false
    while (!done && k <= maxK) {
      val core = kCore(spark, g, k)
      if (core.isEmpty) done = true
      else {
        out = out.join(core.withColumn("ink", lit(true)), Seq("id"), "left")
          .select(col("id"),
            when(col("ink"), lit(k.toLong)).otherwise(col("coreness")).as("coreness"))
          .cutLineage
        k += 1
      }
    }
    out
  }
}
