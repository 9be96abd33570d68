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
  * Distributed shape — INCREMENTAL residual degrees (the ParK idea, mirrored): degrees
  * are aggregated from the edge table exactly ONCE; every peel micro-round then only
  * subtracts the dead frontier's contributions. Per micro-round the moving data is
  *   (a) the dead frontier (shuffled to the edge table's src-hash partitioning),
  *   (b) its neighbor-contribution counts (already dst-hash partitioned by the
  *       aggregation, co-partitioned with the state — no exchange on the state side).
  * The m-row edge table is only ever STREAMED from cache (shuffle-hash probe), never
  * re-shuffled and never re-aggregated — on a web graph with hundreds of peel
  * micro-rounds this is the difference between O(rounds·m) shuffle and
  * O(Σ frontier-adjacency) ≈ O(m) total shuffle across the whole decomposition.
  */
object KCore {

  /** Edge view + initial residual-degree state, both hash-partitioned for exchange-free
    * iteration: bi by src (the probe side of every frontier join), state by id (matches
    * the contribution aggregation's dst-hash partitioning). */
  private def prepared(g: LinkGraph): (DataFrame, DataFrame) = {
    val spark = g.vertices.sparkSession
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val bi = g.bidirected.select("src", "dst")
      .repartition(parts, col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    bi.count()
    val deg0 = bi.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
    val state = g.vertices.join(deg0, Seq("id"), "left")
      .select(col("id"), coalesce(col("deg"), lit(0L)).as("deg"))
      .repartition(parts, col("id"))
      .cutLineage
    (bi, state)
  }

  /** One peel micro-round: remove `dead` from `state`, subtracting each survivor's
    * count of dead neighbors. Returns the new state (lineage cut, co-partitioned). */
  private def subtractDead(bi: DataFrame, state: DataFrame, dead: DataFrame,
                           k: Int): DataFrame = {
    val delta = bi
      .join(dead.withColumnRenamed("id", "src").hint("shuffle_hash"), "src")
      .groupBy(col("dst").as("id")).agg(count(lit(1)).as("dcnt"))
    state.filter(col("deg") >= k)
      .join(delta.hint("shuffle_hash"), Seq("id"), "left")
      .select(col("id"), (col("deg") - coalesce(col("dcnt"), lit(0L))).as("deg"))
      .cutLineage
  }

  /** Vertices of the k-core (fixpoint of peeling at threshold k). */
  def kCore(spark: SparkSession, g: LinkGraph, k: Int, maxRounds: Int = 1000): DataFrame = {
    val (bi, state0) = prepared(g)
    var state = state0
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      val dead = state.filter(col("deg") < k).select("id").cutLineage
      if (dead.count() == 0) converged = true
      else {
        val prev = state
        state = subtractDead(bi, state, dead, k)
        prev.releaseState(); dead.releaseState()
      }
      round += 1
    }
    bi.unpersist()
    state.select("id")
  }

  /** Coreness per vertex in ONE ascending-k peel (the ParK shape,
    * CoreDecomposition.cpp:45-150): at stage k remove nodes of residual degree < k to a
    * fixpoint — everything removed at stage k has coreness k-1. Each vertex is peeled
    * exactly once and each edge's contribution is subtracted exactly once. Isolated
    * vertices get coreness 0. */
  def coreness(spark: SparkSession, g: LinkGraph, maxK: Int = 1 << 20): DataFrame = {
    val (bi, state0) = prepared(g)
    var state = state0
    var out = g.vertices.filter(lit(false))
      .select(col("id"), lit(0L).as("coreness")) // empty, typed
    var n = state.count()
    var k = 1
    while (n > 0 && k <= maxK) {
      var stable = false
      while (!stable && n > 0) {
        val dead = state.filter(col("deg") < k).select("id").cutLineage
        val d = dead.count()
        if (d == 0) stable = true
        else {
          val prevOut = out
          out = out.union(dead.select(col("id"), lit((k - 1).toLong).as("coreness")))
            .cutLineage
          prevOut.releaseState()
          val prevState = state
          state = subtractDead(bi, state, dead, k)
          prevState.releaseState(); dead.releaseState()
          n -= d
        }
      }
      k += 1
    }
    bi.unpersist()
    out
  }
}
