package graft.algo

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.LinkGraph

/** Synthetic partitions for tests and quality-measure anchors — the reference's
  * ClusteringGenerator (/root/reference/networkit/cpp/community/ClusteringGenerator.cpp):
  * 1-clustering (Q=0, coverage=1 anchors), singleton clustering (Q<=0 anchor), random
  * k-clustering (seeded, deterministic here via xxhash64 instead of a thread-local RNG),
  * and the continuous balanced k-clustering (id * k / n). All are pure column
  * expressions over the vertex table. */
object ClusteringGenerator {

  /** Every node in cluster 0. */
  def one(g: LinkGraph): DataFrame =
    g.vertices.select(col("id"), lit(0L).as("label"))

  /** Every node its own cluster (Partition::allToSingletons). */
  def singletons(g: LinkGraph): DataFrame =
    g.vertices.select(col("id"), col("id").as("label"))

  /** Seeded pseudo-random assignment to k clusters — deterministic at any parallelism
    * (hash of (seed, id)), unlike the reference's thread-local RNG. */
  def random(g: LinkGraph, k: Long, seed: Long = 42L): DataFrame =
    g.vertices.select(col("id"), pmod(xxhash64(lit(seed), col("id")), lit(k)).as("label"))

  /** Continuous balanced k-clustering: label = floor(id * k / n) over dense ids. */
  def continuousBalanced(spark: SparkSession, g: LinkGraph, k: Long): DataFrame =
    g.vertices.select(col("id"), expr(s"id * $k div ${math.max(1L, g.n)}").as("label"))
}
