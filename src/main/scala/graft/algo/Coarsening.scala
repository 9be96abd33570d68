package graft.algo

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.LinkGraph

/** The coarsening-module tail beyond ParallelPartitionCoarsening (Measures.coarsen)
  * — the coarsening/GraphCoarsening.h surface:
  *
  *   - MatchingCoarsening (/root/reference/networkit/cpp/coarsening/
  *     MatchingCoarsening.cpp:14-45): contract each matched pair to one coarse node —
  *     here the coarse id is the min endpoint (the reference assigns sequential ids
  *     in node order; a deterministic representative replaces the sequence counter,
  *     same partition), unmatched nodes survive as themselves; edge weights sum.
  *   - ClusteringProjector.projectBack (/root/reference/networkit/cpp/coarsening/
  *     ClusteringProjector.cpp:10-22): pull a coarse clustering back to the fine
  *     graph through the fine→coarse map — one hash join.
  *
  * Both are single-shuffle compositions of the existing coarsen/matching machinery.
  */
object Coarsening {

  /** Fine→coarse map induced by a matching (matched pair → min endpoint,
    * unmatched → self). `matching` = (src, dst, ...) matched pairs, src < dst.
    * Output (id, label). */
  def matchingPartition(spark: SparkSession, g: LinkGraph,
                        matching: DataFrame): DataFrame = {
    val reps = matching.select(col("src").as("id"), col("src").as("nc"))
      .union(matching.select(col("dst").as("id"), col("src").as("nc")))
    g.vertices.join(reps, Seq("id"), "left")
      .select(col("id"), coalesce(col("nc"), col("id")).as("label"))
  }

  /** MatchingCoarsening: the coarse weighted graph (a, b, w) — a ≤ b, self-loop
    * rows carry intra-pair weight (ParallelPartitionCoarsening conventions). */
  def matchingCoarsening(spark: SparkSession, g: LinkGraph,
                         matching: DataFrame): DataFrame =
    Measures.coarsen(spark, g, matchingPartition(spark, g, matching))

  /** ClusteringProjector.projectBack: fine labels = coarse labels looked up through
    * the fine→coarse map. `fineToCoarse` and `coarseLabels` are (id, label). */
  def projectBack(fineToCoarse: DataFrame, coarseLabels: DataFrame): DataFrame =
    fineToCoarse.select(col("id"), col("label").as("c"))
      .join(coarseLabels.select(col("id").as("c"), col("label")), "c")
      .select(col("id"), col("label"))
}
