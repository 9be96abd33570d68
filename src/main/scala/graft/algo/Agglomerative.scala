package graft.algo

import graft.DataFrameLineageOps

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.LinkGraph

/** Parallel agglomerative community detection — the reference's
  * ParallelAgglomerativeClusterer (/root/reference/networkit/cpp/community/
  * ParallelAgglomerativeClusterer.cpp:18-90): per level, score every edge by the
  * modularity gain of merging its endpoints (scoring/ModularityScoring.h), compute a
  * weight-maximizing matching on those scores, contract matched pairs
  * (coarsening/MatchingCoarsening), and repeat until few merges remain; the coarsest
  * nodes, projected back, are the communities.
  *
  * Distributed twin choices (all deterministic, mirrored in the DuckDB oracle):
  *   - scoring: the modularity score's ORDER is preserved by the cleared-denominator
  *     integer 2·W·w(u,v) − vol(u)·vol(v) (W = total weight, vol counts self-loops
  *     twice) — exact int64 at gate scale (documented: rescale above ~10^9 weight).
  *   - matching: [[Matching.matchEdges]] local-max rounds (the reference uses the
  *     sequential PathGrowingMatcher; local-max is its parallel half-approximation
  *     sibling from the same matching module).
  *   - contraction: matched pair → min endpoint id; edge table re-grouped with
  *     self-loop rows kept (they carry the merged community's internal weight into
  *     the next level's volumes).
  */
object Agglomerative {

  /** `levels` fixed agglomeration levels, `matchRounds` local-max rounds per level.
    * Returns (id, label): original vertex -> coarsest community (min member id). */
  def runFixed(spark: SparkSession, g: LinkGraph, levels: Int,
               matchRounds: Int = 10): DataFrame = {
    // Level-0 state: canonical undirected (integer multiplicity weight), no self-loops.
    var edges = g.edges
      .select(least(col("src"), col("dst")).as("s"), greatest(col("src"), col("dst")).as("t"))
      .groupBy("s", "t").agg(count(lit(1)).as("w"))
      .cutLineage
    var labels = g.vertices.select(col("id"), col("id").as("label")).cutLineage

    for (_ <- 1 to levels) {
      val tw = edges.agg(sum("w")).head().getLong(0)
      val vol = edges.select(col("s").as("id"),
          when(col("s") === col("t"), lit(2L) * col("w")).otherwise(col("w")).as("wc"))
        .union(edges.filter(col("s") =!= col("t"))
          .select(col("t").as("id"), col("w").as("wc")))
        .groupBy("id").agg(sum("wc").as("vol"))
      val scored = edges.filter(col("s") =!= col("t"))
        .join(vol.select(col("id").as("s"), col("vol").as("vs")), "s")
        .join(vol.select(col("id").as("t"), col("vol").as("vt")), "t")
        .select(col("s").as("src"), col("t").as("dst"),
          (lit(2L * tw) * col("w") - col("vs") * col("vt")).as("w"))
        .filter(col("w") > 0L) // only positive-gain merges: a negative score is a
                               // modularity-DECREASING contraction (this is what
                               // stops a bridge from fusing two dense communities)
      val matched = Matching.matchEdges(scored, matchRounds)
      val merges = matched
        .select(col("src").as("c"), least(col("src"), col("dst")).as("nc"))
        .union(matched.select(col("dst").as("c"), least(col("src"), col("dst")).as("nc")))
        .cutLineage
      val prevLabels = labels; val prevEdges = edges
      labels = labels.join(merges.withColumnRenamed("c", "label"), Seq("label"), "left")
        .select(col("id"), coalesce(col("nc"), col("label")).as("label"))
        .cutLineage
      edges = edges
        .join(merges.select(col("c").as("s"), col("nc").as("ns")), Seq("s"), "left")
        .join(merges.select(col("c").as("t"), col("nc").as("nt")), Seq("t"), "left")
        .select(
          least(coalesce(col("ns"), col("s")), coalesce(col("nt"), col("t"))).as("s"),
          greatest(coalesce(col("ns"), col("s")), coalesce(col("nt"), col("t"))).as("t"),
          col("w"))
        .groupBy("s", "t").agg(sum("w").as("w"))
        .cutLineage
      prevLabels.releaseState(); prevEdges.releaseState(); merges.releaseState()
      matched.releaseState()
    }
    labels
  }

  /** Production variant: agglomerate until a level merges fewer than
    * `relThreshold`·n pairs or fewer than 2 communities remain (the reference's
    * REL_REPEAT_THRSH = 5e-3 stop rule). */
  def run(spark: SparkSession, g: LinkGraph, relThreshold: Double = 5e-3,
          matchRounds: Int = 10, maxLevels: Int = 50): DataFrame = {
    var labels = runFixed(spark, g, 0) // identity, typed
    var lvl = 0
    var repeat = true
    while (repeat && lvl < maxLevels) {
      val next = runFixedFrom(spark, g, labels, matchRounds)
      val before = labels.select("label").distinct().count()
      val after = next.select("label").distinct().count()
      repeat = after < before && after >= 2 &&
        (before - after).toDouble / before > relThreshold
      labels.releaseState()
      labels = next
      lvl += 1
    }
    labels
  }

  /** One agglomeration level starting from an existing labeling (used by [[run]]). */
  private def runFixedFrom(spark: SparkSession, g: LinkGraph, labels: DataFrame,
                           matchRounds: Int): DataFrame = {
    val edges = g.edges
      .join(labels.select(col("id").as("src"), col("label").as("ls")), "src")
      .join(labels.select(col("id").as("dst"), col("label").as("lt")), "dst")
      .select(least(col("ls"), col("lt")).as("s"), greatest(col("ls"), col("lt")).as("t"))
      .groupBy("s", "t").agg(count(lit(1)).as("w"))
      .cutLineage
    val tw = edges.agg(sum("w")).head().getLong(0)
    val vol = edges.select(col("s").as("id"),
        when(col("s") === col("t"), lit(2L) * col("w")).otherwise(col("w")).as("wc"))
      .union(edges.filter(col("s") =!= col("t"))
        .select(col("t").as("id"), col("w").as("wc")))
      .groupBy("id").agg(sum("wc").as("vol"))
    val scored = edges.filter(col("s") =!= col("t"))
      .join(vol.select(col("id").as("s"), col("vol").as("vs")), "s")
      .join(vol.select(col("id").as("t"), col("vol").as("vt")), "t")
      .select(col("s").as("src"), col("t").as("dst"),
        (lit(2L * tw) * col("w") - col("vs") * col("vt")).as("w"))
      .filter(col("w") > 0L)
    val matched = Matching.matchEdges(scored, matchRounds)
    val merges = matched
      .select(col("src").as("c"), least(col("src"), col("dst")).as("nc"))
      .union(matched.select(col("dst").as("c"), least(col("src"), col("dst")).as("nc")))
    val out = labels.join(merges.withColumnRenamed("c", "label"), Seq("label"), "left")
      .select(col("id"), coalesce(col("nc"), col("label")).as("label"))
      .cutLineage
    edges.releaseState(); matched.releaseState()
    out
  }
}
