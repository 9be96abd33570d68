package graft.algo

import graft.DataFrameLineageOps

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.LinkGraph

/** Local-max (Preis) matching — the reference's LocalMaxMatcher
  * (/root/reference/networkit/cpp/matching/LocalMaxMatcher.cpp:20-82): per round,
  * every remaining edge checks whether it is the locally dominant edge at BOTH
  * endpoints; dominant pairs match, their endpoints leave, repeat until no edges
  * remain. Half-approximation of maximum weight matching.
  *
  * The reference jitters weights with a per-run RNG to break ties
  * (LocalMaxMatcher.cpp:36); we instead use a STRICT deterministic total order
  * (weight DESC, src ASC, dst ASC), so "locally maximum" is the per-node argmin of
  * an order key — reproducible across engines and partitionings, which is what lets
  * the DuckDB twin replay the rounds bit-for-bit.
  *
  * Distributed shape: per round the per-node dominant edge is one partial-aggregable
  * min(struct) over the remaining incident edges (map-side combine absorbs hubs); the
  * mutual-agreement check and the endpoint removal are semi/anti joins against the
  * (frontier-sized, shrinking) matched-node set. No collect, no windows.
  */
object Matching {

  /** Deterministic synthetic integer weight for the unweighted web edge table — the
    * same (src+dst)-derived weight family as q_sssp_weighted, so oracle replay is
    * exact integer arithmetic. */
  def syntheticWeight: org.apache.spark.sql.Column =
    lit(1L) + pmod(col("src") + col("dst"), lit(5L))

  /** `rounds` fixed local-max rounds over the canonical undirected edge set.
    * Returns the matched pairs (src, dst, w), src < dst. On graphs where the process
    * drains within `rounds` (spec-checked) this IS the LocalMaxMatcher matching. */
  def localMaxMatching(spark: SparkSession, g: LinkGraph, rounds: Int): DataFrame =
    matchEdges(
      g.canonicalUndirected.select(col("src"), col("dst"), syntheticWeight.as("w")),
      rounds)

  /** The general local-max rounds over ANY weighted edge set (src, dst, w) with
    * src < dst — also the matching engine inside the agglomerative clusterer, where
    * w is the integer modularity score. */
  def matchEdges(edges: DataFrame, rounds: Int): DataFrame = {
    var rem = edges.cutLineage
    var acc = rem.filter(lit(false)) // empty, typed (src, dst, w)
    var r = 0
    var drained = false
    while (r < rounds && !drained) {
      if (rem.isEmpty) drained = true
      else {
        // Dominant edge per node: argmin of (-w, src, dst) over incident edges.
        val inc = rem.select(col("src").as("x"), col("src"), col("dst"), col("w"))
          .union(rem.select(col("dst").as("x"), col("src"), col("dst"), col("w")))
        val best = inc
          .groupBy("x")
          .agg(min(struct((-col("w")).as("nw"), col("src"), col("dst"))).as("b"))
          .select(col("x"), col("b.src").as("bsrc"), col("b.dst").as("bdst"))
        val matched = rem
          .join(best.where(col("x") === col("bsrc"))
            .select(col("bsrc").as("src"), col("bdst").as("dst")), Seq("src", "dst"), "left_semi")
          .join(best.where(col("x") === col("bdst"))
            .select(col("bsrc").as("src"), col("bdst").as("dst")), Seq("src", "dst"), "left_semi")
          .cutLineage
        val mnodes = matched.select(col("src").as("id"))
          .union(matched.select(col("dst").as("id"))).distinct()
        val prevRem = rem
        val prevAcc = acc
        rem = rem
          .join(mnodes.withColumnRenamed("id", "src"), Seq("src"), "left_anti")
          .join(mnodes.withColumnRenamed("id", "dst"), Seq("dst"), "left_anti")
          .select("src", "dst", "w")
          .cutLineage
        acc = acc.union(matched).cutLineage
        prevRem.releaseState(); prevAcc.releaseState(); matched.releaseState()
        r += 1
      }
    }
    acc
  }

  /** True iff `matching(src,dst)` is a valid matching of g (no shared endpoints,
    * edges exist) — spec helper mirroring Matching::isProper
    * (matching/Matching.cpp:20-60). */
  def isProper(g: LinkGraph, matching: DataFrame): Boolean = {
    val ends = matching.select(col("src").as("id"))
      .union(matching.select(col("dst").as("id")))
    val dup = ends.groupBy("id").count().filter(col("count") > 1).count()
    val missing = matching.select("src", "dst")
      .join(g.canonicalUndirected.select("src", "dst"), Seq("src", "dst"), "left_anti")
      .count()
    dup == 0 && missing == 0
  }

  /** True iff no remaining edge has both endpoints unmatched (maximality). */
  def isMaximal(g: LinkGraph, matching: DataFrame): Boolean = {
    val ends = matching.select(col("src").as("id"))
      .union(matching.select(col("dst").as("id"))).distinct()
    g.canonicalUndirected
      .join(ends.withColumnRenamed("id", "src"), Seq("src"), "left_anti")
      .join(ends.withColumnRenamed("id", "dst"), Seq("dst"), "left_anti")
      .isEmpty
  }
}
