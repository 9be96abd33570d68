package graft.algo

import graft.DataFrameLineageOps

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.model.LinkGraph

/** Strongly connected components of the DIRECTED link graph
  * (/root/reference/networkit/cpp/components/StronglyConnectedComponents.cpp:25-120).
  *
  * The reference runs sequential Tarjan — inherently a single DFS stack, which does not
  * distribute. This is the standard distributed re-architecture (trim + forward-backward
  * coloring, Orzan's coloring algorithm / the FW-BW-Trim family used by every BSP graph
  * system), built from the engine's existing frontier primitives:
  *
  *   1. TRIM to a fixpoint: a node with no in-edge or no out-edge inside the remaining
  *      subgraph is its own (trivial) SCC — peels entire DAG tails/chains, which on a
  *      bowtie-shaped web graph is most of the vertex set.
  *   2. COLOR forward: color(v) = min node id that reaches v, by frontier-restricted
  *      min propagation along directed edges (the directed twin of
  *      ConnectedComponents.run's loop).
  *   3. BACKWARD sweep: from each root r (color(r) = r) walk the transpose restricted
  *      to color = r. Everything reached is exactly SCC(r), labeled r. Every SCC member
  *      reaches r (definition of color), so r is the SCC's MINIMUM id — the same
  *      min-node-id label semantics as connected components, and every color class's
  *      root SCC peels in the same round (many SCCs per outer round).
  *   4. Remove found SCCs, filter the edge set, repeat.
  *
  * Per outer round the moving data is frontier-sized messages over the remaining edge
  * set; outer rounds are few on web graphs (giant SCC + trimmed periphery). Output
  * (id, scc) for every vertex, execution-order independent (min is associative), hence
  * exactly reproducible across engines and parallelism levels.
  */
object Scc {

  final case class Result(labels: DataFrame, rounds: Int)

  def run(spark: SparkSession, g: LinkGraph, maxOuterRounds: Int = 64): Result = {
    var e = g.edges.select("src", "dst").distinct().cutLineage
    var remaining = g.vertices.select("id").cutLineage
    var out = g.vertices.filter(lit(false))
      .select(col("id"), lit(0L).as("scc")) // empty, typed
    var left = remaining.count()
    var rounds = 0

    while (left > 0 && rounds < maxOuterRounds) {
      // --- 1. trim to fixpoint: no in-edge or no out-edge => trivial SCC ---
      var trimming = true
      while (trimming && left > 0) {
        val hasOut = e.select(col("src").as("id")).distinct()
        val hasIn = e.select(col("dst").as("id")).distinct()
        val nontrivial = hasOut.join(hasIn, Seq("id"), "left_semi").cutLineage
        val trivial = remaining.join(nontrivial, Seq("id"), "left_anti").cutLineage
        val t = trivial.count()
        if (t == 0) { trimming = false; trivial.releaseState() }
        else {
          val prevOut = out
          out = out.union(trivial.select(col("id"), col("id").as("scc"))).cutLineage
          prevOut.releaseState()
          val prevRem = remaining
          remaining = nontrivial
          prevRem.releaseState()
          val prevE = e
          e = e.join(remaining.withColumnRenamed("id", "src"), Seq("src"), "left_semi")
            .join(remaining.withColumnRenamed("id", "dst"), Seq("dst"), "left_semi")
            .select("src", "dst").cutLineage
          prevE.releaseState(); trivial.releaseState()
          left -= t
        }
      }
      if (left > 0) {
        // --- 2. forward min-id coloring to fixpoint (frontier-restricted) ---
        var color = remaining.select(col("id"), col("id").as("color")).cutLineage
        var frontier = color
        var active = left
        while (active > 0) {
          val msgs = e.join(frontier.withColumnRenamed("id", "src"), "src")
            .groupBy(col("dst").as("id")).agg(min("color").as("cand"))
          val next = color.join(msgs, Seq("id"), "left")
            .select(col("id"),
              least(col("color"), coalesce(col("cand"), col("color"))).as("color"),
              (col("cand") < col("color")).as("changed"))
            .cutLineage
          val prevColor = color
          frontier = next.filter(col("changed")).select("id", "color").cutLineage
          active = frontier.count()
          color = next.select("id", "color").cutLineage
          prevColor.releaseState(); next.releaseState()
        }
        // --- 3. backward sweep from roots, restricted to same color ---
        val colored = color.persist(StorageLevel.MEMORY_AND_DISK)
        var members = colored.filter(col("id") === col("color"))
          .select(col("id"), col("color")).cutLineage
        var bf = members
        var grow = bf.count()
        while (grow > 0) {
          val cand = e.join(bf.withColumnRenamed("id", "dst"), "dst")
            .select(col("src").as("id"), col("color")).distinct()
          val inColor = cand.join(colored.withColumnRenamed("color", "c"), "id")
            .filter(col("color") === col("c")).select("id", "color")
          val fresh = inColor.join(members, Seq("id"), "left_anti").cutLineage
          grow = fresh.count()
          if (grow > 0) {
            val prevM = members
            members = members.union(fresh).cutLineage
            prevM.releaseState()
            bf = fresh
          }
        }
        // --- 4. peel the found SCCs ---
        val found = members.count()
        val prevOut = out
        out = out.union(members.select(col("id"), col("color").as("scc"))).cutLineage
        prevOut.releaseState()
        val prevRem = remaining
        remaining = remaining.join(members.select("id"), Seq("id"), "left_anti").cutLineage
        prevRem.releaseState()
        val prevE = e
        e = e.join(remaining.withColumnRenamed("id", "src"), Seq("src"), "left_semi")
          .join(remaining.withColumnRenamed("id", "dst"), Seq("dst"), "left_semi")
          .select("src", "dst").cutLineage
        prevE.releaseState()
        colored.unpersist(); members.releaseState()
        left -= found
      }
      rounds += 1
    }
    require(left == 0, s"SCC did not converge in $maxOuterRounds outer rounds")
    Result(out, rounds)
  }
}
