package graft.algo

import graft.DataFrameLineageOps

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.LinkGraph
import graft.synth.GraphSpec.{lcg, M}

/** Luby's maximal independent set
  * (/root/reference/networkit/cpp/independentset/Luby.cpp:15-95, the concrete
  * IndependentSetFinder.h implementation): per round, each
  * still-active node enters the candidate set S with probability 1/(2·wdeg(v)) where
  * wdeg is the weighted degree over ACTIVE neighbors; for every active edge inside S
  * the lower-weighted-degree endpoint is dropped (ties drop the canonical-second
  * endpoint, Luby.cpp:60-72); the surviving S' is independent, joins the MIS, and
  * S' plus its neighborhood deactivates. Expected O(log n) rounds.
  *
  * The reference draws from a per-run RNG; we draw from the shared deterministic
  * nonlinear LCG on (node, round, seed) — same family as EdgeScores.randomEdgeScore —
  * with the membership test done in exact int64 arithmetic
  * (draw < M / (2·wdeg), integer division), so the DuckDB twin replays every round
  * bit-for-bit. Isolated-among-active nodes (wdeg = 0, reference probability 1/0 → 1)
  * always enter S and never conflict.
  *
  * Distributed shape: per round one aggregation over the still-active edge set for
  * wdeg (partial-agg absorbs hubs), pure column expressions for the draw, and
  * frontier-sized joins for conflict resolution and deactivation. The active edge set
  * only shrinks.
  */
object IndependentSet {

  /** `rounds` fixed Luby rounds; returns the independent set built so far as
    * (id) rows — a maximal independent set once the process drains
    * (spec-checked on fixtures; every prefix is independent). */
  def lubyFixed(spark: SparkSession, g: LinkGraph, rounds: Int, seed: Long = 42L): DataFrame = {
    // Integer multiplicity weight (1 or 2 on a merged antiparallel pair) — the same
    // weighted view PLP's oracle uses, keeping wdeg integer-exact.
    var active = g.vertices.select("id").cutLineage
    var edges = g.edges
      .select(least(col("src"), col("dst")).as("s"), greatest(col("src"), col("dst")).as("t"))
      .groupBy("s", "t").agg(count(lit(1)).as("w"))
      .cutLineage
    var mis = active.filter(lit(false)) // empty, typed (id)
    var r = 1
    var drained = false
    while (r <= rounds && !drained) {
      if (active.isEmpty) drained = true
      else {
        val wdeg = active.join(
          edges.select(col("s").as("id"), col("w"))
            .union(edges.select(col("t").as("id"), col("w")))
            .groupBy("id").agg(sum("w").as("wd")),
          Seq("id"), "left")
          .select(col("id"), coalesce(col("wd"), lit(0L)).as("wd"))
        val x = s"(id * 1000003 + $r * 7919 + $seed)"
        val draw = s"(((${lcg(x)} * ${lcg(s"($x) + 1000003")}) div 65536) % $M)"
        // `div` (integer division) — Spark's `/` on longs is a DOUBLE divide and
        // would diverge from the DuckDB twin's `//`.
        val s0 = wdeg.filter(col("wd") === 0L ||
          expr(s"$draw < ($M div (2 * wd))")).cutLineage
        // Conflict edges inside S: drop t when wd(s) >= wd(t), else drop s
        // (reference tie-break drops the edge's second endpoint, Luby.cpp:70).
        val losers = edges
          .join(s0.select(col("id").as("s"), col("wd").as("wds")), Seq("s"))
          .join(s0.select(col("id").as("t"), col("wd").as("wdt")), Seq("t"))
          .select(when(col("wds") >= col("wdt"), col("t")).otherwise(col("s")).as("id"))
          .distinct()
        val sPrime = s0.select("id").join(losers, Seq("id"), "left_anti").cutLineage
        val removed = sPrime
          .union(edges.join(sPrime.withColumnRenamed("id", "s"), Seq("s"), "left_semi")
            .select(col("t").as("id")))
          .union(edges.join(sPrime.withColumnRenamed("id", "t"), Seq("t"), "left_semi")
            .select(col("s").as("id")))
          .distinct()
        val prevActive = active; val prevEdges = edges; val prevMis = mis
        mis = mis.union(sPrime.select("id")).cutLineage
        active = active.join(removed, Seq("id"), "left_anti").cutLineage
        edges = edges
          .join(active.withColumnRenamed("id", "s"), Seq("s"), "left_semi")
          .join(active.withColumnRenamed("id", "t"), Seq("t"), "left_semi")
          .select("s", "t", "w")
          .cutLineage
        prevActive.releaseState(); prevEdges.releaseState(); prevMis.releaseState()
        s0.releaseState(); sPrime.releaseState()
        r += 1
      }
    }
    mis
  }

  /** Spec helper: no edge of g has both endpoints in `set(id)`. */
  def isIndependent(g: LinkGraph, set: DataFrame): Boolean =
    g.canonicalUndirected
      .join(set.withColumnRenamed("id", "src"), Seq("src"), "left_semi")
      .join(set.withColumnRenamed("id", "dst"), Seq("dst"), "left_semi")
      .isEmpty

  /** Spec helper: every node outside `set` has a neighbor in `set` (maximality;
    * isolated nodes must be IN the set). */
  def isMaximal(g: LinkGraph, set: DataFrame): Boolean = {
    val covered = g.bidirected
      .join(set.withColumnRenamed("id", "src"), Seq("src"), "left_semi")
      .select(col("dst").as("id"))
      .union(set)
      .distinct()
    g.vertices.join(covered, Seq("id"), "left_anti").isEmpty
  }
}
