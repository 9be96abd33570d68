package graft.algo

import graft.DataFrameLineageOps

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.model.LinkGraph

/** PLM — multilevel parallel Louvain (/root/reference/networkit/cpp/community/PLM.cpp:29-340),
  * the reference's default community detector (`networkit/community.py:31-38`).
  *
  * Per level: local-moving phase — every node considers its neighboring communities D
  * and moves to the best one if the modularity gain is positive
  * (`PLM.cpp:140-146`):
  *
  *   ΔQ(u, C→D) = (aff_D − aff_C)/ω + γ·((vol(C∖u) − vol(D∖u))·vol(u)) / (2ω²)
  *
  * with aff_X = Σ w(u,v) over neighbors v in X (self-loops excluded, `:92-96`),
  * vol(u) = weightedDegree(u) + w(u,u) (`:48-52`), ω = total edge weight. Then the
  * graph is coarsened by the level's partition (ParallelPartitionCoarsening — intra-
  * community weight becomes a self-loop row) and PLM recurses; the coarse labels are
  * prolonged back (`:247-273,321-339`).
  *
  * The reference moves asynchronously under OpenMP (racy by design); this engine runs
  * synchronous (Jacobi) rounds with a deterministic tie-break (max gain, then smallest
  * community id), so results are reproducible at any parallelism.
  *
  * Gains are compared in CLEARED-DENOMINATOR INTEGER form: at γ=1,
  * ΔQ·2ω² = 2ω(aff_D − aff_C) + ((vol(C∖u) − vol(D∖u))·vol(u)), and every term is an
  * exact int64 (weights are integer-valued at every level: 1 at level 0, sums after
  * coarsening). Integer compares are order-independent, so the result is bit-identical
  * across engines and partitionings — this is what lets the DuckDB oracle replay the
  * whole multilevel recursion (`OracleSql.plm`). Exact while ω < ~2^31 (≈2B edges);
  * beyond that swap the gain column to DecimalType(38,0) — same plan shape.
  *
  * Spark shape per round: one groupBy for the batch's affinities (the m-row shuffle),
  * two n-row aggregations for volumes, one argmax — the same shuffle budget as a PLP
  * round. Gains are computed ONLY for the round's parity batch, not all nodes.
  */
object PLM {

  final case class Result(labels: DataFrame, levels: Int, rounds: Int)

  /** edges: (src, dst, weight) one row per logical undirected edge, src<=dst, MAY
    * contain self-loops (coarse levels); weights must be integer-valued. Returns
    * (id, label) over `vertices` after `maxRounds` synchronous rounds (early exit on a
    * full quiet batch cycle unless `fixedSchedule`). */
  private def movePhase(spark: SparkSession, vertices: DataFrame, edges: DataFrame,
                        maxRounds: Int, batches: Int,
                        fixedSchedule: Boolean,
                        init: Option[DataFrame] = None): (DataFrame, Int) = {
    val e = edges.select(col("src"), col("dst"), col("weight").cast("long").as("w"))
    // Bidirected non-loop view for neighbor expansion.
    val nonLoop = e.filter(col("src") =!= col("dst"))
    val bi = nonLoop.union(
      nonLoop.select(col("dst").as("src"), col("src").as("dst"), col("w")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val loops = e.filter(col("src") === col("dst"))
      .select(col("src").as("id"), col("w").as("lw"))
    // vol(u) = weightedDegree + w(u,u) [loop counted twice: once in wdeg once more here]
    val volNode = vertices
      .join(bi.groupBy(col("src").as("id")).agg(sum("w").as("wd")), Seq("id"), "left")
      .join(loops, Seq("id"), "left")
      .select(col("id"),
        (coalesce(col("wd"), lit(0L)) + lit(2L) * coalesce(col("lw"), lit(0L))).as("vol"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val omega = e.agg(sum("w")).head().getLong(0)

    var labels = init.getOrElse(vertices.select(col("id"), col("id").as("label"))).cutLineage
    var round = 0
    var quiet = 0 // consecutive quiet rounds (a full cycle of batches = stable)
    while ((fixedSchedule || quiet < batches) && round < maxRounds) {
      val volComm = volNode.join(labels, "id").groupBy("label").agg(sum("vol").as("volC"))
      // Parity gating: only one batch of nodes (id parity == round parity) moves per
      // round. The reference's async execution never moves two adjacent nodes at the
      // same instant; a pure Jacobi update would let symmetric pairs swap communities
      // forever (2-cycles). Alternating batches is deterministic and breaks every
      // symmetric oscillation; convergence = a full quiet batch cycle. The affinity
      // aggregation is restricted to the batch up front — 1/batches of the shuffle.
      val batchSrc = pmod(col("src"), lit(batches.toLong)) === lit((round % batches).toLong)
      val aff = bi.filter(batchSrc)
        .join(labels.select(col("id").as("dst"), col("label").as("d")), "dst")
        .groupBy(col("src").as("id"), col("d"))
        .agg(sum("w").as("aff"))
      val withOwn = aff
        .join(labels, "id")
        .join(volNode, "id")
        .join(volComm.select(col("label").as("d"), col("volC").as("volD")), "d")
        .join(volComm, Seq("label"))
      // aff toward own community (0 if no intra neighbor)
      val ownAff = withOwn.filter(col("d") === col("label"))
        .select(col("id"), col("aff").as("affC"))
      // ΔQ·2ω² — exact int64 at γ=1 (see scaladoc).
      val gains = withOwn.filter(col("d") =!= col("label"))
        .join(ownAff, Seq("id"), "left")
        .select(col("id"), col("label"), col("d"),
          (lit(2L) * lit(omega) * (col("aff") - coalesce(col("affC"), lit(0L))) +
            ((col("volC") - col("vol")) - col("volD")) * col("vol")).as("gain"))
      val best = gains
        .groupBy("id")
        .agg(max(struct(col("gain"), (-col("d")).as("nd"))).as("top"))
        .select(col("id"), col("top.gain").as("gain"), (-col("top.nd")).as("best"))
        .filter(col("gain") > 0L)
      val next = labels.join(best.select(col("id"), col("best")), Seq("id"), "left")
        .select(col("id"), coalesce(col("best"), col("label")).as("label"),
          col("best").isNotNull.as("changed"))
        .cutLineageLazy
      if (fixedSchedule) {
        next.count() // materialize the lazy checkpoint
      } else {
        val moved = next.filter(col("changed")).count()
        quiet = if (moved == 0) quiet + 1 else 0
      }
      val prev = labels
      labels = next.select("id", "label").cutLineage
      prev.releaseState()
      next.releaseState()
      round += 1
    }
    bi.unpersist(); volNode.unpersist()
    (labels, round)
  }

  /** Weighted coarsening with self-loops (ParallelPartitionCoarsening semantics,
    * coarsening/ParallelPartitionCoarsening.cpp:22-136). */
  private def coarsenW(edges: DataFrame, labels: DataFrame): DataFrame =
    edges
      .join(labels.select(col("id").as("src"), col("label").as("ls")), "src")
      .join(labels.select(col("id").as("dst"), col("label").as("ld")), "dst")
      .select(least(col("ls"), col("ld")).as("src"),
        greatest(col("ls"), col("ld")).as("dst"), col("weight"))
      .groupBy("src", "dst").agg(sum("weight").as("weight"))

  /** Adaptive multilevel run (the production entry point): move until a full quiet
    * batch cycle, coarsen while communities keep merging, prolong. γ=1.
    * `refine` = the reference's optional refinement pass (PLM.cpp:275-296,
    * constructor default false): after prolongation, one more move phase on the FINE
    * graph seeded with the prolonged partition — individual nodes may defect to a
    * better neighboring community that only became visible at fine granularity. */
  def run(spark: SparkSession, g: LinkGraph,
          maxRounds: Int = 32, maxLevels: Int = 10, batches: Int = 4,
          refine: Boolean = false): Result = {
    var edges = g.canonicalUndirected.persist(StorageLevel.MEMORY_AND_DISK)
    var vertices = g.vertices
    var labels: DataFrame = null // fine labels accumulated through prolongation
    var level = 0
    var totalRounds = 0
    var done = false
    while (!done && level < maxLevels) {
      val (lv, rounds) = movePhase(spark, vertices, edges, maxRounds, batches,
        fixedSchedule = false)
      totalRounds += rounds
      val k = lv.select("label").distinct().count()
      val n = vertices.count()
      labels =
        if (labels == null) lv
        else labels.select(col("id"), col("label").as("coarse"))
          .join(lv.select(col("id").as("coarse"), col("label")), "coarse")
          .select(col("id"), col("label")).cutLineage
      if (k == n) done = true // no merge happened at this level
      else {
        val coarse = coarsenW(edges, lv).persist(StorageLevel.MEMORY_AND_DISK)
        coarse.count()
        edges.unpersist()
        edges = coarse
        vertices = lv.select(col("label").as("id")).distinct().cutLineage
        level += 1
      }
    }
    if (refine) {
      val (refined, r) = movePhase(spark, g.vertices,
        g.canonicalUndirected, maxRounds, batches,
        fixedSchedule = false, init = Some(labels))
      totalRounds += r
      labels = refined
    }
    Result(labels, level + 1, totalRounds)
  }

  /** Fixed-schedule run for the cross-engine oracle: exactly `rounds` move rounds at
    * each of `levels` levels, always coarsening between levels — fully deterministic
    * and unrollable as chained CTEs (OracleSql.plm replays it bit-for-bit in DuckDB). */
  def runFixed(spark: SparkSession, g: LinkGraph, rounds: Int, levels: Int,
               batches: Int = 4): DataFrame = {
    var edges = g.canonicalUndirected.persist(StorageLevel.MEMORY_AND_DISK)
    var vertices = g.vertices
    var labels: DataFrame = null
    var level = 0
    while (level < levels) {
      val (lv, _) = movePhase(spark, vertices, edges, rounds, batches,
        fixedSchedule = true)
      labels =
        if (labels == null) lv
        else labels.select(col("id"), col("label").as("coarse"))
          .join(lv.select(col("id").as("coarse"), col("label")), "coarse")
          .select(col("id"), col("label")).cutLineage
      if (level < levels - 1) {
        val coarse = coarsenW(edges, lv).persist(StorageLevel.MEMORY_AND_DISK)
        coarse.count()
        edges.unpersist()
        edges = coarse
        vertices = lv.select(col("label").as("id")).distinct().cutLineage
      }
      level += 1
    }
    labels
  }
}
