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
  * community id), so results are reproducible at any parallelism. All sums stay exact:
  * weights are integer-valued doubles (< 2^53), so aggregation order cannot change a
  * gain comparison.
  *
  * Spark shape per round: one groupBy for affinities (the m-row shuffle), two n-row
  * aggregations for volumes, one argmax — the same shuffle budget as a PLP round.
  */
object PLM {

  final case class Result(labels: DataFrame, levels: Int, rounds: Int)

  /** edges: (src, dst, weight) one row per logical undirected edge, src<=dst, MAY
    * contain self-loops (coarse levels). Returns (id, label) over `vertices`. */
  private def movePhase(spark: SparkSession, vertices: DataFrame, edges: DataFrame,
                        gamma: Double, maxRounds: Int, batches: Int): (DataFrame, Int) = {
    // Bidirected non-loop view for neighbor expansion.
    val nonLoop = edges.filter(col("src") =!= col("dst"))
    val bi = nonLoop.union(
      nonLoop.select(col("dst").as("src"), col("src").as("dst"), col("weight")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val loops = edges.filter(col("src") === col("dst"))
      .select(col("src").as("id"), col("weight").as("lw"))
    // vol(u) = weightedDegree + w(u,u) [counted twice: once in wdeg once more here]
    val volNode = vertices
      .join(bi.groupBy(col("src").as("id")).agg(sum("weight").as("wd")), Seq("id"), "left")
      .join(loops, Seq("id"), "left")
      .select(col("id"),
        (coalesce(col("wd"), lit(0.0)) + lit(2.0) * coalesce(col("lw"), lit(0.0))).as("vol"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val omega = edges.agg(sum("weight")).head().getDouble(0)

    var labels = vertices.select(col("id"), col("id").as("label")).cutLineage
    var round = 0
    var quiet = 0 // consecutive quiet rounds (a full cycle of batches = stable)
    while (quiet < batches && round < maxRounds) {
      val volComm = volNode.join(labels, "id").groupBy("label").agg(sum("vol").as("volC"))
      // affinity of u toward each neighboring community D (and its own C)
      val aff = bi
        .join(labels.select(col("id").as("dst"), col("label").as("d")), "dst")
        .groupBy(col("src").as("id"), col("d"))
        .agg(sum("weight").as("aff"))
      val withOwn = aff
        .join(labels, "id")
        .join(volNode, "id")
        .join(volComm.select(col("label").as("d"), col("volC").as("volD")), "d")
        .join(volComm, Seq("label"))
      // aff toward own community (0 if no intra neighbor)
      val ownAff = withOwn.filter(col("d") === col("label"))
        .select(col("id"), col("aff").as("affC"))
      val gains = withOwn.filter(col("d") =!= col("label"))
        .join(ownAff, Seq("id"), "left")
        .select(col("id"), col("label"), col("d"), col("vol"),
          ((col("aff") - coalesce(col("affC"), lit(0.0))) / omega +
            lit(gamma) * (((col("volC") - col("vol")) - col("volD")) * col("vol")) /
              (2.0 * omega * omega)).as("gain"))
      // Parity gating: only half the nodes move per round (id parity == round
      // parity). The reference's async execution never moves two adjacent nodes at
      // the same instant; a pure Jacobi update would let symmetric pairs swap
      // communities forever (2-cycles). Alternating halves is deterministic and
      // breaks every symmetric oscillation; convergence = an even+odd pair of
      // quiet rounds.
      val best = gains
        .filter(pmod(col("id"), lit(batches.toLong)) === (round % batches).toLong)
        .groupBy("id")
        .agg(max(struct(col("gain"), (-col("d")).as("nd"))).as("top"))
        .select(col("id"), col("top.gain").as("gain"), (-col("top.nd")).as("best"))
        .filter(col("gain") > 0)
      val next = labels.join(best.select(col("id"), col("best")), Seq("id"), "left")
        .select(col("id"), coalesce(col("best"), col("label")).as("label"),
          col("best").isNotNull.as("changed"))
        .cutLineageLazy
      val moved = next.filter(col("changed")).count()
      if (sys.env.contains("PLM_DEBUG"))
        println(s"PLMROUND round=$round moved=$moved t=${System.nanoTime() / 1000000}" +
          s" leaves=${next.queryExecution.analyzed.collectLeaves().size}" +
          s" nodes=${next.queryExecution.analyzed.collect { case p => p }.size}" +
          s" labelLeaves=${labels.queryExecution.analyzed.collectLeaves().size}")
      quiet = if (moved == 0) quiet + 1 else 0
      val prev = labels
      labels = next.select("id", "label").cutLineage
      prev.unpersist(false)
      next.unpersist(false)
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

  def run(spark: SparkSession, g: LinkGraph, gamma: Double = 1.0,
          maxRounds: Int = 32, maxLevels: Int = 10, batches: Int = 4): Result = {
    var edges = g.canonicalUndirected.persist(StorageLevel.MEMORY_AND_DISK)
    var vertices = g.vertices
    var labels: DataFrame = null // fine labels accumulated through prolongation
    var level = 0
    var totalRounds = 0
    var done = false
    while (!done && level < maxLevels) {
      val (lv, rounds) = movePhase(spark, vertices, edges, gamma, maxRounds, batches)
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
    Result(labels, level + 1, totalRounds)
  }
}
