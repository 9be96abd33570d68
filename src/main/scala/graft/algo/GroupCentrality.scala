package graft.algo

import graft.DataFrameLineageOps

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.model.LinkGraph

/** Group-degree centrality (/root/reference/networkit/cpp/centrality/GroupDegree.cpp:
  * 41-150): greedily build a k-node group maximizing the number of nodes reachable in
  * one hop (group members count themselves, countGroupNodes=true). Each greedy step
  * picks the node with the highest marginal gain = its not-yet-reachable neighbors
  * (+1 if itself unreachable), then marks it and its neighborhood reachable.
  *
  * The reference's bucket-queue extractMin breaks gain ties by queue insertion order;
  * this engine uses the deterministic (gain DESC, id ASC) argmax instead — documented
  * divergence, reproducible at any parallelism and replayable by the DuckDB twin
  * (OracleSql.groupDegree).
  *
  * Spark shape per step: one aggregation over the bidirected edges filtered to
  * not-yet-reachable targets (m-row scan, map-side partial agg) + one argmax — k
  * driver-loop steps of bounded-size state (the group and reachable set live as
  * DataFrames, never collected beyond the 1-row argmax).
  */
object GroupCentrality {

  /** Greedy group of size k: output (ord, id, gain) — selection order, chosen node,
    * marginal gain at selection time. */
  def groupDegree(spark: SparkSession, g: LinkGraph, k: Int): DataFrame = {
    val bi = g.bidirected.select("src", "dst").persist(StorageLevel.MEMORY_AND_DISK)
    bi.count()
    var group = g.vertices.filter(lit(false))
      .select(col("id"), lit(0L).as("ord"), lit(0L).as("gain")) // empty, typed
    var reachable = g.vertices.filter(lit(false)).select("id")
    var ord = 0L
    while (ord < k) {
      val nonReach = g.vertices.join(reachable, Seq("id"), "left_anti")
      val nbrGain = bi
        .join(nonReach.withColumnRenamed("id", "dst"), "dst")
        .groupBy(col("src").as("id")).agg(count(lit(1)).as("ng"))
      val gains = g.vertices
        .join(group.select("id"), Seq("id"), "left_anti")
        .join(nbrGain, Seq("id"), "left")
        .join(nonReach.withColumn("selfg", lit(1L)), Seq("id"), "left")
        .select(col("id"),
          (coalesce(col("ng"), lit(0L)) + coalesce(col("selfg"), lit(0L))).as("gain"))
      val best = gains
        .agg(max(struct(col("gain"), (-col("id")).as("nid"))).as("top"))
        .select((-col("top.nid")).as("id"), col("top.gain").as("gain"))
      val chosen = best.select(col("id"), lit(ord).as("ord"), col("gain")).cutLineage
      group = group.union(chosen).cutLineage
      reachable = reachable
        .union(chosen.select("id"))
        .union(bi.join(chosen.select(col("id").as("src")), "src").select(col("dst").as("id")))
        .distinct().cutLineage
      ord += 1
    }
    bi.unpersist()
    group.select(col("ord"), col("id"), col("gain"))
  }

  /** GroupCloseness (/root/reference/networkit/cpp/centrality/GroupCloseness.cpp:
    * 81-214): greedily build a k-node group minimizing the sum of hop distances to
    * the group. The reference seeds with the top-closeness/max-degree node, keeps a
    * distance vector d[v] = dist(v, S), and per step picks the candidate u with the
    * largest improvement Σ_v (d[v] − min(d[v], dist(u,v))), evaluated by pruned
    * per-candidate BFS.
    *
    * Distributed re-architecture: per-candidate sequential BFS does not distribute,
    * but the candidate distances dist(u,·) are FIXED across greedy rounds — so one
    * batched multi-source BFS from a degree-capped candidate pool (top `poolSize` by
    * (degree DESC, id ASC); the reference's own H>0 path seeds by max degree)
    * computes every distance once, and each greedy round is a single aggregation
    * over that state + a 1-row argmax. Unreachable distance = n (sentinel; exact
    * integers throughout, DuckDB twin = OracleSql.groupCloseness). Capping the pool
    * is the scale deviation (documented): at 100 TB the pool is the only state whose
    * BFS reach is materialized, (poolSize × reach) rows, same shape as sampled APSP.
    *
    * Output (ord, id, gain): seed gain = Σ_v (n − dist(seed,v)). */
  def groupCloseness(spark: SparkSession, g: LinkGraph, k: Int, poolSize: Int = 16,
                     maxLevels: Int = 15): DataFrame = {
    val n = g.n
    val deg = g.bidirected.select("src", "dst")
      .groupBy(col("src").as("id")).agg(count(lit(1)).as("d"))
    val pool = g.vertices.join(deg, Seq("id"), "left")
      .select(col("id"), coalesce(col("d"), lit(0L)).as("d"))
      .orderBy(desc("d"), asc("id")).limit(poolSize).select("id")
      .cutLineage
    // dist(s, v) for every pool source, one batched msBFS (dist <= maxLevels)
    val (state, _) = Betweenness.msBfs(spark, g, pool, maxLevels)
    val dist = state.select("s", "id", "dist").persist(StorageLevel.MEMORY_AND_DISK)
    dist.count()
    val seed = pool.orderBy(asc("id"))
      .join(deg, Seq("id"), "left")
      .select(col("id"), coalesce(col("d"), lit(0L)).as("d"))
      .agg(max(struct(col("d"), (-col("id")).as("nid"))).as("t"))
      .select((-col("t.nid")).as("id")).head().getLong(0)
    // d(v) = dist(v, S); sentinel n where unreached
    var dS = g.vertices
      .join(dist.filter(col("s") === seed).select(col("id"), col("dist")), Seq("id"), "left")
      .select(col("id"), coalesce(col("dist"), lit(n)).as("dist"))
      .cutLineage
    val seedGain = dS.agg(sum(lit(n) - col("dist"))).head().getLong(0)
    var rows = Seq((0L, seed, seedGain))
    var selected = Set(seed)
    var ord = 1L
    while (ord < k) {
      val cand = dist.filter(!col("s").isin(selected.toSeq: _*))
      val gains = cand.join(dS.withColumnRenamed("dist", "dcur"), "id")
        .groupBy("s")
        .agg(sum(when(col("dcur") > col("dist"), col("dcur") - col("dist"))
          .otherwise(0L)).as("gain"))
      val best = gains
        .agg(max(struct(col("gain"), (-col("s")).as("nid"))).as("t"))
        .select((-col("t.nid")).as("id"), col("t.gain").as("gain")).head()
      val chosen = best.getLong(0)
      rows :+= ((ord, chosen, best.getLong(1)))
      selected += chosen
      val prev = dS
      dS = dS.join(dist.filter(col("s") === chosen)
          .select(col("id"), col("dist").as("nd")), Seq("id"), "left")
        .select(col("id"), least(col("dist"), coalesce(col("nd"), col("dist"))).as("dist"))
        .cutLineage
      prev.releaseState()
      ord += 1
    }
    dist.unpersist(); state.releaseState(); pool.releaseState()
    import spark.implicits._
    rows.toDF("ord", "id", "gain")
  }
}
