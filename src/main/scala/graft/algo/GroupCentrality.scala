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
}
