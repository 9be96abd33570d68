package graft.algo

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.model.LinkGraph
import graft.iterate.IterativeJob

/** Connected components by union-by-min label propagation (the role the reference's
  * structures/UnionFind.h sequential DSU plays), the algorithm of
  * ParallelConnectedComponents
  * (/root/reference/networkit/cpp/components/ParallelConnectedComponents.cpp:20-95):
  *
  *   - every node starts with its own id as label (:29-36, allToSingletons);
  *   - each round a node takes the min of its own and its neighbors' labels (:55-77);
  *   - only *active* nodes (whose neighborhood changed) do work — here the active set is
  *     a frontier DataFrame of nodes whose label shrank last round, and messages flow only
  *     out of the frontier (the distributed analog of the activeness flags :67-74);
  *   - after 8 rounds the graph is coarsened by current labels and the algorithm recurses
  *     on the (much smaller) label graph, then projects back (:49,81-94).
  *
  * The fixpoint is the per-component minimum node id — execution-order independent, hence
  * "labels match exactly" across engines and parallelism levels. Undirected semantics: the
  * directed edge table is expanded to its bidirected view (this equals WCC for the
  * directed web graph, WeaklyConnectedComponents.cpp:32-60).
  */
object ConnectedComponents {

  final case class Result(labels: DataFrame, rounds: Int)

  def run(spark: SparkSession, g: LinkGraph,
          checkpointDir: Option[String] = None,
          coarsenAfter: Int = 8): Result = {
    val bi = g.bidirected.select(col("src"), col("dst")).persist(StorageLevel.MEMORY_AND_DISK)
    bi.count()
    val r = iterate(spark, g.vertices, bi, checkpointDir, coarsenAfter, depth = 0)
    bi.unpersist()
    r
  }

  private def iterate(spark: SparkSession, vertices: DataFrame, bi: DataFrame,
                      checkpointDir: Option[String], coarsenAfter: Int, depth: Int): Result = {
    val job = IterativeJob(spark, checkpointDir, s"cc_d$depth")
    val resumeFrom = job.lastCompleteIteration
    var labels = if (resumeFrom >= 0) job.load(resumeFrom).select("id", "label")
                 else job.init(vertices.select(col("id"), col("id").as("label")))
    // Frontier: nodes whose label changed last round (initially: everyone).
    var frontier = if (resumeFrom >= 0) job.load(resumeFrom).filter(col("changed")).select("id", "label")
                   else labels
    var round = resumeFrom + 1
    var active = if (resumeFrom >= 0) frontier.count() else 1L
    while (active > 0 && round < coarsenAfter) {
      // Messages only from the frontier — neighbors of unchanged nodes see nothing new.
      val msgs = bi
        .join(frontier.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst")).agg(min(col("label")).as("cand"))
        .withColumnRenamed("dst", "id")
      val next = labels.join(msgs, Seq("id"), "left")
        .select(col("id"), least(col("label"), coalesce(col("cand"), col("label"))).as("label"),
          (col("cand") < col("label")).as("changed"))
      val stepped = job.step(round, next.select("id", "label", "changed"))
      frontier = stepped.filter(col("changed")).select("id", "label")
      active = frontier.count()
      job.recordMetric(round, "changed", active.toDouble)
      labels = stepped.select("id", "label")
      round += 1
    }
    if (active == 0) Result(labels, round)
    else {
      // Coarsen by current labels and recurse (reference :81-94): the label graph is
      // geometrically smaller, so convergence completes on cheap shuffles.
      val lsrc = labels.withColumnRenamed("id", "src").withColumnRenamed("label", "lsrc")
      val ldst = labels.withColumnRenamed("id", "dst").withColumnRenamed("label", "ldst")
      val coarseEdges = bi.join(lsrc, "src").join(ldst, "dst")
        .filter(col("lsrc") =!= col("ldst"))
        .select(col("lsrc").as("src"), col("ldst").as("dst"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
      val coarseVerts = labels.select(col("label").as("id")).distinct()
      val sub = iterate(spark, coarseVerts, coarseEdges, checkpointDir, Int.MaxValue, depth + 1)
      // Project back: fine label -> coarse component label.
      val coarseMap = sub.labels.select(col("id").as("label"), col("label").as("comp"))
      val projected = labels
        .join(coarseMap, "label")
        .select(col("id"), col("comp").as("label"))
      coarseEdges.unpersist()
      Result(projected, round + sub.rounds)
    }
  }
}
