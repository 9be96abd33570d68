package graft.streaming

import graft.DataFrameLineageOps

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Dynamic-graph event streaming — the Structured Streaming analog of the reference's
  * dynamics stack (/root/reference/networkit/cpp/dynamics/GraphEvent.h:24-39,
  * DGSStreamParser.cpp:18-120 + io/DGSReader.h, GraphUpdater.cpp,
  * base/DynAlgorithm.h:21-26, dynamics/GraphEventHandler.h).
  *
  * Events: EDGE_ADDITION ("ae"), EDGE_REMOVAL ("re"), EDGE_WEIGHT_UPDATE ("ce"),
  * NODE_ADDITION ("an"), NODE_REMOVAL ("rn"), TIME_STEP ("st"). The reference replays a
  * totally-ordered DGS file; here events arrive as a stream with event-time
  * (`TIME_STEP` generalizes to watermarks), state folds per micro-batch via
  * `foreachBatch`, and incremental algorithms (DynConnectedComponents insert path) warm-
  * start from the previous result instead of recomputing.
  */
object GraphEvents {

  val schema = "etype string, u bigint, v bigint, w double, ts timestamp"

  /** Parse DGS-style lines `"<op> <u> [<v> [<w>]]"` into typed event rows
    * (DGSStreamParser.cpp:18-60; numeric ids, 0-based). Works on both batch and
    * streaming DataFrames of a single `value` string column. */
  def parseDgs(lines: DataFrame): DataFrame =
    lines
      .select(split(trim(col("value")), "\\s+").as("f"))
      .filter(size(col("f")) >= 1 && col("f").getItem(0).isin("ae", "re", "ce", "an", "rn", "st"))
      .select(
        col("f").getItem(0).as("etype"),
        expr("get(f, 1)").cast("long").as("u"),
        expr("get(f, 2)").cast("long").as("v"),
        coalesce(expr("get(f, 3)").cast("double"), lit(1.0)).as("w"))

  /** Fold one micro-batch of events onto an edge table (GraphUpdater semantics with
    * per-batch set semantics: additions ∪, weight updates overwrite, removals \). */
  def applyBatch(edges: DataFrame, events: DataFrame): DataFrame = {
    val adds = events.filter(col("etype") === "ae")
      .select(col("u").as("src"), col("v").as("dst"), col("w").as("weight"))
    val updates = events.filter(col("etype") === "ce")
      .select(col("u").as("src"), col("v").as("dst"), col("w").as("nw"))
    val removes = events.filter(col("etype") === "re")
      .select(col("u").as("src"), col("v").as("dst"))
    edges
      .unionByName(adds)
      .groupBy("src", "dst").agg(max("weight").as("weight"))
      .join(updates, Seq("src", "dst"), "left")
      .select(col("src"), col("dst"), coalesce(col("nw"), col("weight")).as("weight"))
      .join(removes, Seq("src", "dst"), "left_anti")
  }

  /** GraphDifference (dynamics/GraphDifference.cpp:20-120): the edit script turning
    * edge table `e1` into `e2`, as GraphEvent rows replayable by [[applyBatch]] —
    * `re` = edges of e1 absent from e2, `ae` = edges of e2 absent from e1 (w = new
    * weight), `ce` = present in both with different weight (w = e2's weight). The
    * reference emits removals before additions; here the `etype` column carries that
    * ordering ("re" < "ae"/"ce" replay order is applyBatch's set semantics anyway).
    * Node events are out of scope (fixed vertex universe). Inputs are canonical
    * undirected (src ≤ dst) weighted edge tables; three hash-partitioned joins on
    * (src, dst), no shuffle wider than the symmetric difference. */
  def graphDifference(e1: DataFrame, e2: DataFrame): DataFrame = {
    val a = e1.select(col("src"), col("dst"), col("weight").as("w1"))
    val b = e2.select(col("src"), col("dst"), col("weight").as("w2"))
    val removals = a.join(b, Seq("src", "dst"), "left_anti")
      .select(lit("re").as("etype"), col("src").as("u"), col("dst").as("v"),
        lit(0.0).as("w"))
    val additions = b.join(a, Seq("src", "dst"), "left_anti")
      .select(lit("ae").as("etype"), col("src").as("u"), col("dst").as("v"),
        col("w2").as("w"))
    val updates = a.join(b, Seq("src", "dst"))
      .filter(col("w1") =!= col("w2"))
      .select(lit("ce").as("etype"), col("src").as("u"), col("dst").as("v"),
        col("w2").as("w"))
    removals.unionByName(additions).unionByName(updates)
  }

  /** Streaming event-rate monitor: windowed per-type counts with an event-time
    * watermark (late events beyond the delay are dropped — the streaming-native
    * generalization of the reference's TIME_STEP batching). */
  def eventRates(events: DataFrame, window_ : String = "1 minute",
                 watermarkDelay: String = "30 seconds"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), window_), col("etype"))
      .agg(count(lit(1)).as("events"))

  /** DynConnectedComponents insert path (components/DynConnectedComponents.cpp edge-
    * addition case): warm-start min-label propagation from the previous labels with the
    * frontier seeded by the new edges' endpoints — converges in O(merged-component
    * diameter) rounds instead of a full recompute. `bi` must already include the new
    * edges (both directions). */
  def incrementalCC(spark: SparkSession, labels: DataFrame, bi: DataFrame,
                    newEdges: DataFrame): DataFrame = {
    val biC = bi.persist(StorageLevel.MEMORY_AND_DISK)
    var lbl = labels.cutLineage
    var frontier = newEdges
      .select(col("src").as("id")).union(newEdges.select(col("dst")))
      .distinct()
      .join(lbl, "id")
    var active = frontier.count()
    while (active > 0) {
      val msgs = biC.join(frontier.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id")).agg(min("label").as("cand"))
      val next = lbl.join(msgs, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("cand"), col("label"))).as("label"),
          (col("cand") < col("label")).as("changed"))
        .cutLineage
      frontier = next.filter(col("changed")).select("id", "label")
      active = frontier.count()
      lbl = next.select("id", "label")
    }
    biC.unpersist()
    lbl
  }

  /** DynConnectedComponents edge-REMOVAL repair (components/DynConnectedComponents
    * .cpp edge-removal case — the reference BFS-checks whether the endpoints are still
    * connected and relabels the split-off side). Min-node-id label semantics make the
    * repair local and exact: only the components containing a removed edge's endpoints
    * can change, so min-label propagation is re-run from singleton labels INSIDE those
    * components only (over `bi`, which must already EXCLUDE the removed edges); every
    * other component's labels pass through untouched. Cost ∝ affected-component
    * adjacency × its diameter — at web scale that's one community, not the graph.
    * Result is identical to a cold ConnectedComponents recompute. */
  def decrementalCC(spark: SparkSession, labels: DataFrame, bi: DataFrame,
                    removedEdges: DataFrame): DataFrame = {
    val touched = removedEdges
      .select(col("src").as("id")).union(removedEdges.select(col("dst").as("id")))
      .distinct().join(labels, "id").select("label").distinct().cutLineage
    val affected = labels.join(touched, Seq("label"), "left_semi")
      .select("id").cutLineage
    val subBi = bi
      .join(affected.withColumnRenamed("id", "src"), Seq("src"), "left_semi")
      .join(affected.withColumnRenamed("id", "dst"), Seq("dst"), "left_semi")
      .persist(StorageLevel.MEMORY_AND_DISK)
    var lbl = affected.select(col("id"), col("id").as("label")).cutLineage
    var frontier = lbl
    var active = frontier.count()
    while (active > 0) {
      val msgs = subBi.join(frontier.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id")).agg(min("label").as("cand"))
      val next = lbl.join(msgs, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("cand"), col("label"))).as("label"),
          (col("cand") < col("label")).as("changed"))
        .cutLineage
      frontier = next.filter(col("changed")).select("id", "label")
      active = frontier.count()
      lbl = next.select("id", "label")
    }
    subBi.unpersist()
    // select() pins the column order: the USING-join moves `label` first, and the
    // union below is positional.
    labels.join(touched, Seq("label"), "left_anti").select("id", "label").union(lbl)
  }

  /** DynWeaklyConnectedComponents (/root/reference/networkit/cpp/components/
    * DynWeaklyConnectedComponents.cpp:20-160): weak components of a DIRECTED graph
    * maintained under a mixed insert/remove batch. Weak connectivity ignores
    * orientation, so the repair delegates to the undirected incremental/decremental
    * min-label machinery over the bidirected view; a directed removal only removes
    * the undirected pair when no antiparallel twin survives the batch. Removals run
    * first against the post-batch view (exact within affected components), then the
    * insert warm start merges across old component boundaries — together equal to a
    * cold recompute on the mutated graph. */
  def dynWeaklyCC(spark: SparkSession, prevLabels: DataFrame, oldEdges: DataFrame,
                  events: DataFrame): DataFrame = {
    val newEdges = applyBatch(oldEdges, events)
    def biOf(e: DataFrame) = e.select(col("src"), col("dst"))
      .union(e.select(col("dst").as("src"), col("src").as("dst"))).distinct()
    val biOld = biOf(oldEdges)
    val biNew = biOf(newEdges).persist(StorageLevel.MEMORY_AND_DISK)
    biNew.count()
    val removed = biOld.join(biNew, Seq("src", "dst"), "left_anti")
      .filter(col("src") < col("dst")).cutLineage
    val added = biNew.join(biOld, Seq("src", "dst"), "left_anti")
      .filter(col("src") < col("dst")).cutLineage
    val afterDec =
      if (removed.count() > 0) decrementalCC(spark, prevLabels, biNew, removed)
      else prevLabels
    val out =
      if (added.count() > 0) incrementalCC(spark, afterDec, biNew, added)
      else afterDec
    biNew.unpersist(); removed.releaseState(); added.releaseState()
    out
  }
}
