package graft.algo

import graft.DataFrameLineageOps

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.model.LinkGraph

/** BiconnectedComponents (/root/reference/networkit/cpp/components/
  * BiconnectedComponents.cpp:19-160): the reference runs the sequential
  * Hopcroft-Tarjan DFS. A DFS stack does not distribute, so this is the classic
  * Tarjan-Vishkin re-architecture (the standard PRAM biconnectivity algorithm, which
  * works on ANY rooted spanning tree, not just a DFS tree):
  *
  *   1. BFS spanning forest (one level-synchronous sweep — frontier joins).
  *   2. nd(v) = subtree size, bottom-up by level; low(v)/high(v) = min/max preorder
  *      reachable from subtree(v) through a single non-tree edge, same sweep.
  *   3. pre(v) = preorder number, top-down by level (sibling offsets = per-parent
  *      prefix sums of nd); roots get disjoint global offsets so preorder intervals
  *      never collide across components.
  *   4. Auxiliary graph on the NON-ROOT vertices (vertex v stands for tree edge
  *      (parent(v), v)):
  *        A. non-tree edge {u,v}, neither an ancestor of the other -> aux edge {u,v};
  *        B. tree edge (w,v), w = parent(v), w not a root -> aux edge {w,v} iff
  *           low(v) < pre(w) or high(v) >= pre(w) + nd(w)
  *      (ancestor test is the preorder-interval test pre(u) <= pre(v) < pre(u)+nd(u)).
  *   5. Connected components of the auxiliary graph = biconnected components; a
  *      non-tree edge {u,v} inherits the component of its larger-preorder endpoint.
  *
  * Everything is frontier joins + per-level aggregations: O(depth) rounds, each
  * shuffling only that level's rows; the aux-graph CC reuses [[ConnectedComponents]].
  * Bridges come out naturally as singleton components; articulation points are the
  * vertices incident to more than one component label.
  */
object Biconnected {

  final case class Result(
      /** (src, dst, comp) per canonical undirected edge; comp = min non-root vertex
        * id of the component's tree edges (deterministic). */
      edgeComponents: DataFrame,
      /** (id, comps) — number of distinct biconnected components touching each
        * non-isolated vertex; comps > 1 <=> articulation point. */
      nodeComponents: DataFrame)

  def run(spark: SparkSession, g: LinkGraph): Result = {
    val und = g.canonicalUndirected.select("src", "dst")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val bi = und.union(und.select(col("dst").as("src"), col("src").as("dst")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    bi.count()

    // --- 1. BFS spanning forest: roots = per-component min id ----------------------
    val roots = ConnectedComponents.run(spark, g).labels
      .groupBy(col("label")).agg(min("id").as("id")).select("id")
    // tree rows: (id, parent, level); roots carry parent = -1
    var levels = List(roots.select(col("id"), lit(-1L).as("parent"), lit(0L).as("level"))
      .cutLineage)
    var frontier = levels.head
    var visited = frontier.select("id").cutLineage
    var depth = 0L
    var more = frontier.count() > 0
    while (more) {
      // deterministic parent choice: the smallest frontier neighbor
      val next = bi.join(frontier.select(col("id").as("src")), "src")
        .groupBy(col("dst").as("id")).agg(min("src").as("parent"))
        .join(visited, Seq("id"), "left_anti")
        .select(col("id"), col("parent"), lit(depth + 1L).as("level"))
        .cutLineage
      more = next.count() > 0
      if (more) {
        levels = next :: levels
        visited = visited.union(next.select("id")).cutLineage
        frontier = next
        depth += 1L
      }
    }
    val byLevel = levels.reverse.toArray // byLevel(l) = rows at level l

    // non-tree edges (canonical): und minus the tree edge in either orientation
    val treeE = byLevel.drop(1).foldLeft(
      spark.range(0).select(col("id").as("src"), col("id").as("dst")))(
      (acc, lv) => acc.union(lv.select(
        least(col("parent"), col("id")).as("src"),
        greatest(col("parent"), col("id")).as("dst"))))
    val nonTree = und.join(treeE, Seq("src", "dst"), "left_anti")
      .persist(StorageLevel.MEMORY_AND_DISK)
    nonTree.count()

    // --- 2+3. nd / pre / low / high -------------------------------------------------
    // preorder top-down needs nd first; nd bottom-up: nd(v) = 1 + sum nd(children)
    var ndAbove: DataFrame = null // (parent, ndsum) aggregated from level l+1
    val ndByLevel = new Array[DataFrame](byLevel.length)
    for (l <- byLevel.indices.reverse) {
      val base = byLevel(l).select(col("id"), col("parent"))
      val nd =
        (if (ndAbove == null) base.withColumn("nd", lit(1L))
         else base.join(ndAbove, Seq("id"), "left")
           .select(col("id"), col("parent"), (lit(1L) + coalesce(col("ndsum"), lit(0L))).as("nd")))
          .cutLineage
      ndByLevel(l) = nd
      ndAbove = nd.groupBy(col("parent").as("id")).agg(sum("nd").as("ndsum")).cutLineage
    }
    // pre: roots first (disjoint offsets by id order), then children by sibling rank
    val rootCum = graft.layout.Layout.prefixSum(
      ndByLevel(0).select(col("id"), col("parent"), col("nd")),
      Seq(col("id").asc), "nd", "cum") // EXCLUSIVE: cum = preorder offset of the root
    val rootPre = rootCum
      .select(col("id"), col("parent"), col("nd"), col("cum").as("pre"))
      .cutLineage
    rootCum.unpersist() // one-shot consumer (Layout ownership contract)
    val preByLevel = new Array[DataFrame](byLevel.length)
    preByLevel(0) = rootPre
    for (l <- 1 until byLevel.length) {
      // per-parent sibling offsets: exclusive prefix sum of nd ordered by id (window
      // is partitioned by parent — bounded by max degree, never global)
      val w = Window.partitionBy("parent").orderBy("id")
        .rowsBetween(Window.unboundedPreceding, -1)
      val sib = ndByLevel(l).withColumn("off", coalesce(sum("nd").over(w), lit(0L)))
      preByLevel(l) = sib.join(
          preByLevel(l - 1).select(col("id").as("parent"), col("pre").as("ppre")), "parent")
        .select(col("id"), col("parent"), col("nd"),
          (col("ppre") + 1L + col("off")).as("pre"))
        .cutLineage
    }
    val pre = preByLevel.reduce(_ union _)
      .select("id", "parent", "nd", "pre").persist(StorageLevel.MEMORY_AND_DISK)
    pre.count()
    preByLevel.foreach(_.releaseState())

    // base low/high from incident non-tree edges (both directions), then bottom-up
    val ntBoth = nonTree.union(nonTree.select(col("dst").as("src"), col("src").as("dst")))
    val ntReach = ntBoth.join(pre.select(col("id").as("dst"), col("pre").as("wpre")), "dst")
      .groupBy(col("src").as("id"))
      .agg(min("wpre").as("ntlo"), max("wpre").as("nthi"))
    val baseLh = pre.join(ntReach, Seq("id"), "left")
      .select(col("id"), col("parent"), col("pre"),
        least(col("pre"), coalesce(col("ntlo"), col("pre"))).as("lo"),
        greatest(col("pre"), coalesce(col("nthi"), col("pre"))).as("hi"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var lhAbove: DataFrame = null // (parent, clo, chi) from level l+1
    val lhByLevel = new Array[DataFrame](byLevel.length)
    for (l <- byLevel.indices.reverse) {
      val mine = baseLh.join(byLevel(l).select("id"), "id", "left_semi")
      val lh =
        (if (lhAbove == null) mine.select(col("id"), col("parent"), col("lo"), col("hi"))
         else mine.join(lhAbove, Seq("id"), "left")
           .select(col("id"), col("parent"),
             least(col("lo"), coalesce(col("clo"), col("lo"))).as("lo"),
             greatest(col("hi"), coalesce(col("chi"), col("hi"))).as("hi")))
          .cutLineage
      lhByLevel(l) = lh
      lhAbove = lh.groupBy(col("parent").as("id"))
        .agg(min("lo").as("clo"), max("hi").as("chi")).cutLineage
    }
    val lowHigh = lhByLevel.reduce(_ union _).select("id", "lo", "hi")
    val info = pre.join(lowHigh, "id")
      .select(col("id"), col("parent"), col("pre"), col("nd"), col("lo"), col("hi"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    info.count()
    pre.unpersist(); baseLh.unpersist()

    // --- 4. auxiliary edges ---------------------------------------------------------
    val iu = info.select(col("id").as("src"), col("pre").as("upre"), col("nd").as("und_"))
    val iv = info.select(col("id").as("dst"), col("pre").as("vpre"), col("nd").as("vnd"))
    val auxA = nonTree.join(iu, "src").join(iv, "dst")
      // unrelated: neither preorder interval contains the other endpoint
      .filter(!(col("vpre") >= col("upre") && col("vpre") < col("upre") + col("und_")) &&
              !(col("upre") >= col("vpre") && col("upre") < col("vpre") + col("vnd")))
      .select(col("src").as("a"), col("dst").as("b"))
    val pw = info.select(col("id").as("parent"), col("pre").as("wpre"),
      col("nd").as("wnd"), col("parent").as("gp"))
    val auxB = info.filter(col("parent") >= 0L).join(pw, "parent")
      .filter(col("gp") >= 0L && // parent itself must be a non-root aux vertex
        (col("lo") < col("wpre") || col("hi") >= col("wpre") + col("wnd")))
      .select(col("parent").as("a"), col("id").as("b"))
    val auxEdges = auxA.union(auxB)
      .select(least(col("a"), col("b")).as("src"), greatest(col("a"), col("b")).as("dst"),
        lit(1.0).as("weight"))
    val auxVerts = info.filter(col("parent") >= 0L).select("id")
    val auxG = LinkGraph.fromEdges(spark, auxEdges, Some(auxVerts))
    val cc = ConnectedComponents.run(spark, auxG).labels // (id, label)

    // --- 5. per-edge labels ---------------------------------------------------------
    val treeLabeled = info.filter(col("parent") >= 0L)
      .join(cc, "id")
      .select(least(col("parent"), col("id")).as("src"),
        greatest(col("parent"), col("id")).as("dst"), col("label").as("comp"))
    val deeper = nonTree.join(iu, "src").join(iv, "dst")
      .select(col("src"), col("dst"),
        when(col("vpre") > col("upre"), col("dst")).otherwise(col("src")).as("rep"))
    val nonTreeLabeled = deeper
      .join(cc.withColumnRenamed("id", "rep"), "rep")
      .select(col("src"), col("dst"), col("label").as("comp"))
    val edgeComponents = treeLabeled.union(nonTreeLabeled)
      .persist(StorageLevel.MEMORY_AND_DISK)
    edgeComponents.count()
    val nodeComponents = edgeComponents
      .select(col("src").as("id"), col("comp"))
      .union(edgeComponents.select(col("dst").as("id"), col("comp")))
      .groupBy("id").agg(countDistinct("comp").as("comps"))
    info.unpersist(); nonTree.unpersist(); bi.unpersist(); und.unpersist()
    byLevel.foreach(_.releaseState())
    ndByLevel.foreach(_.releaseState())
    lhByLevel.foreach(_.releaseState())
    Result(edgeComponents, nodeComponents)
  }
}
