package graft.model

import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.ingest.Ingest
import graft.synth.PageTableGen

/** The engine's core graph value: a directed edge table + vertex table + meta.
  *
  * Spark-native replacement for the reference's adjacency-list Graph
  * (/root/reference/networkit/cpp/graph/Graph.h:82-119):
  *   - `edges(src, dst, weight)` hash-partitioned by src and sorted within partitions —
  *     the distributed analog of sorted CSR adjacency (Graph.h:450-461).
  *   - `vertices(id)` is the node universe (the `exists` bitmap analog, Graph.h:106).
  *   - undirected iteration (Graph.h:1244-1246 dedups with u>=v) is a *view*:
  *     [[bidirected]] unions the transpose for neighbor expansion, [[canonicalUndirected]]
  *     keeps one row per logical edge with src<dst.
  */
final case class LinkGraph(vertices: DataFrame, edges: DataFrame, n: Long, m: Long) {

  /** Neighbor-expansion view of the underlying undirected graph: each logical edge
    * appears in both directions exactly once. Built from the persisted
    * [[canonicalUndirected]], so the union is shuffle-free. */
  def bidirected: DataFrame = {
    val und = canonicalUndirected
    und.union(und.select(col("dst").as("src"), col("src").as("dst"), col("weight")))
  }

  /** One row per logical undirected edge, src < dst (self-loops excluded upstream).
    * Antiparallel directed pairs merge with SUMMED weight — the reference's
    * directed→undirected conversion (graph/Graph.cpp:73-140 copy ctor) keeps both
    * directions as parallel multi-edges, so its weighted degrees/volumes count both;
    * summing on merge reproduces exactly those weighted measures on a simple graph.
    *
    * Persisted ONCE per graph instance (lazily, on first access): every undirected
    * algorithm funnels through this view, and queries composing several operators
    * (PLP + triangles + measures) would otherwise re-shuffle the m-row groupBy per
    * operator. The blocks live as long as the graph value — one graph per job at
    * production scale, bounded by fixture size in tests. */
  lazy val canonicalUndirected: DataFrame = {
    val und = edges.select(
      least(col("src"), col("dst")).as("src"),
      greatest(col("src"), col("dst")).as("dst"),
      col("weight"))
      .groupBy("src", "dst").agg(sum("weight").as("weight"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    und.count()
    und
  }

  /** Unweighted degree per vertex over the undirected view (absent if isolated) —
    * shared by the triangle family / LCC / edge scores, persisted with the view it
    * derives from. */
  lazy val undirectedDegrees: DataFrame = {
    val d = canonicalUndirected
      .select(col("src").as("id")).union(canonicalUndirected.select(col("dst").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    d.count()
    d
  }

  /** Induced subgraph on a node set (GraphTools::subgraphFromNodes, graph/Graph.h:558):
    * keep edges whose BOTH endpoints are in `nodes(id)` — two semi-joins, no shuffle
    * beyond the (broadcastable when small) node-set joins. */
  def subgraphFromNodes(nodes: DataFrame): LinkGraph = {
    val ns = nodes.select(col("id"))
    val e = edges
      .join(ns.withColumnRenamed("id", "src"), Seq("src"), "left_semi")
      .join(ns.withColumnRenamed("id", "dst"), Seq("dst"), "left_semi")
      .select("src", "dst", "weight")
    LinkGraph.fromEdges(vertices.sparkSession, e,
      Some(vertices.join(ns, Seq("id"), "left_semi")))
  }

  /** Out-degree / weighted out-degree per vertex (Graph.cpp:536-545); vertices with no
    * out-edges (dangling) are absent — callers decide null semantics. */
  def outDegrees: DataFrame =
    edges.groupBy("src").agg(count(lit(1)).as("outDeg"), sum("weight").as("outW"))
      .withColumnRenamed("src", "id")
}

object LinkGraph {
  /** Per-(session, sfDir) cache so the many Verify queries materialize the synthetic
    * page table -> edge pipeline once. */
  private val cache = TrieMap[String, LinkGraph]()

  def forSf(spark: SparkSession, sfDir: String): LinkGraph =
    cache.getOrElseUpdate(sfDir + "#" + System.identityHashCode(spark), {
      build(spark, PageTableGen.pages(spark, sfDir))
    })

  /** Full ingest: page table -> links -> dense dictionary -> edge table, with the
    * canonical layout persisted (partitioned by src, sorted within partitions). */
  def build(spark: SparkSession, pages: DataFrame, numPartitions: Int = 0): LinkGraph = {
    val dict = Ingest.denseDictionary(pages) // persisted+materialized by zipWithRank
    val raw = Ingest.deriveEdges(pages, dict)
    val parts = if (numPartitions > 0) numPartitions
                else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val edges = raw
      .repartition(parts, col("src"))
      .sortWithinPartitions("src", "dst")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val vertices = dict.select(col("id")).persist(StorageLevel.MEMORY_AND_DISK)
    val n = vertices.count()
    val m = edges.count()
    LinkGraph(vertices, edges, n, m)
  }

  /** Disjoint union — Graph::append (graph/Graph.h:540-545, Graph.cpp:1010-1025): the
    * second graph's vertex ids are remapped past this graph's id range. */
  def append(a: LinkGraph, b: LinkGraph): LinkGraph = {
    val off = a.vertices.agg(max("id")).head().getLong(0) + 1L
    val bv = b.vertices.select((col("id") + off).as("id"))
    val be = b.edges.select((col("src") + off).as("src"),
      (col("dst") + off).as("dst"), col("weight"))
    fromEdges(a.vertices.sparkSession, a.edges.union(be), Some(a.vertices.union(bv)))
  }

  /** Overlay union — Graph::merge (Graph.h:547-552, Graph.cpp:1027-1035): same id
    * space; edges of `b` not already in `a` are added (a's weights win, like the
    * reference which skips existing edges). */
  def merge(a: LinkGraph, b: LinkGraph): LinkGraph = {
    val newEdges = b.edges.join(a.edges.select("src", "dst"), Seq("src", "dst"), "left_anti")
    fromEdges(a.vertices.sparkSession, a.edges.union(newEdges),
      Some(a.vertices.union(b.vertices).distinct()))
  }

  /** A graph directly from an explicit edge list (fixtures, readers). Vertex universe =
    * endpoints unless a vertex table is supplied (isolated nodes need one). */
  /** Construct from an edge table (the graph/GraphBuilder.h entry point analog). */
  def fromEdges(spark: SparkSession, edges: DataFrame, vertices: Option[DataFrame] = None): LinkGraph = {
    val withW = if (edges.columns.contains("weight")) edges
                else edges.withColumn("weight", lit(1.0))
    val e = withW.select(col("src").cast("long"), col("dst").cast("long"),
      col("weight").cast("double").as("weight"))
    val v = vertices.getOrElse(
      e.select(col("src").as("id")).union(e.select(col("dst").as("id"))).distinct())
      .select(col("id").cast("long"))
    val ec = e.persist(StorageLevel.MEMORY_AND_DISK)
    val vc = v.persist(StorageLevel.MEMORY_AND_DISK)
    LinkGraph(vc, ec, vc.count(), ec.count())
  }
}
