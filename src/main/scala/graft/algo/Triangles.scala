package graft.algo

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.model.LinkGraph

/** Triangle counting / local clustering coefficient via degree-ordered edge orientation —
  * the reference's "turbo mode"
  * (/root/reference/networkit/cpp/centrality/LocalClusteringCoefficient.cpp:20-22,56-84
  * and edgescores/TriangleEdgeScore.cpp:24-26):
  * every undirected edge is directed from the endpoint with (smaller degree, smaller id)
  * to the other, so each triangle is discovered exactly once and the maximum out-degree
  * of the oriented graph is O(sqrt(m)) — this *is* the hub-skew mitigation (a 10^6-degree
  * hub never becomes a join fan-out key on its full neighborhood).
  *
  * Plan shape: two degree joins orient each edge with a plain `struct(deg, id)`
  * comparison — NO global rank, NO single-partition window, nothing that funnels the
  * vertex set through one task; wedge self-join on the low endpoint; close with a join
  * against the oriented edge set. All joins shuffle on keys whose fan-out is
  * degree-capped, so the plan survives a 100x scale-up unchanged.
  */
object Triangles {

  /** Oriented-edge view cache, one persisted frame per graph instance (reference
    * equality — LinkGraph wraps specific DataFrames): q_triangles_global /
    * q_triangles_node / q_lcc / TriangleEdgeScore all consume the same orientation,
    * and rebuilding it per operator cost the round-2 bench +20% on triangles. Blocks
    * live as long as the graph value, like LinkGraph.canonicalUndirected. */
  private val orientedCache =
    new java.util.concurrent.ConcurrentHashMap[LinkGraph, DataFrame]()

  /** Oriented edges `(a, b, db)` in raw id space: a -> b iff
    * (deg(a), a) < (deg(b), b) lexicographically; `db` = deg(b) rides along so wedge
    * endpoints can be ordered without another join. Persisted once per graph. */
  /** Drop `g`'s memoized oriented view (benchmark re-measurement needs the re-run
    * to rebuild it like the first sample did). */
  def evictOriented(g: LinkGraph): Unit =
    Option(orientedCache.remove(g)).foreach(_.unpersist())

  def oriented(g: LinkGraph): DataFrame =
    orientedCache.computeIfAbsent(g, { g =>
      val und = g.canonicalUndirected.select("src", "dst")
      val deg = g.undirectedDegrees
      val j = und
        .join(deg.select(col("id").as("src"), col("deg").as("ds")), "src")
        .join(deg.select(col("id").as("dst"), col("deg").as("dd")), "dst")
      val srcFirst = struct(col("ds"), col("src")) < struct(col("dd"), col("dst"))
      val o = j.select(
        when(srcFirst, col("src")).otherwise(col("dst")).as("a"),
        when(srcFirst, col("dst")).otherwise(col("src")).as("b"),
        when(srcFirst, col("dd")).otherwise(col("ds")).as("db"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      o.count()
      o
    })

  /** Per-node triangle counts (id, triangles) over the undirected graph; nodes in no
    * triangle are absent. */
  def perNode(spark: SparkSession, g: LinkGraph): DataFrame =
    triangleCorners(oriented(g))
      .select(explode(array(col("a"), col("b"), col("c"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("triangles"))

  /** Total number of triangles in the undirected graph. */
  def globalCount(spark: SparkSession, g: LinkGraph): Long =
    triangleCorners(oriented(g)).count()

  /** All triangles as id triples (a, b, c) with (deg,id)-order a < b < c: wedge join on
    * the low endpoint + closing join. The closing edge of a wedge (b, c) with
    * (deg_b,b) < (deg_c,c) is oriented b -> c, so one equi-join closes it. */
  private[algo] def triangleCorners(o: DataFrame): DataFrame = {
    val e1 = o.select(col("a"), col("b"), col("db"))
    val e2 = o.select(col("a"), col("b").as("c"), col("db").as("dc"))
    val wedges = e1.join(e2, Seq("a"))
      .filter(struct(col("db"), col("b")) < struct(col("dc"), col("c")))
      .select(col("a"), col("b"), col("c"))
    val e3 = o.select(col("a").as("b"), col("b").as("c"))
    wedges.join(e3, Seq("b", "c")).select(col("a"), col("b"), col("c"))
  }

  /** Local clustering coefficient c(u) = 2*tri(u) / (d(u)(d(u)-1)), degree over the
    * undirected graph (LocalClusteringCoefficient.cpp:81-82). Degree<2 nodes get 0. */
  def localClusteringCoefficient(spark: SparkSession, g: LinkGraph): DataFrame = {
    val deg = g.undirectedDegrees
    val tri = perNode(spark, g)
    g.vertices
      .join(deg, Seq("id"), "left")
      .join(tri, Seq("id"), "left")
      .select(col("id"),
        when(coalesce(col("deg"), lit(0L)) < 2, lit(0.0))
          .otherwise(lit(2.0) * coalesce(col("triangles"), lit(0L)) /
            (col("deg") * (col("deg") - 1L))).as("lcc"))
  }

  /** Exact global clustering coefficient = 3*triangles / wedges
    * (global/ClusteringCoefficient.cpp:168-218 exactGlobal; the
    * global/GlobalClusteringCoefficient.h approximation is the same wedge ratio). */
  def globalClusteringCoefficient(spark: SparkSession, g: LinkGraph): Double = {
    val wedges = g.undirectedDegrees
      .agg(coalesce(sum(col("deg") * (col("deg") - 1L) / lit(2.0)), lit(0.0)))
      .head().getDouble(0)
    if (wedges == 0.0) 0.0 else 3.0 * globalCount(spark, g) / wedges
  }
}
