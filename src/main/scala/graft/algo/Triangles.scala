package graft.algo

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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
  * Plan shape: rank nodes by (degree, id); relabel edges by rank so orientation becomes a
  * plain `<`; wedge self-join on the low endpoint; close with a semi-ish join against the
  * oriented edge set. All joins shuffle on a key whose fan-out is degree-capped.
  */
object Triangles {

  /** (oriented edges relabeled to rank space, rank dictionary id<->rank(+degree)). */
  def oriented(g: LinkGraph): (DataFrame, DataFrame) = {
    val und = g.canonicalUndirected.select("src", "dst")
    val deg = und.select(col("src").as("id")).union(und.select(col("dst").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    // Total order (deg asc, id asc) -> dense rank. Window is test-scale fine; at cluster
    // scale swap for a sort-based zipWithIndex equivalent; orientation only needs ANY
    // total order consistent with degree, so ties could also hash-break without a sort.
    val rank = deg.withColumn("r",
      row_number().over(Window.orderBy(col("deg"), col("id"))).cast("long") - 1L)
    val bySrc = rank.select(col("id").as("src"), col("r").as("rs"))
    val byDst = rank.select(col("id").as("dst"), col("r").as("rd"))
    val o = und.join(bySrc, "src").join(byDst, "dst")
      .select(least(col("rs"), col("rd")).as("a"), greatest(col("rs"), col("rd")).as("b"))
    (o, rank)
  }

  /** Per-node triangle counts (id, triangles) over the undirected graph; nodes in no
    * triangle are absent. */
  def perNode(spark: SparkSession, g: LinkGraph): DataFrame = {
    val (o, rank) = oriented(g)
    val oc = o.persist(StorageLevel.MEMORY_AND_DISK)
    oc.count()
    val tri = triangleCorners(oc)
    val perRank = tri.select(explode(array(col("a"), col("b"), col("c"))).as("r"))
      .groupBy("r").agg(count(lit(1)).as("triangles"))
    val out = perRank.join(rank.select(col("id"), col("r")), "r")
      .select(col("id"), col("triangles"))
    oc.unpersist()
    out
  }

  /** Total number of triangles in the undirected graph. */
  def globalCount(spark: SparkSession, g: LinkGraph): Long = {
    val (o, _) = oriented(g)
    val oc = o.persist(StorageLevel.MEMORY_AND_DISK)
    oc.count()
    val c = triangleCorners(oc).count()
    oc.unpersist()
    c
  }

  /** All triangles as rank triples (a < b < c): wedge join + closing join. */
  private def triangleCorners(o: DataFrame): DataFrame = {
    val e1 = o.select(col("a"), col("b"))
    val e2 = o.select(col("a").as("b"), col("b").as("c"))
    val wedges = e1.join(e2, "b").select(col("a"), col("b"), col("c"))
    val e3 = o.select(col("a"), col("b").as("c"))
    wedges.join(e3, Seq("a", "c"))
  }

  /** Local clustering coefficient c(u) = 2*tri(u) / (d(u)(d(u)-1)), degree over the
    * undirected graph (LocalClusteringCoefficient.cpp:81-82). Degree<2 nodes get 0. */
  def localClusteringCoefficient(spark: SparkSession, g: LinkGraph): DataFrame = {
    val und = g.canonicalUndirected.select("src", "dst")
    val deg = und.select(col("src").as("id")).union(und.select(col("dst").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
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
    * (global/ClusteringCoefficient.cpp:168-218 exactGlobal). */
  def globalClusteringCoefficient(spark: SparkSession, g: LinkGraph): Double = {
    val und = g.canonicalUndirected.select("src", "dst")
    val wedges = und.select(col("src").as("id")).union(und.select(col("dst").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
      .agg(sum(col("deg") * (col("deg") - 1L) / lit(2.0))).head().getDouble(0)
    if (wedges == 0.0) 0.0 else 3.0 * globalCount(spark, g) / wedges
  }
}
