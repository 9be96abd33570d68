package graft.algo

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.LinkGraph

/** Permanence centrality (/root/reference/networkit/cpp/centrality/
  * PermanenceCentrality.cpp:140-158 + getIntraClustering:108-138): how firmly a node
  * sits inside its community C:
  *
  *   perm(u) = I(u) / (E_max(u) · deg(u)) − (1 − c_in(u))
  *
  * with I = # neighbors in C, E_max = the largest neighbor count in any OTHER single
  * community (1 if u has no external neighbors — the paper's convention), and c_in =
  * clustering among u's intra-community neighbors = intra-triangles(u) / C(I,2)
  * (0 when I < 2).
  *
  * Spark shape: one strength aggregation (groupBy (node, neighbor-label) over the
  * bidirected view), plus the per-node triangle count of the COMMUNITY-INDUCED
  * subgraph (same degree-ordered oriented wedge join as [[Triangles]], run on the
  * label-filtered edge set — orientation keeps the hub-skew bound inside big
  * communities). Every term is an exact integer; perm is one double expression, so
  * the DuckDB twin (OracleSql.permanence) matches bit-for-bit.
  */
object Permanence {

  /** (id, intra, emax, deg, tri_in, permanence) over `labels(id, label)`. */
  def run(spark: SparkSession, g: LinkGraph, labels: DataFrame): DataFrame = {
    val biLab = g.bidirected.select("src", "dst")
      .join(labels.select(col("id").as("src"), col("label").as("ls")), "src")
      .join(labels.select(col("id").as("dst"), col("label").as("ld")), "dst")
    // strength(u, L) = # neighbors of u in community L.
    val strength = biLab.groupBy(col("src").as("id"), col("ld").as("nl"), col("ls"))
      .agg(count(lit(1)).as("cnt"))
    val intra = strength.filter(col("nl") === col("ls"))
      .select(col("id"), col("cnt").as("intra"))
    val emax = strength.filter(col("nl") =!= col("ls"))
      .groupBy("id").agg(max("cnt").as("emax"))
    val deg = g.bidirected.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
    // Per-node triangles of the community-induced subgraph.
    val intraEdges = g.canonicalUndirected.select("src", "dst")
      .join(labels.select(col("id").as("src"), col("label").as("ls")), "src")
      .join(labels.select(col("id").as("dst"), col("label").as("ld")), "dst")
      .filter(col("ls") === col("ld"))
      .select(col("src"), col("dst"), lit(1.0).as("weight"))
    val gIn = LinkGraph.fromEdges(spark, intraEdges, Some(g.vertices))
    val triIn = Triangles.perNode(spark, gIn)
      .select(col("id"), col("triangles").as("tri_in"))

    g.vertices
      .join(deg, Seq("id"), "left")
      .join(intra, Seq("id"), "left")
      .join(emax, Seq("id"), "left")
      .join(triIn, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("intra"), lit(0L)).as("intra"),
        coalesce(col("emax"), lit(1L)).as("emax"), // no external => 1
        coalesce(col("deg"), lit(0L)).as("deg"),
        coalesce(col("tri_in"), lit(0L)).as("tri_in"))
      .select(col("id"), col("intra"), col("emax"), col("deg"), col("tri_in"),
        (when(col("deg") === 0L, lit(0.0))
          .otherwise(col("intra").cast("double") / (col("emax") * col("deg"))) -
          (lit(1.0) -
            when(col("intra") < 2L, lit(0.0))
              .otherwise(col("tri_in").cast("double") * 2.0 /
                (col("intra") * (col("intra") - 1L)))))
          .as("permanence"))
  }
}
