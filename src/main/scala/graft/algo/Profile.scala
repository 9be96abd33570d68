package graft.algo

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.LinkGraph

/** Network-profile summary — the reference's profiling battery
  * (/root/reference/networkit/profiling/profiling.py:728-790: Nodes, Edges, Density,
  * Self Loops, Connected Components, degree statistics) as ONE exact-integer summary
  * row: global aggregations over the edge table plus the connected-components count,
  * everything partial-aggregable (no windows, no collect).
  *
  * Columns: n, m (directed), m_und (canonical undirected), density
  * (m / n(n−1), the directed density the reference reports), max_out_deg, max_in_deg,
  * dangling (out-degree-0 nodes — the PageRank mass sinks), isolated (degree-0 both
  * directions), reciprocal_pairs (antiparallel directed pairs — the reciprocity
  * numerator), n_components, max_component.
  */
object Profile {

  def run(spark: SparkSession, g: LinkGraph): DataFrame = {
    val od = g.edges.groupBy(col("src").as("id")).agg(count(lit(1)).as("od"))
    val id = g.edges.groupBy(col("dst").as("id")).agg(count(lit(1)).as("idg"))
    val degs = g.vertices
      .join(od, Seq("id"), "left").join(id, Seq("id"), "left")
      .select(coalesce(col("od"), lit(0L)).as("od"), coalesce(col("idg"), lit(0L)).as("idg"))
      .agg(
        max("od").as("max_out_deg"), max("idg").as("max_in_deg"),
        sum(when(col("od") === 0L, 1L).otherwise(0L)).as("dangling"),
        sum(when(col("od") === 0L && col("idg") === 0L, 1L).otherwise(0L)).as("isolated"))
    // Antiparallel pairs: directed edges whose reverse also exists, counted once.
    val recip = g.edges.select(col("src"), col("dst"))
      .join(g.edges.select(col("dst").as("src"), col("src").as("dst")), Seq("src", "dst"), "left_semi")
      .filter(col("src") < col("dst"))
      .agg(count(lit(1)).as("reciprocal_pairs"))
    val comps = ConnectedComponents.run(spark, g).labels
      .groupBy("label").agg(count(lit(1)).as("sz"))
      .agg(count(lit(1)).as("n_components"), max("sz").as("max_component"))
    val mUnd = g.canonicalUndirected.agg(count(lit(1)).as("m_und"))
    degs.crossJoin(recip).crossJoin(comps).crossJoin(mUnd)
      .select(
        lit(g.n).as("n"), lit(g.m).as("m"), col("m_und"),
        (lit(g.m).cast("double") / (lit(g.n).cast("double") * (lit(g.n) - 1L).cast("double")))
          .as("density"),
        col("max_out_deg"), col("max_in_deg"), col("dangling"), col("isolated"),
        col("reciprocal_pairs"), col("n_components"), col("max_component"))
  }
}
