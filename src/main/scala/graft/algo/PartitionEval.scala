package graft.algo

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.LinkGraph

/** The reference's partition-evaluation family — per-community quality values over a
  * `labels(id, label)` partition (community/PartitionHubDominance.cpp,
  * IntrapartitionDensity.cpp, IsolatedInterpartitionConductance.cpp,
  * IsolatedInterpartitionExpansion.cpp, PartitionFragmentation.cpp,
  * StablePartitionNodes.cpp). Each measure's run() is a node/edge sweep + per-cluster
  * reduction; here each is 1-2 hash aggregations over the labeled edge view — the
  * per-community row set IS the result (the reference's min/max/avg summaries are one
  * more trivial aggregation the caller can run).
  *
  * All numerators/denominators are exact integers; every double is a single division
  * of those integers (or `1 - x/y`), so values are bit-stable across engines and the
  * DuckDB twin replays them exactly.
  */
object PartitionEval {

  /** Canonical undirected edges with both endpoint labels. */
  private def labeled(g: LinkGraph, labels: DataFrame): DataFrame =
    g.canonicalUndirected
      .join(labels.select(col("id").as("src"), col("label").as("lsrc")), "src")
      .join(labels.select(col("id").as("dst"), col("label").as("ldst")), "dst")

  private def sizes(labels: DataFrame): DataFrame =
    labels.groupBy("label").agg(count(lit(1)).as("size"))

  /** PartitionHubDominance (PartitionHubDominance.cpp:21-60): per cluster, the maximum
    * number of INTRA-cluster neighbors any member has, normalized by (size-1); a
    * singleton (or any cluster where that ratio is undefined) scores 1. Neighbor
    * counts are over the simple undirected graph (one per adjacent node).
    * Output (label, size, max_internal_deg, dominance). */
  def hubDominance(spark: SparkSession, g: LinkGraph, labels: DataFrame): DataFrame = {
    val le = labeled(g, labels).filter(col("lsrc") === col("ldst"))
    val internal = le.select(col("src").as("id"), col("lsrc").as("label"))
      .union(le.select(col("dst").as("id"), col("ldst").as("label")))
      .groupBy("id", "label").agg(count(lit(1)).as("ideg"))
    val mx = internal.groupBy("label").agg(max("ideg").as("max_internal_deg"))
    sizes(labels).join(mx, Seq("label"), "left")
      .select(col("label"), col("size"),
        coalesce(col("max_internal_deg"), lit(0L)).as("max_internal_deg"))
      .withColumn("dominance",
        when(col("size") <= 1L, lit(1.0))
          .otherwise(col("max_internal_deg").cast("double") / (col("size") - 1L)))
  }

  /** IntrapartitionDensity (IntrapartitionDensity.cpp:20-75): intra-cluster edge count
    * over the possible C(size, 2); clusters with no possible pair score 1.
    * Output (label, size, intra_edges, density). */
  def intrapartitionDensity(spark: SparkSession, g: LinkGraph, labels: DataFrame): DataFrame = {
    val intra = labeled(g, labels).filter(col("lsrc") === col("ldst"))
      .groupBy(col("lsrc").as("label")).agg(count(lit(1)).as("intra_edges"))
    sizes(labels).join(intra, Seq("label"), "left")
      .select(col("label"), col("size"),
        coalesce(col("intra_edges"), lit(0L)).as("intra_edges"))
      .withColumn("density",
        when(expr("size * (size - 1) / 2") === 0L, lit(1.0))
          .otherwise(col("intra_edges").cast("double") / expr("size * (size - 1) / 2")))
  }

  /** IsolatedInterpartitionConductance + Expansion (IsolatedInterpartitionConductance
    * .cpp:20-75, IsolatedInterpartitionExpansion.cpp:20-70): per cluster, the weighted
    * cut to ALL other clusters, normalized by min(vol, totalVol − vol) (conductance)
    * and by min(size, n − size) (expansion); 0 where the denominator is 0.
    * Output (label, size, vol, cut, conductance, expansion). */
  def isolatedInterpartition(spark: SparkSession, g: LinkGraph, labels: DataFrame): DataFrame = {
    val le = labeled(g, labels)
    val totals = le.agg(sum("weight").cast("long").as("w_all"))
      .crossJoin(labels.agg(count(lit(1)).as("n_all"))).head()
    val (wAll, nAll) = (totals.getLong(0), totals.getLong(1))
    val cut = le.filter(col("lsrc") =!= col("ldst"))
    val cutPer = cut.select(col("lsrc").as("label"), col("weight"))
      .union(cut.select(col("ldst").as("label"), col("weight")))
      .groupBy("label").agg(sum("weight").cast("long").as("cut"))
    val vol = le.select(col("lsrc").as("label"), col("weight"))
      .union(le.select(col("ldst").as("label"), col("weight")))
      .groupBy("label").agg(sum("weight").cast("long").as("vol"))
    sizes(labels)
      .join(vol, Seq("label"), "left").join(cutPer, Seq("label"), "left")
      .select(col("label"), col("size"),
        coalesce(col("vol"), lit(0L)).as("vol"),
        coalesce(col("cut"), lit(0L)).as("cut"))
      .withColumn("conductance",
        when(least(col("vol"), lit(2L * wAll) - col("vol")) <= 0L, lit(0.0))
          .otherwise(col("cut").cast("double") /
            least(col("vol"), lit(2L * wAll) - col("vol"))))
      .withColumn("expansion",
        when(least(col("size"), lit(nAll) - col("size")) <= 0L, lit(0.0))
          .otherwise(col("cut").cast("double") /
            least(col("size"), lit(nAll) - col("size"))))
  }

  /** PartitionFragmentation (PartitionFragmentation.cpp:10-75): how much each cluster
    * is split across the graph's connected components — 1 − (largest piece of the
    * cluster∩component intersection) / size. 0 = cluster lives in one component.
    * Output (label, size, max_piece, fragmentation). `components(id, label)` is the
    * CC labeling (pass ConnectedComponents.run(...).labels). */
  def fragmentation(spark: SparkSession, g: LinkGraph, labels: DataFrame,
                    components: DataFrame): DataFrame = {
    val pieces = labels
      .join(components.select(col("id"), col("label").as("comp")), "id")
      .groupBy("label", "comp").agg(count(lit(1)).as("piece"))
      .groupBy("label").agg(max("piece").as("max_piece"))
    sizes(labels).join(pieces, Seq("label"), "left")
      .select(col("label"), col("size"), coalesce(col("max_piece"), lit(0L)).as("max_piece"))
      .withColumn("fragmentation",
        lit(1.0) - col("max_piece").cast("double") / col("size"))
  }

  /** StablePartitionNodes (StablePartitionNodes.cpp:15-95): a node is STABLE iff it is
    * isolated, or its weighted intra-cluster neighbor weight is positive AND strictly
    * greater than the weight toward every other single cluster. Per cluster: the
    * stable fraction. Output (label, size, stable, stable_frac). */
  def stablePartitionNodes(spark: SparkSession, g: LinkGraph, labels: DataFrame): DataFrame = {
    val biLab = g.bidirected
      .join(labels.select(col("id").as("src"), col("label").as("lsrc")), "src")
      .join(labels.select(col("id").as("dst"), col("label").as("ldst")), "dst")
    val lw = biLab.groupBy(col("src").as("id"), col("lsrc").as("label"), col("ldst").as("nl"))
      .agg(sum("weight").cast("long").as("w"))
    val own = lw.filter(col("nl") === col("label"))
      .select(col("id"), col("w").as("own"))
    val foreignMax = lw.filter(col("nl") =!= col("label"))
      .groupBy("id").agg(max("w").as("fmax"))
    val degreed = lw.select("id").distinct() // nodes with degree > 0
    val stableNodes = labels
      .join(degreed.withColumn("has_deg", lit(true)), Seq("id"), "left")
      .join(own, Seq("id"), "left").join(foreignMax, Seq("id"), "left")
      .select(col("id"), col("label"),
        (col("has_deg").isNull || // isolated nodes are stable (:21)
          (coalesce(col("own"), lit(0L)) > 0L &&
            coalesce(col("fmax"), lit(0L)) < coalesce(col("own"), lit(0L))))
          .as("stable"))
    stableNodes.groupBy("label")
      .agg(count(lit(1)).as("size"),
        sum(when(col("stable"), 1L).otherwise(0L)).as("stable"))
      .withColumn("stable_frac", col("stable").cast("double") / col("size"))
  }
}
