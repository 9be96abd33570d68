package graft.algo

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.LinkGraph

/** The remaining LinkPredictor index family + candidate/selection utilities
  * (the NeighborhoodUtility.h set-algebra helpers become joins; ranked outputs
  * replace PredictionsSorter.h's in-place sorts) —
  * the long tail of /root/reference/networkit/cpp/linkprediction/ beyond the
  * CN/Jaccard/AA/PA block (LinkPrediction.scala) and RA/Katz/ROC (LinkPredEval.scala):
  *
  *   - TotalNeighborsIndex.cpp:11-13      |N(u) ∪ N(v)| = deg(u)+deg(v)−cn for
  *                                        non-adjacent pairs
  *   - UDegreeIndex.cpp / VDegreeIndex.cpp deg(u) / deg(v)
  *   - NeighborhoodDistanceIndex.cpp:12-17 cn / sqrt(deg(u)·deg(v))
  *   - NeighborsMeasureIndex.cpp:11-21    Σ_{x∈N(u), y∈N(v)} [x = y or x ~ y]
  *                                        = cn + walks₃(u,v) — the double loop counts
  *                                        exactly the length-3 walks u→x→y→v plus the
  *                                        common-neighbor coincidences
  *   - SameCommunityIndex.cpp:24-26       1 iff u, v share a community label (the
  *                                        reference runs PLM internally; here the
  *                                        partition is a parameter so any detector —
  *                                        PLP, PLM, external labels — plugs in)
  *   - AdjustedRandIndex.cpp:11-34        replicated LITERALLY, including the
  *                                        reference's use of set_union for both
  *                                        "difference" vectors: b = c = |N(u) ∪ N(v)|,
  *                                        a = cn, d = n − |union|,
  *                                        score = 2(ad − bc) / (ab+ac+2ad+b²+bd+c²+cd)
  *                                        (0 when the denominator is 0)
  *   - MissingLinksFinder.cpp:16-42       pairs at exactly hop-distance k, u < v
  *   - LinkThresholder.cpp:13-44          byScore / byCount / byPercentage selection
  *
  * Spark shape: ONE wedge aggregation produces walks₂(u,·) (= common-neighbor counts),
  * one more edge join produces walks₃ — no per-pair set materialization, no UDFs; the
  * per-pair indices are then pure column math. The candidate space is the distance-2
  * non-adjacent set sharded by `uMod` (sampled u-side, u < v), the same hub guard as
  * LinkPrediction.scores — at web scale the quadratic pair space is always sharded.
  * All counts exact int64; the two float columns round to 7 decimals for cross-engine
  * parity.
  */
object LinkPredIndices {

  /** All per-pair indices over the distance-2 non-adjacent candidates with
    * u % uMod == 0 and u < v. `partition` = (id, label) community assignment for
    * SameCommunityIndex. Output: (u, v, cn, total_neighbors, u_deg, v_deg,
    * neighborhood_distance, neighbors_measure, same_community, adjusted_rand). */
  def indices(spark: SparkSession, g: LinkGraph, partition: DataFrame,
              uMod: Long = 1L): DataFrame = {
    val bi = g.bidirected.select("src", "dst")
    val deg = bi.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
    // x ∈ N(u) for the sampled u-side.
    val w1 = bi.select(col("dst").as("u"), col("src").as("x"))
      .filter(pmod(col("u"), lit(uMod)) === 0L)
    // walks₂(u, y) = |{x : x~u, x~y}| for ALL y — at y = v (non-adjacent) this IS the
    // common-neighbor count; it is also the length-2 prefix of walks₃.
    val walks2 = w1.join(bi.withColumnRenamed("src", "x"), "x")
      .groupBy(col("u"), col("dst").as("y"))
      .agg(count(lit(1)).as("w2"))
    // walks₃(u, v) = Σ_{y~v} walks₂(u, y).
    val walks3 = walks2
      .join(bi.select(col("src").as("y"), col("dst").as("v")), "y")
      .groupBy("u", "v").agg(sum("w2").as("w3"))
    val und = g.canonicalUndirected.select(col("src").as("u"), col("dst").as("v"))
    val n = g.n
    val a = col("cn")
    val un = col("u_deg") + col("v_deg") - col("cn") // |N(u) ∪ N(v)| (non-adjacent)
    val d = lit(n) - un
    // AdjustedRandIndex.cpp:27-33 with b = c = |union| (see scaladoc).
    val denom = a * un + a * un + lit(2L) * a * d + un * un + un * d + un * un + un * d
    walks2.filter(col("u") < col("y"))
      .select(col("u"), col("y").as("v"), col("w2").as("cn"))
      .join(und, Seq("u", "v"), "left_anti") // predictions are NON-adjacent pairs
      .join(walks3, Seq("u", "v"), "left")
      .join(deg.select(col("id").as("u"), col("deg").as("u_deg")), "u")
      .join(deg.select(col("id").as("v"), col("deg").as("v_deg")), "v")
      .join(partition.select(col("id").as("u"), col("label").as("lu")), "u")
      .join(partition.select(col("id").as("v"), col("label").as("lv")), "v")
      .select(col("u"), col("v"), col("cn"),
        un.as("total_neighbors"),
        col("u_deg"), col("v_deg"),
        round(col("cn").cast("double") /
          sqrt((col("u_deg") * col("v_deg")).cast("double")), 7)
          .as("neighborhood_distance"),
        (col("cn") + coalesce(col("w3"), lit(0L))).as("neighbors_measure"),
        when(col("lu") === col("lv"), 1L).otherwise(0L).as("same_community"),
        when(denom === 0L, lit(0.0))
          .otherwise(round(lit(2.0) * (a * d - un * un).cast("double") /
            denom.cast("double"), 7)).as("adjusted_rand"))
  }

  /** MissingLinksFinder.findAtDistance(k): pairs (u, v), u < v, at exactly
    * hop-distance k, u-side sampled by `uMod` — one k-level batched msBFS; state is
    * (source × reached), the same scale envelope as sampled APSP. */
  def missingLinks(spark: SparkSession, g: LinkGraph, k: Int,
                   uMod: Long = 1L): DataFrame = {
    val sources = g.vertices.filter(pmod(col("id"), lit(uMod)) === 0L)
    val (state, _) = Betweenness.msBfs(spark, g, sources, maxLevels = k)
    state.filter(col("dist") === k.toLong && col("s") < col("id"))
      .select(col("s").as("u"), col("id").as("v"))
  }

  /** LinkThresholder.byScore: predictions with score >= minScore (the reference drops
    * strictly-below; output is the pair set). */
  def byScore(predictions: DataFrame, scoreCol: String, minScore: Double): DataFrame =
    predictions.filter(col(scoreCol) >= minScore).select("u", "v")

  /** LinkThresholder.byCount: the numLinks highest-scored pairs, ties broken by
    * (u, v) ascending — a distributed rank, no driver-side sort. */
  def byCount(predictions: DataFrame, scoreCol: String, numLinks: Long): DataFrame =
    graft.layout.Layout.zipWithRankBy(predictions,
      Seq(col(scoreCol).desc, col("u").asc, col("v").asc), "__rnk")
      .filter(col("__rnk") < numLinks)
      .select("u", "v")

  /** LinkThresholder.byPercentage: byCount with numLinks = ⌊pct · |predictions|⌋. */
  def byPercentage(predictions: DataFrame, scoreCol: String, pct: Double): DataFrame = {
    require(pct >= 0.0 && pct <= 1.0, "percentage in [0,1]")
    byCount(predictions, scoreCol, (pct * predictions.count()).toLong)
  }
}
