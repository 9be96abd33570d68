package graft.algo

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.LinkGraph

/** Link-prediction indices over distance-2 candidate pairs — the reference's
  * LinkPredictor family re-expressed as ONE wedge join + per-pair column math
  * (/root/reference/networkit/cpp/linkprediction/CommonNeighborsIndex.cpp,
  * JaccardIndex.cpp:14-21, AdamicAdarIndex.cpp:15-22 (1/ln(deg)),
  * PreferentialAttachmentIndex.cpp:11-15, MissingLinksFinder.cpp):
  *
  *   - candidates = non-adjacent pairs (u,v), u < v, sharing >= 1 neighbor (the
  *     MissingLinksFinder distance-2 set), optionally restricted to a deterministic
  *     u-sample (`uMod`) — at web scale you never score all O(Σ deg²) pairs at once,
  *     you shard by source bucket exactly like this;
  *   - cn  = |N(u) ∩ N(v)|                  (CommonNeighborsIndex)
  *   - pa  = deg(u)·deg(v)                  (PreferentialAttachmentIndex)
  *   - jaccard = cn / (deg(u)+deg(v)−cn)    (JaccardIndex; union = deg+deg−cn for
  *                                           non-adjacent pairs)
  *   - adamic_adar = Σ_z 1/ln(deg(z))       (AdamicAdarIndex) — the one float sum,
  *                                           rounded to 7 decimals for oracle parity.
  *
  * All integers exact; the wedge fan-out is Σ_z deg(z)·deg_sampled(z), sharded by
  * `uMod` — the hub guard for the quadratic wedge space.
  */
object LinkPrediction {

  def scores(spark: SparkSession, g: LinkGraph, uMod: Long = 1L): DataFrame = {
    val bi = g.bidirected.select("src", "dst")
    val deg = bi.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
    val wu = bi.select(col("src").as("z"), col("dst").as("u"))
      .filter(pmod(col("u"), lit(uMod)) === 0L)
    val wv = bi.select(col("src").as("z"), col("dst").as("v"))
    val pairs = wu.join(wv, "z")
      .filter(col("u") < col("v"))
      .join(deg.select(col("id").as("z"), col("deg").as("dz")), "z")
      .groupBy("u", "v")
      .agg(count(lit(1)).as("cn"),
        sum(lit(1.0) / log(col("dz"))).as("aa"))
    val und = g.canonicalUndirected.select(col("src").as("u"), col("dst").as("v"))
    pairs
      .join(und, Seq("u", "v"), "left_anti") // only NON-adjacent pairs are predictions
      .join(deg.select(col("id").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("id").as("v"), col("deg").as("dv")), "v")
      .select(col("u"), col("v"), col("cn"),
        (col("du") * col("dv")).as("pa"),
        (col("cn").cast("double") / (col("du") + col("dv") - col("cn"))).as("jaccard"),
        round(col("aa"), 7).as("adamic_adar"))
  }
}
