package graft.algo

import graft.DataFrameLineageOps

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.model.LinkGraph
import graft.synth.Generators

/** GlobalCurveball — degree-preserving graph randomization
  * (/root/reference/networkit/cpp/randomization/GlobalCurveball.cpp:34-44,
  * CurveballImpl.cpp trade mechanics): R global trade rounds; each round pairs every
  * node with a partner and redistributes the pair's disjoint neighbors while common
  * neighbors (and the intra-pair edge) stay put — the degree sequence is exactly
  * preserved and the graph stays simple.
  *
  * Re-architecture for SIMULTANEOUS distributed execution (the reference applies
  * trades sequentially in hash order, which doesn't parallelize): per round,
  *   1. nodes are ranked by a per-round LCG key (distributed rank, no global window);
  *      rank 2i / 2i+1 form pair i (an odd tail node sits out the round);
  *   2. every edge is OWNED by its endpoint with the smaller (key, id) — each edge
  *      participates in exactly ONE trade per round, so no two trades race on it;
  *   3. a trade pools the pair's owned neighbors w that are NOT in the partner's
  *      full round-start neighborhood (the simplicity guard; edges whose w is a
  *      common neighbor, the partner itself, or an unpaired node's edges freeze for
  *      the round) and deals the pool back deterministically: the side-0 member
  *      receives exactly as many pool elements as it contributed (rank order =
  *      per-element LCG draw), so OWNED degrees — hence total degrees — are
  *      preserved exactly.
  * No two trades can create the same edge: a pooled w appears once per pair (w ∉
  * N(partner) excludes the other side's owned copy) and an assigned edge's receiving
  * endpoint belongs to exactly one pair. All draws are (seed, round, id) LCG
  * arithmetic, so the full trade sequence is replayed bit-exactly by the DuckDB twin
  * (OracleSql.globalCurveball) and is partitioning-independent.
  *
  * Cost per round: one distributed rank + O(m) joins + one window partitioned by
  * pair id (the skew point is a two-hub pair — the same O(deg u + deg v) a
  * sequential trade pays; hubs pair with random partners, so the expected window
  * group is 2·avg-degree).
  */
object Curveball {

  def globalCurveball(spark: SparkSession, g: LinkGraph, rounds: Int,
                      seed: Long = 42L): DataFrame = {
    def draw(x: String) = expr(Generators.drawSql(x, duck = false))
    var und = g.canonicalUndirected
      .select(col("src").as("s"), col("dst").as("t"))
      .filter(col("s") =!= col("t"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    und.count()
    for (r <- 0 until rounds) {
      val keyed = g.vertices.withColumn("k", draw(s"id*13 + ${seed + r}*1000033"))
      val pairing = graft.layout.Layout.zipWithRankBy(
        keyed, Seq(col("k"), col("id")), "rank")
      val pa = pairing.select(col("id"), col("k"),
        expr("rank div 2").as("p"), pmod(col("rank"), lit(2L)).as("side"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      pa.count()
      pairing.unpersist()
      val partner = pa.select(col("p"), col("id"), col("side"))
        .join(pa.select(col("p"), col("id").as("partner"),
          col("side").as("oside")), "p")
        .filter(col("side") =!= col("oside"))
        .select(col("id"), col("partner"))
      // Edge ownership: the endpoint with the smaller (k, id).
      val ks = pa.select(col("id").as("s"), col("k").as("ks"))
      val kt = pa.select(col("id").as("t"), col("k").as("kt"))
      val sFirst = col("ks") < col("kt") ||
        (col("ks") === col("kt") && col("s") < col("t"))
      val ow = und.join(ks, "s").join(kt, "t")
        .select(when(sFirst, col("s")).otherwise(col("t")).as("o"),
          when(sFirst, col("t")).otherwise(col("s")).as("w"))
      val bi = und.select(col("s").as("a"), col("t").as("b"))
        .union(und.select(col("t").as("a"), col("s").as("b")))
      val rows = ow
        .join(pa.select(col("id").as("o"), col("p"), col("side")), "o")
        .join(partner.withColumnRenamed("id", "o"), Seq("o"), "left")
        .join(bi.select(col("a").as("partner"), col("b").as("w"),
          lit(true).as("inp")), Seq("partner", "w"), "left")
      val freezeCond = col("partner").isNull || col("w") === col("partner") ||
        col("inp").isNotNull
      val frozen = rows.filter(freezeCond).select(col("o"), col("w"))
      val pool = rows.filter(!freezeCond)
        .select(col("p"), col("side"), col("o"), col("partner"), col("w"))
      val cnt0 = pool.groupBy("p")
        .agg(sum(when(col("side") === 0L, 1L).otherwise(0L)).as("c0"))
      val assigned = pool.join(cnt0, "p")
        .withColumn("dw", draw(s"w*31 + p*97 + ${seed + r}*999979"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("p").orderBy(col("dw"), col("w"))).cast("long"))
        .select(
          when(col("rn") <= col("c0"),
            when(col("side") === 0L, col("o")).otherwise(col("partner")))
            .otherwise(
              when(col("side") === 1L, col("o")).otherwise(col("partner")))
            .as("o"),
          col("w"))
      val prev = und
      und = frozen.union(assigned)
        .select(least(col("o"), col("w")).as("s"),
          greatest(col("o"), col("w")).as("t"))
        .cutLineage
      prev.releaseState(); pa.unpersist()
    }
    und.select(col("s").as("src"), col("t").as("dst"))
  }
}
