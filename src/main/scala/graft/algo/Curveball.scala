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
  * GlobalCurveballImpl.h + CurveballImpl.cpp trade mechanics,
  * CurveballGlobalTradeGenerator.h / GlobalTradeSequence.h pairing): R global trade rounds; each round pairs every
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
  *      full round-start neighborhood AND are not themselves trading this round
  *      (the simplicity guards; edges whose w is a common neighbor, the partner
  *      itself, another trading node, or an unpaired node's edges freeze for the
  *      round) and deals the pool back deterministically: the side-0 member
  *      receives exactly as many pool elements as it contributed (rank order =
  *      per-element LCG draw), so OWNED degrees — hence total degrees — are
  *      preserved exactly.
  * Collision-freedom proof: every created edge is (r, w) with r trading and w
  * NOT trading (guard 3). Two created edges can only coincide if r1 = r2 — same
  * pair, where a pooled w appears at most once (w ∉ N(partner) excludes the other
  * side's owned copy while w ∈ N(owner) holds); created-vs-frozen coincidence is
  * impossible because a created edge moved to the partner was absent at round
  * start (w ∉ N(partner)) while frozen edges existed. Because the w-not-trading
  * guard would freeze everything under a full pairing, each round executes only
  * the EVEN-numbered pairs (pairing is a fresh LCG shuffle per round, so every
  * node trades with probability 1/2 per round; run 2× rounds for the reference's
  * per-round mixing). All draws are (seed, round, id) LCG arithmetic, so the full
  * trade sequence is replayed bit-exactly by the DuckDB twin
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
      // Only even-numbered pairs execute this round (see the scaladoc proof);
      // the rest keep null p/side and freeze like unpaired nodes.
      val pa = pairing.select(col("id"), col("k"),
        when(pmod(expr("rank div 2"), lit(2L)) === 0L, expr("rank div 2")).as("p"),
        when(pmod(expr("rank div 2"), lit(2L)) === 0L,
          pmod(col("rank"), lit(2L))).as("side"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      pa.count()
      pairing.unpersist()
      val partner = pa.select(col("p"), col("id"), col("side"))
        .join(pa.select(col("p"), col("id").as("partner"),
          col("side").as("oside")), "p")
        .filter(col("side") =!= col("oside"))
        .select(col("id"), col("partner"))
      und = tradeRound(g, und, pa, partner, seed, r)
      pa.unpersist()
    }
    und.select(col("s").as("src"), col("t").as("dst"))
  }

  /** Curveball with a UNIFORM trade sequence
    * (randomization/CurveballUniformTradeGenerator.cpp:19-36 + Curveball.cpp): per
    * round, `tradesPerRound` (fst, snd) pairs drawn uniformly over the id range by
    * the shared LCG (fst = snd redrawn — here dropped, same marginal). The reference
    * applies its trade list sequentially; the distributed twin applies each round's
    * trades simultaneously, so a node drawn into several trades of one round keeps
    * only its first (smallest trade id) and trades whose partner was captured
    * elsewhere freeze for the round — conflict-free batches, exact degree
    * preservation, deterministic at any parallelism. Output (src, dst). */
  def uniformCurveball(spark: SparkSession, g: LinkGraph, rounds: Int,
                       tradesPerRound: Int, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    def draw(x: String) = expr(Generators.drawSql(x, duck = false))
    val n = g.n
    var und = g.canonicalUndirected
      .select(col("src").as("s"), col("dst").as("t"))
      .filter(col("s") =!= col("t"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    und.count()
    for (r <- 0 until rounds) {
      val cand = spark.range(tradesPerRound).toDF("p")
        .select(col("p"),
          (draw(s"p*2 + ${seed + r}*1000003") % n).as("fst"),
          (draw(s"p*2 + 1 + ${seed + r}*1000003") % n).as("snd"))
        .filter(col("fst") =!= col("snd"))
      // A node keeps only its smallest trade id; a trade survives iff both ends won.
      val firstOf = cand
        .select(explode(array(col("fst"), col("snd"))).as("id"), col("p"))
        .groupBy("id").agg(min("p").as("pmin"))
      val trades = cand
        .join(firstOf.select(col("id").as("fst"), col("pmin").as("pf")), "fst")
        .join(firstOf.select(col("id").as("snd"), col("pmin").as("ps")), "snd")
        .filter(col("p") === col("pf") && col("p") === col("ps"))
        .select("p", "fst", "snd")
      val keyed = g.vertices.withColumn("k", draw(s"id*13 + ${seed + r}*1000033"))
      val pa = keyed
        .join(trades.select(col("fst").as("id"), col("p"), lit(0L).as("side"))
          .union(trades.select(col("snd").as("id"), col("p"), lit(1L).as("side"))),
          Seq("id"), "left")
        .select(col("id"), col("k"), col("p"), col("side"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      pa.count()
      val partner = trades.select(col("fst").as("id"), col("snd").as("partner"))
        .union(trades.select(col("snd").as("id"), col("fst").as("partner")))
      und = tradeRound(g, und, pa, partner, seed, r)
      pa.unpersist()
    }
    und.select(col("s").as("src"), col("t").as("dst"))
  }

  /** One simultaneous trade round over the current undirected edge set: ownership by
    * smaller (k, id), partner-neighborhood freeze, deterministic pool re-deal (see
    * the object scaladoc). `pa` = (id, k, p, side) with p/side null for nodes not
    * trading this round; `partner` = (id, partner) for trading nodes. */
  private def tradeRound(g: LinkGraph, und: DataFrame, pa: DataFrame,
                         partner: DataFrame, seed: Long, r: Int): DataFrame = {
    def draw(x: String): org.apache.spark.sql.Column =
      expr(Generators.drawSql(x, duck = false))
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
        .join(pa.select(col("id").as("w"), col("p").as("wp")), Seq("w"), "left")
      // Freeze: owner not trading, w = partner, w in partner's round-start
      // neighborhood, or w itself trading this round (the collision-freedom guard).
      val freezeCond = col("partner").isNull || col("w") === col("partner") ||
        col("inp").isNotNull || col("wp").isNotNull
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
      val next = frozen.union(assigned)
        .select(least(col("o"), col("w")).as("s"),
          greatest(col("o"), col("w")).as("t"))
        .cutLineage
      prev.releaseState()
      next
  }
}
