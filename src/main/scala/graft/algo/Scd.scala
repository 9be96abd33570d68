package graft.algo

import graft.DataFrameLineageOps

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.model.LinkGraph

/** Selective community detection — PageRankNibble
  * (/root/reference/networkit/cpp/scd/PageRankNibble.cpp:20-100 — the
  * SelectiveCommunityDetector.h surface,
  * ApproximatePageRank.cpp:20-62): expand a seed node into a community by running the
  * Andersen–Chung–Lang push-style approximate personalized PageRank to support-sparse
  * convergence, then take the prefix of the (p/vol)-ordered sweep with minimum
  * conductance.
  *
  * Re-architecture: the reference pushes one queue entry at a time off a FIFO; here a
  * whole ROUND of active nodes (res(u) ≥ ε·vol(u)) pushes simultaneously — each round
  * is one frontier-sized join + aggregation, and the state (p, res) lives only on
  * TOUCHED nodes (support-sparse like the sequential algorithm — the point of APR is
  * that the support stays near the seed, never approaching n). Batched push preserves
  * the ACL residual invariant and the ε-approximation guarantee; push ORDER differs
  * from the queue so p differs within the bound — here deterministically, where the
  * reference's own parallel variants differ racily.
  *
  * Arithmetic is fixed-point scaled-integer (`Scale`), every update a floor division —
  * bit-identical across engines and partitionings, so the DuckDB oracle unrolls the
  * same rounds exactly. α and ε are rationals (num/den) for the same reason.
  */
object Scd {

  val Scale = 1000000000000L // 1e12: res(seed) starts at Scale

  /** Batched approximate personalized PageRank from `seed`: support table
    * (id, p, res, vol) in Scale units after at most `maxRounds` push rounds (earlier
    * if no node is active; `fixedRounds` always runs exactly maxRounds for the
    * cross-engine oracle — inactive rounds are no-ops). alpha = aNum/aDen,
    * eps = eNum/eDen (reference defaults 0.15, 1e-4). */
  def approximatePageRank(spark: SparkSession, g: LinkGraph, seed: Long,
                          aNum: Long = 15L, aDen: Long = 100L,
                          eNum: Long = 1L, eDen: Long = 10000L,
                          maxRounds: Int = 64, fixedRounds: Boolean = false): DataFrame = {
    val bi = g.bidirected.select(col("src"), col("dst"),
      col("weight").cast("long").as("w")).persist(StorageLevel.MEMORY_AND_DISK)
    val vol = bi.groupBy(col("src").as("id")).agg(sum("w").as("vol"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    vol.count()
    var state = vol.filter(col("id") === seed)
      .select(col("id"), lit(0L).as("p"), lit(Scale).as("res"), col("vol"))
      .cutLineage
    require(state.count() == 1, s"seed $seed is isolated or absent — APR undefined")
    // active: res/Scale >= eps * vol  <=>  res * eDen >= eNum * vol * Scale
    val isActive = col("res") * lit(eDen) >= col("vol") * lit(eNum) * lit(Scale)
    var round = 0
    var done = false
    while (!done && round < maxRounds) {
      val act = state.filter(isActive).select("id", "res", "vol").cutLineage
      done = act.limit(1).count() == 0 && !fixedRounds
      if (!done) {
        // mass per out-edge: floor((aDen-aNum) * res * w / (2 * aDen * vol))
        val msgs = bi.join(act.withColumnRenamed("id", "src"), "src")
          .groupBy(col("dst").as("id"))
          .agg(sum(expr(s"((${aDen - aNum} * res) * w) div (${2 * aDen} * vol)"))
            .as("m_in"))
        val next = state
          .join(act.select(col("id"), lit(true).as("is_act")), Seq("id"), "left")
          .join(msgs, Seq("id"), "left")
          .select(col("id"),
            expr(s"p + (CASE WHEN is_act THEN ($aNum * res) div $aDen ELSE 0 END)").as("p"),
            expr(s"(CASE WHEN is_act THEN (${aDen - aNum} * res) div ${2 * aDen} " +
              "ELSE res END) + coalesce(m_in, 0)").as("res"),
            col("vol"))
        val newTouched = msgs.join(state.select("id"), Seq("id"), "left_anti")
          .join(vol, "id")
          .select(col("id"), lit(0L).as("p"), col("m_in").as("res"), col("vol"))
        val prev = state
        state = next.union(newTouched).cutLineage
        prev.releaseState()
      }
      act.releaseState()
      round += 1
    }
    bi.unpersist(); vol.unpersist()
    state.select("id", "p", "res", "vol")
  }

  /** The conductance sweep (PageRankNibble.cpp:20-80): rank the support by
    * score = p/vol DESC (integer-scaled; ties by id — the deterministic refinement of
    * the reference's score-only sort), then per prefix k: cum_vol(k),
    * cut(k) = cum_vol(k) − 2·intra(k), denom(k) = min(cum_vol, totalVol − cum_vol).
    * EVERY column is an exact integer (conductance itself = cut/denom is left to the
    * caller), so the sweep table is bit-identical across engines. Prefix sums are
    * distributed (Layout.prefixSum); intra-edge events land at max(rank_a, rank_b). */
  def sweep(spark: SparkSession, g: LinkGraph, support: DataFrame): DataFrame = {
    val totalVol = g.canonicalUndirected
      .agg((lit(2L) * sum("weight")).cast("long")).head().getLong(0)
    val scored = support.filter(col("p") > 0L || col("res") > 0L)
      .select(col("id"), col("p"), col("vol"),
        expr("(p * 1000000) div vol").as("score"))
    val ranked = graft.layout.Layout.zipWithRankBy(scored,
      Seq(col("score").desc, col("id").asc), "rank")
    val cumVol = graft.layout.Layout.prefixSum(
      ranked.select(col("rank"), col("id"), col("p"), col("vol"), col("score")),
      Seq(col("rank").asc), "vol", "cum_before")
      .select(col("rank"), col("id"), col("p"), col("vol"), col("score"),
        (col("cum_before") + col("vol")).as("cum_vol"))
    val rk = ranked.select(col("id"), col("rank"))
    val ev = g.canonicalUndirected
      .join(rk.select(col("id").as("src"), col("rank").as("ra")), "src")
      .join(rk.select(col("id").as("dst"), col("rank").as("rb")), "dst")
      .select(greatest(col("ra"), col("rb")).as("erank"),
        col("weight").cast("long").as("w"))
      .groupBy("erank").agg(sum("w").as("wsum"))
    val withEv = cumVol.join(ev, col("rank") === col("erank"), "left")
      .select(col("rank"), col("id"), col("p"), col("vol"), col("score"),
        col("cum_vol"), coalesce(col("wsum"), lit(0L)).as("wsum"))
    graft.layout.Layout.prefixSum(withEv, Seq(col("rank").asc), "wsum", "intra_before")
      .select(col("rank"), col("id"), col("p"), col("vol"), col("cum_vol"),
        (col("cum_vol") - lit(2L) * (col("intra_before") + col("wsum"))).as("cut"),
        least(col("cum_vol"), lit(totalVol) - col("cum_vol")).as("denom"))
  }

  /** PageRankNibble end to end: APR from the seed, sweep, return the members of the
    * minimum-conductance prefix (ties: smallest prefix; prefix must be < n —
    * PageRankNibble.cpp:70). The fraction argmin cut/denom is computed by exact
    * cross-multiplication, no floating point. */
  def pageRankNibble(spark: SparkSession, g: LinkGraph, seed: Long,
                     aNum: Long = 15L, aDen: Long = 100L,
                     eNum: Long = 1L, eDen: Long = 10000L,
                     maxRounds: Int = 64): DataFrame = {
    val apr = approximatePageRank(spark, g, seed, aNum, aDen, eNum, eDen, maxRounds)
    val sw = sweep(spark, g, apr).persist(StorageLevel.MEMORY_AND_DISK)
    val cands = sw.filter(col("rank") < g.n - 1 && col("denom") > 0L)
      .select("rank", "cut", "denom").collect() // support-sized: small by design
    require(cands.nonEmpty, "sweep produced no valid prefix")
    val best = cands.minBy { r =>
      (BigInt(r.getAs[Long]("cut")) * 1000000000L / r.getAs[Long]("denom"),
        r.getAs[Long]("rank"))
    }.getAs[Long]("rank")
    val out = sw.filter(col("rank") <= best).select("id", "rank", "cut", "denom")
      .cutLineage
    sw.unpersist()
    out
  }

  /** GCE — greedy community expansion from a seed, "M" objective
    * (/root/reference/networkit/cpp/scd/GCE.cpp:43-200): grow C one node per step,
    * always taking the shell node maximizing M' = intWeight' / extWeight', stopping
    * when no addition improves M. Adding shell node v with degInt(v) = neighbors in C
    * and degExt(v) = neighbors outside: int' = int + degInt, ext' = ext − degInt +
    * degExt. The reference walks one node's neighborhood at a time off a hash map and
    * breaks ties by map iteration order; here each step computes ALL shell degrees in
    * one frontier-restricted join (edges into C, grouped by the outside endpoint) and
    * ties break deterministically (min id). The M-comparison is exact-integer
    * cross-multiplication — valid while vol(C)² < 2^63, always true for the local
    * communities GCE targets. Always runs exactly `maxSteps` unrolled steps (no-op
    * steps once no candidate improves — the oracle's fixed schedule). Output
    * (id, ord, deg_int): join order + internal degree at join time (seed: ord=0). */
  def gce(spark: SparkSession, g: LinkGraph, seed: Long, maxSteps: Int = 20): DataFrame = {
    import spark.implicits._
    val bi = g.bidirected.select("src", "dst").persist(StorageLevel.MEMORY_AND_DISK)
    val deg = bi.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val seedDeg = deg.filter(col("id") === seed).select("deg").collect()
    require(seedDeg.nonEmpty, s"seed $seed is isolated or absent — GCE undefined")
    var members = Seq((seed, 0L, 0L)).toDF("id", "ord", "deg_int").cutLineage
    var intW = 0L
    var extW = seedDeg.head.getLong(0)
    var step = 1
    var stuck = false
    while (step <= maxSteps && !stuck && extW > 0L) {
      // Shell degrees: edges whose dst is in C, grouped by the src endpoint outside C.
      val shell = bi
        .join(broadcast(members.select(col("id").as("dst"))), "dst")
        .join(members.select(col("id").as("src")), Seq("src"), "left_anti")
        .groupBy(col("src").as("id")).agg(count(lit(1)).as("di"))
        .join(deg, "id")
        .select(col("id"), col("di"), (col("deg") - col("di")).as("dx"),
          (lit(extW) - col("di") + (col("deg") - col("di"))).as("ext2"))
      // Strict improvement: ext2 == 0 (whole component absorbed — treat as +inf) or
      // (int+di)·ext > int·ext2; argmax of M' by cross-multiplied comparison.
      val cands = shell
        .filter(col("ext2") === 0L ||
          (lit(intW) + col("di")) * lit(extW) > lit(intW) * col("ext2"))
        .select(col("id"), col("di"), col("ext2"))
        .collect() // shell of a local community: bounded by vol(C)
      if (cands.isEmpty) stuck = true
      else {
        // Defined selection order (the oracle replays it exactly): floor-scaled
        // M'·10^12 descending, ties min id; ext2 = 0 ranks above everything.
        val best = cands.minBy { r =>
          val di = r.getAs[Long]("di"); val ext2 = r.getAs[Long]("ext2")
          val key = if (ext2 == 0L) BigInt(-1) << 100
                    else -(BigInt(intW + di) * 1000000000000L / ext2)
          (key, r.getAs[Long]("id"))
        }
        val bid = best.getAs[Long]("id"); val di = best.getAs[Long]("di")
        intW += di
        extW = best.getAs[Long]("ext2")
        val prev = members
        members = members
          .union(Seq((bid, step.toLong, di)).toDF("id", "ord", "deg_int")).cutLineage
        prev.releaseState()
      }
      step += 1
    }
    bi.unpersist(); deg.unpersist()
    members
  }
}
