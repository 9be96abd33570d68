package graft.algo

import graft.DataFrameLineageOps

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.model.LinkGraph

/** Shortest-path SAMPLING estimators (the Mahmoody/KADABRA family):
  * ApproxGroupBetweenness (/root/reference/networkit/cpp/centrality/
  * ApproxGroupBetweenness.cpp:36-137 — Mahmoody et al. "Scalable Betweenness
  * Centrality Maximization via Sampling": sampled pairs → one shortest path each →
  * greedy max-coverage over the path hyperedges) and the fixed-budget twin of
  * KadabraBetweenness's estimator (/root/reference/networkit/cpp/centrality/
  * KadabraBetweenness.cpp — per-pair single-shortest-path sampling; the reference
  * adds adaptive Rademacher stopping, this engine exposes the deterministic
  * fixed-sample estimate the oracle can replay).
  *
  * The reference samples uniform pairs and a uniform shortest path per pair; the
  * deterministic twin draws pairs from the shared LCG and takes the
  * LEXICOGRAPHICALLY SMALLEST shortest path (predecessor = min-id neighbor one
  * level closer to the source). Everything is batched: ONE multi-source BFS over
  * the distinct sources, then the backward walks advance ALL pairs in lockstep —
  * one frontier join per hop level, never one BFS per sample. */
object PathSampling {

  /** Deterministic sampled pairs j = 0..samples−1: s = draw(2j+B) % n,
    * t = draw(2j+1+B) % n (B = seed·92821), kept when s ≠ t and both ids exist.
    * Output (j, s, t). */
  def samplePairs(spark: SparkSession, g: LinkGraph, samples: Int,
                  seed: Long): DataFrame = {
    val b = seed * 92821L
    val n = g.n
    val draw = (x: String) => graft.synth.Generators.drawSql(x, duck = false)
    val raw = spark.range(samples).select(col("id").as("j"),
      (expr(draw(s"id * 2 + $b")) % n).as("s"),
      (expr(draw(s"id * 2 + 1 + $b")) % n).as("t"))
      .filter(col("s") =!= col("t"))
    raw.join(g.vertices.select(col("id").as("s")), Seq("s"))
      .join(g.vertices.select(col("id").as("t")), Seq("t"))
      .select("j", "s", "t")
  }

  /** One lexicographically-smallest shortest path per sampled pair, as hyperedge
    * rows (j, id) over the INTERIOR nodes (endpoints excluded — Brandes pair
    * dependency semantics). Pairs in different components contribute nothing
    * (Mahmoody Lemma 3). `maxLevels` caps the forward BFS. */
  def pathHyperedges(spark: SparkSession, g: LinkGraph, pairs: DataFrame,
                     maxLevels: Int = 32): DataFrame = {
    val sources = pairs.select(col("s").as("id")).distinct()
    val dist = Betweenness.msBfs(spark, g, sources, maxLevels)._1
      .persist(StorageLevel.MEMORY_AND_DISK)
    dist.count()
    val bi = g.bidirected.select("src", "dst").persist(StorageLevel.MEMORY_AND_DISK)
    bi.count()
    // Walk state (j, s, cur, rem): from (t, dist(s,t)) back to the source.
    var state = pairs
      .join(dist.select(col("s"), col("id").as("t"), col("dist").as("rem")),
        Seq("s", "t"))
      .select(col("j"), col("s"), col("t").as("cur"), col("rem"))
      .cutLineage
    var interior = spark.emptyDataFrame
    var first = true
    var more = state.filter(col("rem") > 1L).limit(1).count() > 0
    while (more) {
      val stepped = state.filter(col("rem") > 1L)
        .join(bi, col("cur") === bi("dst"))
        .join(dist.select(col("s"), col("id").as("src"), col("dist").as("wd")),
          Seq("s", "src"))
        .filter(col("wd") === col("rem") - 1L)
        .groupBy("j", "s", "rem")
        .agg(min("src").as("cur"))
        .select(col("j"), col("s"), col("cur"), (col("rem") - 1L).as("rem"))
        .cutLineage
      val emitted = stepped.select(col("j"), col("cur").as("id"))
      // Materialize the accumulated interior BEFORE releasing the superseded
      // state — the union references the prior rounds' checkpoint blocks.
      val prevInterior = if (first) null else interior
      interior = (if (first) emitted else interior.union(emitted)).cutLineage
      if (prevInterior != null) prevInterior.releaseState()
      first = false
      val prev = state
      state = stepped
      prev.releaseState()
      more = state.filter(col("rem") > 1L).limit(1).count() > 0
    }
    val out = if (first) pairs.select(col("j"), col("s").as("id")).limit(0)
              else interior
    dist.unpersist(); bi.unpersist()
    out
  }

  /** KADABRA-estimator twin: bc_est(v) = (# sampled paths through v) / samples.
    * Output (id, cnt, bc_est) over all vertices. */
  def betweennessEstimate(spark: SparkSession, g: LinkGraph, samples: Int,
                          seed: Long, maxLevels: Int = 32): DataFrame = {
    val h = pathHyperedges(spark, g,
      samplePairs(spark, g, samples, seed), maxLevels)
    g.vertices.join(h.groupBy("id").agg(count(lit(1)).as("cnt")), Seq("id"), "left")
      .select(col("id"), coalesce(col("cnt"), lit(0L)).as("cnt"))
      .withColumn("bc_est", col("cnt").cast("double") / samples)
  }

  /** ApproxBetweenness with the ADAPTIVE Riondato–Kornaropoulos sample bound
    * (/root/reference/networkit/cpp/centrality/ApproxBetweenness.cpp:30-56):
    * r = ⌈(c/ε²)·(⌊log₂(vd−2)⌋ + 1 − ln δ)⌉ path samples, each contributing 1/r to
    * every interior node of one sampled shortest path — the ε-δ guarantee the
    * round-3 fixed-budget twin lacked. Deterministic re-expression:
    *   - vd (the reference's estimatedPedantic vertex diameter) = two-sweep lower
    *     bound + 1 — deterministic, two BFS passes;
    *   - ⌊log₂⌋ in exact integer arithmetic (numberOfLeadingZeros / a generate_series
    *     max in the twin) and −ln δ passed as the literal `lnInvDelta`, so both
    *     engines evaluate the same finite double expression — no library log calls
    *     whose last-ulp could flip the ceil;
    *   - the sample budget is capped at `maxSamples` (the twin generates the same
    *     capped universe and filters j < r).
    * Sampling/backward-walk machinery is [[samplePairs]]/[[pathHyperedges]] — one
    * msBFS over distinct sources + lockstep walks, never one BFS per sample.
    * Output (id, cnt, bc_est) with bc_est = cnt/r; all-zero when vd ≤ 2 (reference
    * early-out). */
  def approxBetweennessAdaptive(spark: SparkSession, g: LinkGraph,
                                cEps: Long = 25L,
                                lnInvDelta: Double = 2.302585092994046,
                                maxSamples: Int = 512, seed: Long = 42L,
                                maxLevels: Int = 32): DataFrame = {
    val lb = Distances.diameterTwoSweep(spark, g).head().getLong(0)
    val vd = lb + 1L
    val zeros = g.vertices.select(col("id"), lit(0L).as("cnt"), lit(0.0).as("bc_est"))
    if (vd <= 2L) zeros
    else {
      val ilog2 = 63 - java.lang.Long.numberOfLeadingZeros(vd - 2L)
      val r = math.min(maxSamples.toLong,
        math.ceil(cEps * (ilog2 + 1 + lnInvDelta)).toLong).toInt
      val h = pathHyperedges(spark, g, samplePairs(spark, g, r, seed), maxLevels)
      g.vertices.join(h.groupBy("id").agg(count(lit(1)).as("cnt")), Seq("id"), "left")
        .select(col("id"), coalesce(col("cnt"), lit(0L)).as("cnt"))
        .withColumn("bc_est", col("cnt").cast("double") / r)
    }
  }

  /** KADABRA with the reference's ADAPTIVE two-phase stopping schedule
    * (/root/reference/networkit/cpp/centrality/KadabraBetweenness.cpp:309-407 run():
    * ω = 0.5/ε²·(log₂(diam−1) + 1 + ln(0.5/δ)) max samples; a τ = ω/startFactor
    * warm-up phase whose counts seed per-node failure-probability guesses
    * (computeDeltaGuess:190-248); then sampling resumes from zero and a Borassi–
    * Natale Chernoff status check (computeFinished:50-91, computeF/computeG:94-112)
    * stops the run as soon as EVERY node's lower/upper error bound is < ε, else at
    * ω). Deterministic distributed re-expression:
    *   - samples are the shared-LCG pair sequence + lexicographically-smallest
    *     shortest paths ([[samplePairs]]/[[pathHyperedges]] — ONE msBFS over the ω
    *     distinct sources; a round then only *counts* rows with j < t, so the
    *     adaptive schedule costs one small aggregation per check, not a re-walk);
    *   - the reference checks status every itersPerStep samples; a distributed
    *     engine checks on a ROUND-DOUBLING schedule t ∈ {τ, 2τ, 4τ, …} ∩ [1, ω)
    *     (O(log ω) driver round-trips instead of O(ω));
    *   - computeDeltaGuess's exp()-based per-node δ allocation is quantized to
    *     POWERS OF TWO so both engines evaluate identical IEEE expressions (exp is
    *     not correctly rounded; sqrt and +,−,×,÷ are): node v gets weight
    *     w_v = c1_v + 1 from its τ-phase count, δ_v = (δ/2)·2^(−q_v) with
    *     q_v = ⌊log₂ W⌋ + 1 − ⌊log₂ w_v⌋ (W = Σw_v). Since 2^(−q_v) ≤ w_v/W,
    *     Σ(δ_L,v + δ_U,v) ≤ δ — the reference's union-bound invariant — while
    *     high-count nodes get the larger budgets exactly as computeDeltaGuess
    *     intends. ln(1/δ_v) = ln(2/δ) + q_v·ln2 from literals and integers, so
    *     engine and oracle agree bit-for-bit;
    *   - the stop decision folds nodes into (c1, ct) count classes (the bound
    *     depends only on the two integers), so each check collects a few hundred
    *     class rows, never per-node state.
    * In absolute mode (k = 0, the only mode exposed) the cap ω usually binds — as
    * in the reference, whose absolute run loop rarely certifies ε before ω; the
    * schedule demonstrably stops early on degenerate inputs (KadabraSpec).
    * Output (id, cnt, t_star, bc_est = cnt/t_star); zeros with t_star = 0 when no
    * pair is reachable (vd ≤ 1). */
  def kadabraAdaptive(spark: SparkSession, g: LinkGraph,
                      err: Double = 0.1,
                      lnHalfInvDelta: Double = 1.6094379124341003, // ln(0.5/δ), δ = 0.1
                      lnTwoInvDelta: Double = 2.995732273553991,   // ln(2/δ),  δ = 0.1
                      startFactor: Long = 100L,
                      maxSamples: Int = 512, seed: Long = 42L,
                      maxLevels: Int = 32): DataFrame = {
    val LN2 = 0.6931471805599453
    val THIRD = 1.0 / 3
    val lb = Distances.diameterTwoSweep(spark, g).head().getLong(0)
    val vd = lb + 1L // deterministic diameter estimate; ω uses log₂(vd − 1)
    if (vd <= 1L)
      g.vertices.select(col("id"), lit(0L).as("cnt"), lit(0L).as("t_star"),
        lit(0.0).as("bc_est"))
    else {
      val k = 63 - java.lang.Long.numberOfLeadingZeros(vd - 1L)
      val omega = math.min(maxSamples.toLong,
        math.ceil((0.5 / (err * err)) * (k + 1 + lnHalfInvDelta)).toLong)
      val tau = math.max(1L, omega / startFactor)
      val h = pathHyperedges(spark, g,
          samplePairs(spark, g, omega.toInt, seed), maxLevels)
        .persist(StorageLevel.MEMORY_AND_DISK)
      h.count()
      // τ-phase per-node counts → power-of-two δ budgets.
      val c1 = h.filter(col("j") < tau).groupBy("id").agg(count(lit(1)).as("c1"))
      val w = c1.agg(coalesce(sum("c1"), lit(0L))).head().getLong(0) + g.n // Σ(c1_v + 1) over all nodes
      val ilogW = 63 - java.lang.Long.numberOfLeadingZeros(w)
      val byNode = g.vertices.join(c1, Seq("id"), "left")
        .select(col("id"), coalesce(col("c1"), lit(0L)).as("c1"))
      val omegaD = omega.toDouble
      def finishedAt(t: Long): Boolean = {
        val ct = h.filter(col("j") < t).groupBy("id").agg(count(lit(1)).as("ct"))
        val classes = byNode.join(ct, Seq("id"), "left")
          .select(col("c1"), coalesce(col("ct"), lit(0L)).as("ct"))
          .distinct().collect()
        classes.forall { row =>
          val c1v = row.getLong(0); val ctv = row.getLong(1)
          val qv = ilogW + 1 - (63 - java.lang.Long.numberOfLeadingZeros(c1v + 1L))
          val lV = lnTwoInvDelta + qv * LN2
          val bt = ctv.toDouble / t
          val tmpL = omegaD / t - THIRD
          val tmpU = omegaD / t + THIRD
          val errL = math.min(
            lV / t * (-tmpL + math.sqrt(tmpL * tmpL + 2.0 * bt * omegaD / lV)), bt)
          val errU = math.min(
            lV / t * (tmpU + math.sqrt(tmpU * tmpU + 2.0 * bt * omegaD / lV)), 1.0 - bt)
          errL < err && errU < err
        }
      }
      val schedule =
        Iterator.iterate(tau)(_ * 2L).takeWhile(_ < omega).toList
      val tStar = schedule.find(finishedAt).getOrElse(omega)
      val cnt = h.filter(col("j") < tStar).groupBy("id").agg(count(lit(1)).as("cnt"))
      val out = g.vertices.join(cnt, Seq("id"), "left")
        .select(col("id"), coalesce(col("cnt"), lit(0L)).as("cnt"),
          lit(tStar).as("t_star"))
        .withColumn("bc_est", col("cnt").cast("double") / tStar)
      out
    }
  }

  /** ApproxGroupBetweenness: greedy max-coverage of the sampled-path hyperedges —
    * k rounds of (coverage-count argmax over ALIVE hyperedges, ties → smaller id),
    * each round one aggregation + one anti-join (the groupDegree greedy shape).
    * Output (ord, id, gain). */
  def approxGroupBetweenness(spark: SparkSession, g: LinkGraph, k: Int,
                             samples: Int, seed: Long,
                             maxLevels: Int = 32): DataFrame = {
    import spark.implicits._
    val h0 = pathHyperedges(spark, g,
      samplePairs(spark, g, samples, seed), maxLevels)
      .persist(StorageLevel.MEMORY_AND_DISK)
    h0.count()
    var h = h0
    var picked = List.empty[(Long, Long, Long)] // (ord, id, gain)
    var ord = 0L
    while (ord < k) {
      val chosen = g.vertices
        .join(h.groupBy("id").agg(count(lit(1)).as("gain")), Seq("id"), "left")
        .select(col("id"), coalesce(col("gain"), lit(0L)).as("gain"))
        .filter(!col("id").isInCollection(
          if (picked.isEmpty) Seq(-1L) else picked.map(_._2)))
        .orderBy(desc("gain"), asc("id")).limit(1)
        .head()
      val v = chosen.getLong(0)
      picked = picked :+ ((ord, v, chosen.getLong(1)))
      val dead = h.filter(col("id") === v).select("j").distinct()
      h = h.join(dead, Seq("j"), "left_anti").cutLineage
      ord += 1
    }
    h0.unpersist()
    picked.toDF("ord", "id", "gain")
  }
}
