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
