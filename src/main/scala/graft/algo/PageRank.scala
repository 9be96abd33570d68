package graft.algo

import graft.DataFrameLineageOps

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.model.LinkGraph
import graft.iterate.IterativeJob

/** PageRank with NetworKit's exact semantics
  * (/root/reference/networkit/cpp/centrality/PageRank.cpp:20-71):
  *
  *   1. pr[u] = 1/n                                                  (:24-26)
  *   2. deg[u] = weighted OUT-degree                                  (:30-33, Graph.cpp:536-545)
  *   3. pr'[u] = damp * SUM over in-edges (v->u) of pr[v]*w/deg[v] + (1-damp)/n   (:37-46)
  *   4. stop when L2 norm of the delta vector <= tol (checked pre-normalization)  (:48-57)
  *   5. post-normalize to sum 1; dangling mass is NOT redistributed — the final
  *      normalization compensates                                     (:62-68)
  *
  * Each iteration is one Catalyst-planned join + aggregation:
  *   contribs = edges |><| ranks on src, groupBy dst, sum(rank * w / outW)
  * then a right join against the vertex universe so sinks (no in-edges) still receive
  * the teleport term. The per-edge w/outW factor is precomputed once and persisted, so
  * the loop body shuffles only (dst, contribution) pairs.
  */
object PageRank {

  final case class Result(ranks: DataFrame, iterations: Int, finalDelta: Double)

  /** `warmStart`: optional (id, score) to seed the iteration — the DynPageRank path
    * (the reference's dynamic centralities re-run from the previous solution after a
    * graph delta): after an edge batch, restart from the old ranks and converge in a
    * few iterations instead of from-scratch. */
  def run(spark: SparkSession, g: LinkGraph, damp: Double = 0.85, tol: Double = 1e-8,
          maxIter: Int = 200, checkpointDir: Option[String] = None,
          warmStart: Option[DataFrame] = None): Result = {
    val n = g.n
    // Per-edge transfer coefficient: w(v,u) / weightedOutDegree(v). Persisted once.
    val transfer = g.edges
      .join(g.outDegrees.select(col("id").as("src"), col("outW")), "src")
      .select(col("src"), col("dst"), (col("weight") / col("outW")).as("coef"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    transfer.count()

    val job = IterativeJob(spark, checkpointDir, "pagerank")
    // Resume from the last complete checkpoint if one exists (north rule: jobs are
    // resumable mid-computation from the manifest).
    val resumeFrom = job.lastCompleteIteration
    var ranks =
      if (resumeFrom >= 0) job.load(resumeFrom).select("id", "score")
      else job.init(warmStart match {
        // New vertices absent from the warm state get the uniform prior.
        case Some(w) => g.vertices
          .join(w.select(col("id"), col("score").as("ws")), Seq("id"), "left")
          .select(col("id"), coalesce(col("ws"), lit(1.0 / n)).as("score"))
        case None => g.vertices.select(col("id"), lit(1.0 / n).as("score"))
      })
    var iter = resumeFrom + 1
    var delta = Double.MaxValue
    val teleport = (1.0 - damp) / n
    while (iter < maxIter && delta > tol) {
      // Co-partitioned shuffle-hash joins: `transfer` is persisted hash(src, P); the
      // rank state leaves each iteration hash(id, P) (groupBy(dst) exchange + alias-
      // aware propagation through localCheckpoint), so both joins below run exchange-
      // free — the ONLY per-iteration shuffle is the m contribution rows, with map-side
      // partial aggregation. Broadcasting the rank state instead would re-collect and
      // re-ship n rows through the driver every iteration (it mutates each round) and
      // bills every task for deserializing it — measurably the scaling killer.
      val contribs = transfer
        .join(ranks.select(col("id").as("src"), col("score")).hint("shuffle_hash"), "src")
        .groupBy(col("dst"))
        .agg(sum(col("score") * col("coef")).as("mass"))
      // Join against the previous ranks (same id universe as the vertex table) so the
      // old score rides along into the checkpoint — the L2 delta then needs no second
      // shuffle join, just a scan of the materialized iteration state.
      val next = ranks.select(col("id"), col("score").as("prev"))
        .join(contribs.withColumnRenamed("dst", "id").hint("shuffle_hash"), Seq("id"), "left")
        .select(col("id"),
          (lit(damp) * coalesce(col("mass"), lit(0.0)) + lit(teleport)).as("score"),
          col("prev"))
      val checked = job.step(iter, next)
      delta = math.sqrt(
        checked.agg(sum(pow(col("score") - col("prev"), 2.0))).head().getDouble(0))
      job.recordMetric(iter, "l2_delta", delta)
      ranks = checked.select("id", "score")
      iter += 1
    }
    // Final sum-to-1 normalization (reference :62-68).
    val total = ranks.agg(sum("score")).head().getDouble(0)
    val out = ranks.select(col("id"), (col("score") / total).as("score"))
    transfer.unpersist()
    Result(out, iter, delta)
  }

  /** Fixed-point (scaled-integer) PageRank: ranks held as `round(score * 1e12)`-style
    * longs, contributions use integer division — every operation is exact and
    * order-independent, so results are bit-identical across engines, partitionings and
    * parallelism levels. Used by the cross-engine oracle gate; the float [[run]] is the
    * production scorer. Unweighted (web) graphs only. */
  def fixedPoint(spark: SparkSession, g: LinkGraph, iterations: Int,
                 scale: Long = 1000000000000L): DataFrame = {
    val n = g.n
    val outDeg = g.edges.groupBy("src").agg(count(lit(1)).as("outDeg"))
    val e = g.edges.select(col("src"), col("dst"))
      .join(outDeg, "src")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val init = scale / n
    val tele = (15L * init) / 100L
    var ranks = g.vertices.select(col("id"), lit(init).as("pr"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    ranks.count()
    var i = 0
    while (i < iterations) {
      val contribs = e
        .join(ranks.withColumnRenamed("id", "src"), "src")
        .select(col("dst"), expr("pr div outDeg").as("c"))
        .groupBy("dst").agg(sum("c").as("mass"))
      val next = g.vertices
        .join(contribs.withColumnRenamed("dst", "id"), Seq("id"), "left")
        .select(col("id"),
          (expr("85 * coalesce(mass, 0L) div 100") + lit(tele)).as("pr"))
      val prev = ranks
      ranks = next.cutLineage
      prev.unpersist()
      i += 1
    }
    e.unpersist()
    ranks
  }

  /** TrustRank / personalized PageRank (Gyöngyi, Garcia-Molina & Pedersen, VLDB
    * 2004 — the canonical web-spam analysis operator; beyond the reference's
    * uniform-teleport PageRank but the same iteration): teleport mass goes ONLY to
    * a trusted seed set, so scores measure link-proximity to the seeds and pages
    * unreachable from them converge to 0. Scaled-integer fixed-point twin of
    * [[fixedPoint]] (same per-iteration plan: one co-partitioned m-row join +
    * partial aggregation; the seed flag rides the vertex table as a 0/1 column).
    * Output (id, pr) with pr ≈ scale · trust score. */
  def trustRankFixed(spark: SparkSession, g: LinkGraph, seeds: DataFrame,
                     iterations: Int, scale: Long = 1000000000000L): DataFrame = {
    val sTbl = seeds.select(col("id")).distinct().withColumn("s", lit(1L))
    val verts = g.vertices.join(sTbl, Seq("id"), "left")
      .select(col("id"), coalesce(col("s"), lit(0L)).as("s"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    verts.count()
    // Seed count derived from the PERSISTED flag column, not a second evaluation of
    // the caller's `seeds` plan (ADVICE r3: a nondeterministic seeds source could
    // otherwise make the teleport scale disagree with the joined flags).
    val sc = verts.agg(sum("s")).head().getLong(0)
    require(sc > 0, "trustRank needs a non-empty seed set")
    val init = scale / sc
    val tele = (15L * init) / 100L
    val outDeg = g.edges.groupBy("src").agg(count(lit(1)).as("outDeg"))
    val e = g.edges.select(col("src"), col("dst"))
      .join(outDeg, "src")
      .persist(StorageLevel.MEMORY_AND_DISK)
    var ranks = verts.select(col("id"), (col("s") * init).as("pr")).cutLineage
    var i = 0
    while (i < iterations) {
      val contribs = e
        .join(ranks.withColumnRenamed("id", "src"), "src")
        .select(col("dst"), expr("pr div outDeg").as("c"))
        .groupBy("dst").agg(sum("c").as("mass"))
      val prev = ranks
      ranks = verts
        .join(contribs.withColumnRenamed("dst", "id"), Seq("id"), "left")
        .select(col("id"),
          (expr("85 * coalesce(mass, 0L) div 100") + col("s") * tele).as("pr"))
        .cutLineage
      prev.releaseState()
      i += 1
    }
    e.unpersist(); verts.unpersist()
    ranks
  }

  /** HITS hubs & authorities (Kleinberg, JACM 1999 — the other canonical web-link
    * eigenvector pair; beyond the reference, which ships only PageRank/eigenvector).
    * Fixed-point scaled-integer twin: per iteration the authority vector is the
    * in-edge sum of hub scores L1-normalized to `scale` (truncating division by the
    * collected total — a scalar, so the normalize stays one Catalyst expression),
    * then hubs likewise from the new authorities over out-edges. Two m-row
    * join+partial-agg exchanges per iteration — the PageRank plan shape, twice.
    * Output (id, hub, auth). */
  def hitsFixed(spark: SparkSession, g: LinkGraph, iterations: Int,
                scale: Long = 1000000L): DataFrame = {
    val e = g.edges.select(col("src"), col("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    def normalized(raw: DataFrame, valCol: String): DataFrame = {
      // raw: (id, r) over a SUBSET of vertices; normalize over the full vertex set.
      val total = raw.agg(coalesce(sum("r"), lit(0L))).head().getLong(0)
      g.vertices.join(raw, Seq("id"), "left")
        .select(col("id"),
          (if (total == 0L) lit(0L)
           else expr(s"coalesce(r, 0L) * $scale div $total")).as(valCol))
        .cutLineage
    }
    // Hubs start at 1 (not `scale`): normalization makes the starting magnitude
    // irrelevant — floor((r·k·S)/(t·k)) = floor(r·S/t) for any k — and the
    // pre-normalization product indeg·h then stays < 2^63 for in-degrees up to
    // ~9.2e12 instead of ~9.2e6 (ADVICE r3: a web hub above 9.2e6 in-links would
    // have wrapped in Spark while DuckDB errors, breaking cross-engine parity).
    var hub = g.vertices.select(col("id"), lit(1L).as("h")).cutLineage
    var auth: DataFrame = g.vertices.select(col("id"), lit(0L).as("a")).cutLineage
    var i = 0
    while (i < iterations) {
      val aRaw = e.join(hub.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id")).agg(sum("h").as("r"))
      val prevA = auth
      auth = normalized(aRaw, "a")
      prevA.releaseState()
      val hRaw = e.join(auth.withColumnRenamed("id", "dst"), "dst")
        .groupBy(col("src").as("id")).agg(sum("a").as("r"))
      val prevH = hub
      hub = normalized(hRaw, "h")
      prevH.releaseState()
      i += 1
    }
    val out = hub.join(auth, Seq("id"))
      .select(col("id"), col("h").as("hub"), col("a").as("auth"))
    e.unpersist()
    out
  }
}
