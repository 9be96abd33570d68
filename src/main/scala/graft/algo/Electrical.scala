package graft.algo

import graft.DataFrameLineageOps

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.model.LinkGraph

/** Electrical (Laplacian) operator family: effective resistance, commute-time
  * distance, spanning-edge centrality, electrical closeness.
  *
  * Reference: /root/reference/networkit/cpp/distance/CommuteTimeDistance.cpp,
  * centrality/EffectiveResistanceDistance.cpp, centrality/SpanningEdgeCentrality.cpp,
  * centrality/ApproxElectricalCloseness.cpp — all built on the LAMG multigrid solver
  * there (declared a non-goal in SURVEY §7.5). Revisited Spark-first: every member
  * needs only solutions of L x = b, and the whole family needs just a HANDFUL of
  * right-hand sides — exact pair probes (e_u − e_v) for resistance / commute
  * distances, and k = O(log n) Spielman–Srivastava JLT probes (random ±1 edge signs
  * pushed through Bᵀ) for the all-edges / all-nodes estimators. All solves run
  * BATCHED through one damped Jacobi iteration whose per-round cost is exactly one
  * PageRank round (one bidirected-edge join + partial aggregation keyed by vertex),
  * times the probe count — the same one-m-row-exchange-per-iteration scale story as
  * PageRank. At cluster scale the matvec primitive is unchanged; the damped Jacobi
  * loop would swap for Chebyshev/CG acceleration (same joins, fewer rounds). Jacobi
  * is used here because its truncating-integer update replays bit-exactly in the
  * DuckDB oracle.
  *
  * State is scaled int64 (x ≈ scale · potential). Spark's `div` and DuckDB's `//`
  * both truncate toward zero, and `%` keeps the dividend's sign in both engines, so
  * the iteration is cross-engine exact including negative potentials.
  */
object Electrical {

  /** Default potential scale: 2^14 keeps every downstream square/sum (diff², n·y'²
    * with y' = x div 64) far inside int64 at web-fixture magnitudes. */
  val Scale = 16384L

  /** Damped Jacobi sweep for the grounded Laplacian system L x = b, batched over all
    * probes `q` at once. `b` is (id, q, b) integer rows (absent = 0) with
    * Σ_id b = 0 per probe on each component (a consistent system); the returned
    * state (id, q, x) covers EVERY vertex × probe, with x ≈ scale · potential and
    * x(ground, ·) = 0. Per round (all integer, truncating division):
    *
    *   x'_i = (x_i + (scale·b_i + Σ_{j~i} x_j) div deg_i) div 2,   x'_ground = 0.
    *
    * The 1/2 damping kills the −1 Jacobi mode on bipartite components; isolated
    * vertices (deg 0) hold x = 0. One edge-join shuffle per round. */
  def solveBatch(spark: SparkSession, g: LinkGraph, b: DataFrame, iters: Int,
                 scale: Long = Scale, ground: Long = 0L): DataFrame = {
    val bi = g.bidirected.select("src", "dst").persist(StorageLevel.MEMORY_AND_DISK)
    val deg = bi.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
    val qs = b.select("q").distinct()
    val base = g.vertices.crossJoin(broadcast(qs))
      .join(b, Seq("id", "q"), "left")
      .join(deg, Seq("id"), "left")
      .select(col("id"), col("q"),
        coalesce(col("deg"), lit(0L)).as("deg"),
        coalesce(col("b"), lit(0L)).as("b"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    base.count()
    var x = base.select(col("id"), col("q"), lit(0L).as("x")).cutLineage
    var it = 0
    while (it < iters) {
      val msgs = x.join(bi, x("id") === bi("src"))
        .groupBy(col("dst").as("id"), col("q"))
        .agg(sum("x").as("m"))
      val prev = x
      x = base
        .join(prev.withColumnRenamed("x", "xp"), Seq("id", "q"))
        .join(msgs, Seq("id", "q"), "left")
        .select(col("id"), col("q"),
          when(col("id") === ground || col("deg") === 0L, lit(0L))
            .otherwise(expr(s"(xp + (b * $scale + coalesce(m, 0L)) div deg) div 2"))
            .as("x"))
        .cutLineage
      prev.releaseState()
      it += 1
    }
    base.unpersist()
    bi.unpersist()
    x
  }

  /** ±1 probe sign for (canonical edge, probe) — the shared nonlinear draw, so the
    * oracle replays it verbatim. */
  def signSql(u: String, v: String, q: String, seed: Long, duck: Boolean): String =
    s"((${graft.synth.Generators.drawSql(s"($u) * 1000003 + ($v) * 31 + ($q) * 7919 + $seed", duck)} % 2) * 2 - 1)"

  /** JLT probe table b_q = Bᵀ r_q (each canonical edge (u,v) adds +r to u, −r to v)
    * for q = 0..k−1. Output (id, q, b). */
  def jltProbes(g: LinkGraph, k: Int, seed: Long): DataFrame = {
    val spark = g.edges.sparkSession
    import spark.implicits._
    val cu = g.canonicalUndirected.select(col("src").as("u"), col("dst").as("v"))
    val sg = cu.crossJoin(broadcast((0 until k).map(_.toLong).toDF("q")))
      .withColumn("s", expr(signSql("u", "v", "q", seed, duck = false)))
    sg.select(col("u").as("id"), col("q"), col("s").as("b"))
      .union(sg.select(col("v").as("id"), col("q"), (-col("s")).as("b")))
      .groupBy("id", "q").agg(sum("b").as("b"))
  }

  /** Effective resistance + commute-time distance for the pair set (u, v) keyed by
    * probe id q (EffectiveResistanceDistance / CommuteTimeDistance semantics, exact
    * pair probes — no JLT): solve L x_q = e_u − e_v, then R(u,v) = (x_q(u) − x_q(v))
    * / scale and C(u,v) = 2·m·R(u,v). `pairs` is (q, u, v); output
    * (q, r_scaled, r, commute) with r_scaled the exact-integer column the oracle
    * matches. Pairs in different components drift (R = ∞ in theory) —
    * deterministically, identically in both engines. */
  def effectiveResistance(spark: SparkSession, g: LinkGraph, pairs: DataFrame,
                          iters: Int, scale: Long = Scale,
                          ground: Long = 0L): DataFrame = {
    val b = pairs.select(col("u").as("id"), col("q"), lit(1L).as("b"))
      .union(pairs.select(col("v").as("id"), col("q"), lit(-1L).as("b")))
      .groupBy("id", "q").agg(sum("b").as("b"))
    val x = solveBatch(spark, g, b, iters, scale, ground)
    val xu = pairs.join(x.withColumnRenamed("id", "u"), Seq("q", "u"))
      .select(col("q"), col("v"), col("x").as("xu"))
    val xv = x.select(col("q"), col("id").as("v"), col("x").as("xv"))
    // Commute time uses the UNDIRECTED edge count (the Laplacian's m) — not the
    // directed row count g.m (CommuteTimeDistance.cpp: 2·|E|·R on the undirected G).
    val mu = g.canonicalUndirected.count()
    xu.join(xv, Seq("q", "v"))
      .select(col("q"), (col("xu") - col("xv")).as("r_scaled"))
      .withColumn("r", col("r_scaled").cast("double") / scale)
      .withColumn("commute", lit(2.0) * mu * col("r_scaled") / scale)
  }

  /** Spanning-edge centrality (SpanningEdgeCentrality.cpp — effective resistance of
    * every edge, ≙ its spanning-tree occurrence probability): JLT estimate
    * sec(u,v) = Σ_q (x_q(u) − x_q(v))² / (k·scale²), computed for ALL edges from the
    * SAME k solved probe vectors. Output (src, dst, sec_scaled, sec):
    * sec_scaled = Σ_q diff² is the exact-integer oracle column. */
  def spanningEdgeCentrality(spark: SparkSession, g: LinkGraph, k: Int, iters: Int,
                             seed: Long = 42L, scale: Long = Scale): DataFrame = {
    val x = solveBatch(spark, g, jltProbes(g, k, seed), iters, scale)
    val cu = g.canonicalUndirected.select("src", "dst")
    cu.join(x.select(col("id").as("src"), col("q"), col("x").as("xu")), Seq("src"))
      .join(x.select(col("id").as("dst"), col("q"), col("x").as("xv")), Seq("dst", "q"))
      .groupBy("src", "dst")
      .agg(sum((col("xu") - col("xv")) * (col("xu") - col("xv"))).as("sec_scaled"))
      .withColumn("sec", col("sec_scaled").cast("double") / (k.toDouble * scale * scale))
  }

  /** CurrentFlowGroupCloseness (centrality/CurrentFlowGroupCloseness.cpp — group
    * closeness under effective-resistance distance, greedy submodular selection):
    * from the SAME k JLT probe solutions, R(u,v) for ANY pair is the integer sum
    * Σ_q (y_u − y_v)², so the greedy farness-reduction argmax over a candidate
    * pool × sampled target set needs NO further solves. `poolMod`/`targetMod`
    * sample candidates/targets deterministically (the reference evaluates all n —
    * its O(n·k) solver sweeps are the same tractability split as TopCloseness's
    * sampled variants here). Output (ord, id, gain_scaled): gain_scaled = the
    * exact-integer drop in Σ_v min_{s∈S} rsq(v, S) at each pick. */
  def currentFlowGroupCloseness(spark: SparkSession, g: LinkGraph, k: Int,
                                poolMod: Long, targetMod: Long, probes: Int,
                                iters: Int, seed: Long = 42L,
                                scale: Long = Scale): DataFrame = {
    import spark.implicits._
    val x = solveBatch(spark, g, jltProbes(g, probes, seed), iters, scale)
    val y = x.select(col("id"), col("q"), expr("x div 64").as("y"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    y.count()
    val pool = g.vertices.filter(col("id") % poolMod === 0)
      .select(col("id").as("c"))
    val targets = g.vertices.filter(col("id") % targetMod === 0)
      .select(col("id").as("v"))
    val rr = broadcast(pool).crossJoin(targets)
      .join(y.select(col("id").as("c"), col("q"), col("y").as("yc")), Seq("c"))
      .join(y.select(col("id").as("v"), col("q"), col("y").as("yv")), Seq("v", "q"))
      .groupBy("c", "v")
      .agg(sum((col("yc") - col("yv")) * (col("yc") - col("yv"))).as("rsq"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    rr.count()
    y.unpersist()
    // Greedy: best(v) starts at +inf (no member yet); pick argmax total reduction.
    // inf = 2^45: far above any reachable rsq (≤ probes·(2·ymax)² ≲ 2^35) yet small
    // enough that Σ_v inf in the first-round gain stays inside int64 (ANSI mode).
    val inf = 1L << 45
    var best = rr.select(col("v")).distinct().withColumn("best", lit(inf))
    var picked = List.empty[(Long, Long, Long)]
    var ord = 0L
    while (ord < k) {
      val gains = rr.join(best, Seq("v"))
        .groupBy("c")
        .agg(sum(col("best") - least(col("best"), col("rsq"))).as("gain"))
        .filter(!col("c").isInCollection(
          if (picked.isEmpty) Seq(-1L) else picked.map(_._2)))
        .orderBy(desc("gain"), asc("c")).limit(1).head()
      val cSel = gains.getLong(0)
      picked = picked :+ ((ord, cSel, gains.getLong(1)))
      best = best.join(rr.filter(col("c") === cSel).select(col("v"), col("rsq")),
          Seq("v"), "left")
        .select(col("v"), least(col("best"), coalesce(col("rsq"), col("best")))
          .as("best"))
      ord += 1
    }
    rr.unpersist()
    picked.toDF("ord", "id", "gain_scaled")
  }

  /** Electrical closeness (ApproxElectricalCloseness.cpp semantics — closeness with
    * effective-resistance farness): from the same k JLT probe solutions,
    * Σ_v R(u,v) ≈ Σ_q (n·y_u² − 2·y_u·S_q + T_q) / (k·s²) with y = x div 64 (the
    * reduced scale keeps n·y² inside int64), S_q = Σ_v y_v, T_q = Σ_v y_v² — three
    * aggregates, NO pairwise table. Output (id, farness_scaled, closeness):
    * farness_scaled = Σ_q (n·y_u² − 2·y_u·S_q + T_q) exact-integer,
    * closeness = (n−1)·k·s² / farness_scaled (0 when farness is 0). */
  def electricalCloseness(spark: SparkSession, g: LinkGraph, k: Int, iters: Int,
                          seed: Long = 42L, scale: Long = Scale): DataFrame = {
    val x = solveBatch(spark, g, jltProbes(g, k, seed), iters, scale)
    val y = x.select(col("id"), col("q"), expr("x div 64").as("y"))
    val stats = y.groupBy("q").agg(sum("y").as("sq"),
      sum(col("y") * col("y")).as("tq"))
    val n = g.n
    val sEff = scale / 64L
    val far = y.join(broadcast(stats), Seq("q"))
      .groupBy("id")
      .agg(sum(lit(n) * col("y") * col("y") - lit(2L) * col("y") * col("sq")
        + col("tq")).as("farness_scaled"))
    far.select(col("id"), col("farness_scaled"),
      when(col("farness_scaled") > 0L,
        lit((n - 1).toDouble * k * sEff * sEff) / col("farness_scaled"))
        .otherwise(lit(0.0)).as("closeness"))
  }

  /** ERD2 — the reference fork's OWN contribution
    * (/root/reference/networkit/cpp/centrality/ERD2.cpp:19-120 + ERDLevel.h): the
    * pairwise EffectiveResistanceDistance matrix over a node subset, with the fork's
    * degree-1 coarsening level — leaves whose support has degree > 1 are peeled
    * before the solve and re-attached afterwards as R(leaf, ·) = R(support, ·) + 1
    * (unit weights; ERD2.cpp:78-84's uncoarsening). The reference then computes a
    * dense pseudo-inverse; the graft replaces that with one batched integer-Jacobi
    * probe per distinct CORE pair (the same machinery as [[effectiveResistance]]),
    * keeping every output exact-integer and DuckDB-replayable. Peeling is exactly
    * the right first move at web scale, where leaf pages are a large fraction of
    * the crawl. Probe keys assume ids < 2^31 (true for the dense page dictionary).
    * Output one row per subset pair u < v: (u, v, r_scaled, r). */
  def erdMatrix(spark: SparkSession, g: LinkGraph, subset: DataFrame,
                iters: Int, scale: Long = Scale): DataFrame = {
    val und = g.canonicalUndirected.select("src", "dst")
    val deg = g.undirectedDegrees
    val nbr = und.select(col("src").as("id"), col("dst").as("nb"))
      .union(und.select(col("dst").as("id"), col("src").as("nb")))
    // leaves with a non-leaf support (mutual-leaf K2 pairs stay in the core)
    val supp = deg.filter(col("deg") === 1L).join(nbr, "id")
      .join(deg.select(col("id").as("nb"), col("deg").as("nd")), "nb")
      .filter(col("nd") > 1L).select(col("id"), col("nb"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    supp.count()
    val leafIds = supp.select("id")
    val coreV = g.vertices.join(leafIds, Seq("id"), "left_anti")
    val coreE = und
      .join(leafIds.withColumnRenamed("id", "src"), Seq("src"), "left_anti")
      .join(leafIds.withColumnRenamed("id", "dst"), Seq("dst"), "left_anti")
      .select(col("src"), col("dst"), lit(1.0).as("weight"))
    val coreG = graft.model.LinkGraph.fromEdges(spark, coreE, Some(coreV))
    val ground = coreV.agg(min("id")).head().getLong(0)

    val mapped = subset.select(col("id"))
      .join(supp.select(col("id"), col("nb")), Seq("id"), "left")
      .select(col("id"), coalesce(col("nb"), col("id")).as("m"),
        col("nb").isNotNull.cast("long").as("peeled"))
    val pairRows = mapped.select(col("id").as("u"), col("m").as("mu"), col("peeled").as("pu"))
      .join(mapped.select(col("id").as("v"), col("m").as("mv"), col("peeled").as("pv")),
        col("u") < col("v"))
      .select(col("u"), col("v"),
        least(col("mu"), col("mv")).as("cu"), greatest(col("mu"), col("mv")).as("cv"),
        (col("pu") + col("pv")).as("peels"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    pairRows.count()
    val qOf = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
      a * lit(1L << 31) + b
    val corePairs = pairRows.filter(col("cu") =!= col("cv"))
      .select(col("cu"), col("cv")).distinct()
      .select(qOf(col("cu"), col("cv")).as("q"), col("cu").as("u"), col("cv").as("v"))
    val coreR = effectiveResistance(spark, coreG, corePairs, iters, scale, ground)
      .select(col("q"), col("r_scaled"))
    val out = pairRows
      .join(coreR, qOf(col("cu"), col("cv")) === coreR("q"), "left")
      .select(col("u"), col("v"),
        (coalesce(col("r_scaled"), lit(0L)) + col("peels") * lit(scale)).as("r_scaled"))
      .select(col("u"), col("v"), col("r_scaled"),
        (col("r_scaled").cast("double") / scale).as("r"))
    supp.unpersist()
    out
  }
}
