package graft.algo

import graft.DataFrameLineageOps

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.model.LinkGraph

/** Betweenness (Brandes) + closeness/harmonic-closeness from ONE batched multi-source
  * BFS harness — the distributed re-architecture of the reference's per-source SSSP
  * loops (/root/reference/networkit/cpp/centrality/Betweenness.cpp:28-140,
  * Closeness.cpp:35-66, HarmonicCloseness.cpp:20-46, ApproxBetweenness.cpp sampling).
  *
  * Forward pass: level-synchronous BFS from ALL sources simultaneously; the state is
  * one DataFrame (s, id, dist, sigma) keyed by (source, node) — shortest-path counts
  * sigma accumulate via sum over predecessor messages, the textbook Brandes forward
  * phase. One shuffle per BFS level regardless of the number of sources: batching
  * sources is what makes Brandes feasible on Spark (n sequential SSSPs would be n
  * driver loops; here the source dimension rides inside the row key).
  *
  * Backward pass: dependencies in order of decreasing distance,
  * delta(v) += sigma_v/sigma_w * (1 + delta(w)) over successors w (dist_w = dist_v+1),
  * one level per round. Unnormalized scores match the reference exactly: score(t) =
  * sum of dependencies over sources, NO undirected halving (Betweenness.cpp:84,105-112
  * divides only in the `normalized` branch).
  *
  * Exact closeness/harmonic of the source nodes come free from the forward state:
  * closeness(s) = 1/Σ dist (Closeness.cpp:55-60), harmonic(s) = Σ 1/d
  * (HarmonicCloseness.cpp:36-43). With all sources = all vertices this is the exact
  * full algorithm; with a sampled source set it is the Approx* family (the scale
  * path — cost is levels × m × |S|/n per level).
  *
  * The `fixedPoint` variant keeps the dependency recursion in scaled-integer floor
  * division (delta' = Σ (sigma_v * (SCALE + delta_w)) div sigma_w) — exact and
  * order-independent, so the DuckDB oracle replays it bit-for-bit.
  */
object Betweenness {

  /** LCM(1..16): exact-integer harmonic numerators for BFS distances <= 16. */
  val HarmonicLcm = 720720L

  /** Forward multi-source BFS: state (s, id, dist, sigma) for every (source, reached
    * node) pair, plus the number of levels. `sources` must be a DataFrame(id). */
  def msBfs(spark: SparkSession, g: LinkGraph, sources: DataFrame,
            maxLevels: Int = 64): (DataFrame, Int) = {
    val bi = g.bidirected.select("src", "dst").persist(StorageLevel.MEMORY_AND_DISK)
    bi.count()
    var state = sources.select(col("id").as("s"), col("id"),
      lit(0L).as("dist"), lit(1L).as("sigma")).cutLineage
    var frontier = state
    var level = 1
    var more = frontier.count() > 0
    while (more && level <= maxLevels) {
      val msgs = frontier
        .join(bi, frontier("id") === bi("src"))
        .groupBy(col("s"), col("dst"))
        .agg(sum("sigma").as("sigma"))
        .select(col("s"), col("dst").as("id"), col("sigma"))
      val next = msgs
        .join(state.select("s", "id"), Seq("s", "id"), "left_anti")
        .select(col("s"), col("id"), lit(level.toLong).as("dist"), col("sigma"))
        .cutLineage
      more = next.count() > 0
      if (more) {
        val prev = state
        state = state.union(next).cutLineage
        prev.releaseState()
        frontier = next
        level += 1
      }
    }
    bi.unpersist()
    (state, level)
  }

  /** Exact Brandes dependencies (float) from `sources`; with sources = all vertices
    * this is exact betweenness, with a sample it is EstimateBetweenness's sum (no
    * rescaling). Output (id, bc) over ALL vertices (0 where never intermediate). */
  def run(spark: SparkSession, g: LinkGraph, sources: DataFrame): DataFrame =
    backward(spark, g, sources, fpScale = None)

  /** Scaled-integer twin of [[run]] for the cross-engine oracle: dependencies carried
    * as floor((sigma_v * (SCALE + delta_w)) / sigma_w) sums — exact int64, identical
    * in DuckDB (OracleSql.betweennessFixed). Output (id, bc) longs. */
  def fixedPoint(spark: SparkSession, g: LinkGraph, sources: DataFrame,
                 scale: Long = 10000L): DataFrame =
    backward(spark, g, sources, fpScale = Some(scale))

  // Shared backward sweep; fpScale = Some(s) switches the dependency term to the
  // scaled-integer floor-division form.
  private def backward(spark: SparkSession, g: LinkGraph, sources: DataFrame,
                       fpScale: Option[Long]): DataFrame = {
    val zero: Column = fpScale.map(_ => lit(0L)).getOrElse(lit(0.0))
    val deltaType = if (fpScale.isDefined) "long" else "double"
    val (state0, levels) = msBfs(spark, g, sources)
    val state = state0.persist(StorageLevel.MEMORY_AND_DISK)
    state.count()
    val bi = g.bidirected.select("src", "dst").persist(StorageLevel.MEMORY_AND_DISK)
    bi.count()
    // delta rows accumulate level by level, highest level first (those nodes have no
    // successors -> delta 0 and contribute via the join's left side only).
    var delta = state.filter(lit(false))
      .select(col("s"), col("id"), zero.as("delta")) // empty, typed
    var lev = levels - 1
    while (lev >= 0) {
      val preds = state.filter(col("dist") === lev.toLong)
        .select(col("s"), col("id"), col("sigma"))
      val succs = state.filter(col("dist") === (lev + 1).toLong)
        .select(col("s").as("ws"), col("id").as("wid"), col("sigma").as("wsigma"))
      val nd = preds
        .join(bi, preds("id") === bi("src"))
        .join(succs, col("wid") === col("dst") && col("ws") === col("s"))
        .join(delta.select(col("s").as("ds"), col("id").as("did"), col("delta").as("wdelta")),
          col("ds") === col("s") && col("did") === col("wid"), "left")
        .select(col("s"), col("id"), col("sigma"), col("wsigma"),
          coalesce(col("wdelta"), zero).as("wdelta"))
        .select(col("s"), col("id"), (fpScale match {
          case Some(sc) => expr(s"sigma * ($sc + wdelta) div wsigma")
          case None => col("sigma").cast("double") / col("wsigma").cast("double") *
            (lit(1.0) + col("wdelta"))
        }).as("c"))
        .groupBy("s", "id").agg(sum("c").as("delta"))
      val prev = delta
      delta = delta.union(nd).cutLineage
      prev.releaseState()
      lev -= 1
    }
    val scores = delta.filter(col("id") =!= col("s"))
      .groupBy("id").agg(sum("delta").as("bc0"))
    val out = g.vertices.join(scores, Seq("id"), "left")
      .select(col("id"), coalesce(col("bc0"), zero).cast(deltaType).as("bc"))
    state.unpersist(); bi.unpersist()
    out
  }

  /** DynBetweenness / DynApproxBetweenness path
    * (/root/reference/networkit/cpp/centrality/DynBetweenness.cpp:30-160,
    * DynApproxBetweenness.cpp): incremental update after an undirected edge-insert
    * batch, re-expressed at affected-SOURCE granularity (the distributed analog of the
    * reference's affected-vertex updates). A source s is affected iff some inserted
    * edge (u,v) has dist_s(u) ≠ dist_s(v) — an equal-level edge creates no new
    * shortest path from s, and a both-unreachable edge touches nothing; detection is
    * ONE |S|×|batch| join against the previous forward state. Per-source dependency
    * sums are additive and the scaled-integer recursion is per-source independent, so
    *   newBc = oldBc − part(A, G_old) + part(A, G_new)
    * is EXACT — bit-equal to the cold recompute on G_new (Round13Spec asserts
    * equality; `q_dyn_betweenness` proves it against the cold DuckDB twin). Work is
    * proportional to |A| re-swept sources instead of |S|.
    *
    * `oldBc`/`oldState` accept a previous solution (the streaming path); when None
    * they are computed here. Returns (newBc, affectedCount). */
  def warmInsertFixed(spark: SparkSession, gOld: LinkGraph, gNew: LinkGraph,
                      sources: DataFrame, added: DataFrame, scale: Long = 10000L,
                      oldBc: Option[DataFrame] = None,
                      oldState: Option[DataFrame] = None): (DataFrame, Long) = {
    val st = oldState.getOrElse(msBfs(spark, gOld, sources)._1)
      .persist(StorageLevel.MEMORY_AND_DISK)
    st.count()
    val und = added.select("src", "dst")
      .union(added.select(col("dst").as("src"), col("src").as("dst"))).distinct()
    val prevBc = oldBc.getOrElse(fixedPoint(spark, gOld, sources, scale))
    val affected = sources.select(col("id").as("s")).crossJoin(und)
      .join(st.select(col("s"), col("id").as("src"), col("dist").as("du")),
        Seq("s", "src"), "left")
      .join(st.select(col("s"), col("id").as("dst"), col("dist").as("dv")),
        Seq("s", "dst"), "left")
      .filter(!(col("du") <=> col("dv"))) // null-safe: both-null = unaffected
      .select(col("s").as("id")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nAff = affected.count()
    st.unpersist()
    if (nAff == 0) { affected.unpersist(); return (prevBc, 0L) }
    val oldPart = fixedPoint(spark, gOld, affected, scale)
    val newPart = fixedPoint(spark, gNew, affected, scale)
    val out = prevBc.withColumnRenamed("bc", "b0")
      .join(oldPart.withColumnRenamed("bc", "bo"), Seq("id"))
      .join(newPart.withColumnRenamed("bc", "bn"), Seq("id"))
      .select(col("id"), (col("b0") - col("bo") + col("bn")).as("bc"))
    affected.unpersist()
    (out, nAff)
  }

  /** Exact closeness + harmonic closeness OF the source nodes (unnormalized reference
    * semantics: closeness = 1/Σdist over reachable, harmonic = Σ 1/d). All doubles are
    * single divisions of exact integers (harmonic via the LCM(1..16) numerator), so
    * the DuckDB twin matches bit-for-bit. Requires BFS depth <= 16. */
  def closenessHarmonic(spark: SparkSession, g: LinkGraph, sources: DataFrame): DataFrame = {
    val (state, levels) = msBfs(spark, g, sources)
    require(levels <= 16, s"harmonic LCM covers distances <= 16, BFS depth was $levels")
    state.groupBy(col("s").as("id"))
      .agg((count(lit(1)) - 1L).as("reached"),
        sum("dist").as("sumdist"),
        sum(when(col("dist") > 0L, expr(s"$HarmonicLcm div dist")).otherwise(0L)).as("hnum"))
      .select(col("id"), col("reached"), col("sumdist"),
        when(col("sumdist") > 0L, lit(1.0) / col("sumdist")).otherwise(lit(0.0)).as("closeness"),
        (col("hnum").cast("double") / lit(HarmonicLcm.toDouble)).as("harmonic"))
  }

  /** DynTopHarmonicCloseness path
    * (/root/reference/networkit/cpp/centrality/DynTopHarmonicCloseness.cpp: maintain
    * exact per-node harmonics across an edge delta and repair only affected nodes).
    * Unweighted distances change for node x iff some inserted edge (u,v) has
    * |d_old(x,u) − d_old(x,v)| ≥ 2 (an equal-level or ±1 insert creates no shorter
    * path), including one-endpoint-unreachable (new reachability); closeness AND
    * harmonic depend on distances only, so the affected set is exactly that — and it
    * is detected with ONE multi-source BFS from the BATCH ENDPOINTS on the old graph
    * (|batch| sources, undirected symmetry gives d(x,e) = d(e,x)). Exact repaired
    * rows come from one msBfs restricted to affected ∩ maintained sources on the new
    * graph; every other maintained row is carried over untouched. Bit-equal to the
    * cold recompute (q_dyn_harmonic cold twin, Round13Spec). Returns
    * (rows, affectedCount). */
  def closenessHarmonicWarm(spark: SparkSession, gOld: LinkGraph, gNew: LinkGraph,
                            sources: DataFrame, added: DataFrame,
                            oldAll: Option[DataFrame] = None): (DataFrame, Long) = {
    val old = oldAll.getOrElse(closenessHarmonic(spark, gOld, sources))
      .persist(StorageLevel.MEMORY_AND_DISK)
    old.count()
    val endpoints = added.select(col("src").as("id"))
      .union(added.select(col("dst").as("id"))).distinct()
    val (st, _) = msBfs(spark, gOld, endpoints)
    val du = st.select(col("s").as("src"), col("id").as("x"), col("dist").as("du"))
    val dv = st.select(col("s").as("dst"), col("id").as("x"), col("dist").as("dv"))
    val affected = sources.select(col("id").as("x"))
      .crossJoin(added.select("src", "dst"))
      .join(du, Seq("src", "x"), "left")
      .join(dv, Seq("dst", "x"), "left")
      .filter(!(col("du") <=> col("dv")) &&
        (col("du").isNull || col("dv").isNull ||
          abs(col("du") - col("dv")) >= 2L))
      .select(col("x").as("id")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nAff = affected.count()
    if (nAff == 0L) { affected.unpersist(); return (old, 0L) }
    val repaired = closenessHarmonic(spark, gNew, affected)
    val out = old.join(affected, Seq("id"), "left_anti").unionByName(repaired)
    (out, nAff)
  }

  /** DynBetweennessOneNode (/root/reference/networkit/cpp/centrality/
    * DynBetweennessOneNode.cpp:20-160): maintain, for tracked node x, the pair state
    * (dist, sigma, sigmax) over a source set after inserting undirected edge {u, v} —
    * the reference's getDistance/getSigma/getSigmax surface, from which x's score is
    * Σ sigmax/sigma.
    *
    * Warm repair is the closed form for one unit-weight insert: a new shortest path
    * crosses {u, v} at most once, so with OLD distances d and counts σ
    *   d'(s, t) = min(d(s,t), d(s,u)+1+d(v,t), d(s,v)+1+d(u,t))
    *   σ'(s, t) = [d=d']σ + [d1=d']σ(s,u)σ(v,t) + [d2=d']σ(s,v)σ(u,t)
    * (the two crossing orientations are disjoint path families). ONE batched msBFS
    * from {u, v} on the old graph supplies every term; the repair is the same
    * broadcast-candidate merge as dynApspInsert. σx then comes from the repaired
    * state itself: σx(s,t) = σ'(s,x)·σ'(x,t) iff d'(s,x)+d'(x,t) = d'(s,t) — x's
    * column is a broadcast-sized slice, x's row one hash join.
    *
    * `prev` must be msBfs state on the OLD graph with x among the sources. Output
    * (s, id, dist, sigma, sigmax) equals the cold state on the mutated graph. */
  def dynBetweennessOneNode(spark: SparkSession, g: LinkGraph, prev: DataFrame,
                            u: Long, v: Long, x: Long): DataFrame = {
    import spark.implicits._
    val duv = msBfs(spark, g, Seq(u, v).toDF("id"))._1
    val pu = duv.filter(col("s") === u)
      .select(col("id"), col("dist").as("du"), col("sigma").as("su"))
    val pv = duv.filter(col("s") === v)
      .select(col("id"), col("dist").as("dv"), col("sigma").as("sv"))
    val tgt = pu.join(pv, Seq("id"), "full")
      .persist(StorageLevel.MEMORY_AND_DISK)
    tgt.count()
    duv.releaseState()
    // per-source legs (undirected symmetry: d(s,u) = d(u,s), σ likewise)
    val src = prev.select(col("s")).distinct()
      .join(tgt.select(col("id").as("s"), col("du").as("sdu"), col("dv").as("sdv"),
        col("su").as("ssu"), col("sv").as("ssv")), Seq("s"), "left")
    val cand = broadcast(src)
      .crossJoin(tgt.select(col("id"), col("du"), col("dv"), col("su"), col("sv")))
      .select(col("s"), col("id"),
        (col("sdu") + lit(1L) + col("dv")).as("d1"), (col("ssu") * col("sv")).as("c1"),
        (col("sdv") + lit(1L) + col("du")).as("d2"), (col("ssv") * col("su")).as("c2"))
      .filter(col("d1").isNotNull || col("d2").isNotNull)
    val st = prev.select(col("s"), col("id"), col("dist").as("pd"), col("sigma").as("ps"))
      .join(cand, Seq("s", "id"), "full")
      .select(col("s"), col("id"),
        least(col("pd"), col("d1"), col("d2")).as("dist"),
        col("pd"), col("ps"), col("d1"), col("c1"), col("d2"), col("c2"))
      .select(col("s"), col("id"), col("dist"),
        (when(col("pd") === col("dist"), col("ps")).otherwise(lit(0L)) +
          when(col("d1") === col("dist"), col("c1")).otherwise(lit(0L)) +
          when(col("d2") === col("dist"), col("c2")).otherwise(lit(0L))).as("sigma"))
      .cutLineage
    tgt.unpersist()
    val sx = st.filter(col("id") === x)
      .select(col("s"), col("dist").as("dsx"), col("sigma").as("ssx"))
    val xt = st.filter(col("s") === x)
      .select(col("id"), col("dist").as("dxt"), col("sigma").as("sxt"))
    st.join(broadcast(sx), Seq("s"), "left")
      .join(xt, Seq("id"), "left")
      .select(col("s"), col("id"), col("dist"), col("sigma"),
        when(col("dsx").isNotNull && col("dxt").isNotNull &&
          col("dsx") + col("dxt") === col("dist"),
          col("ssx") * col("sxt")).otherwise(lit(0L)).as("sigmax"))
  }
}
