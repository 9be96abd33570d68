package graft.algo

import graft.DataFrameLineageOps

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.model.LinkGraph

/** Shortest-path distances (/root/reference/networkit/cpp/distance/BFS.cpp and the
  * BFSfrom combinator, graph/Graph.h:1523-1575) as level-synchronous frontier joins:
  * per level, expand the frontier through the (bidirected) edge table, keep newly
  * discovered nodes, assign level+1. One shuffle per level; frontier size bounds the
  * join's build side, unreached vertices are never touched — the textbook distributed
  * BFS.
  */
object Distances {

  /** Hop distance from `source` over the undirected view; unreachable vertices get -1.
    * Output (id, dist). */
  def bfsHops(spark: SparkSession, g: LinkGraph, source: Long): DataFrame = {
    val bi = g.bidirected.select("src", "dst").persist(StorageLevel.MEMORY_AND_DISK)
    bi.count()
    var visited = g.vertices.filter(col("id") === source)
      .select(col("id"), lit(0L).as("dist")).cutLineage
    var frontier = visited
    var level = 1L
    var more = frontier.count() > 0
    while (more) {
      val next = bi.join(frontier.withColumnRenamed("id", "src").select("src"), "src")
        .select(col("dst").as("id")).distinct()
        .join(visited.select("id"), Seq("id"), "left_anti")
        .select(col("id"), lit(level).as("dist"))
        .cutLineage
      more = next.count() > 0
      if (more) {
        visited = visited.union(next).cutLineage
        frontier = next
        level += 1
      }
    }
    bi.unpersist()
    g.vertices.join(visited, Seq("id"), "left")
      .select(col("id"), coalesce(col("dist"), lit(-1L)).as("dist"))
  }

  /** GraphDistance (distance/GraphDistance.cpp:12-28): the single (u, v) pair
    * distance — unweighted via BFS, weighted via the Bellman-Ford SSSP when a
    * weight expression is given. One row (u, v, dist); -1 when unreachable. */
  def graphDistance(spark: SparkSession, g: LinkGraph, u: Long, v: Long,
                    weight: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    val d = weight match {
      case None    => bfsHops(spark, g, u)
      case Some(w) => weightedSssp(spark, g, u, w)
    }
    d.filter(col("id") === v).select(lit(u).as("u"), col("id").as("v"), col("dist"))
  }

  /** Eccentricity of `source` + reachable-count (Diameter building block,
    * distance/Eccentricity.cpp): one row (ecc, reached). */
  def eccentricity(spark: SparkSession, g: LinkGraph, source: Long): DataFrame =
    bfsHops(spark, g, source)
      .agg(max(col("dist")).as("ecc"),
        sum(when(col("dist") >= 0L, 1L).otherwise(0L)).as("reached"))

  /** Diameter bounds by the classic double sweep (the lower-bound seed of the
    * reference's iFub, distance/Diameter.cpp:1-324 estimatedRange): BFS from `start`,
    * take the farthest node u (ties: smallest id), BFS from u; lb = ecc(u) <= diameter
    * <= 2*ecc(u) = ub. Two BFS passes regardless of graph size. One row (lb, ub). */
  def diameterTwoSweep(spark: SparkSession, g: LinkGraph, start: Long = 0L): DataFrame = {
    val d1 = bfsHops(spark, g, start)
    val u = d1.filter(col("dist") >= 0L)
      .orderBy(desc("dist"), asc("id")).select("id").head().getLong(0)
    bfsHops(spark, g, u)
      .agg(max("dist").as("lb"))
      .select(col("lb"), (col("lb") * 2L).as("ub"))
  }

  /** Weighted single-source shortest paths (distance/Dijkstra.cpp semantics) as a
    * distributed Bellman-Ford: iterate dist' = min(dist, min over in-neighbors
    * (dist[v] + w)) until fixpoint — priority queues don't distribute, min-plus
    * relaxation does (one shuffle per round, rounds <= longest shortest-path edge
    * count). Integer weights keep the state exact. Unreachable => -1. */
  def weightedSssp(spark: SparkSession, g: LinkGraph, source: Long,
                   weight: org.apache.spark.sql.Column,
                   maxRounds: Int = 200): DataFrame = {
    val inf = 999999999L
    val bi = g.bidirected.select(col("src"), col("dst"), weight.cast("long").as("w"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    bi.count()
    var dist = g.vertices
      .select(col("id"), when(col("id") === source, 0L).otherwise(inf).as("dist"))
      .cutLineage
    var round = 0
    var changed = 1L
    while (changed > 0 && round < maxRounds) {
      val relax = bi.join(dist.select(col("id").as("src"), col("dist").as("ds")), "src")
        .filter(col("ds") < inf)
        .groupBy(col("dst").as("id")).agg(min(col("ds") + col("w")).as("cand"))
      val next = dist.join(relax, Seq("id"), "left")
        .select(col("id"),
          least(col("dist"), coalesce(col("cand"), col("dist"))).as("dist"),
          (col("cand") < col("dist")).as("changed"))
        .cutLineageLazy
      changed = next.filter(col("changed")).count()
      val prev = dist
      dist = next.select("id", "dist").cutLineage
      prev.releaseState(); next.releaseState()
      round += 1
    }
    bi.unpersist()
    dist.select(col("id"), when(col("dist") >= inf, -1L).otherwise(col("dist")).as("dist"))
  }

  /** IncompleteDijkstra (the concrete distance/IncompleteSSSP.h implementation —
    * /root/reference/networkit/cpp/distance/
    * IncompleteDijkstra.cpp — the bounded-exploration Dijkstra the pruning
    * centralities consume): weighted SSSP that never relaxes past `bound`. Same
    * frontier relaxation as [[weightedSssp]] with the relax join PRE-FILTERED to
    * ds + w <= bound — the per-round shuffle shrinks to the distance ball around
    * the source instead of the whole graph (the point of the operator at scale).
    * Output only the settled ball: (id, dist) with dist <= bound. */
  def incompleteDijkstra(spark: SparkSession, g: LinkGraph, source: Long,
                         weight: org.apache.spark.sql.Column, bound: Long,
                         maxRounds: Int = 200): DataFrame = {
    val inf = 999999999L
    val bi = g.bidirected.select(col("src"), col("dst"), weight.cast("long").as("w"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    bi.count()
    var dist = g.vertices
      .select(col("id"), when(col("id") === source, 0L).otherwise(inf).as("dist"))
      .cutLineage
    var round = 0
    var changed = 1L
    while (changed > 0 && round < maxRounds) {
      val relax = bi.join(dist.select(col("id").as("src"), col("dist").as("ds")), "src")
        .filter(col("ds") < inf && col("ds") + col("w") <= bound)
        .groupBy(col("dst").as("id")).agg(min(col("ds") + col("w")).as("cand"))
      val next = dist.join(relax, Seq("id"), "left")
        .select(col("id"),
          least(col("dist"), coalesce(col("cand"), col("dist"))).as("dist"),
          (col("cand") < col("dist")).as("changed"))
        .cutLineageLazy
      changed = next.filter(col("changed")).count()
      val prev = dist
      dist = next.select("id", "dist").cutLineage
      prev.releaseState(); next.releaseState()
      round += 1
    }
    bi.unpersist()
    dist.filter(col("dist") <= bound)
  }

  /** EXACT diameter by iFub (/root/reference/networkit/cpp/distance/Diameter.cpp:1-324,
    * the iFUB algorithm): two-sweep from `start` picks the far node u (ties: smallest
    * id); BFS levels from u order the candidates; then walk fringes top-down — the
    * eccentricities of all level-i nodes (ONE batched msBFS per level) raise the lower
    * bound, and lb > 2*(i-1) certifies no deeper pair can beat it. Terminates after
    * the top few levels on small-world graphs; each fringe batch is the same
    * one-shuffle-per-level harness as everything else (no per-node BFS loop).
    *
    * Connected-component semantics: the diameter OF THE COMPONENT CONTAINING `start`
    * (the reference's exact path requires connectedness; on the web graph run it on
    * the giant component). One row (diameter). */
  def diameterExact(spark: SparkSession, g: LinkGraph, start: Long = 0L): DataFrame = {
    import spark.implicits._
    val d1 = bfsHops(spark, g, start)
    val u = d1.filter(col("dist") >= 0L)
      .orderBy(desc("dist"), asc("id")).select("id").head().getLong(0)
    val d2 = bfsHops(spark, g, u).persist(StorageLevel.MEMORY_AND_DISK)
    var lb = d2.agg(max("dist")).head().getLong(0)
    var i = lb
    var done = lb <= 0L
    while (!done && i > 0L) {
      val fringe = d2.filter(col("dist") === i).select("id")
      if (fringe.limit(1).count() > 0) {
        val (state, _) = Betweenness.msBfs(spark, g, fringe)
        val fringeMax = state.agg(max("dist")).head().getLong(0)
        lb = math.max(lb, fringeMax)
      }
      if (lb > 2L * (i - 1L)) done = true // certified: deeper fringes can't exceed lb
      else i -= 1L
    }
    d2.unpersist()
    Seq(lb).toDF("diameter")
  }

  /** DFSfrom (/root/reference/networkit/cpp/graph/Graph.h DFSfrom / DFSEdgesFrom —
    * stack-based preorder over the adjacency): depth-first search is inherently
    * sequential (each step depends on the full visited set), so like the reference —
    * and like [[graft.synth.Generators.havelHakimi]] — this runs driver-side over a
    * collected adjacency list and is meant for fixture-scale use; the distributed
    * traversal primitive at 100 TB is BFS ([[bfsHops]], msBFS). Neighbor order is
    * ascending id (the reference visits in adjacency/insertion order, which a
    * shuffled edge table cannot reproduce; ascending id is the deterministic total
    * order every other tie-break in this engine uses). Guarded by the same
    * driver-parse size bound rationale as the exchange-format readers.
    * Output (id, ord): DFS preorder number per reached node. */
  def dfsFrom(spark: SparkSession, g: LinkGraph, source: Long,
              maxNodes: Long = 10000000L): DataFrame = {
    import spark.implicits._
    require(g.n <= maxNodes,
      s"dfsFrom is the driver-side fixture-scale primitive (n=${g.n} > $maxNodes); " +
        "use bfsHops/msBfs for web-scale traversal")
    // The node bound alone doesn't protect the driver: a dense 10M-node graph has
    // billions of edges and the whole edge set is collected below. Bound m by the
    // same ~16-byte-per-edge budget rationale as GraphReaders.guardDriverParse.
    val maxEdges = math.max(maxNodes, 32000000L)
    require(g.m <= maxEdges,
      s"dfsFrom collects the full edge set to the driver (m=${g.m} > $maxEdges); " +
        "use bfsHops/msBfs for web-scale traversal")
    val adj = g.canonicalUndirected.select("src", "dst").collect()
      .foldLeft(scala.collection.mutable.HashMap.empty[Long, List[Long]]) { (m, r) =>
        val (u, v) = (r.getLong(0), r.getLong(1))
        m(u) = v :: m.getOrElse(u, Nil); m(v) = u :: m.getOrElse(v, Nil); m
      }
    val visited = scala.collection.mutable.LinkedHashSet.empty[Long]
    val stack = scala.collection.mutable.Stack(source)
    while (stack.nonEmpty) {
      val u = stack.pop()
      if (!visited.contains(u)) {
        visited += u
        // Push descending so the SMALLEST unvisited neighbor is explored first.
        adj.getOrElse(u, Nil).sorted(Ordering[Long].reverse)
          .foreach(v => if (!visited.contains(v)) stack.push(v))
      }
    }
    visited.toSeq.zipWithIndex.map { case (id, i) => (id, i.toLong) }
      .toDF("id", "ord")
  }

  /** EXACT effective diameter (/root/reference/networkit/cpp/distance/
    * EffectiveDiameter.cpp:20-88 — per-node reachability bitsets grown one hop per
    * round; a node finishes at hop h when |B(v,h)| ≥ ⌈ratio·n⌉; result =
    * Σ finish-hops / n): re-architected as ONE batched multi-source BFS from every
    * node (the Betweenness forward harness — the reference's O(n²) bitset matrix
    * becomes the (s, id, dist) pair table), then per-source hop CDF: h_v =
    * max(1, min d with |{u : dist(v,u) ≤ d}| ≥ threshold) — the max(1,·) mirrors the
    * reference's h starting at 1. The cumulative count is a window PARTITIONED BY
    * source (never a global window). Connected-component semantics as the reference:
    * it throws on disconnected input; we run on the component containing `start`.
    * Exact all-pairs is Θ(n·reach) state — for the giant web component use the ANF
    * sketch twin ([[graft.algo.Anf.effectiveDiameter]]); exact is for
    * fixture/component scale, like the reference's own use.
    * One row (n, sum_hops, eff_diameter). */
  def effectiveDiameterExact(spark: SparkSession, g: LinkGraph,
                             ratio: Double = 0.9, start: Long = 0L): DataFrame = {
    val comp = bfsHops(spark, g, start).filter(col("dist") >= 0L).select("id")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nC = comp.count()
    val sub = g.subgraphFromNodes(comp)
    // reference threshold: (uint64)(ceil(ratio * n) + 0.5) = ceil(ratio * n)
    val threshold = math.ceil(ratio * nC).toLong
    val (state, _) = Betweenness.msBfs(spark, sub, comp)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("s").orderBy("dist")
    val hops = state.groupBy("s", "dist").agg(count(lit(1)).as("c"))
      .withColumn("cum", sum("c").over(w))
      .filter(col("cum") >= threshold)
      .groupBy("s").agg(greatest(lit(1L), min("dist")).as("hop"))
    val out = hops.agg(count(lit(1)).as("n"), sum("hop").as("sum_hops"))
      .select(col("n"), col("sum_hops"),
        (col("sum_hops").cast("double") / col("n")).as("eff_diameter"))
    comp.unpersist()
    out
  }

  /** APSP (/root/reference/networkit/cpp/distance/APSP.cpp — per-source BFS loop),
    * re-architected as ONE batched multi-source BFS (the Betweenness forward harness):
    * output (s, id, dist) for every (source, reached node) pair. With `sources` = all
    * vertices this is exact APSP (Θ(n·reach) output — only for small n); the scale
    * path is a sampled source set (distance-sketch style), which is the same call with
    * a filtered source table. Unreached pairs are absent (the reference stores +inf). */
  def apsp(spark: SparkSession, g: LinkGraph, sources: DataFrame): DataFrame =
    Betweenness.msBfs(spark, g, sources)._1.select("s", "id", "dist")

  /** DynAPSP single-insert repair (/root/reference/networkit/cpp/distance/
    * DynAPSP.cpp:66-160 — per-event affected-pair update via in-neighbor BFS
    * phases), re-expressed as the closed-form identity for one unweighted
    * undirected insert {u, v}:
    *
    *   d'(s, y) = min(d(s, y), d(s, u) + 1 + d(v, y), d(s, v) + 1 + d(u, y))
    *
    * with every d an OLD distance — a shortest path in the mutated graph crosses
    * the new edge at most once (shortest paths are simple), so its two halves are
    * old shortest paths. ONE batched msBFS from {u, v} on the old graph supplies
    * all needed terms: the per-source rows (d(s,u), d(s,v)) are a broadcast-sized
    * table (|sources| rows), the per-target rows (d(u,y), d(v,y)) one n-row table,
    * and the repair is a broadcast nested-loop candidate set (exactly the output's
    * own Θ(|sources|·reach) size) full-outer-merged with `prev` on (s, id) — no
    * per-source BFS, no driver iteration. Pairs unreachable in the mutated graph
    * stay absent (both legs null). `prev` must be apsp(g, sources) on the OLD
    * graph; the result equals the cold apsp on the mutated graph exactly (the
    * oracle computes the cold side). */
  def dynApspInsert(spark: SparkSession, g: LinkGraph, prev: DataFrame,
                    u: Long, v: Long): DataFrame = {
    import spark.implicits._
    val duv = Betweenness.msBfs(spark, g, Seq(u, v).toDF("id"))._1
    val du = duv.filter(col("s") === u).select(col("id"), col("dist").as("du"))
    val dv = duv.filter(col("s") === v).select(col("id"), col("dist").as("dv"))
    val tgt = du.join(dv, Seq("id"), "full")
      .persist(StorageLevel.MEMORY_AND_DISK)
    tgt.count()
    // d(s,u) / d(s,v) per source: the undirected distance table is symmetric.
    val src = prev.select(col("s")).distinct()
      .join(tgt.select(col("id").as("s"), col("du").as("sdu"),
        col("dv").as("sdv")), Seq("s"), "left")
    val cand = broadcast(src)
      .crossJoin(tgt.select(col("id"), col("du"), col("dv")))
      .select(col("s"), col("id"),
        least(col("sdu") + lit(1L) + col("dv"),
              col("sdv") + lit(1L) + col("du")).as("cd"))
      .filter(col("cd").isNotNull)
    val out = prev.withColumnRenamed("dist", "pd")
      .join(cand, Seq("s", "id"), "full")
      .select(col("s"), col("id"), least(col("pd"), col("cd")).as("dist"))
    out
  }

  /** ApproxCloseness (/root/reference/networkit/cpp/centrality/ApproxCloseness.cpp —
    * the sampling estimator role; the estimate is the classic Eppstein–Wang form):
    * from k sampled BFS sources, ĉ(v) = k·(n−1) / (n·Σ_{s∈S} d(s,v)). The reference
    * samples uniformly at random; the deterministic twin uses the fixed sample
    * id % mod == 0, all sources in ONE batched multi-source BFS. Nodes no sampled
    * source reaches get estimate 0 (the reference skips other components entirely).
    * Output (id, sum_dist, cnt_src, closeness_est) — exact integers + one fixed
    * double expression. */
  def approxCloseness(spark: SparkSession, g: LinkGraph, mod: Long,
                      maxLevels: Int = 40): DataFrame = {
    val sources = g.vertices.filter(col("id") % mod === 0)
    val k = sources.count()
    val state = Betweenness.msBfs(spark, g, sources, maxLevels)._1
    val perTarget = state.groupBy("id")
      .agg(sum("dist").as("sum_dist"), count(lit(1)).as("cnt_src"))
    g.vertices.join(perTarget, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("sum_dist"), lit(0L)).as("sum_dist"),
        coalesce(col("cnt_src"), lit(0L)).as("cnt_src"))
      .withColumn("closeness_est",
        when(col("sum_dist") > 0L,
          (lit(k) * lit(g.n - 1L)).cast("double") /
            (lit(g.n) * col("sum_dist")).cast("double"))
          .otherwise(lit(0.0)))
  }

  /** Volume (/root/reference/networkit/cpp/distance/Volume.cpp:40-72): for each radius
    * r in 1..rmax, the average number of nodes within hop distance <= r of a sample
    * node (the node itself included). The reference samples random nodes; the
    * deterministic twin uses the fixed source set id % mod == 0, and all radii come
    * from ONE batched multi-source BFS capped at rmax levels (not one BFS per sample).
    * Output (r, within, volume): exact pair counts + the one double average. */
  def volume(spark: SparkSession, g: LinkGraph, rmax: Int, mod: Long): DataFrame = {
    import spark.implicits._
    val sources = g.vertices.filter(col("id") % mod === 0)
    val nSources = sources.count()
    val (state, _) = Betweenness.msBfs(spark, g, sources, maxLevels = rmax)
    val byDist = state.groupBy("dist").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val rows = (1 to rmax).map { r =>
      val within = (0L to r.toLong).map(d => byDist.getOrElse(d, 0L)).sum
      (r.toLong, within)
    }
    rows.toDF("r", "within")
      .select(col("r"), col("within"),
        (col("within").cast("double") / nSources.toDouble).as("volume"))
  }

  /** NeighborhoodFunctionHeuristic
    * (/root/reference/networkit/cpp/distance/NeighborhoodFunctionHeuristic.cpp:35-100):
    * estimate NF(h) from s sampled BFS runs scaled by n/s. The reference samples
    * uniformly or degree-split and runs one BFS per sample; the deterministic twin
    * takes the fixed sample id % mod == 0 and runs ALL samples in ONE batched
    * multi-source BFS. nf_est(h) = pairs(<=h) * n // s (exact integer floor), where
    * pairs counts (source, node) at 1 <= dist <= h. Output (hop, pairs, nf_est). */
  def neighborhoodFunctionHeuristic(spark: SparkSession, g: LinkGraph, maxHops: Int,
                                    mod: Long): DataFrame = {
    import spark.implicits._
    val sources = g.vertices.filter(col("id") % mod === 0)
    val nSources = sources.count()
    val (state, _) = Betweenness.msBfs(spark, g, sources, maxLevels = maxHops)
    val byDist = state.filter(col("dist") > 0).groupBy("dist").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val rows = (1 to maxHops).map { h =>
      (h.toLong, (1L to h.toLong).map(d => byDist.getOrElse(d, 0L)).sum)
    }
    rows.toDF("hop", "pairs")
      .select(col("hop"), col("pairs"),
        expr(s"pairs * ${g.n} div $nSources").as("nf_est"))
  }

  /** DynBFS insert repair (/root/reference/networkit/cpp/distance/DynBFS.cpp:32-90):
    * warm-start hop distances after an edge-insert batch. Inserts only DECREASE
    * distances, so the repair seeds a frontier with the endpoints whose distance
    * improves through an inserted edge and relaxes level-synchronously from there —
    * per-round work ∝ the affected cone, not the graph. `prev` is (id, dist) with -1
    * for unreachable (mirrored to +inf internally). Result equals a cold BFS on the
    * updated graph (Round10Spec asserts equality). */
  def bfsHopsWarm(spark: SparkSession, g: LinkGraph, prev: DataFrame,
                  added: DataFrame): DataFrame = {
    val inf = Long.MaxValue / 4
    val addBi = added.select(col("src"), col("dst"))
      .union(added.select(col("dst").as("src"), col("src").as("dst"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val bi = g.bidirected.select("src", "dst").union(addBi)
      .persist(StorageLevel.MEMORY_AND_DISK)
    bi.count()
    var dist = prev.select(col("id"),
      when(col("dist") < 0L, lit(inf)).otherwise(col("dist")).as("dist")).cutLineage
    // Seed: improvements available through an inserted edge.
    var frontier = addBi
      .join(dist.select(col("id").as("src"), col("dist").as("ds")), "src")
      .join(dist.select(col("id").as("dst"), col("dist").as("dd")), "dst")
      .filter(col("ds") + 1L < col("dd"))
      .select(col("dst").as("id"), (col("ds") + 1L).as("nd"))
      .groupBy("id").agg(min("nd").as("nd"))
      .cutLineage
    while (frontier.count() > 0) {
      dist = dist
        .join(frontier.withColumnRenamed("nd", "better"), Seq("id"), "left")
        .select(col("id"), least(col("dist"), coalesce(col("better"), col("dist"))).as("dist"))
        .cutLineage
      frontier = bi
        .join(frontier.select(col("id").as("src"), col("nd")), "src")
        .select(col("dst").as("id"), (col("nd") + 1L).as("nd"))
        .groupBy("id").agg(min("nd").as("nd"))
        .join(dist, Seq("id"))
        .filter(col("nd") < col("dist"))
        .select("id", "nd")
        .cutLineage
    }
    addBi.unpersist(); bi.unpersist()
    dist.select(col("id"),
      when(col("dist") >= inf, lit(-1L)).otherwise(col("dist")).as("dist"))
  }

  /** DynSSSP insert repair — DynDijkstra semantics
    * (/root/reference/networkit/cpp/distance/DynDijkstra.cpp:35-100, DynSSSP.h):
    * after an insert batch, only nodes whose distance improves through an inserted
    * edge seed the repair; relaxation then propagates from the improved frontier
    * only (work ∝ the affected cone, like [[bfsHopsWarm]] — the weighted analog:
    * min-plus relaxation instead of +1 levels). `prev` = (id, dist) from
    * [[weightedSssp]] on the old graph (-1 = unreached), `added` = (src, dst, w)
    * inserted undirected edges. Converges to the cold solution on the mutated graph
    * (weights ≥ 1 ⇒ Bellman-Ford fixpoint is unique). */
  def weightedSsspWarm(spark: SparkSession, g: LinkGraph, prev: DataFrame,
                       added: DataFrame,
                       weight: org.apache.spark.sql.Column): DataFrame = {
    val inf = 999999999L
    val addBi = added.select(col("src"), col("dst"), col("w").cast("long").as("w"))
      .union(added.select(col("dst").as("src"), col("src").as("dst"),
        col("w").cast("long").as("w")))
      .distinct().persist(StorageLevel.MEMORY_AND_DISK)
    val bi = g.bidirected.select(col("src"), col("dst"), weight.cast("long").as("w"))
      .union(addBi)
      .persist(StorageLevel.MEMORY_AND_DISK)
    bi.count()
    var dist = prev.select(col("id"),
      when(col("dist") < 0L, lit(inf)).otherwise(col("dist")).as("dist")).cutLineage
    // Seed: improvements available through an inserted edge.
    var frontier = addBi
      .join(dist.select(col("id").as("src"), col("dist").as("ds")), "src")
      .join(dist.select(col("id").as("dst"), col("dist").as("dd")), "dst")
      .filter(col("ds") < inf && col("ds") + col("w") < col("dd"))
      .select(col("dst").as("id"), (col("ds") + col("w")).as("nd"))
      .groupBy("id").agg(min("nd").as("nd"))
      .cutLineage
    while (frontier.count() > 0) {
      dist = dist
        .join(frontier.withColumnRenamed("nd", "better"), Seq("id"), "left")
        .select(col("id"),
          least(col("dist"), coalesce(col("better"), col("dist"))).as("dist"))
        .cutLineage
      frontier = bi
        .join(frontier.select(col("id").as("src"), col("nd")), "src")
        .select(col("dst").as("id"), (col("nd") + col("w")).as("nd"))
        .groupBy("id").agg(min("nd").as("nd"))
        .join(dist, Seq("id"))
        .filter(col("nd") < col("dist"))
        .select("id", "nd")
        .cutLineage
    }
    addBi.unpersist(); bi.unpersist()
    dist.select(col("id"),
      when(col("dist") >= inf, lit(-1L)).otherwise(col("dist")).as("dist"))
  }

  /** AffectedNodes (/root/reference/networkit/cpp/distance/AffectedNodes.cpp:20-60):
    * the nodes whose hop distance changed under an edge-update batch — the diff of
    * the warm-repaired distances against the previous solution. */
  def affectedNodes(prev: DataFrame, updated: DataFrame): DataFrame =
    prev.select(col("id"), col("dist").as("old_dist"))
      .join(updated.select(col("id"), col("dist").as("new_dist")), "id")
      .filter(col("old_dist") =!= col("new_dist"))

  /** AllSimplePaths (/root/reference/networkit/cpp/distance/AllSimplePaths.h:22-60,
    * AllSimplePaths.cpp:30-90): every simple directed path source -> target with at
    * most `cutoff` edges. The reference prunes its DFS with a backward reachability
    * pass; the distributed shape keeps exactly that idea — partial paths extend as
    * array columns over the directed edge table, and a partial path of length L
    * survives only if the reverse-BFS distance from its head to the target is
    * <= cutoff - L (so dead branches never join again). Path count is worst-case
    * exponential (inherent to the operator); the pruning bounds the frontier to paths
    * that can still complete. Output (path_str, len) per path. */
  def allSimplePaths(spark: SparkSession, g: LinkGraph, source: Long, target: Long,
                     cutoff: Int): DataFrame = {
    import spark.implicits._
    require(cutoff >= 1 && source != target)
    val distT = bfsHopsDirected(spark, g, target, reverse = true)
      .filter(col("dist") >= 0L)
      .select(col("id").as("head"), col("dist").as("dt"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val dir = g.edges.select("src", "dst").distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    dir.count()
    var frontier = Seq((Array(source), source)).toDF("path", "head")
      .join(distT, Seq("head"), "left_semi")
    var done = spark.emptyDataset[(String, Long)].toDF("path_str", "len")
    for (l <- 1 to cutoff) {
      val ext = frontier
        .join(dir.withColumnRenamed("src", "head"), "head")
        .filter(!array_contains(col("path"), col("dst")))
        .select(concat(col("path"), array(col("dst"))).as("path"), col("dst").as("head"))
        .cutLineage
      done = done.union(
        ext.filter(col("head") === target)
          .select(concat_ws("->",
            transform(col("path"), x => x.cast("string"))).as("path_str"),
            lit(l.toLong).as("len")))
        .cutLineage
      frontier =
        if (l == cutoff) ext.filter(lit(false))
        else ext.filter(col("head") =!= target)
          .join(distT, Seq("head")).filter(col("dt") <= (cutoff - l).toLong)
          .select("path", "head").cutLineage
    }
    distT.unpersist(); dir.unpersist()
    done
  }

  /** Directed BFS from `source` following out-edges, or in-edges when `reverse`
    * (/root/reference/networkit/cpp/distance/ReverseBFS.cpp — the reverse variant;
    * the forward one is BFS.cpp run on a directed graph). Same level-synchronous
    * frontier harness as [[bfsHops]], over the directed edge table instead of the
    * bidirected view. Unreachable vertices get -1. Output (id, dist). */
  def bfsHopsDirected(spark: SparkSession, g: LinkGraph, source: Long,
                      reverse: Boolean = false): DataFrame = {
    val dir0 = g.edges.select("src", "dst")
    val dir = (if (reverse) dir0.select(col("dst").as("src"), col("src").as("dst"))
               else dir0).distinct().persist(StorageLevel.MEMORY_AND_DISK)
    dir.count()
    var visited = g.vertices.filter(col("id") === source)
      .select(col("id"), lit(0L).as("dist")).cutLineage
    var frontier = visited
    var level = 1L
    var more = frontier.count() > 0
    while (more) {
      val next = dir.join(frontier.withColumnRenamed("id", "src").select("src"), "src")
        .select(col("dst").as("id")).distinct()
        .join(visited.select("id"), Seq("id"), "left_anti")
        .select(col("id"), lit(level).as("dist"))
        .cutLineage
      more = next.count() > 0
      if (more) {
        visited = visited.union(next).cutLineage
        frontier = next
        level += 1
      }
    }
    dir.unpersist()
    g.vertices.join(visited, Seq("id"), "left")
      .select(col("id"), coalesce(col("dist"), lit(-1L)).as("dist"))
  }
}
