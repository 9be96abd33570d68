package graft.algo

import scala.collection.mutable

import graft.DataFrameLineageOps

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Max-flow / min-cut (Edmonds-Karp) and Flake-Tarjan cut clustering.
  *
  * Reference semantics: /root/reference/networkit/cpp/flow/EdmondsKarp.cpp:18-120
  * (BFS augmenting paths on the residual graph of an undirected capacitated graph;
  * `getSourceSet` = residual-reachable set from the source after convergence) and
  * /root/reference/networkit/cpp/community/CutClustering.cpp:16-80 (augment G with a
  * sink t connected to every node at weight alpha; process nodes in degree-descending
  * order, skipping already-clustered nodes; each unclustered node's min-cut source side
  * becomes a cluster, absorbing earlier sub-clusters).
  *
  * Spark-first re-expression:
  *
  *   - Flow decomposition is inherently sequential (one augmenting path at a time), but
  *     each path search is a full BFS — so the BFS is the distributed primitive here,
  *     exactly like the engine's msBFS family: frontier expansion is one co-partitioned
  *     shuffle-hash join per level over the residual-arc table. Only the O(path-length)
  *     predecessor walk touches the driver (one ≤batch-row lookup per hop).
  *
  *   - Independent max-flow runs BATCH into one keyed state, (run, u, v, cap): all runs
  *     advance through the same per-level jobs, so k flows cost max-rounds, not
  *     sum-of-rounds — the same batching the betweenness/APSP kernels use.
  *
  *   - CutClustering's sequential skip/absorb loop is provably order-independent: the
  *     minimal min-cut source sides msc(u) form a laminar family with
  *     `v ∈ msc(u) ⇒ msc(v) ⊆ msc(u)` (Flake-Tarjan nesting, cited by the reference at
  *     CutClustering.cpp:66-68), so the final partition is exactly the family's MAXIMAL
  *     sets, and each cluster's label is the first node in the reference's processing
  *     order (degree desc, id asc) whose msc equals that set. That turns n sequential
  *     max-flows into ONE batched run plus two tiny containment joins — and it is the
  *     scale path: at web scale the runs batch by wave while the per-level joins stay
  *     a single co-partitioned exchange regardless of batch size.
  *
  * All capacities are integers (Long): gains and flow values stay exact, so the DuckDB
  * oracle (brute-force min-cut subset enumeration on the fixture) matches bit-for-bit.
  */
object Flow {

  /** Result of one batch of max-flow runs: per-run flow value (runs are driver-scale
    * batches by construction) and the union of per-run minimal source sides. */
  final case class BatchResult(values: Map[Long, Long], sourceSets: DataFrame)

  final case class MaxFlowResult(value: Long, sourceSet: DataFrame)

  /** Batched Edmonds-Karp. `edges` is an undirected capacity table (u, v, cap) — one
    * row per logical edge, integer cap — flow may use each edge in either direction up
    * to cap (the reference's undirected residual semantics, EdmondsKarp.cpp:28-40).
    * `runs` are (runId, source, sink) triples sharing that capacity table.
    */
  def edmondsKarpBatched(spark: SparkSession, edges: DataFrame,
                         runs: Seq[(Long, Long, Long)],
                         maxPhases: Int = 10000): BatchResult = {
    import spark.implicits._
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt

    val und = edges.select(col("u").cast("long").as("u"), col("v").cast("long").as("v"),
      col("cap").cast("long").as("cap"))
    val arcs0 = und.union(und.select(col("v").as("u"), col("u").as("v"), col("cap")))
    val runsDf = runs.toDF("run", "s", "t")

    // Residual state, keyed by run and hash-partitioned on (run, u) — the probe key of
    // every frontier expansion. Initial residual cap = cap in both directions.
    var resid = arcs0.crossJoin(broadcast(runsDf.select("run")))
      .select(col("run"), col("u"), col("v"), col("cap"))
      .repartition(parts, col("run"), col("u"))
      .cutLineage

    val srcOf  = runs.map(r => r._1 -> r._2).toMap
    val active = mutable.Set[Long](runs.map(_._1): _*)
    val value  = mutable.Map[Long, Long](runs.map(r => r._1 -> 0L): _*)
    val emptySrc = spark.emptyDataset[(Long, Long)].toDF("run", "id")
    var sources  = emptySrc
    var phase = 0

    while (active.nonEmpty && phase < maxPhases) {
      // ---- distributed BFS over residual arcs, all active runs at once ----
      var visited = runsDf.filter(col("run").isin(active.toSeq: _*))
        .select(col("run"), col("s").as("id"), col("s").as("pred"),
          lit(Long.MaxValue).as("gain"))
        .repartition(parts, col("run"), col("id"))
        .cutLineage
      var frontier = visited
      val retired  = mutable.ArrayBuffer[DataFrame](visited, frontier)
      val bfsActive = active.clone()
      // run -> (pred-of-sink, augmenting gain)
      val reached = mutable.Map[Long, (Long, Long)]()

      var bfsDone = bfsActive.isEmpty
      while (!bfsDone) {
        val nxt = frontier
          .select(col("run"), col("id").as("u"), col("gain").as("fgain"))
          .join(resid.filter(col("cap") > 0).hint("shuffle_hash"), Seq("run", "u"))
          .select(col("run"), col("v").as("id"), col("u").as("pred"),
            least(col("fgain"), col("cap")).as("gain"))
          .join(visited.select("run", "id").hint("shuffle_hash"),
            Seq("run", "id"), "left_anti")
          .groupBy("run", "id")
          .agg(max(struct(col("gain"), (-col("pred")).as("np"), col("pred"))).as("best"))
          .select(col("run"), col("id"),
            col("best.pred").as("pred"), col("best.gain").as("gain"))
          .repartition(parts, col("run"), col("id"))
          .cutLineage
        retired += nxt

        // Which runs hit their sink this level? (≤ batch rows)
        val hits = nxt.join(broadcast(runsDf), Seq("run"))
          .filter(col("id") === col("t"))
          .select("run", "pred", "gain").collect()
        hits.foreach { r =>
          val run = r.getLong(0)
          reached(run) = (r.getLong(1), r.getLong(2))
          bfsActive -= run
        }
        val clean = nxt.join(broadcast(runsDf), Seq("run"))
          .filter(col("id") =!= col("t"))
          .select("run", "id", "pred", "gain")
        visited = visited.union(clean).cutLineage
        retired += visited

        // Which runs still expand? (distinct run ids — ≤ batch rows)
        val expanding =
          if (bfsActive.isEmpty) Set.empty[Long]
          else clean.filter(col("run").isin(bfsActive.toSeq: _*))
            .select("run").distinct().collect().map(_.getLong(0)).toSet
        val exhausted = bfsActive.toSet -- expanding
        if (exhausted.nonEmpty) {
          // BFS ran dry without reaching the sink: max flow complete for these runs;
          // the visited set IS the residual-reachable minimal source side.
          sources = sources
            .union(visited.filter(col("run").isin(exhausted.toSeq: _*))
              .select("run", "id"))
            .cutLineage
          bfsActive --= exhausted
          active --= exhausted
        }
        if (bfsActive.isEmpty) bfsDone = true
        else {
          frontier = clean.filter(col("run").isin(bfsActive.toSeq: _*)).cutLineage
          retired += frontier
        }
      }

      // ---- augment: walk the predecessor chains (≤ depth driver lookups) ----
      if (reached.nonEmpty) {
        // per-run path edges (u -> v) in flow direction
        val pathEdges = mutable.ArrayBuffer[(Long, Long, Long)]() // (run, u, v)
        val cur = mutable.Map[Long, Long]()
        for ((run, (pred, _)) <- reached) {
          val sink = runs.find(_._1 == run).get._3
          pathEdges += ((run, pred, sink))
          cur(run) = pred
        }
        var walking = cur.exists { case (r, c) => c != srcOf(r) }
        while (walking) {
          val need = cur.toSeq.filter { case (r, c) => c != srcOf(r) }
          val needDf = need.toDF("run", "id")
          val rows = visited.join(broadcast(needDf), Seq("run", "id"))
            .select("run", "id", "pred").collect()
          rows.foreach { r =>
            val (run, id, pred) = (r.getLong(0), r.getLong(1), r.getLong(2))
            pathEdges += ((run, pred, id))
            cur(run) = pred
          }
          walking = cur.exists { case (r, c) => c != srcOf(r) }
        }
        // residual update: forward arcs lose gain, reverse arcs regain it
        val deltas = pathEdges.toSeq.flatMap { case (run, u, v) =>
          val g = reached(run)._2
          Seq((run, u, v, -g), (run, v, u, g))
        }.toDF("run", "u", "v", "delta")
        val prev = resid
        resid = resid.join(broadcast(deltas), Seq("run", "u", "v"), "left")
          .select(col("run"), col("u"), col("v"),
            (col("cap") + coalesce(col("delta"), lit(0L))).as("cap"))
          .cutLineage
        prev.releaseState()
        reached.foreach { case (run, (_, g)) => value(run) = value(run) + g }
      }
      retired.foreach(_.releaseState())
      phase += 1
    }
    resid.releaseState()
    BatchResult(value.toMap, sources)
  }

  /** Single-pair max flow; sourceSet is the minimal min-cut source side (id). */
  def maxFlow(spark: SparkSession, edges: DataFrame, s: Long, t: Long): MaxFlowResult = {
    val r = edmondsKarpBatched(spark, edges, Seq((0L, s, t)))
    MaxFlowResult(r.values(0L), r.sourceSets.select("id"))
  }

  /** Flake-Tarjan cut clustering (CutClustering.cpp:16-80): returns (id, cluster)
    * where cluster ids match the reference exactly (degree-desc/id-asc creator of each
    * maximal minimal-source-side). `edges` is the undirected capacity table (u,v,cap);
    * `alpha` is the sink-edge weight in the same integer units (scale caps to make
    * fractional alphas exact). */
  def cutClustering(spark: SparkSession, edges: DataFrame, alpha: Long): DataFrame = {
    val und = edges.select(col("u").cast("long").as("u"), col("v").cast("long").as("v"),
      col("cap").cast("long").as("cap"))
    val nodesDf = und.select(col("u").as("id")).union(und.select(col("v").as("id")))
      .distinct()
    // CutClustering is n max-flows on one graph — the reference itself is O(n·flow)
    // sequential (CutClustering.cpp:63). We batch ALL of them into one keyed EK run;
    // the node list bounds the batch and is driver-scale by construction (a community
    // fixture / per-seed set). At larger n, chunk this list into successive batches.
    val nodes = nodesDf.collect().map(_.getLong(0)).sorted
    val sink  = -1L
    val aug   = und.union(
      nodesDf.select(col("id").as("u"), lit(sink).as("v"), lit(alpha).as("cap")))
    val runs = nodes.map(u => (u, u, sink)).toSeq
    val res  = edmondsKarpBatched(spark, aug, runs)

    val msc = res.sourceSets // (run, id): msc(run)
    val sz  = msc.groupBy("run").agg(count(lit(1)).as("sz"))
    // unweighted degree in the ORIGINAL graph = the reference's processing-order key
    val deg = und.select(col("u").as("id")).union(und.select(col("v").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))

    // containment: msc(a) ⊆ msc(b) iff |msc(a) ∩ msc(b)| = |msc(a)|
    val contained = msc.select(col("run").as("ra"), col("id"))
      .join(msc.select(col("run").as("rb"), col("id")), Seq("id"))
      .filter(col("ra") =!= col("rb"))
      .groupBy("ra", "rb").agg(count(lit(1)).as("common"))
      .join(sz.select(col("run").as("ra"), col("sz").as("sza")), Seq("ra"))
      .join(sz.select(col("run").as("rb"), col("sz").as("szb")), Seq("rb"))
      .filter(col("common") === col("sza"))
    // a is dominated if some b holds a strict superset, or the SAME set but b comes
    // first in the reference's order (deg desc, id asc) — b is the cluster's creator.
    val ordered = contained
      .join(deg.select(col("id").as("ra"), col("deg").as("dega")), Seq("ra"))
      .join(deg.select(col("id").as("rb"), col("deg").as("degb")), Seq("rb"))
    val dominated = ordered.filter(
      col("szb") > col("sza") ||
        (col("szb") === col("sza") &&
          (col("degb") > col("dega") ||
            (col("degb") === col("dega") && col("rb") < col("ra")))))
      .select(col("ra").as("run")).distinct()
    val creators = sz.select("run").join(dominated, Seq("run"), "left_anti")
    msc.join(creators, Seq("run"))
      .select(col("id"), col("run").as("cluster"))
  }

  /** CutClustering.getClusterHierarchy (CutClustering.cpp:82-240): the complete
    * parametric hierarchy — every alpha breakpoint where the clustering changes,
    * found by the reference's interval recursion. Breakpoints
    * (upperCut − lowerCut)/(lowerSize − upperSize) are exact rationals over the
    * integer caps, so each probe clustering runs on caps scaled by 2·den with
    * integer alpha 2·num + 1 (= breakpoint + 1/(2·den), the reference's +ε) — no
    * floating-point drift anywhere. Per-cluster cuts/sizes are one distributed
    * aggregation per level (collected: one row per cluster); the probe clusterings
    * are the batched-EK [[cutClustering]]. Returns (alphaNum, alphaDen) → partition
    * (id, cluster), including alpha=0 (connected components, min-id reps) and the
    * upper bound (singletons). */
  def clusterHierarchy(spark: SparkSession,
                       edges: DataFrame): Map[(Long, Long), DataFrame] = {
    val und = edges.select(col("u").cast("long").as("u"), col("v").cast("long").as("v"),
      col("cap").cast("long").as("cap")).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    und.count()
    val nodes = und.select(col("u").as("id")).union(und.select(col("v").as("id")))
      .distinct().persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // driver-side maps for the interval logic (one row per CLUSTER — bounded)
    def stats(part: DataFrame): (Map[Long, Long], Map[Long, Long], Map[Long, Long]) = {
      val lbl = part.select(col("id"), col("cluster"))
      val sizes = lbl.groupBy("cluster").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val cutRows = und
        .join(lbl.select(col("id").as("u"), col("cluster").as("cu")), "u")
        .join(lbl.select(col("id").as("v"), col("cluster").as("cv")), "v")
        .filter(col("cu") =!= col("cv"))
        .select(explode(array(struct(col("cu").as("c"), col("cap")),
          struct(col("cv").as("c"), col("cap")))).as("e"))
        .groupBy(col("e.c").as("c")).agg(sum(col("e.cap")).as("w"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val memb = lbl.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      (sizes, cutRows.withDefaultValue(0L), memb)
    }

    val nN = nodes.count()
    // probe at alpha = num/den + 1/(2·den·n) — the reference's "+ε". Distinct
    // breakpoints p/q (q ≤ n) differ by ≥ 1/(den·q) ≥ 1/(den·n), so this ε can
    // never jump past the next breakpoint: exact-rational safety the float ε lacks.
    def clusterAt(num: Long, den: Long): DataFrame =
      cutClustering(spark,
        und.select(col("u"), col("v"), (col("cap") * lit(2L * den * nN)).as("cap")),
        alpha = 2L * num * nN + 1L).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val comps = {
      // connected components of the capacity graph, min-id labels (alpha = 0)
      var lbl = nodes.select(col("id"), col("id").as("cluster")).cutLineage
      val bi = und.select(col("u"), col("v"))
        .union(und.select(col("v").as("u"), col("u").as("v")))
      var changed = 1L
      while (changed > 0) {
        val msgs = bi.join(lbl.select(col("id").as("u"), col("cluster")), "u")
          .groupBy(col("v").as("id")).agg(min("cluster").as("cand"))
        val next = lbl.join(msgs, Seq("id"), "left")
          .select(col("id"),
            least(col("cluster"), coalesce(col("cand"), col("cluster"))).as("cluster"),
            (col("cand") < col("cluster")).as("ch")).cutLineageLazy
        changed = next.filter(col("ch")).count()
        val prev = lbl
        lbl = next.select("id", "cluster").cutLineage
        prev.releaseState(); next.releaseState()
      }
      lbl
    }
    val singletons = nodes.select(col("id"), col("id").as("cluster"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val maxW = und.agg(max("cap")).head().getLong(0)
    val upperBound = maxW + 1L // weighted upper bound (CutClustering.cpp:88-95)

    val result = scala.collection.mutable.Map[(Long, Long), DataFrame]()
    result((0L, 1L)) = comps

    // recursion with an explicit driver stack; rationals kept as (num, den)
    case class Frame(lowNum: Long, lowDen: Long, low: DataFrame,
                     upNum: Long, upDen: Long, up: DataFrame)
    val stack = scala.collection.mutable.Stack(
      Frame(0L, 1L, comps, upperBound, 1L, singletons))
    while (stack.nonEmpty) {
      var f = stack.pop()
      var open = true
      while (open) {
        val (loSizes, loCuts, loMemb) = stats(f.low)
        val (upSizes, upCuts, upMemb) = stats(f.up)
        // first lower cluster (sorted order = deterministic twin of the reference's
        // map iteration) whose candidate breakpoint is strictly below the upper alpha
        var best: Option[(Long, Long)] = None // (num, den): cutDiff / sizeDiff
        def gt(a: (Long, Long), b: (Long, Long)): Boolean = a._1 * b._2 > b._1 * a._2
        def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)
        for ((lc, lSize) <- loSizes.toSeq.sortBy(_._1) if best.isEmpty) {
          if (upSizes(upMemb(lc)) != lSize) {
            var num = upCuts(upMemb(lc)) - loCuts(lc)
            var den = lSize - upSizes(upMemb(lc))
            // alternative upper-cluster representatives inside this lower cluster
            // (CutClustering.cpp:179-190): keep the HIGHEST candidate breakpoint
            for ((u2, c2) <- upMemb if loMemb(u2) == lc && c2 == u2 && u2 != lc) {
              val n2 = upCuts(u2) - loCuts(lc)
              val d2 = lSize - upSizes(u2)
              if (d2 > 0 && gt((n2, d2), (num, den))) { num = n2; den = d2 }
            }
            if (gt((f.upNum, f.upDen), (num, den))) {
              val g = math.max(gcd(math.abs(num), den), 1L)
              best = Some((num / g, den / g))
            }
          }
        }
        best match {
          case None =>
            result.getOrElseUpdate((f.upNum, f.upDen), f.up)
            open = false
          case Some((num, den)) =>
            val mid = clusterAt(num, den)
            val nMid = mid.select("cluster").distinct().count()
            if (nMid == upSizes.size) {
              // middle IS the upper clustering: (num, den)+ε is its lower bound
              result.getOrElseUpdate((num, den), f.up)
              f = Frame(f.lowNum, f.lowDen, f.low, num, den, f.up)
              // continue loop with tightened upper bound
            } else if (nMid == loSizes.size) {
              // numerical impossibility in the reference; with exact rationals this
              // means lower == middle — stop this interval
              open = false
            } else {
              // a genuinely new clustering strictly between: recurse below (the
              // recursion discovers middle's own tight lower-bound key), continue
              // above with lower = middle (CutClustering.cpp:228-233)
              stack.push(Frame(f.lowNum, f.lowDen, f.low, num, den, mid))
              f = Frame(num, den, mid, f.upNum, f.upDen, f.up)
            }
        }
      }
    }
    und.unpersist(); nodes.unpersist()
    result.toMap
  }
}
