package graft.viz

import graft.DataFrameLineageOps

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.LinkGraph
import graft.synth.GraphSpec

/** Graph-drawing family — the reference's viz stack (GraphLayoutAlgorithm.h /
  * layout/LayoutAlgorithm.h surfaces; the far-field grid replaces viz/Octree.h)
  * re-expressed as iterative
  * DataFrame pipelines over a coordinate table (id, x, y):
  *
  *   - FruchtermanReingold (viz/FruchtermanReingold.cpp:23-160): spring embedder;
  *     the reference's O(n²) `forNodePairs` repulsion becomes a GRID-BINNED spatial
  *     join — exact pairwise forces within the 3×3 cell neighborhood plus a far-field
  *     term from per-cell centroids (Barnes-Hut-style, one shuffle per iteration;
  *     the per-cell summary is a ≤gridRes² broadcast). gridRes = 1 reproduces the
  *     reference's exact all-pairs loop.
  *   - PivotMDS (viz/PivotMDS.cpp:23-130, Brandes & Pich): k-pivot BFS distances via
  *     the engine's batched msBFS, distributed double-centering, then power iteration
  *     on the k×k Gram matrix C^T C — the n×k matrix stays distributed; only the
  *     k×k driver object is local, exactly the reference's memory split.
  *   - MaxentStress (viz/MaxentStress.cpp, Gansner et al.): the local-iteration form —
  *     x_u ← (Σ_{v∈N(u)} w_uv (x_v + d_uv·(x_u-x_v)/‖x_u-x_v‖) + q·Σ_{far} …) / Σ w —
  *     with the same grid far-field approximation standing in for the solver round.
  *   - MultilevelLayouter (viz/MultilevelLayouter.cpp:20-80): matching-coarsen to a
  *     small graph, lay out the coarsest level, prolong coordinates, FR-refine.
  *   - PostscriptWriter (viz/PostscriptWriter.cpp:13-210): EPS output of a layout.
  *
  * Coordinates live in the unit square like the reference's default frame. The random
  * init is the shared deterministic LCG, so layouts are reproducible across runs and
  * partitionings.
  */
object GraphViz {

  /** Deterministic pseudo-random in [0,1): two-round LCG of (id·mix + seed). */
  private def unitRand(idCol: Column, mix: Long, seed: Long): Column =
    expr(GraphSpec.lcg(s"id * $mix + $seed")).cast("double") / lit(GraphSpec.M.toDouble)

  /** Random initial layout (Layouter.cpp:39-52 analog, deterministic). */
  def randomLayout(g: LinkGraph, seed: Long = 42L): DataFrame =
    g.vertices.select(col("id"),
      unitRand(col("id"), 2L, seed).as("x"),
      unitRand(col("id"), 3L, seed + 7L).as("y"))

  /** One FR force pass: returns the new (id, x, y). `optSq` = optimal pair squared
    * distance 0.3/n (FruchtermanReingold.cpp:14,30). */
  private def frStep(layout: DataFrame, edges: DataFrame, optSq: Double,
                     stepLen: Double, gridRes: Int): DataFrame = {
    val optDist = math.sqrt(optSq)
    val g = math.max(gridRes, 1)
    val cellOf = (c: Column) => least(floor(c * g), lit(g - 1)).cast("long")
    val pos = layout.select(col("id"), col("x"), col("y"),
      cellOf(col("x")).as("cx"), cellOf(col("y")).as("cy"))

    // far-field: per-cell count + centroid, broadcast (≤ g² rows)
    val cells = pos.groupBy("cx", "cy")
      .agg(count(lit(1)).as("cnt"), avg("x").as("mx"), avg("y").as("my"))
    val far = pos.crossJoin(broadcast(cells.select(col("cx").as("ocx"),
        col("cy").as("ocy"), col("cnt"), col("mx"), col("my"))))
      .filter(abs(col("cx") - col("ocx")) > 1 || abs(col("cy") - col("ocy")) > 1)
      .select(col("id"),
        (col("cnt") * lit(optSq) * (col("x") - col("mx")) /
          (pow(col("x") - col("mx"), 2) + pow(col("y") - col("my"), 2))).as("fx"),
        (col("cnt") * lit(optSq) * (col("y") - col("my")) /
          (pow(col("x") - col("mx"), 2) + pow(col("y") - col("my"), 2))).as("fy"))

    // near-field: exact pairs within the 3×3 cell neighborhood (spatial join on the
    // receiver's 9 candidate cells; each unordered pair meets exactly once per side)
    val probe = pos.select(col("id"), col("x"), col("y"),
        explode(sequence(col("cx") - 1, col("cx") + 1)).as("jcx"), col("cy"))
      .select(col("id"), col("x"), col("y"), col("jcx"),
        explode(sequence(col("cy") - 1, col("cy") + 1)).as("jcy"))
    val near = probe.join(
        pos.select(col("id").as("oid"), col("x").as("ox"), col("y").as("oy"),
          col("cx").as("jcx"), col("cy").as("jcy")), Seq("jcx", "jcy"))
      .filter(col("id") =!= col("oid"))
      .select(col("id"),
        when(pow(col("x") - col("ox"), 2) + pow(col("y") - col("oy"), 2) > 0,
          lit(optSq) * (col("x") - col("ox")) /
            (pow(col("x") - col("ox"), 2) + pow(col("y") - col("oy"), 2)))
          .otherwise(lit(0.0)).as("fx"),
        when(pow(col("x") - col("ox"), 2) + pow(col("y") - col("oy"), 2) > 0,
          lit(optSq) * (col("y") - col("oy")) /
            (pow(col("x") - col("ox"), 2) + pow(col("y") - col("oy"), 2)))
          .otherwise(lit(0.0)).as("fy"))

    // attraction along edges (FruchtermanReingold.cpp:39-47): (p1-p2)·(dist/optDist),
    // pulling both endpoints together
    val coords = layout.select(col("id"), col("x"), col("y"))
    val ev = edges.select(col("src"), col("dst"))
      .join(coords.select(col("id").as("src"), col("x").as("sx"), col("y").as("sy")), "src")
      .join(coords.select(col("id").as("dst"), col("x").as("dx"), col("y").as("dy")), "dst")
      .select(col("src"), col("dst"),
        (sqrt(pow(col("sx") - col("dx"), 2) + pow(col("sy") - col("dy"), 2)) / lit(optDist))
          .as("str"),
        (col("sx") - col("dx")).as("vx"), (col("sy") - col("dy")).as("vy"))
    val attr = ev.select(col("src").as("id"), (-col("vx") * col("str")).as("fx"),
        (-col("vy") * col("str")).as("fy"))
      .union(ev.select(col("dst").as("id"), (col("vx") * col("str")).as("fx"),
        (col("vy") * col("str")).as("fy")))

    val force = far.union(near).union(attr)
      .groupBy("id").agg(sum("fx").as("fx"), sum("fy").as("fy"))
    layout.join(force, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("fx"), lit(0.0)).as("fx"), coalesce(col("fy"), lit(0.0)).as("fy"),
        col("x"), col("y"))
      .select(col("id"),
        least(greatest(col("x") + when(sqrt(col("fx") * col("fx") + col("fy") * col("fy")) > 0,
          lit(stepLen) * col("fx") / sqrt(col("fx") * col("fx") + col("fy") * col("fy")))
          .otherwise(lit(0.0)), lit(0.0)), lit(1.0)).as("x"),
        least(greatest(col("y") + when(sqrt(col("fx") * col("fx") + col("fy") * col("fy")) > 0,
          lit(stepLen) * col("fy") / sqrt(col("fx") * col("fx") + col("fy") * col("fy")))
          .otherwise(lit(0.0)), lit(0.0)), lit(1.0)).as("y"))
  }

  /** FruchtermanReingold with the reference's cooling schedule (step 1/(1 + 0.1t),
    * FruchtermanReingold.cpp:84-89). Returns (id, x, y) in the unit square. */
  def fruchtermanReingold(spark: SparkSession, g: LinkGraph, maxIter: Int = 30,
                          gridRes: Int = 8, seed: Long = 42L,
                          init: Option[DataFrame] = None): DataFrame = {
    val edges = g.canonicalUndirected.select("src", "dst").cutLineage
    var layout = init.getOrElse(randomLayout(g, seed)).cutLineage
    val optSq = 0.3 / math.max(g.n, 1L).toDouble
    var step = 1.0
    var iter = 0
    while (iter < maxIter) {
      val prev = layout
      layout = frStep(layout, edges, optSq, step, gridRes).cutLineage
      prev.releaseState()
      iter += 1
      step = 1.0 / (1.0 + 0.1 * iter)
    }
    edges.releaseState()
    layout
  }

  /** The deterministic pivot set: the k first nodes under the LCG shuffle (the
    * reference draws k random distinct nodes, PivotMDS.cpp:107-125). */
  def mdsPivots(g: LinkGraph, numPivots: Int, seed: Long): DataFrame =
    g.vertices.orderBy(expr(GraphSpec.lcg(s"id * 5 + $seed")), col("id"))
      .limit(numPivots).select(col("id"))

  /** PivotMDS's double-centered pivot-distance matrix as EXACT integer numerators
    * scaled by n·k: cnum = d·n·k − rowSum(id)·n − colSum(s)·k + total
    * (PivotMDS.cpp:46-69 with the three means cleared of denominators). Rows exist
    * only for (pivot, node) pairs the BFS reached — the reference's sparse-triplet
    * convention. Integer-exact, so the DuckDB oracle matches bit-for-bit. */
  def pivotMdsCentered(spark: SparkSession, g: LinkGraph, numPivots: Int = 10,
                       seed: Long = 42L): DataFrame = {
    val pivots = mdsPivots(g, numPivots, seed).cutLineage
    val k = pivots.count()
    val (bfs, _) = graft.algo.Betweenness.msBfs(spark, g, pivots)
    val d = bfs.select(col("s"), col("id"), col("dist"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    d.count()
    bfs.releaseState(); pivots.releaseState()
    val n = g.n
    val rowSum = d.groupBy("id").agg(sum("dist").as("rsum"))
    val colSum = d.groupBy("s").agg(sum("dist").as("csum"))
    val total = d.agg(sum("dist")).head().getLong(0)
    d.join(rowSum, Seq("id")).join(colSum, Seq("s"))
      .select(col("s"), col("id"),
        (col("dist") * lit(n * k) - col("rsum") * lit(n) - col("csum") * lit(k) +
          lit(total)).as("cnum"))
  }

  /** PivotMDS (viz/PivotMDS.cpp:23-105). Unweighted BFS distances stand in for the
    * reference's uniform-weight Dijkstra. Returns (id, x, y) — the first two MDS
    * coordinates. */
  def pivotMds(spark: SparkSession, g: LinkGraph, numPivots: Int = 10,
               dim: Int = 2, powerIters: Int = 60, seed: Long = 42L): DataFrame = {
    val pivotIds = mdsPivots(g, numPivots, seed).collect().map(_.getLong(0)).sorted
    val k = pivotIds.length
    val pidx = pivotIds.zipWithIndex.toMap
    val n = g.n.toDouble

    // double centering via the exact integer numerators, divided once
    val c = pivotMdsCentered(spark, g, numPivots, seed)
      .select(col("s"), col("id"), (col("cnum").cast("double") / lit(n * k)).as("v"))
      .cutLineage

    // k×k Gram matrix C^T C — driver-local by design (k ≤ tens)
    val gram = Array.ofDim[Double](k, k)
    c.select(col("id"), col("s").as("s1"), col("v").as("v1"))
      .join(c.select(col("id"), col("s").as("s2"), col("v").as("v2")), Seq("id"))
      .groupBy("s1", "s2").agg(sum(col("v1") * col("v2")).as("g"))
      .collect().foreach(r => gram(pidx(r.getLong(0)))(pidx(r.getLong(1))) = r.getDouble(2))

    // power iteration + deflation on the driver (PivotMDS.cpp:75-105)
    def powerIter(m: Array[Array[Double]]): (Array[Double], Double) = {
      var v = Array.tabulate(k)(i => 1.0 / math.sqrt(k.toDouble) * (if (i % 2 == 0) 1 else -1))
      var lambda = 0.0
      for (_ <- 0 until powerIters) {
        val nv = Array.tabulate(k)(i => (0 until k).map(j => m(i)(j) * v(j)).sum)
        val norm = math.sqrt(nv.map(x => x * x).sum)
        if (norm > 0) { v = nv.map(_ / norm); lambda = norm }
      }
      (v, lambda)
    }
    val axes = (0 until math.min(dim, k)).map { _ =>
      val (v, lambda) = powerIter(gram)
      val sq = v.map(x => x * x).sum
      for (i <- 0 until k; j <- 0 until k) gram(i)(j) -= lambda / sq * v(i) * v(j)
      v
    }

    // pos_d = C · eigvec_d : one distributed matvec per dimension
    val s = spark
    import s.implicits._
    val evRows = axes.zipWithIndex.flatMap { case (v, a) =>
      pivotIds.zipWithIndex.map { case (p, i) => (p, a, v(i)) }
    }.toDF("s", "axis", "ev")
    val coords = c.join(broadcast(evRows), Seq("s"))
      .groupBy("id", "axis").agg(sum(col("v") * col("ev")).as("coord"))
    val out = g.vertices
      .join(coords.filter(col("axis") === 0).select(col("id"), col("coord").as("x")),
        Seq("id"), "left")
      .join(coords.filter(col("axis") === 1).select(col("id"), col("coord").as("y")),
        Seq("id"), "left")
      .select(col("id"), coalesce(col("x"), lit(0.0)).as("x"),
        coalesce(col("y"), lit(0.0)).as("y"))
      .cutLineage
    c.releaseState()
    out
  }

  /** Maxent-stress layout (viz/MaxentStress.cpp, Gansner et al. §local iteration):
    * fixed rounds of x_u ← (Σ_{v∈N(u)} (x_v + d·unit(x_u-x_v)) + q·far(u)) / (deg+q'),
    * with unit edge targets d = optDist and the FR grid far-field as the maxent term.
    * Init = PivotMDS rescaled to the unit square (the reference also seeds from a
    * coarse MDS solution). */
  def maxentStress(spark: SparkSession, g: LinkGraph, rounds: Int = 20,
                   gridRes: Int = 8, alpha: Double = 0.008, seed: Long = 42L): DataFrame = {
    val edges = g.canonicalUndirected.select("src", "dst").cutLineage
    // rescale MDS init into [0,1]²
    val mds = pivotMds(spark, g, numPivots = math.min(10, g.n.toInt), seed = seed)
    val ext = mds.agg(min("x").as("x0"), max("x").as("x1"),
      min("y").as("y0"), max("y").as("y1")).head()
    val (x0, x1, y0, y1) = (ext.getDouble(0), ext.getDouble(1), ext.getDouble(2), ext.getDouble(3))
    var layout = mds.select(col("id"),
      (when(lit(x1 - x0) > 0, (col("x") - lit(x0)) / lit(x1 - x0)).otherwise(lit(0.5))).as("x"),
      (when(lit(y1 - y0) > 0, (col("y") - lit(y0)) / lit(y1 - y0)).otherwise(lit(0.5))).as("y"))
      .cutLineage
    mds.releaseState()
    val optDist = math.sqrt(0.3 / math.max(g.n, 1L).toDouble)
    val gr = math.max(gridRes, 1)
    val cellOf = (c: Column) => least(floor(c * gr), lit(gr - 1)).cast("long")
    var r = 0
    while (r < rounds) {
      val coords = layout
      val ev = edges
        .join(coords.select(col("id").as("src"), col("x").as("sx"), col("y").as("sy")), "src")
        .join(coords.select(col("id").as("dst"), col("x").as("dx"), col("y").as("dy")), "dst")
        .select(col("src"), col("dst"), col("sx"), col("sy"), col("dx"), col("dy"),
          greatest(sqrt(pow(col("sx") - col("dx"), 2) + pow(col("sy") - col("dy"), 2)),
            lit(1e-9)).as("len"))
      // neighbor target positions: v + d·unit(u - v), from u's perspective
      val tgt = ev.select(col("src").as("id"),
          (col("dx") + lit(optDist) * (col("sx") - col("dx")) / col("len")).as("tx"),
          (col("dy") + lit(optDist) * (col("sy") - col("dy")) / col("len")).as("ty"))
        .union(ev.select(col("dst").as("id"),
          (col("sx") + lit(optDist) * (col("dx") - col("sx")) / col("len")).as("tx"),
          (col("sy") + lit(optDist) * (col("dy") - col("sy")) / col("len")).as("ty")))
        .groupBy("id").agg(count(lit(1)).as("deg"), sum("tx").as("stx"), sum("ty").as("sty"))
      // maxent far term: push away from distant cell centroids (grid approximation)
      val pos = coords.select(col("id"), col("x"), col("y"),
        cellOf(col("x")).as("cx"), cellOf(col("y")).as("cy"))
      val cells = pos.groupBy("cx", "cy")
        .agg(count(lit(1)).as("cnt"), avg("x").as("mx"), avg("y").as("my"))
      val far = pos.crossJoin(broadcast(cells.select(col("cx").as("ocx"),
          col("cy").as("ocy"), col("cnt"), col("mx"), col("my"))))
        .filter(abs(col("cx") - col("ocx")) > 1 || abs(col("cy") - col("ocy")) > 1)
        .groupBy("id").agg(
          sum(col("cnt") * (col("x") - col("mx")) /
            (pow(col("x") - col("mx"), 2) + pow(col("y") - col("my"), 2))).as("rx"),
          sum(col("cnt") * (col("y") - col("my")) /
            (pow(col("x") - col("mx"), 2) + pow(col("y") - col("my"), 2))).as("ry"))
      val prev = layout
      layout = coords.join(tgt, Seq("id"), "left").join(far, Seq("id"), "left")
        .select(col("id"),
          least(greatest(when(col("deg").isNotNull,
            (col("stx") + lit(alpha) * coalesce(col("rx"), lit(0.0))) / col("deg"))
            .otherwise(col("x")), lit(0.0)), lit(1.0)).as("x"),
          least(greatest(when(col("deg").isNotNull,
            (col("sty") + lit(alpha) * coalesce(col("ry"), lit(0.0))) / col("deg"))
            .otherwise(col("y")), lit(0.0)), lit(1.0)).as("y"))
        .cutLineage
      prev.releaseState()
      r += 1
    }
    edges.releaseState()
    layout
  }

  /** MultilevelLayouter (viz/MultilevelLayouter.cpp:20-80): matching-coarsen until
    * ≤ `coarsestSize` nodes, FR at the coarsest level, prolong coordinates through the
    * matching hierarchy, FR-refine at each finer level. */
  def multilevelLayout(spark: SparkSession, g: LinkGraph, coarsestSize: Long = 20,
                       refineIters: Int = 10, seed: Long = 42L): DataFrame = {
    var levels = List.empty[(LinkGraph, DataFrame)] // (fine graph, fine->coarse map)
    var cur = g
    var guard = 0
    while (cur.n > coarsestSize && guard < 20) {
      val m = graft.algo.Matching.localMaxMatching(spark, cur, rounds = 10)
      val f2c = graft.algo.Coarsening.matchingPartition(spark, cur, m).cutLineage
      val coarseEdges = graft.algo.Coarsening.matchingCoarsening(spark, cur, m)
        .filter(col("a") =!= col("b"))
        .select(col("a").as("src"), col("b").as("dst"), col("w").cast("double").as("weight"))
      val nxt = LinkGraph.fromEdges(spark, coarseEdges,
        Some(f2c.select(col("label").as("id")).distinct()))
      if (nxt.n >= cur.n) guard = 20 // matching stalled (no edges) — stop coarsening
      else {
        levels = (cur, f2c) :: levels
        cur = nxt
      }
      guard += 1
    }
    var layout = fruchtermanReingold(spark, cur, maxIter = 30, seed = seed)
    levels.foreach { case (fine, f2c) =>
      val prolonged = f2c.select(col("id"), col("label").as("cid"))
        .join(layout.select(col("id").as("cid"), col("x"), col("y")), "cid")
        .select(col("id"),
          // split matched pairs by a deterministic jitter so FR can separate them
          least(greatest(col("x") + (unitRand(col("id"), 11L, seed) - lit(0.5)) * lit(0.02),
            lit(0.0)), lit(1.0)).as("x"),
          least(greatest(col("y") + (unitRand(col("id"), 13L, seed) - lit(0.5)) * lit(0.02),
            lit(0.0)), lit(1.0)).as("y"))
      layout = fruchtermanReingold(spark, fine, maxIter = refineIters, seed = seed,
        init = Some(prolonged))
    }
    layout
  }

  /** Full stress Σ_{u,v reached} (‖x_u-x_v‖ - d_uv)² over BFS distances from `sample`
    * sources (MaxentStress.cpp fullStressMeasure, KaDraw): the layout-quality metric
    * the specs assert on. */
  def stress(spark: SparkSession, g: LinkGraph, layout: DataFrame,
             sample: DataFrame, scale: Double): Double = {
    val (bfs, _) = graft.algo.Betweenness.msBfs(spark, g, sample)
    val v = bfs.filter(col("dist") > 0)
      .join(layout.select(col("id").as("s"), col("x").as("sx"), col("y").as("sy")), Seq("s"))
      .join(layout, Seq("id"))
      .select(pow(sqrt(pow(col("sx") - col("x"), 2) + pow(col("sy") - col("y"), 2)) * lit(scale)
        - col("dist").cast("double"), 2).as("sq"))
      .agg(sum("sq")).head().getDouble(0)
    bfs.releaseState()
    v
  }

  /** PostscriptWriter (viz/PostscriptWriter.cpp:13-210): EPS drawing of the layout —
    * edges as colored strokes, nodes as filled circles, 1020×1020 canvas. */
  def writePostscript(g: LinkGraph, layout: DataFrame, path: String): Unit = {
    val spark = g.edges.sparkSession
    import spark.implicits._
    val W = 1020.0
    val header = Seq(
      (0L, 0L, "%!PS-Adobe-1.0"),
      (0L, 1L, "%%Title: graft visualization"),
      (0L, 2L, f"%%%%BoundingBox: 0.000 0.000 $W%.1f $W%.1f"),
      (0L, 3L, "%%EndComments"),
      (0L, 4L, "%%EndProlog"),
      (0L, 5L, "gsave"),
      (0L, 6L, "/p {newpath} bind def"),
      (0L, 7L, "/m {moveto} bind def"),
      (0L, 8L, "/l {lineto} bind def"),
      (0L, 9L, "/c {setrgbcolor} bind def"),
      (0L, 10L, "/s {stroke} bind def"),
      (0L, 11L, "/a {arc} bind def"),
      (0L, 12L, "/f {fill} bind def"))
    val px = (c: Column) => round(c * (W - 20.0) + 10.0, 3).cast("string")
    val coords = layout.select(col("id"), col("x"), col("y"))
    val edgeRows = g.canonicalUndirected
      .join(coords.select(col("id").as("src"), col("x").as("sx"), col("y").as("sy")), "src")
      .join(coords.select(col("id").as("dst"), col("x").as("dx"), col("y").as("dy")), "dst")
      .select(lit(1L).as("k"), (col("src") * lit(1L << 32) + col("dst")).as("o"),
        concat(lit("p 0.0 0.0 0.0 c "), px(col("sx")), lit(" "), px(col("sy")),
          lit(" m "), px(col("dx")), lit(" "), px(col("dy")), lit(" l s")).as("line"))
    val nodeRows = coords.select(lit(2L).as("k"), col("id").as("o"),
      concat(lit("p 0.0 0.0 1.0 c "), px(col("x")), lit(" "), px(col("y")),
        lit(" 4.0 0.0 360.0 a f")).as("line"))
    header.toDF("k", "o", "line")
      .union(edgeRows).union(nodeRows)
      .union(Seq((3L, 0L, "grestore"), (3L, 1L, "%%EOF")).toDF("k", "o", "line"))
      .repartition(1).sortWithinPartitions(col("k"), col("o")).select("line")
      .write.mode("overwrite").text(path)
  }
}
