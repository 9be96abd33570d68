package graft.algo

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.model.LinkGraph

/** Per-edge scores + sparsification (/root/reference/networkit/cpp/edgescores/
  * TriangleEdgeScore.cpp:18-110 — ChibaNishizekiTriangleEdgeScore.h computes the same
  * per-edge triangle counts — JaccardSimilarityAttributizer, the scoring/EdgeScoring.h
  * surface, and sparsification/
  * GlobalThresholdFilter.cpp):
  *
  *   - triangle count per logical undirected edge, via the same degree-ordered
  *     orientation as [[Triangles]] (each triangle found once; hub-skew capped);
  *   - neighborhood Jaccard per edge = tri(e) / (deg(u) + deg(v) - tri(e)) — exact
  *     integers + one double division;
  *   - GlobalThresholdFilter: keep edges with score above/below a threshold — the
  *     backbone/sparsification primitive (`edges.filter(score >= t)`).
  */
object EdgeScores {

  /** (src, dst, tri) triangle count per canonical undirected edge; edges in no triangle
    * get 0. */
  def triangleEdgeScore(spark: SparkSession, g: LinkGraph): DataFrame = {
    val oc = Triangles.oriented(g).persist(StorageLevel.MEMORY_AND_DISK)
    oc.count()
    // Each triangle (a,b,c) — raw ids, (deg,id)-ordered a<b<c — hits its three oriented
    // edges (a,b), (b,c), (a,c); count per edge, left-join back so 0-triangle edges stay.
    val perEdge = Triangles.triangleCorners(oc).select(
        explode(array(
          struct(col("a").as("x"), col("b").as("y")),
          struct(col("b").as("x"), col("c").as("y")),
          struct(col("a").as("x"), col("c").as("y")))).as("e"))
      .groupBy(col("e.x").as("x"), col("e.y").as("y")).agg(count(lit(1)).as("tri"))
    oc.join(perEdge, oc("a") === perEdge("x") && oc("b") === perEdge("y"), "left")
      .select(least(col("a"), col("b")).as("src"),
        greatest(col("a"), col("b")).as("dst"),
        coalesce(col("tri"), lit(0L)).as("tri"))
  }

  /** (src, dst, tri, jaccard) neighborhood Jaccard per canonical undirected edge
    * (distance/JaccardDistance.h node-distance form and the Jaccard similarity
    * attributizer share this computation). */
  def jaccardEdgeScore(spark: SparkSession, g: LinkGraph): DataFrame = {
    val deg = g.bidirected.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
    triangleEdgeScore(spark, g)
      .join(deg.select(col("id").as("src"), col("deg").as("ds")), "src")
      .join(deg.select(col("id").as("dst"), col("deg").as("dd")), "dst")
      .select(col("src"), col("dst"), col("tri"),
        (col("tri").cast("double") / (col("ds") + col("dd") - col("tri"))).as("jaccard"))
  }

  /** LocalDegreeScore (sparsification/LocalDegreeScore.cpp:32-91): per node u, rank
    * its neighbors v by degree DESC with competition ranking (ties share the smallest
    * rank — exactly `rank()`); the directed exponent is 1 − ln(rank)/ln(deg u)
    * (1 when deg u <= 1); the edge score is the max over both directions. The window
    * partitions by node (never global), ordering only on the neighbor's degree — the
    * per-node partitions are the same skew surface as the degree aggregation itself.
    * Scores are rounded to 7 decimals so the libm-vs-DuckDB ln ulp can't flip the
    * cross-engine hash. Output (src, dst, score) per canonical undirected edge. */
  def localDegreeScore(spark: SparkSession, g: LinkGraph): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val deg = g.bidirected.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
    val ranked = g.bidirected.select("src", "dst")
      .join(deg.select(col("id").as("src"), col("deg").as("du")), "src")
      .join(deg.select(col("id").as("dst"), col("deg").as("dv")), "dst")
      .withColumn("rnk",
        rank().over(Window.partitionBy(col("src")).orderBy(col("dv").desc)))
      .select(col("src"), col("dst"),
        when(col("du") <= 1L, lit(1.0))
          .otherwise(lit(1.0) - log(col("rnk").cast("double")) / log(col("du").cast("double")))
          .as("e"))
    ranked.select(least(col("src"), col("dst")).as("src"),
        greatest(col("src"), col("dst")).as("dst"), col("e"))
      .groupBy("src", "dst").agg(round(max(col("e")), 7).as("score"))
  }

  /** GlobalThresholdFilter (sparsification/GlobalThresholdFilter.cpp): edges whose
    * score meets the threshold. `above=true` keeps score >= t, else score <= t. */
  def globalThresholdFilter(scored: DataFrame, scoreCol: String, t: Double,
                            above: Boolean = true): DataFrame =
    if (above) scored.filter(col(scoreCol) >= t) else scored.filter(col(scoreCol) <= t)

  /** SCAN structural similarity
    * (sparsification/SCANStructuralSimilarityScore.cpp:10-16):
    * score(u,v) = (tri(e) + 1) / sqrt((deg u + 1)·(deg v + 1)) per edge. Exact-integer
    * inputs, one sqrt + division (IEEE-identical across engines), rounded to 7
    * decimals like [[localDegreeScore]]. Output (src, dst, tri, score). */
  def scanScore(spark: SparkSession, g: LinkGraph): DataFrame = {
    val deg = g.bidirected.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
    triangleEdgeScore(spark, g)
      .join(deg.select(col("id").as("src"), col("deg").as("ds")), "src")
      .join(deg.select(col("id").as("dst"), col("deg").as("dd")), "dst")
      .select(col("src"), col("dst"), col("tri"),
        round((col("tri") + 1L).cast("double") /
          sqrt(((col("ds") + 1L) * (col("dd") + 1L)).cast("double")), 7).as("score"))
  }

  /** ChanceCorrectedTriangleScore
    * (sparsification/ChanceCorrectedTriangleScore.cpp:22-28): triangles relative to
    * the chance expectation — tri·(n−2)/((deg u −1)·(deg v −1)) when tri > 0;
    * 1 when either endpoint is degree-1; else 0. (tri > 0 implies both degrees >= 2,
    * so the division is safe.) Output (src, dst, tri, score). */
  def chanceCorrectedTriangleScore(spark: SparkSession, g: LinkGraph): DataFrame = {
    val n = g.n
    val deg = g.bidirected.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
    triangleEdgeScore(spark, g)
      .join(deg.select(col("id").as("src"), col("deg").as("ds")), "src")
      .join(deg.select(col("id").as("dst"), col("deg").as("dd")), "dst")
      .select(col("src"), col("dst"), col("tri"),
        when(col("tri") > 0L,
          round((col("tri") * (n - 2L)).cast("double") /
            ((col("ds") - 1L) * (col("dd") - 1L)).cast("double"), 7))
          .when(col("ds") === 1L || col("dd") === 1L, lit(1.0))
          .otherwise(lit(0.0)).as("score"))
  }

  /** LocalSimilarityScore (sparsification/LocalSimilarityScore.cpp:29-67): per node,
    * neighbors are ranked by neighborhood-Jaccard similarity DESC with neighbor-id ASC
    * tie-break — the reference's exact AttributizedEdge total order
    * (LocalSimilarityScore.h:26-30), so `row_number` reproduces it bit-for-bit (the
    * sim doubles are the same exact-integer divisions in both engines). The directed
    * exponent is 1 − ln(rank)/ln(deg) (1 when deg <= 1); the edge score is the max
    * over both directions, rounded to 7 decimals. The window partitions by node —
    * never global. Output (src, dst, score) per canonical undirected edge. */
  def localSimilarityScore(spark: SparkSession, g: LinkGraph): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val deg = g.bidirected.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
    val sims = jaccardEdgeScore(spark, g).select(col("src"), col("dst"), col("jaccard"))
    val directed = sims.select(col("src").as("ego"), col("dst").as("alter"), col("jaccard"))
      .union(sims.select(col("dst").as("ego"), col("src").as("alter"), col("jaccard")))
    directed
      .join(deg.select(col("id").as("ego"), col("deg").as("d")), "ego")
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("ego")).orderBy(col("jaccard").desc, col("alter").asc)))
      .select(col("ego"), col("alter"),
        when(col("d") <= 1L, lit(1.0))
          .otherwise(lit(1.0) - log(col("rnk").cast("double")) / log(col("d").cast("double")))
          .as("e"))
      .select(least(col("ego"), col("alter")).as("src"),
        greatest(col("ego"), col("alter")).as("dst"), col("e"))
      .groupBy("src", "dst").agg(round(max(col("e")), 7).as("score"))
  }

  /** Sparsifiers::getSparsifiedGraphOfSize (sparsification/Sparsifiers.cpp:48-70 +
    * networkit/sparsification.py:107-213): keep exactly ceil(ratio·m) edges with the
    * highest score. The python reference binary-searches a threshold; this engine
    * ranks directly on the deterministic total order (score DESC, src ASC, dst ASC)
    * via [[graft.layout.Layout.zipWithRankBy]] — distributed range-partition rank, no
    * global single-partition window, no driver-side search loop. */
  def sparsifiedGraphOfSize(scored: DataFrame, scoreCol: String, ratio: Double): DataFrame = {
    val m = scored.count()
    val target = math.ceil(ratio * m).toLong
    graft.layout.Layout.zipWithRankBy(scored,
        Seq(col(scoreCol).desc, col("src").asc, col("dst").asc), "__rank")
      .filter(col("__rank") < target).drop("__rank")
  }

  /** RandomEdgeScore (/root/reference/networkit/cpp/sparsification/RandomEdgeScore
    * .cpp:14-30): a uniform pseudo-random score per undirected edge — the null-model
    * baseline the sparsification family is compared against. The reference draws from
    * a per-run RNG; for engine/partitioning independence we draw from the shared
    * deterministic nonlinear LCG on (src, dst, seed) (synth/Generators semantics):
    * exact int64 arithmetic + ONE double division, so the DuckDB twin is bit-identical.
    * Pure per-edge expression — no shuffle beyond the canonical-undirected view. */
  def randomEdgeScore(spark: SparkSession, g: LinkGraph, seed: Long = 42L): DataFrame = {
    import graft.synth.GraphSpec.{lcg, M}
    val x = s"(src * 1000003 + dst + $seed)"
    val draw = s"(((${lcg(x)} * ${lcg(s"($x) + 1000003")}) div 65536) % $M)"
    g.canonicalUndirected.select(col("src"), col("dst"),
      (expr(draw).cast("double") / lit(M.toDouble)).as("score"))
  }

  /** RandomNodeEdgeScore (sparsification/RandomNodeEdgeScore.cpp:16-66): the
    * reference removes edges one at a time — with probability rneRatio via node-edge
    * sampling (uniform node, then uniform incident edge, so P(e) ∝ 1/d_u + 1/d_v),
    * else uniformly at random — and scores each edge by removalPosition / m. The
    * trajectory is a sequential RNG walk; the distributed twin draws ONE deterministic
    * priority per edge whose bias follows the same selection mixture and linearizes
    * the priority order (position / m), preserving the operator's null-baseline role
    * while being reproducible and partitioning-independent. All-integer arithmetic
    * (degrees clamped at 2^15 in the weight so the mixture stays exact in int64 —
    * the bias saturates for mega-hubs), so the DuckDB twin matches bit-for-bit.
    * Output (src, dst, score). */
  def randomNodeEdgeScore(spark: SparkSession, g: LinkGraph,
                          rneRatio: Double = 0.8, seed: Long = 42L): DataFrame = {
    import graft.synth.GraphSpec.{lcg, M}
    val num = math.round(rneRatio * 100).toInt // rational mixture num/100
    val m = g.canonicalUndirected.count()
    val x = s"(src * 1000003 + dst + $seed)"
    val draw = s"(((${lcg(x)} * ${lcg(s"($x) + 1000003")}) div 65536) % $M)"
    val deg = g.bidirected.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
    val keyed = g.canonicalUndirected
      .join(deg.select(col("id").as("src"), col("deg").as("du")), "src")
      .join(deg.select(col("id").as("dst"), col("deg").as("dv")), "dst")
      .select(col("src"), col("dst"),
        least(col("du"), lit(32768L)).as("cu"), least(col("dv"), lit(32768L)).as("cv"))
      // weight ∝ (1-r)·du·dv + r·(du+dv)·2^14  (node-edge term (1/du+1/dv) multiplied
      // through by du·dv; 2^14 keeps the two terms comparable at typical degrees)
      .select(col("src"), col("dst"),
        (lit(100L - num) * col("cu") * col("cv") +
          lit(num.toLong) * (col("cu") + col("cv")) * lit(16384L)).as("w"))
      .select(col("src"), col("dst"),
        expr(s"($draw * 1048576) div w").as("key")) // smaller key = removed earlier
    graft.layout.Layout.zipWithRankBy(keyed,
        Seq(col("key").asc, col("src").asc, col("dst").asc), "__pos")
      .select(col("src"), col("dst"),
        (col("__pos").cast("double") / lit(m.toDouble)).as("score"))
  }

  /** Directed (ego, alter, att) view of a canonical per-edge attribute table. */
  private def directedAttr(attr: DataFrame): DataFrame =
    attr.select(col("src").as("ego"), col("dst").as("alter"), col("att"))
      .union(attr.select(col("dst").as("ego"), col("src").as("alter"), col("att")))

  /** SimmelianOverlapScore (sparsification/SimmelianOverlapScore.cpp:16-31 +
    * SimmelianScore.cpp:16-75): rank each node's neighbors by per-edge triangle count
    * DESC with competition ranking (reference: rank 0 best, ties share, gaps after —
    * exactly SQL `rank()` minus 1); the score of edge (u,v) is the OVERLAP = number of
    * common neighbors w (w != u,v) ranked <= maxRank by BOTH endpoints. The reference's
    * incremental matched-set sweep reduces to exactly this count (w is matched iff both
    * sides emit it within the rank budget). Join shape: edges x top-(maxRank) lists —
    * fan-out per edge bounded by the rank budget (+ties), never by degree.
    * Output (src, dst, overlap). */
  def simmelianOverlapScore(spark: SparkSession, g: LinkGraph, maxRank: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tri = triangleEdgeScore(spark, g).withColumnRenamed("tri", "att")
    val top = directedAttr(tri)
      .withColumn("rnk", rank().over(Window.partitionBy(col("ego")).orderBy(col("att").desc)))
      .filter(col("rnk") <= maxRank + 1) // reference ranks 0..maxRank inclusive
      .select(col("ego"), col("alter"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val und = tri.select("src", "dst")
    val overlaps = und
      .join(top.select(col("ego").as("src"), col("alter").as("w")), "src")
      .filter(col("w") =!= col("dst"))
      .join(top.select(col("ego").as("dst"), col("alter").as("w")), Seq("dst", "w"), "left_semi")
      .groupBy("src", "dst").agg(count(lit(1)).as("overlap"))
    und.join(overlaps, Seq("src", "dst"), "left")
      .select(col("src"), col("dst"), coalesce(col("overlap"), lit(0L)).as("overlap"))
  }

  /** MultiscaleScore (sparsification/MultiscaleScore.cpp:14-63, the Serrano et al.
    * multiscale backbone): per endpoint u with degree k, the edge's attribute is
    * locally normalized (p = att / sum of u's attributes) and scored against the
    * uniform null model as 1 - (1-p)^(k-1); the edge keeps the max over both
    * endpoints. `attr` = (src, dst, att) per canonical undirected edge, att > 0.
    * Pure column math over one bidirected aggregation; pow is libm so the score is
    * rounded to 7 decimals (the repo-wide cross-engine ulp guard). */
  def multiscaleScore(spark: SparkSession, g: LinkGraph, attr: DataFrame): DataFrame = {
    val d = directedAttr(attr)
    val sums = d.groupBy("ego").agg(sum("att").as("s"), count(lit(1)).as("k"))
    d.join(sums, "ego")
      .select(col("ego"), col("alter"),
        when(col("k") <= 1L, lit(0.0))
          .otherwise(lit(1.0) - pow(lit(1.0) - col("att").cast("double") / col("s"),
            (col("k") - 1L).cast("double"))).as("e"))
      .select(least(col("ego"), col("alter")).as("src"),
        greatest(col("ego"), col("alter")).as("dst"), col("e"))
      .groupBy("src", "dst").agg(round(max(col("e")), 7).as("score"))
  }

  /** GeometricMeanScore (edgescores/GeometricMeanScore.cpp:17-40): att(e) /
    * sqrt(S_u * S_v) where S_u = sum of u's incident attributes; 0 where att <= 0.
    * Output (src, dst, score), rounded to 7 decimals. */
  def geometricMeanScore(spark: SparkSession, g: LinkGraph, attr: DataFrame): DataFrame = {
    val sums = directedAttr(attr).groupBy(col("ego").as("id")).agg(sum("att").as("s"))
    attr
      .join(sums.select(col("id").as("src"), col("s").as("su")), "src")
      .join(sums.select(col("id").as("dst"), col("s").as("sv")), "dst")
      .select(col("src"), col("dst"),
        when(col("att") > 0,
          round(col("att").cast("double") /
            sqrt(col("su").cast("double") * col("sv").cast("double")), 7))
          .otherwise(lit(0.0)).as("score"))
  }

  /** EdgeScoreLinearizer (edgescores/EdgeScoreLinearizer.cpp:139-173): replace scores
    * by their normalized sort position pos/(m-1) (0.5 if m == 1). The reference
    * tie-breaks at random; this engine uses the deterministic (src, dst) order so the
    * result is reproducible and oracle-exact. Distributed rank via
    * [[graft.layout.Layout.zipWithRankBy]] — no global window. */
  def linearizeScore(scored: DataFrame, scoreCol: String, inverse: Boolean = false): DataFrame = {
    val m = scored.count()
    if (m == 1) scored.select(col("src"), col("dst"), lit(0.5).as("score"))
    else {
      val order =
        if (inverse) Seq(col(scoreCol).desc, col("src").desc, col("dst").desc)
        else Seq(col(scoreCol).asc, col("src").asc, col("dst").asc)
      graft.layout.Layout.zipWithRankBy(scored, order, "__pos")
        .select(col("src"), col("dst"),
          (col("__pos").cast("double") / lit((m - 1).toDouble)).as("score"))
    }
  }

  /** PrefixJaccardScore (edgescores/PrefixJaccardScore.cpp:19-155): neighbors ranked
    * per node by attribute DESC (competition ranks, 0-based); the score of edge (u,v)
    * is the MAX over rank prefixes r of the Jaccard between the two rank-<=r neighbor
    * sets (endpoints excluded): J_r = C_r / (Eu_r + Ev_r - C_r). The max can only
    * increase when a common neighbor completes (at r = max of its two ranks), and the
    * reference sweeps every integer rank, so evaluating at event ranks reproduces its
    * maximum exactly. Realized as: per-(edge, neighbor) delta events -> one cumulative
    * window PER EDGE (partitions are edge-local, size deg(u)+deg(v) — the same work the
    * reference does per edge, sharded by Spark instead of looped). Exact integer
    * counts, one double division. Output (src, dst, score). */
  def prefixJaccardScore(spark: SparkSession, g: LinkGraph, attr: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ranked = directedAttr(attr)
      .withColumn("rnk",
        rank().over(Window.partitionBy(col("ego")).orderBy(col("att").desc)) - 1L)
      .select(col("ego"), col("alter"), col("rnk"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val und = attr.select("src", "dst")
    // (edge, x, ru, rv): x a neighbor of u and/or v (endpoints excluded).
    val uSide = und.join(ranked.select(col("ego").as("src"), col("alter").as("x"),
        col("rnk").as("ru")), "src").filter(col("x") =!= col("dst"))
    val vSide = und.join(ranked.select(col("ego").as("dst"), col("alter").as("x"),
        col("rnk").as("rv")), "dst").filter(col("x") =!= col("src"))
    val matched = uSide.join(vSide, Seq("src", "dst", "x"), "full")
    // Delta events at each rank: side emissions at ru/rv, common completion at max.
    val events = matched.select(col("src"), col("dst"),
        explode(filter(array(
          struct(col("ru").as("r"), lit(1L).as("du"), lit(0L).as("dv"), lit(0L).as("dc")),
          struct(col("rv").as("r"), lit(0L).as("du"), lit(1L).as("dv"), lit(0L).as("dc")),
          struct(when(col("ru").isNotNull && col("rv").isNotNull,
              greatest(col("ru"), col("rv"))).as("r"),
            lit(0L).as("du"), lit(0L).as("dv"), lit(1L).as("dc"))),
          e => e.getField("r").isNotNull)).as("e"))
      .groupBy(col("src"), col("dst"), col("e.r").as("r"))
      .agg(sum("e.du").as("du"), sum("e.dv").as("dv"), sum("e.dc").as("dc"))
    val w = Window.partitionBy("src", "dst").orderBy("r")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val best = events
      .select(col("src"), col("dst"),
        sum("du").over(w).as("eu"), sum("dv").over(w).as("ev"), sum("dc").over(w).as("c"))
      .select(col("src"), col("dst"),
        (col("c").cast("double") / (col("eu") + col("ev") - col("c"))).as("j"))
      .groupBy("src", "dst").agg(max("j").as("score"))
    und.join(best, Seq("src", "dst"), "left")
      .select(col("src"), col("dst"), coalesce(col("score"), lit(0.0)).as("score"))
  }

  /** AdamicAdarDistance (/root/reference/networkit/cpp/distance/AdamicAdarDistance.cpp:17-58):
    * per existing undirected edge (u,v), aad = Σ_{w ∈ N(u)∩N(v)} 1/ln(deg(w)); the
    * node distance is 1/aad. The reference iterates triangles; here each triangle from
    * the degree-oriented corner join contributes one term to each of its three edges.
    * Terms are pre-scaled to integers (round(1e9/ln(deg))) so the per-edge sum is
    * order-independent and the cross-engine compare exact (a raw double sum would hash
    * differently per partitioning); every corner is in a triangle so deg >= 2 and
    * ln(deg) > 0. Edges in no triangle: aad=0, dist = -1 sentinel (reference: +inf).
    * Output (src, dst, aad_scaled, dist) per canonical undirected edge. */
  /** ChibaNishizekiQuadrangleEdgeScore (edgescores/ChibaNishizekiQuadrangleEdgeScore
    * .cpp:22-100): per-edge 4-cycle count. The reference's marker sweep counts, for
    * edge (u,v), the pairs (x, w) with x ~ u, w ~ v, x ~ w minus the degenerate walks
    * — algebraically: quad(u,v) = walks₃(u,v) − deg(u) − deg(v) + 1 (the x = v walks
    * contribute deg(v), the w = u walks deg(u), and (x,w) = (v,u) is in both).
    * Verified against the reference's own GTest fixtures (4-cycle: all 1s; the
    * 7-node graph: edges (0,1)/(0,3) = 2).
    *
    * Spark shape: walks₂ are aggregated FIRST (one wedge groupBy — map-side combine
    * absorbs the fan-in), then one edge join + re-aggregation; per-edge quadrangle
    * work is inherently Σ deg² wedges — the same envelope as the reference's bucket
    * loop. `maxWedgeDeg` (default unbounded) drops wedge centers above a degree cap:
    * the standard hub guard when a web-scale corpus has 10⁵⁺-degree hubs whose
    * quadrangle counts are dominated by boilerplate anyway (capped mode is an
    * approximation — the degenerate-walk subtraction still uses full degrees).
    * Output (src, dst, quad) per canonical undirected edge. */
  def quadrangleEdgeScore(spark: SparkSession, g: LinkGraph,
                          maxWedgeDeg: Long = Long.MaxValue): DataFrame = {
    val bi = g.bidirected.select("src", "dst").persist(StorageLevel.MEMORY_AND_DISK)
    val deg = bi.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
    val wedgeSide =
      if (maxWedgeDeg == Long.MaxValue) bi
      else bi.join(deg.filter(col("deg") <= maxWedgeDeg)
        .select(col("id").as("src")), "src")
    // walks₂(a, b) = |{x : x~a, x~b}| for ALL ordered pairs, a = b included (the
    // degenerate subtraction needs the full walk count).
    val w2 = wedgeSide.select(col("src").as("x"), col("dst").as("a"))
      .join(wedgeSide.select(col("src").as("x"), col("dst").as("b")), "x")
      .groupBy("a", "b").agg(count(lit(1)).as("w2"))
    // walks₃(u, v) = Σ_{w~v} walks₂(u, w), evaluated on the edge set ONLY: the
    // candidate rows are semi-joined against the canonical edges BEFORE the
    // aggregation — without it this would materialize every distance-≤3 pair.
    // One orientation (a < v) suffices: walks₃ is symmetric.
    val w3 = w2.join(bi.select(col("src").as("b"), col("dst").as("v")), "b")
      .filter(col("a") < col("v"))
      .join(g.canonicalUndirected.select(col("src").as("a"), col("dst").as("v")),
        Seq("a", "v"), "left_semi")
      .groupBy(col("a").as("u"), col("v")).agg(sum("w2").as("w3"))
    val out = g.canonicalUndirected.select("src", "dst")
      .join(w3.select(col("u").as("src"), col("v").as("dst"), col("w3")), Seq("src", "dst"), "left")
      .join(deg.select(col("id").as("src"), col("deg").as("du")), "src")
      .join(deg.select(col("id").as("dst"), col("deg").as("dv")), "dst")
      .select(col("src"), col("dst"),
        (coalesce(col("w3"), lit(0L)) - col("du") - col("dv") + 1L).as("quad"))
    out
  }

  /** EdgeScoreNormalizer (edgescores/EdgeScoreNormalizer.cpp:10-38): min-max map of a
    * score column onto [lower, upper] (invert flips the direction) — two aggregates +
    * one projection, no per-edge state. Rounded to 7 decimals for cross-engine
    * parity. Input/output (src, dst, <scoreCol>) → (src, dst, normalized). */
  def normalizeScore(scored: DataFrame, scoreCol: String, invert: Boolean = false,
                     lower: Double = 0.0, upper: Double = 1.0): DataFrame = {
    val row = scored.agg(min(col(scoreCol)).cast("double"),
      max(col(scoreCol)).cast("double")).head()
    val (mn, mx) = (row.getDouble(0), row.getDouble(1))
    val factor0 = (upper - lower) / (mx - mn)
    val (factor, offset) =
      if (invert) (-factor0, upper + mn * factor0)
      else (factor0, lower - mn * factor0)
    scored.select(col("src"), col("dst"),
      round(lit(factor) * col(scoreCol).cast("double") + lit(offset), 7)
        .as("normalized"))
  }

  /** EdgeScoreBlender (edgescores/EdgeScoreBlender.cpp:15-27): per edge, pick
    * `score1` where `selection` else `score0` — inputs are (src, dst, score) frames
    * plus a boolean-column frame, output (src, dst, score). */
  def blendScores(score0: DataFrame, score1: DataFrame, selection: DataFrame): DataFrame =
    score0.withColumnRenamed(score0.columns(2), "s0")
      .join(score1.select(col("src"), col("dst"),
        col(score1.columns(2)).as("s1")), Seq("src", "dst"))
      .join(selection.select(col("src"), col("dst"),
        col(selection.columns(2)).as("sel")), Seq("src", "dst"))
      .select(col("src"), col("dst"),
        when(col("sel"), col("s1")).otherwise(col("s0")).as("score"))

  /** EdgeScoreAsWeight (edgescores/EdgeScoreAsWeight.cpp:16-36): re-weight the graph
    * with offset + factor·score (or score², `squared`) — returns a new LinkGraph over
    * the same vertices. */
  def scoreAsWeight(spark: SparkSession, g: LinkGraph, scored: DataFrame,
                    scoreCol: String, squared: Boolean = false,
                    offset: Double = 1.0, factor: Double = 1.0): LinkGraph = {
    val s = col(scoreCol).cast("double")
    val w = if (squared) lit(offset) + lit(factor) * s * s
            else lit(offset) + lit(factor) * s
    LinkGraph.fromEdges(spark,
      scored.select(col("src"), col("dst"), w.as("weight")), Some(g.vertices))
  }

  def adamicAdarDistance(spark: SparkSession, g: LinkGraph): DataFrame = {
    val scale = 1000000000L
    // Triangle corners always have deg >= 2; degree-1 nodes would hit ln(1)=0.
    val deg = g.undirectedDegrees.filter(col("deg") >= 2)
    val term = round(lit(scale.toDouble) / log(col("deg").cast("double"))).cast("long")
    val tri = Triangles.triangleCorners(Triangles.oriented(g))
    // Each triangle (a,b,c): edge(a,b) += t(c); edge(a,c) += t(b); edge(b,c) += t(a).
    val contrib = tri
      .join(deg.select(col("id").as("a"), term.as("ta")), "a")
      .join(deg.select(col("id").as("b"), term.as("tb")), "b")
      .join(deg.select(col("id").as("c"), term.as("tc")), "c")
      .select(explode(array(
        struct(least(col("a"), col("b")).as("src"), greatest(col("a"), col("b")).as("dst"),
          col("tc").as("t")),
        struct(least(col("a"), col("c")).as("src"), greatest(col("a"), col("c")).as("dst"),
          col("tb").as("t")),
        struct(least(col("b"), col("c")).as("src"), greatest(col("b"), col("c")).as("dst"),
          col("ta").as("t")))).as("e"))
      .groupBy(col("e.src").as("src"), col("e.dst").as("dst"))
      .agg(sum("e.t").as("aad_scaled"))
    g.canonicalUndirected.select("src", "dst")
      .join(contrib, Seq("src", "dst"), "left")
      .select(col("src"), col("dst"),
        coalesce(col("aad_scaled"), lit(0L)).as("aad_scaled"),
        when(coalesce(col("aad_scaled"), lit(0L)) === 0L, lit(-1.0))
          .otherwise(lit(scale.toDouble) / col("aad_scaled").cast("double")).as("dist"))
  }

  /** LocalFilterScore (/root/reference/networkit/cpp/sparsification/
    * LocalFilterScore.h:20-110): generic local-ranking filter over ANY per-edge
    * attribute. Per endpoint, incident edges rank by attribute DESC with
    * equal-attribute groups sharing one rank (the reference's numSame accumulation
    * == SQL RANK()); the directed exponent is 1 − ln(rank)/ln(d) (logarithmic,
    * keeps top d^e) or 1 − (rank−1)/(d−1) (linear, keeps top 1+e(d−1)); the edge
    * score is the max over both endpoints. `scored` = (src, dst, <attrCol>) per
    * canonical undirected edge; integer attributes make the rank — and hence the
    * rounded score — bit-reproducible in the DuckDB twin. */
  def localFilterScore(spark: SparkSession, g: LinkGraph, scored: DataFrame,
                       attrCol: String, logarithmic: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val deg = g.bidirected.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
    val directed = scored.select(col("src").as("ego"), col("dst").as("alter"),
        col(attrCol).as("attr"))
      .union(scored.select(col("dst").as("ego"), col("src").as("alter"), col(attrCol)))
    val e = directed
      .join(deg.select(col("id").as("ego"), col("deg").as("d")), "ego")
      .withColumn("rnk",
        rank().over(Window.partitionBy(col("ego")).orderBy(col("attr").desc)))
      .select(col("ego"), col("alter"),
        when(col("d") <= 1L, lit(1.0))
          .otherwise(
            if (logarithmic)
              lit(1.0) - log(col("rnk").cast("double")) / log(col("d").cast("double"))
            else
              lit(1.0) - (col("rnk") - 1L).cast("double") / (col("d") - 1L).cast("double"))
          .as("e"))
    e.select(least(col("ego"), col("alter")).as("src"),
        greatest(col("ego"), col("alter")).as("dst"), col("e"))
      .groupBy("src", "dst").agg(round(max(col("e")), 7).as("score"))
  }
}
