package graft.algo

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.model.LinkGraph

/** Per-edge scores + sparsification (/root/reference/networkit/cpp/edgescores/
  * TriangleEdgeScore.cpp:18-110, JaccardSimilarityAttributizer, and sparsification/
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

  /** (src, dst, tri, jaccard) neighborhood Jaccard per canonical undirected edge. */
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
}
