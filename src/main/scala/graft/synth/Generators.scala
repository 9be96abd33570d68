package graft.synth

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.LinkGraph

/** Deterministic distributed graph generators — every edge is a pure function of
  * (seed, index), generated via `spark.range(m)` + column arithmetic: reproducible at
  * any parallelism, no RNG state, no shuffle until the final layout.
  *
  *   - RMAT (/root/reference/networkit/cpp/generators/RmatGenerator.cpp:15-90):
  *     recursive quadrant descent with probabilities (a,b,c,d)=(.57,.19,.19,.05) —
  *     the web-graph-shaped generator (power-law, hubs) used for scale benches.
  *   - Erdős–Rényi G(n,m) (generators/ErdosRenyiGenerator.cpp): m uniform pairs.
  */
object Generators {

  import GraphSpec.{lcg => lcgSql}

  /** Nonlinear 31-bit draw. The chained LCG alone is AFFINE in x (lcg(x) = A²x+c mod M),
    * so constant input strides (edge index, level) would produce tiny output cycles;
    * multiplying two independent affine draws makes the result quadratic in x —
    * breaking the stride structure while staying pure 64-bit-safe integer arithmetic. */
  private def draw(x: String): String =
    s"(((${lcgSql(x)} * ${lcgSql(s"($x) + 1000003")}) div 65536) % ${GraphSpec.M})"

  /** RMAT edge list: 2^scale nodes, edgeFactor * 2^scale edges. Quadrant descent per
    * bit level; draws come from the shared LCG on (seed, edge index, level). */
  def rmat(spark: SparkSession, scale: Int, edgeFactor: Int, seed: Long = 42L): LinkGraph = {
    require(scale >= 1 && scale <= 40)
    val n = 1L << scale
    val m = edgeFactor.toLong * n
    // Per level: r in [0,100); quadrants a=57 b=19 c=19 d=5 cumulative 57/76/95/100.
    // src bit set for quadrants c,d (r>=76); dst bit set for b,d (57<=r<76 or r>=95).
    val levels = (0 until scale).map { l =>
      val r = s"((${draw(s"id*64 + $l + $seed*999983")} div 1024) % 100)"
      (s"(CASE WHEN $r >= 76 THEN ${1L << l} ELSE 0 END)",
        s"(CASE WHEN ($r >= 57 AND $r < 76) OR $r >= 95 THEN ${1L << l} ELSE 0 END)")
    }
    val srcExpr = levels.map(_._1).mkString(" + ")
    val dstExpr = levels.map(_._2).mkString(" + ")
    val edges = spark.range(m)
      .select(expr(srcExpr).as("src"), expr(dstExpr).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .withColumn("weight", lit(1.0))
    LinkGraph.fromEdges(spark, edges, Some(spark.range(n).select(col("id"))))
  }

  /** G(n, m): m distinct uniform edges (self-loops and duplicates dropped). */
  def erdosRenyi(spark: SparkSession, n: Long, m: Long, seed: Long = 42L): LinkGraph = {
    val edges = spark.range(m)
      .select((expr(s"(${draw(s"id*2 + $seed*7")} div 128)") % n).as("src"),
        (expr(s"(${draw(s"id*2 + 1 + $seed*7")} div 128)") % n).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .withColumn("weight", lit(1.0))
    LinkGraph.fromEdges(spark, edges, Some(spark.range(n).select(col("id"))))
  }
}
