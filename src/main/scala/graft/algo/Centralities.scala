package graft.algo

import graft.DataFrameLineageOps

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.storage.StorageLevel

import graft.model.LinkGraph
import graft.iterate.IterativeJob

/** Non-PageRank centralities, same join-agg iteration shape as PageRank.
  *
  *   - Degree centrality (/root/reference/networkit/cpp/centrality/DegreeCentrality
  *     .cpp:15-36): out-degree (undirected: degree), optional /max normalization.
  *   - Eigenvector centrality (centrality/EigenvectorCentrality.cpp:19-75): power
  *     iteration over IN-edges, L2-normalized each step, converge when ‖x‖ stabilizes,
  *     sign fixed so score[minVertex] >= 0.
  *   - Katz (centrality/KatzCentrality.cpp:19-73): x'[u] = Σ_in α·w·(1+x[v]) + β,
  *     converge on ‖x‖ residual, final /‖x‖ normalization. Also a fixed-point integer
  *     variant (α = 1/4096, scaled by 10^6) for cross-engine oracle checking.
  *   - ranking(): scores sorted desc with rank — Centrality.h:58's `ranking()` as a
  *     window function.
  */
object Centralities {

  def degree(spark: SparkSession, g: LinkGraph, normalized: Boolean = false): DataFrame = {
    val deg = g.vertices
      .join(g.edges.groupBy(col("src").as("id")).agg(count(lit(1)).as("d")), Seq("id"), "left")
      .select(col("id"), coalesce(col("d"), lit(0L)).as("deg"))
    if (!normalized) deg.select(col("id"), col("deg").cast("double").as("score"))
    else {
      val mx = deg.agg(max("deg")).head().getLong(0).toDouble
      deg.select(col("id"), (col("deg") / mx).as("score"))
    }
  }

  /** scores -> (rank, id, score) sorted by score desc, ties by id (deterministic).
    * Distributed rank (Layout.zipWithRankBy) — no global window. */
  def ranking(scores: DataFrame): DataFrame =
    graft.layout.Layout
      .zipWithRankBy(scores, Seq(desc("score"), asc("id")), "rank0")
      .select((col("rank0") + 1L).as("rank"), col("id"), col("score"))
      .orderBy("rank")

  /** Power iteration over in-edges, L2-normalized each step. The reference converges
    * when the pre-normalization NORM stabilizes (EigenvectorCentrality.cpp:27-29,62-67);
    * we additionally require the normalized score VECTOR's residual
    * ‖x_t − x_{t−1}‖ <= tol — a stable norm alone cannot certify a rotating iterate.
    * The residual comes free from the same single aggregation via
    * ‖x/len − p‖² = Σx²/len² − 2Σxp/len + Σp² with len = sqrt(Σx²). */
  def eigenvector(spark: SparkSession, g: LinkGraph, tol: Double = 1e-9,
                  maxIter: Int = 500): DataFrame = {
    val inEdges = g.edges.select(col("src"), col("dst"), col("weight"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    inEdges.count()
    var x = g.vertices.select(col("id"), lit(1.0).as("score")).cutLineage
    var len = 0.0; var oldLen = Double.MaxValue
    var residual = Double.MaxValue
    var iter = 0
    while ((math.abs(len - oldLen) > tol || residual > tol) && iter < maxIter) {
      oldLen = len
      val contrib = inEdges.join(x.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id")).agg(sum(col("weight") * col("score")).as("s"))
      // Carry the previous score through the checkpoint so norm AND residual need one
      // scan, no second shuffle (same trick as PageRank's delta).
      val raw = x.select(col("id"), col("score").as("prev"))
        .join(contrib, Seq("id"), "left")
        .select(col("id"), coalesce(col("s"), lit(0.0)).as("score"), col("prev"))
        .cutLineageLazy
      val sums = raw.agg(
        sum(col("score") * col("score")).as("sxx"),
        sum(col("score") * col("prev")).as("sxp"),
        sum(col("prev") * col("prev")).as("spp")).head()
      len = math.sqrt(sums.getDouble(0))
      residual = math.sqrt(math.max(0.0,
        1.0 - 2.0 * sums.getDouble(1) / len + sums.getDouble(2)))
      val prev = x
      x = raw.select(col("id"), (col("score") / len).as("score")).cutLineage
      prev.releaseState()
      raw.releaseState()
      iter += 1
    }
    inEdges.unpersist()
    // Sign correction (reference: flip if score[0] < 0, using the smallest vertex id).
    val s0 = x.orderBy("id").select("score").head().getDouble(0)
    if (s0 < 0) x.select(col("id"), negate(col("score")).as("score")) else x
  }

  /** Fixed-point eigenvector twin for the oracle gate: power iteration with L-INFINITY
    * normalization — max is exact on integers, so every round is order-independent and
    * bit-identical across engines. x0 = scale; per round s[u] = Σ_in x[v] (exact int64),
    * x'[u] = (s[u] * scale) div max(s). Converges to the same eigenvector direction as
    * the L2-normalized float path (normalization choice only rescales). */
  def eigenvectorFixedPoint(spark: SparkSession, g: LinkGraph, rounds: Int,
                            scale: Long = 1000000L): DataFrame = {
    val e = g.edges.select("src", "dst").persist(StorageLevel.MEMORY_AND_DISK)
    e.count()
    var x = g.vertices.select(col("id"), lit(scale).as("ev")).cutLineage
    var i = 0
    while (i < rounds) {
      val contrib = e.join(x.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id")).agg(sum("ev").as("s"))
      // max over an empty contrib (edgeless graph) is NULL — the power iteration is
      // then the identity, so return the initial all-`scale` vector instead of a
      // division by null/zero.
      val mxRow = contrib.agg(max("s")).head()
      val mx = if (mxRow.isNullAt(0)) 0L else mxRow.getLong(0)
      if (mx == 0L) i = rounds
      else {
        val prev = x
        x = g.vertices.join(contrib, Seq("id"), "left")
          .select(col("id"), expr(s"coalesce(s, 0L) * $scale div $mx").as("ev"))
          .cutLineage
        prev.releaseState()
        i += 1
      }
    }
    e.unpersist()
    x
  }

  def katz(spark: SparkSession, g: LinkGraph, alpha: Double = 5e-4, beta: Double = 0.1,
           tol: Double = 1e-8, maxIter: Int = 500): DataFrame = {
    val (x, len, _) = katzCore(spark, g, alpha, beta, tol, maxIter, None)
    x.select(col("id"), (col("score") / len).as("score"))
  }

  /** Katz affine power iteration, warm-startable — the DynKatzCentrality path
    * (/root/reference/networkit/cpp/centrality/DynKatzCentrality.cpp: dynamic
    * centralities re-converge from the previous solution after an edge delta
    * instead of from scratch). The recurrence x' = αWᵀ(1+x) + β is a contraction,
    * so any start converges; a start at the previous fixed point converges in a
    * couple of iterations even after a local graph delta. `warmStart` takes the
    * UNNORMALIZED previous vector (katzCore's own output); vertices absent from it
    * (newly added) get the cold prior. Returns (unnormalized scores, l2 len,
    * iterations) — iterations is the spec's warm ≪ cold evidence. */
  def katzCore(spark: SparkSession, g: LinkGraph, alpha: Double, beta: Double,
               tol: Double, maxIter: Int,
               warmStart: Option[DataFrame]): (DataFrame, Double, Int) = {
    val inEdges = g.edges.persist(StorageLevel.MEMORY_AND_DISK)
    inEdges.count()
    var x = (warmStart match {
      case Some(w) => g.vertices
        .join(w.select(col("id"), col("score").as("ws")), Seq("id"), "left")
        .select(col("id"), coalesce(col("ws"), lit(1.0)).as("score"))
      case None => g.vertices.select(col("id"), lit(1.0).as("score"))
    }).cutLineage
    var len = 0.0; var oldLen = Double.MaxValue; var iter = 0
    while (math.abs(len - oldLen) > tol && iter < maxIter) {
      oldLen = len
      val contrib = inEdges.join(x.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id"))
        .agg(sum(col("weight") * lit(alpha) * (lit(1.0) + col("score"))).as("s"))
      val prev = x
      x = g.vertices.join(contrib, Seq("id"), "left")
        .select(col("id"), (coalesce(col("s"), lit(0.0)) + lit(beta)).as("score"))
        .cutLineageLazy
      len = math.sqrt(x.agg(sum(col("score") * col("score"))).head().getDouble(0))
      prev.releaseState()
      iter += 1
    }
    inEdges.unpersist()
    (x, len, iter)
  }

  /** Fixed-point Katz-style recurrence for the oracle gate: exact integer state,
    * x'[u] = (Σ over in-edges (scale + x[v])) div 4096, `rounds` synchronous rounds.
    * Order-independent ⇒ bit-identical across engines/partitionings. */
  def katzFixedPoint(spark: SparkSession, g: LinkGraph, rounds: Int,
                     scale: Long = 1000000L): DataFrame = {
    val e = g.edges.select("src", "dst").persist(StorageLevel.MEMORY_AND_DISK)
    e.count()
    var x = g.vertices.select(col("id"), lit(0L).as("katz")).cutLineage
    var i = 0
    while (i < rounds) {
      val contrib = e.join(x.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id"))
        .agg(sum(col("katz") + scale).as("s"))
      val prev = x
      x = g.vertices.join(contrib, Seq("id"), "left")
        .select(col("id"), expr("coalesce(s, 0L) div 4096").as("katz"))
        .cutLineage
      prev.releaseState()
      i += 1
    }
    e.unpersist()
    x
  }

  /** Sfigality (/root/reference/networkit/cpp/centrality/Sfigality.cpp:16-28): the
    * fraction of a node's neighbors that have strictly higher degree. Two degree joins
    * + one agg over the bidirected view — exact integer counts, one double division;
    * degree-0 vertices get 0. */
  def sfigality(spark: SparkSession, g: LinkGraph): DataFrame = {
    val deg = g.bidirected.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
    val sf = g.bidirected
      .join(deg.select(col("id").as("src"), col("deg").as("du")), "src")
      .join(deg.select(col("id").as("dst"), col("deg").as("dv")), "dst")
      .groupBy(col("src").as("id"))
      .agg(sum(when(col("du") < col("dv"), 1L).otherwise(0L)).as("higher"),
        count(lit(1)).as("deg"))
    g.vertices.join(sf, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("higher"), lit(0L)).as("higher"),
        coalesce(col("deg"), lit(0L)).as("deg"),
        when(coalesce(col("deg"), lit(0L)) === 0L, lit(0.0))
          .otherwise(col("higher").cast("double") / col("deg")).as("sfigality"))
  }

  /** LaplacianCentrality (/root/reference/networkit/cpp/centrality/LaplacianCentrality.cpp:16-43):
    * the drop in Laplacian energy when node u is removed,
    * lap(u) = wd(u)^2 + Σ_{v∈N(u)} w_uv * (w_uv + 2*wd(v)) over the weighted
    * undirected view (weightedDegree = sum of incident merged weights). Two degree
    * joins + one aggregation — exact integer arithmetic end to end (merged weights are
    * integral), so the cross-engine compare is bit-exact. Isolated vertices get 0. */
  def laplacianCentrality(spark: SparkSession, g: LinkGraph): DataFrame = {
    val bi = g.bidirected.select(col("src"), col("dst"), col("weight").cast("long").as("w"))
    val wdeg = bi.groupBy(col("src").as("id")).agg(sum("w").as("wd"))
    val nbrSum = bi
      .join(wdeg.select(col("id").as("dst"), col("wd").as("wdv")), "dst")
      .groupBy(col("src").as("id"))
      .agg(sum(col("w") * (col("w") + lit(2L) * col("wdv"))).as("nsum"))
    g.vertices
      .join(wdeg, Seq("id"), "left")
      .join(nbrSum, Seq("id"), "left")
      .select(col("id"),
        (coalesce(col("wd"), lit(0L)) * coalesce(col("wd"), lit(0L)) +
          coalesce(col("nsum"), lit(0L))).as("lap"))
  }

  /** LocalPartitionCoverage (/root/reference/networkit/cpp/centrality/LocalPartitionCoverage.cpp:11-29):
    * per node, the weighted fraction of its neighbors sharing its partition label.
    * One label join per endpoint + one aggregation; exact integer numerator/denominator
    * plus the one double ratio (0 for isolated nodes, as the reference). */
  def localPartitionCoverage(spark: SparkSession, g: LinkGraph, partition: DataFrame): DataFrame = {
    val bi = g.bidirected.select(col("src"), col("dst"), col("weight").cast("long").as("w"))
    val agg = bi
      .join(partition.select(col("id").as("src"), col("label").as("ls")), "src")
      .join(partition.select(col("id").as("dst"), col("label").as("ld")), "dst")
      .groupBy(col("src").as("id"))
      .agg(sum(when(col("ls") === col("ld"), col("w")).otherwise(0L)).as("same_w"),
        sum(col("w")).as("deg_w"))
    g.vertices.join(agg, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("same_w"), lit(0L)).as("same_w"),
        coalesce(col("deg_w"), lit(0L)).as("deg_w"),
        when(coalesce(col("same_w"), lit(0L)) === 0L, lit(0.0))
          .otherwise(col("same_w").cast("double") / col("deg_w")).as("coverage"))
  }

  /** Degree assortativity over the undirected graph (benchmark kernel set,
    * /root/reference/benchmark/nk.py — DegreeAssortativity): Pearson correlation of
    * endpoint degrees over the bidirected edge list. One row of exact integer sums +
    * the correlation as one double expression. */
  def assortativity(spark: SparkSession, g: LinkGraph): DataFrame = {
    val deg = g.bidirected.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
    val pairs = g.bidirected
      .join(deg.select(col("id").as("src"), col("deg").as("dx")), "src")
      .join(deg.select(col("id").as("dst"), col("deg").as("dy")), "dst")
    pairs.agg(
      count(lit(1)).as("ne"),
      sum("dx").as("sx"), sum("dy").as("sy"),
      sum(col("dx") * col("dx")).as("sxx"), sum(col("dy") * col("dy")).as("syy"),
      sum(col("dx") * col("dy")).as("sxy"))
      .select(col("ne"), col("sx"), col("sxy"), col("sxx"),
        ((col("ne") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (sqrt((col("ne") * col("sxx") - col("sx") * col("sx")).cast("double")) *
            sqrt((col("ne") * col("syy") - col("sy") * col("sy")).cast("double"))))
          .as("assortativity"))
  }
}
