package graft.algo

import graft.DataFrameLineageOps

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.model.LinkGraph
import graft.synth.GraphSpec

/** ForestFireScore (/root/reference/networkit/cpp/sparsification/ForestFireScore
  * .cpp:18-90): repeatedly start "fires" at random nodes; a burning node burns a
  * geometric(pf) number of its unvisited neighbors (each burn = one edge), the fire
  * spreads to burnt nodes, and each edge's score is its burn count normalized by the
  * maximum. Fires stop when the total number of burnt edges reaches
  * targetBurntRatio * m.
  *
  * Re-architecture for the cluster: the reference runs fires one at a time off a
  * global RNG; here a whole WAVE of fires runs simultaneously as one multi-source
  * frontier process (fire id = seed node), with every random draw a pure LCG function
  * of (fire, node, round, seed) — deterministic under any partitioning and any
  * parallelism. Per round the moving state is frontier-sized; the per-(fire,node)
  * geometric burn count k = floor(ln u / ln pf) reproduces the reference's
  * P(burn >= j) = pf^j marginal, and the burned neighbors are the k smallest by an
  * independent per-edge draw (the reference picks uniformly without replacement).
  */
object ForestFire {

  private def lcgCol(x: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import GraphSpec.{A, C, M}
    (lit(A) * ((lit(A) * pmod(x, lit(M)) + C) % M) + C) % M
  }
  private def drawU(x: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import GraphSpec.M
    (lcgCol(lcgCol(x)).cast("double") + 0.5) / lit(M.toDouble) // (0,1), never 0
  }

  /** (src, dst, burnt, score) per canonical undirected edge; score = burnt / max burnt
    * (0 everywhere if nothing burnt). `firesPerWave` seeds ~that many simultaneous
    * fires per wave; waves repeat until targetBurntRatio*m edges are burnt (counted
    * with multiplicity, as the reference does). */
  def score(spark: SparkSession, g: LinkGraph, pf: Double = 0.6,
            targetBurntRatio: Double = 1.0, firesPerWave: Int = 256,
            seed: Long = 42L, maxRounds: Int = 64, maxWaves: Int = 16): DataFrame = {
    require(pf > 0.0 && pf < 1.0, "pf must be in (0,1)")
    val bi = g.bidirected.select("src", "dst").persist(StorageLevel.MEMORY_AND_DISK)
    val n = math.max(g.n, 1L)
    val target = math.ceil(targetBurntRatio * g.m).toLong
    // burn accumulator per canonical edge
    var burnt = g.canonicalUndirected.select(col("src"), col("dst"), lit(0L).as("burnt"))
      .cutLineage
    var totalBurnt = 0L
    var wave = 0
    while (totalBurnt < target && wave < maxWaves) {
      // ~firesPerWave deterministic seed nodes; fire id = seed node id.
      val frac = math.min(firesPerWave.toDouble / n, 1.0)
      var frontier = g.vertices
        .filter(drawU(col("id") * 31L + lit(seed + wave * 1000003L)) < frac)
        .select(col("id").as("f"), col("id").as("v")).cutLineage
      var visited = frontier.select(col("f"), col("v").as("x")).cutLineage
      var round = 0
      var active = frontier.count()
      while (active > 0 && round < maxRounds && totalBurnt < target) {
        val rseed = seed + wave * 1000003L + round * 10007L
        // Unvisited neighbors of each burning node, per fire.
        val nbrs = frontier.join(bi, col("v") === col("src"))
          .select(col("f"), col("v"), col("dst").as("x"))
          .join(visited, Seq("f", "x"), "left_anti")
        // Geometric burn budget per (fire, node): k = floor(ln u / ln pf).
        val k = floor(log(drawU(col("f") * 1000003L + col("v") * 31L + lit(rseed))) /
          math.log(pf))
        val burned = nbrs
          .withColumn("ord", drawU(col("f") * 99991L + col("v") * 31L + col("x") * 7L + lit(rseed)))
          .withColumn("rn", row_number().over(
            Window.partitionBy("f", "v").orderBy(col("ord"), col("x"))))
          .filter(col("rn") <= k)
          .select(col("f"), col("v"), col("x"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        val edgesBurnt = burned.count()
        if (edgesBurnt > 0) {
          val delta = burned
            .groupBy(least(col("v"), col("x")).as("src"),
              greatest(col("v"), col("x")).as("dst"))
            .agg(count(lit(1)).as("d"))
          val prevB = burnt
          burnt = burnt.join(delta, Seq("src", "dst"), "left")
            .select(col("src"), col("dst"),
              (col("burnt") + coalesce(col("d"), lit(0L))).as("burnt")).cutLineage
          prevB.releaseState()
          // A node burnt by several fires spreads in each; dedup within fire only.
          val newNodes = burned.select(col("f"), col("x")).distinct()
          val prevV = visited
          visited = visited.union(newNodes).cutLineage
          prevV.releaseState()
          val prevF = frontier
          frontier = newNodes.select(col("f"), col("x").as("v")).cutLineage
          prevF.releaseState()
          totalBurnt += edgesBurnt
          active = frontier.count()
        } else active = 0
        burned.unpersist()
        round += 1
      }
      wave += 1
    }
    bi.unpersist()
    val mx = burnt.agg(max("burnt")).head().getLong(0)
    burnt.select(col("src"), col("dst"), col("burnt"),
      if (mx > 0) (col("burnt").cast("double") / mx.toDouble).as("score")
      else lit(0.0).as("score"))
  }
}
