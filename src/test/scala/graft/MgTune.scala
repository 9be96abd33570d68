package graft

import org.apache.spark.sql.functions._
import graft.model.LinkGraph
import graft.algo.{Electrical, Multigrid}

/** Scratch tuning harness (not a suite): sweeps multigrid parameters. */
object MgTune {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    import spark.implicits._
    val scale = Multigrid.Scale

    val n = 128
    val g = LinkGraph.fromEdges(spark,
      (0 until n - 1).map(i => (i.toLong, i.toLong + 1, 1.0)).toDF("src", "dst", "weight"))
    val probe = Seq((0L, 1L, 1L), (n - 1L, 1L, -1L)).toDF("id", "q", "b")
    val exact = scale * (n - 1).toDouble

    for ((lv, cy, ci, on, od) <- Seq((7, 8, 32, 2L, 1L), (7, 8, 32, 3L, 2L),
        (6, 8, 32, 2L, 1L))) {
      val t0 = System.nanoTime()
      val x = Multigrid.solve(spark, g, probe, levels = lv, matchRounds = 3,
        nu1 = 2, nu2 = 2, coarseIters = ci, cycles = cy, overNum = on, overDen = od)
        .filter(col("id") === (n - 1L)).head().getLong(2)
      val err = math.abs(-x - exact) / exact
      println(f"PATH lv=$lv cy=$cy ci=$ci over=$on/$od err=$err%.4f x=$x t=${(System.nanoTime()-t0)/1e9}%.1f s")
    }

    val kg = LinkGraph.fromEdges(spark,
      TestSpark.directed(Fixtures.karateEdges.map(e => (e._1, e._2, 1.0))))
    val kprobe = Seq((0L, 1L, 1L), (33L, 1L, -1L)).toDF("id", "q", "b")
    val truth = Electrical.solveBatch(spark, kg, kprobe, iters = 400)
      .filter(col("id") === 33L).head().getLong(2)
    println(s"KARATE truth(jacobi400)=$truth jacobi80=" +
      Electrical.solveBatch(spark, kg, kprobe, iters = 80)
        .filter(col("id") === 33L).head().getLong(2))
    for ((lv, cy, on, od) <- Seq((3, 6, 3L, 2L), (3, 6, 1L, 1L), (3, 6, 2L, 1L))) {
      val x = Multigrid.solve(spark, kg, kprobe, levels = lv, matchRounds = 3,
        nu1 = 2, nu2 = 2, coarseIters = 32, cycles = cy, overNum = on, overDen = od)
        .filter(col("id") === 33L).head().getLong(2)
      println(f"KARATE lv=$lv cy=$cy over=$on/$od mg=$x rel=${math.abs(x - truth).toDouble / math.abs(truth)}%.4f")
    }
  }
}
