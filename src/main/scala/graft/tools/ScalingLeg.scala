package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.algo.PageRank
import graft.model.LinkGraph

/** One scaling-measurement leg in a FRESH JVM: `ScalingLeg <edgesDir> <cores> <iters>`
  * loads the pre-built scale graph, runs a 3-iteration warm-up + `iters` fixed damped
  * PageRank iterations at local[cores], and prints ONE line `eps=<edges/s/iter>`.
  *
  * Child-process isolation is the point: when all legs share one JVM, heap aging and
  * accumulated shuffle/GC state from earlier (bigger) legs degrade later legs by 2×
  * (measured in BENCH.md round 3) — a fresh process per leg makes the legs
  * order-independent, the same reason [[ProcBench]] spawns children for the hardware
  * ceiling. */
object ScalingLeg {
  def main(args: Array[String]): Unit = {
    val Array(edgesDir, coresS, itersS) = args
    val cores = coresS.toInt
    val iters = itersS.toInt
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-scaling-leg-$cores")
      .config("spark.sql.shuffle.partitions", cores * 4) // measured sweet spot (BENCH.md)
      .config("spark.sql.adaptive.enabled", "false") // stable co-partitioning (Bench.session)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val g = LinkGraph.fromEdges(spark,
      spark.read.parquet(s"$edgesDir/edges"),
      Some(spark.read.parquet(s"$edgesDir/verts")))
    PageRank.run(spark, g, tol = 0.0, maxIter = 3) // warm-up (JIT + shuffle files)
    val t0 = System.nanoTime()
    PageRank.run(spark, g, damp = 0.85, tol = 0.0, maxIter = iters)
      .ranks.agg(sum("score")).head()
    val secs = (System.nanoTime() - t0) / 1e9
    val eps = g.m.toDouble * iters / secs
    spark.stop()
    println(s"eps=$eps m=${g.m} secs=$secs")
  }
}
