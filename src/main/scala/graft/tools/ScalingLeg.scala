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
    val edgesDir = args(0)
    val cores = args(1).toInt
    val iters = args(2).toInt
    // Warm-up sized for a FRESH JVM: C2/codegen compilation costs near-constant
    // wall-clock, which is a negligible fraction of a 2-core leg but 25-45% of an
    // 8/32-core leg at 3 warm-up iterations (measured: 8-core eps 5.5M cold vs 7.2M
    // JIT-warm in the r2 shared-JVM first round). Default 8 restores parity.
    val warm = if (args.length > 3) args(3).toInt else 8
    // partitions-per-core: 4 = the scaling-gate protocol (constant per-core task
    // granularity across legs); 1 = peak-throughput configuration (fewest task
    // switches — measured 2x faster at 32 cores on the same input)
    val partMult = if (args.length > 4) args(4).toInt
      else sys.env.getOrElse("SPARK_GRAFT_PART_MULT", "4").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-scaling-leg-$cores")
      .config("spark.sql.shuffle.partitions", cores * partMult)
      .config("spark.sql.adaptive.enabled", "false") // stable co-partitioning (Bench.session)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val g = LinkGraph.fromEdges(spark,
      spark.read.parquet(s"$edgesDir/edges"),
      Some(spark.read.parquet(s"$edgesDir/verts")))
    PageRank.run(spark, g, tol = 0.0, maxIter = warm) // warm-up (JIT + shuffle files)
    val t0 = System.nanoTime()
    PageRank.run(spark, g, damp = 0.85, tol = 0.0, maxIter = iters)
      .ranks.agg(sum("score")).head()
    val secs = (System.nanoTime() - t0) / 1e9
    val eps = g.m.toDouble * iters / secs
    spark.stop()
    println(s"eps=$eps m=${g.m} secs=$secs")
  }
}
