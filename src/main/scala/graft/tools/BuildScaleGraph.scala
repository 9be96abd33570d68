package graft.tools

import org.apache.spark.sql.SparkSession

import graft.model.LinkGraph

/** Build the replicated scaling-bench graph once and park it as parquet:
  * `BuildScaleGraph <sfDir> <outDir> [replicate]` — the same construction
  * Bench.buildScaleGraph uses, exposed for scaling experiments outside the full
  * bench run. */
object BuildScaleGraph {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus * 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val m0 = LinkGraph.forSf(spark, sfDir).m
    val replicate = args.lift(2).map(_.toLong)
      .getOrElse(math.max(1L, 50000000L / math.max(1L, m0)))
    val g = LinkGraph.build(spark,
      graft.synth.PageTableGen.fromDocuments(spark, docs, replicate))
    g.edges.write.mode("overwrite").parquet(s"$outDir/edges")
    g.vertices.write.mode("overwrite").parquet(s"$outDir/verts")
    println(s"m=${g.m} n=${g.n} replicate=$replicate out=$outDir")
    spark.stop()
  }
}
