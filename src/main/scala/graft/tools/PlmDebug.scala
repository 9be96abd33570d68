package graft.tools
import org.apache.spark.sql.SparkSession
import graft.model.LinkGraph
import graft.algo.PLM
object PlmDebug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val k5 = for { a <- 0 to 4; b <- a + 1 to 4 } yield (a.toLong, b.toLong, 1.0)
    val edges = (k5 ++ k5.map(e => (e._1 + 5, e._2 + 5, e._3)) :+ (4L, 5L, 1.0))
    val bi = (edges ++ edges.map(e => (e._2, e._1, e._3))).toDF("src", "dst", "weight")
    val g = LinkGraph.fromEdges(spark, bi)
    val t0 = System.nanoTime()
    val r = PLM.run(spark, g)
    r.labels.show(12)
    println(f"PLMDEBUG levels=${r.levels} rounds=${r.rounds} secs=${(System.nanoTime()-t0)/1e9}%.1f")
    spark.stop()
  }
}
