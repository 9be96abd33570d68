package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.model.LinkGraph
import graft.viz.GraphViz

/** Layout family (viz/FruchtermanReingold.cpp, PivotMDS.cpp, MaxentStress.cpp,
  * MultilevelLayouter.cpp, PostscriptWriter.cpp). */
class VizSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/root/repo/target"), "viz").resolve(name).toString

  /** Two K6 cliques joined by one bridge — community separation test graph. */
  private lazy val cliques = LinkGraph.fromEdges(spark, TestSpark.directed(
    ((for (a <- 0L to 5L; b <- (a + 1) to 5L) yield (a, b, 1.0)) ++
      (for (a <- 6L to 11L; b <- (a + 1) to 11L) yield (a, b, 1.0)) ++
      Seq((5L, 6L, 1.0))).toSeq))

  private lazy val path10 = LinkGraph.fromEdges(spark,
    TestSpark.directed((0L until 9L).map(i => (i, i + 1, 1.0))))

  private def coords(df: org.apache.spark.sql.DataFrame): Map[Long, (Double, Double)] =
    df.collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap

  private def dist(a: (Double, Double), b: (Double, Double)): Double =
    math.hypot(a._1 - b._1, a._2 - b._2)

  test("FR: deterministic, in unit square, separates two cliques") {
    val l1 = coords(GraphViz.fruchtermanReingold(spark, cliques, maxIter = 25))
    val l2 = coords(GraphViz.fruchtermanReingold(spark, cliques, maxIter = 25))
    // same seed -> same layout (up to float reduction order across partitions)
    assert(l1.keySet == l2.keySet)
    assert(l1.forall { case (k, v) => dist(v, l2(k)) < 1e-3 })
    assert(l1.values.forall { case (x, y) => x >= 0 && x <= 1 && y >= 0 && y <= 1 })
    val intra = for (a <- 0L to 5L; b <- (a + 1) to 5L) yield dist(l1(a), l1(b))
    val inter = for (a <- 0L to 5L; b <- 6L to 11L) yield dist(l1(a), l1(b))
    assert(intra.sum / intra.size < inter.sum / inter.size,
      "mean intra-clique distance should be below mean inter-clique distance")
  }

  test("FR: gridRes=1 (exact all-pairs) close to gridded far-field result in stress") {
    val sources = cliques.vertices.limit(4)
    val exact = GraphViz.fruchtermanReingold(spark, cliques, maxIter = 15, gridRes = 1)
    val grid = GraphViz.fruchtermanReingold(spark, cliques, maxIter = 15, gridRes = 6)
    val se = GraphViz.stress(spark, cliques, exact, sources, scale = 4.0)
    val sg = GraphViz.stress(spark, cliques, grid, sources, scale = 4.0)
    assert(se > 0 && sg > 0 && sg < se * 3 && se < sg * 3)
  }

  test("PivotMDS: path graph embeds with monotone principal axis") {
    val l = GraphViz.pivotMds(spark, path10, numPivots = 10)
    val xs = l.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val seq = (0L until 10L).map(xs)
    val mono = seq.sliding(2).forall(p => p(0) < p(1)) ||
      seq.sliding(2).forall(p => p(0) > p(1))
    assert(mono, s"principal coordinate should be monotone along a path: $seq")
  }

  test("PivotMDS: deterministic; karate embeds with positive spread on both axes") {
    val karate = LinkGraph.fromEdges(spark,
      TestSpark.directed(Fixtures.karateEdges.map(e => (e._1, e._2, 1.0))))
    val a = coords(GraphViz.pivotMds(spark, karate, numPivots = 12))
    val b = coords(GraphViz.pivotMds(spark, karate, numPivots = 12))
    assert(a.keySet == b.keySet)
    assert(a.forall { case (k, v) => dist(v, b(k)) < 1e-6 })
    val xs = a.values.map(_._1); val ys = a.values.map(_._2)
    assert(xs.max - xs.min > 0 && ys.max - ys.min > 0)
  }

  test("MaxentStress: improves full stress over its MDS init on the clique pair") {
    val sources = cliques.vertices
    val mds = GraphViz.pivotMds(spark, cliques, numPivots = 12)
    // rescale like maxentStress's init to compare at the same scale
    val me = GraphViz.maxentStress(spark, cliques, rounds = 15)
    // stress at optimal per-layout scale: evaluate over a small scale sweep
    def bestStress(l: org.apache.spark.sql.DataFrame): Double =
      Seq(1.0, 2.0, 4.0, 8.0, 16.0).map(sc => GraphViz.stress(spark, cliques, l, sources, sc)).min
    assert(bestStress(me) <= bestStress(mds) * 1.5)
    val c = coords(me)
    assert(c.values.forall { case (x, y) => x >= 0 && x <= 1 && y >= 0 && y <= 1 })
  }

  test("MultilevelLayouter: runs the coarsen-prolong-refine pipeline, keeps all nodes") {
    val l = coords(GraphViz.multilevelLayout(spark, cliques, coarsestSize = 4,
      refineIters = 5))
    assert(l.keySet == (0L to 11L).toSet)
    assert(l.values.forall { case (x, y) => x >= 0 && x <= 1 && y >= 0 && y <= 1 })
  }

  test("PostscriptWriter: EPS header, one stroke per edge, one arc per node") {
    val p = tmp("layout.eps")
    val l = GraphViz.fruchtermanReingold(spark, cliques, maxIter = 5)
    GraphViz.writePostscript(cliques, l, p)
    val s = spark; import s.implicits._
    val lines = spark.read.text(p).as[String].collect()
    assert(lines.head.startsWith("%!PS-Adobe"))
    assert(lines.count(_.endsWith(" l s")) == 31) // 2*C(6,2)+1 edges
    assert(lines.count(_.endsWith(" a f")) == 12)
    assert(lines.last == "%%EOF")
    assert(!lines.exists(_.contains(","))) // coordinates must be locale-free
  }
}
