package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.algo.{Agglomerative, Measures}
import graft.model.LinkGraph

/** Round-9 operators: parallel agglomerative clusterer (modularity-scored matching
  * + contraction). */
class Round9Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def karate: LinkGraph = LinkGraph.fromEdges(spark,
    TestSpark.directed(Fixtures.karateEdges.map(e => (e._1, e._2, 1.0))))

  test("pac: two K4 cliques joined by a bridge agglomerate to the two cliques") {
    // Even cliques: each level's matching pairs up WITHIN a clique (odd cliques leave
    // one leftover per side, and maximal matching would pair the leftovers across the
    // bridge — same behavior as the reference's maximal matcher); by the time the
    // bridge is the only cross edge, its modularity score is negative and the
    // positive-gain filter stops the merge.
    val edges = (for {
      base <- Seq(0L, 4L); i <- 0 until 4; j <- i + 1 until 4
    } yield (base + i, base + j, 1.0)) :+ (3L, 4L, 1.0)
    val g = LinkGraph.fromEdges(spark, TestSpark.directed(edges))
    val labels = Agglomerative.run(spark, g)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val c0 = (0L to 3L).map(labels).toSet
    val c1 = (4L to 7L).map(labels).toSet
    assert(c0.size == 1 && c1.size == 1 && c0 != c1,
      s"each clique must agglomerate into one community: $labels")
  }

  test("pac: fixed-level variant is deterministic and merges monotonically") {
    val g = karate
    val l1 = Agglomerative.runFixed(spark, g, levels = 1)
    val l3 = Agglomerative.runFixed(spark, g, levels = 3)
    val n0 = g.n
    val n1 = l1.select("label").distinct().count()
    val n3 = l3.select("label").distinct().count()
    assert(n1 < n0 && n3 <= n1, s"levels must not split communities: $n0 -> $n1 -> $n3")
    val again = Agglomerative.runFixed(spark, g, levels = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again == l3.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
    // Communities are unions of matched pairs across levels -> modularity defined;
    // agglomeration on karate should find positive-modularity structure.
    val q = Measures.summary(spark, g, l3)
      .select("modularity").head().getDouble(0)
    assert(q > 0.2, s"karate agglomeration modularity too low: $q")
  }
}
