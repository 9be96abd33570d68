package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.algo.{Measures, PLM}
import graft.model.LinkGraph

class PlmSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("two disjoint K5 cliques joined by one edge: PLM recovers the 2 cliques") {
    val k5 = for { a <- 0 to 4; b <- a + 1 to 4 } yield (a.toLong, b.toLong, 1.0)
    val edges = k5 ++ k5.map(e => (e._1 + 5, e._2 + 5, e._3)) :+ (4L, 5L, 1.0)
    val g = LinkGraph.fromEdges(spark, TestSpark.undirected(edges))
    val r = PLM.run(spark, g)
    val labels = r.labels.collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert((0L to 4L).map(labels).toSet.size == 1)
    assert((5L to 9L).map(labels).toSet.size == 1)
    assert(labels(0L) != labels(9L))
  }

  test("karate: PLM modularity beats PLP's and exceeds 0.35; proper partition") {
    val g = LinkGraph.fromEdges(spark,
      TestSpark.undirected(Fixtures.karateEdges.map(e => (e._1, e._2, 1.0))))
    val r = PLM.run(spark, g)
    assert(r.labels.count() == 34)
    assert(r.labels.select("id").distinct().count() == 34)
    val q = Measures.summary(spark, g, r.labels).head().getAs[Double]("modularity")
    assert(q > 0.35, s"modularity $q")
    assert(r.levels >= 2) // multilevel coarsening actually engaged
  }

  test("PLM refine phase never lowers modularity (karate)") {
    val g = LinkGraph.fromEdges(spark,
      TestSpark.undirected(Fixtures.karateEdges.map(e => (e._1, e._2, 1.0))))
    val base = PLM.run(spark, g)
    val ref = PLM.run(spark, g, refine = true)
    val qb = Measures.summary(spark, g, base.labels).head().getAs[Double]("modularity")
    val qr = Measures.summary(spark, g, ref.labels).head().getAs[Double]("modularity")
    assert(qr >= qb - 1e-12, s"refined $qr vs base $qb")
    assert(ref.labels.count() == 34)
  }

  test("PLM is deterministic across shuffle-partition settings") {
    val g = LinkGraph.fromEdges(spark,
      TestSpark.undirected(Fixtures.karateEdges.map(e => (e._1, e._2, 1.0))))
    spark.conf.set("spark.sql.shuffle.partitions", "3")
    val a = PLM.run(spark, g).labels.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    val b = PLM.run(spark, g).labels.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    assert(a.sameElements(b))
  }
}
