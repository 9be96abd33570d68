package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.algo.Betweenness
import graft.model.LinkGraph

/** Betweenness / closeness golden tests: the distributed multi-source Brandes is
  * checked against an obviously-correct single-threaded Brandes written here from the
  * published algorithm (the same oracle strategy as SURVEY.md §5 — independent
  * sequential reimplementation, not values copied from the reference). Reference
  * semantics under test: unnormalized scores, no undirected halving
  * (centrality/Betweenness.cpp:84,105-112), closeness = 1/Σd (Closeness.cpp:55-60),
  * harmonic = Σ1/d (HarmonicCloseness.cpp:36-43). */
class BetweennessSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def seqBrandes(edges: Seq[(Long, Long)], n: Int): Array[Double] = {
    val adj = Array.fill(n)(List.empty[Int])
    for ((u, v) <- edges) { adj(u.toInt) ::= v.toInt; adj(v.toInt) ::= u.toInt }
    val bc = Array.fill(n)(0.0)
    for (s <- 0 until n) {
      val dist = Array.fill(n)(-1); val sigma = Array.fill(n)(0.0)
      val order = scala.collection.mutable.ArrayBuffer[Int]()
      dist(s) = 0; sigma(s) = 1.0
      val q = scala.collection.mutable.Queue(s)
      while (q.nonEmpty) {
        val v = q.dequeue(); order += v
        for (w <- adj(v)) {
          if (dist(w) < 0) { dist(w) = dist(v) + 1; q.enqueue(w) }
          if (dist(w) == dist(v) + 1) sigma(w) += sigma(v)
        }
      }
      val delta = Array.fill(n)(0.0)
      for (v <- order.reverse; w <- adj(v) if dist(w) == dist(v) + 1)
        delta(v) += sigma(v) / sigma(w) * (1 + delta(w))
      for (v <- 0 until n if v != s) bc(v) += delta(v)
    }
    bc
  }

  private lazy val karate = LinkGraph.fromEdges(spark,
    TestSpark.undirected(Fixtures.karateEdges.map(e => (e._1, e._2, 1.0))))

  test("karate betweenness matches a sequential Brandes oracle (all sources)") {
    val got = Betweenness.run(spark, karate, karate.vertices)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = seqBrandes(Fixtures.karateEdges, 34)
    for (v <- 0 until 34)
      assert(math.abs(got(v.toLong) - want(v)) < 1e-8, s"node $v: ${got(v.toLong)} vs ${want(v)}")
  }

  test("sampled-source fixed-point betweenness is deterministic and ranks like float") {
    val sources = karate.vertices.filter(col("id") % 3 === 0)
    val a = Betweenness.fixedPoint(spark, karate, sources)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Betweenness.fixedPoint(spark, karate, sources)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
    val fl = Betweenness.run(spark, karate, sources)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // scaled-int deltas floor at 1e-4 resolution: agree within 1 unit per path merge
    assert(a.maxBy(_._2)._1 == fl.maxBy(_._2)._1)
  }

  test("closeness + harmonic of sources match a direct BFS computation") {
    val out = Betweenness.closenessHarmonic(spark, karate, karate.vertices.filter(col("id") === 0))
      .collect().head
    // BFS from 0 on karate, sequential.
    val n = 34
    val adj = Array.fill(n)(List.empty[Int])
    for ((u, v) <- Fixtures.karateEdges) { adj(u.toInt) ::= v.toInt; adj(v.toInt) ::= u.toInt }
    val dist = Array.fill(n)(-1); dist(0) = 0
    val q = scala.collection.mutable.Queue(0)
    while (q.nonEmpty) { val v = q.dequeue(); for (w <- adj(v) if dist(w) < 0) { dist(w) = dist(v) + 1; q.enqueue(w) } }
    val sum = dist.sum
    val harm = dist.filter(_ > 0).map(1.0 / _).sum
    assert(out.getAs[Long]("reached") == 33L)
    assert(out.getAs[Long]("sumdist") == sum.toLong)
    assert(math.abs(out.getAs[Double]("closeness") - 1.0 / sum) < 1e-12)
    assert(math.abs(out.getAs[Double]("harmonic") - harm) < 1e-9)
  }
}
