package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.model.LinkGraph
import graft.algo.PageRank
import graft.text.TextOps

/** Fifth-stint additions: TrustRank (seed-teleport personalized PageRank) and the
  * Gopher-rules quality filter. */
class Round15Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("trustRank: mass stays in the seed-reachable region; unreachable pages score 0") {
    val s = spark; import s.implicits._
    // component A: 0 -> 1 -> 2 (cycle back); component B: 10 <-> 11 (no seeds)
    val g = LinkGraph.fromEdges(spark, Seq(
      (0L, 1L, 1.0), (1L, 2L, 1.0), (2L, 0L, 1.0),
      (10L, 11L, 1.0), (11L, 10L, 1.0)).toDF("src", "dst", "weight"))
    val pr = PageRank.trustRankFixed(spark, g,
      g.vertices.filter(col("id") === 0L), iterations = 30)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pr(10L) == 0L && pr(11L) == 0L)
    assert(pr(0L) > 0L && pr(1L) > 0L && pr(2L) > 0L)
    // seed gets the teleport bonus: strictly more than its cycle-successors' share
    assert(pr(0L) > pr(2L) * 85L / 100L)
  }

  test("trustRank with ALL vertices as seeds is bit-identical to uniform PageRank") {
    val g = LinkGraph.fromEdges(spark,
      TestSpark.directed(Fixtures.karateEdges.map(e => (e._1, e._2, 1.0))))
    val uni = PageRank.fixedPoint(spark, g, iterations = 15)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val tr = PageRank.trustRankFixed(spark, g, g.vertices, iterations = 15)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tr == uni)
  }

  test("HITS: pure-hub star reaches its exact fixed point; L1 norms hold") {
    val s = spark; import s.implicits._
    val g = LinkGraph.fromEdges(spark,
      (1L to 5L).map(i => (0L, i, 1.0)).toDF("src", "dst", "weight"))
    val out = PageRank.hitsFixed(spark, g, iterations = 5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(0L) == ((1000000L, 0L))) // node 0: the only hub, no in-edges
    (1L to 5L).foreach(i => assert(out(i) == ((0L, 200000L))))
    assert(out.values.map(_._2).sum == 1000000L) // authority mass = scale
  }

  test("HITS is deterministic and karate hubs == authorities (undirected ingest)") {
    val g = LinkGraph.fromEdges(spark,
      TestSpark.undirected(Fixtures.karateEdges.map(e => (e._1, e._2, 1.0))))
    val a = PageRank.hitsFixed(spark, g, iterations = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    val b = PageRank.hitsFixed(spark, g, iterations = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(a == b)
    // symmetric edge table → hub and authority converge to the same eigenvector;
    // the alternating update leaves them a half-step apart, so allow a small lag
    // (measured ≤ ~1.3e-4 of scale after 8 iterations).
    a.foreach { case (_, h, au) => assert(math.abs(h - au) <= 1000L, s"$h vs $au") }
  }

  test("gopherFilter: each rule bit fires on a targeted fixture; clean doc keeps") {
    val s = spark; import s.implicits._
    val clean = "the of " + (1 to 48).map(i => f"word$i%02d").mkString(" ")
    val short = "the of x"
    val spam2g = Seq.fill(30)("spam ham").mkString(" ")
    val longTok = "the of " + (1 to 48).map(i => "x" * 15 + i).mkString(" ")
    val noStop = (1 to 60).map(i => f"word$i%02d").mkString(" ")
    val docs = Seq((0L, clean), (1L, short), (2L, spam2g), (3L, longTok), (4L, noStop))
      .toDF("doc_id", "text")
    val out = TextOps.gopherFilter(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(out(0L) == ((0L, 1L)), s"clean doc should pass: ${out(0L)}")
    assert((out(1L)._1 & 1L) != 0L && out(1L)._2 == 0L)   // too short
    assert((out(2L)._1 & 32L) != 0L && out(2L)._2 == 0L)  // top-2-gram share
    assert((out(2L)._1 & 128L) != 0L)                     // dup 5-grams too
    assert((out(3L)._1 & 8L) != 0L && out(3L)._2 == 0L)   // mean token length
    assert((out(4L)._1 & 16L) != 0L && out(4L)._2 == 0L)  // no stopwords
  }
}
