package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.algo.EdgeScores
import graft.layout.Layout
import graft.model.LinkGraph
import graft.synth.Generators

/** Round-4 operators: sparsification score family (SCAN, chance-corrected triangle,
  * local similarity), sparsified-graph-of-size, prefix sums, Chung–Lu generator. */
class Round4Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def karate: LinkGraph = LinkGraph.fromEdges(spark,
    TestSpark.directed(Fixtures.karateEdges.map(e => (e._1, e._2, 1.0))))

  test("scan score: triangle-free star edges score 2/sqrt((d+1)*4), karate in (0,1]") {
    // Star 0-(1..4): tri=0, deg(center)=4, deg(leaf)=1 => (0+1)/sqrt(5*2).
    val star = LinkGraph.fromEdges(spark,
      TestSpark.directed((1L to 4L).map(i => (0L, i, 1.0))))
    val s = EdgeScores.scanScore(spark, star).collect()
    assert(s.length == 4)
    val expect = BigDecimal(1.0 / math.sqrt(10.0))
      .setScale(7, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(s.forall(r => r.getAs[Double]("score") == expect))
    val k = EdgeScores.scanScore(spark, karate).collect()
    assert(k.forall { r =>
      val sc = r.getAs[Double]("score"); sc > 0.0 && sc <= 1.0
    })
  }

  test("chance-corrected triangle: degree-1 edges score 1, triangle edges scaled by n-2") {
    // Path 0-1-2 plus triangle 3-4-5 in one graph (n = 6 nodes, ids 0..5).
    val g = LinkGraph.fromEdges(spark, TestSpark.directed(Seq(
      (0L, 1L, 1.0), (1L, 2L, 1.0), (3L, 4L, 1.0), (4L, 5L, 1.0), (3L, 5L, 1.0))))
    val rows = EdgeScores.chanceCorrectedTriangleScore(spark, g).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getAs[Double]("score"))).toMap
    assert(rows((0L, 1L)) == 1.0 && rows((1L, 2L)) == 1.0) // endpoint of degree 1
    // Triangle edge: tri=1, n=6, degs 2,2 => 1*(6-2)/((2-1)*(2-1)) = 4.
    assert(rows((3L, 4L)) == 4.0 && rows((4L, 5L)) == 4.0 && rows((3L, 5L)) == 4.0)
  }

  test("local similarity: degree-1 endpoints give 1; scores in [0,1]") {
    val g = karate
    val rows = EdgeScores.localSimilarityScore(spark, g).collect()
    assert(rows.length == g.canonicalUndirected.count())
    // e = 1 - ln(rank)/ln(deg) reaches exactly 0 at rank == deg (last neighbor,
    // no tie), so the closed interval is the correct contract.
    assert(rows.forall { r =>
      val s = r.getAs[Double]("score"); s >= 0.0 && s <= 1.0
    })
    // rank-1 neighbor of every node keeps e = 1 - ln(1)/ln(d) = 1 -> per-node max
    // guarantees at least one incident edge of every non-isolated node scores 1.
    val ones = rows.count(_.getAs[Double]("score") == 1.0)
    assert(ones >= 1)
  }

  test("sparsified graph of size keeps exactly ceil(ratio*m) top-score edges") {
    val scored = EdgeScores.scanScore(spark, karate)
    val m = scored.count()
    val kept = EdgeScores.sparsifiedGraphOfSize(scored, "score", 0.25)
    assert(kept.count() == math.ceil(0.25 * m).toLong)
    val minKept = kept.agg(min("score")).head().getDouble(0)
    val dropped = scored.join(kept.select("src", "dst"), Seq("src", "dst"), "left_anti")
    val maxDropped = dropped.agg(max("score")).head().getDouble(0)
    assert(maxDropped <= minKept, s"dropped $maxDropped must not beat kept $minKept")
  }

  test("prefix sum: exclusive cumulative sums match a sequential scan") {
    val s = spark
    import s.implicits._
    val df = (0L until 100L).map(i => (i, i % 7 + 1)).toDF("id", "w")
    val got = Layout.prefixSum(df, Seq(col("id")), "w", "cum")
      .orderBy("id").collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("cum")))
    var acc = 0L
    (0L until 100L).zip(got).foreach { case (i, (id, cum)) =>
      assert(id == i && cum == acc, s"id $i: got $cum want $acc")
      acc += i % 7 + 1
    }
    got.foreach(_ => ())
  }

  test("thrill binary roundtrip: karate and a multi-partition generated graph") {
    import graft.io.GraphReaders
    def roundtrip(g: LinkGraph, parts: Int): Unit = {
      val p = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get("/root/repo/target"), "thrill").toString
      GraphReaders.writeThrillBinary(g, p, partitions = parts)
      val back = GraphReaders.readThrillBinary(spark, p)
      assert(back.n == g.n, s"n: ${back.n} != ${g.n}")
      val orig = g.canonicalUndirected.select("src", "dst").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val got = back.canonicalUndirected.select("src", "dst").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == orig, s"edge set mismatch: ${got.size} vs ${orig.size}")
    }
    roundtrip(karate, parts = 3) // degree-0 tail nodes + multiple shards
    roundtrip(Generators.erdosRenyi(spark, n = 2000, m = 6000, seed = 3), parts = 7)
  }

  test("chung-lu: deterministic, self-loop-free, hub degrees track the weight sequence") {
    val seq = Generators.powerlawDegreeSequence(spark, n = 500, minDeg = 2,
      maxDeg = 50, gamma = 2.5)
    val g1 = Generators.chungLu(spark, seq, seed = 7)
    val g2 = Generators.chungLu(spark, seq, seed = 7)
    assert(g1.m == g2.m && g1.m > 100)
    assert(g1.edges.filter(col("src") === col("dst")).count() == 0)
    // Expected-degree ordering: the top-weight decile must out-degree the bottom decile.
    val deg = g1.bidirected.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
    val top = deg.filter(col("id") < 50).agg(avg("deg")).head().getDouble(0)
    val bottom = deg.filter(col("id") >= 450).agg(avg("deg")).head().getDouble(0)
    assert(top > 2.0 * bottom, s"hubs avg $top must dominate tail avg $bottom")
  }
}
