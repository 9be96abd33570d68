package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.algo.{ClusteringGenerator, LabelPropagation, LinkPrediction, Measures}
import graft.io.GraphReaders
import graft.model.LinkGraph
import graft.synth.Generators

/** Round-2 operators: generators (BA, hyperbolic), KONECT/MatrixMarket/Cover IO,
  * append/merge, clustering generators, NMI/ARI, link prediction. */
class Round2Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tmpFile(content: String, suffix: String): String = {
    val f = Files.createTempFile("graft", suffix)
    Files.writeString(f, content)
    f.toString
  }

  test("barabasi-albert: deterministic, m ~= k*(n-k), preferential hubs exist") {
    val g = Generators.barabasiAlbert(spark, k = 3, n = 500, seed = 7)
    assert(g.n == 500)
    // dedup may drop a few; must stay close to k*(n-k)
    assert(g.m > 3 * (500 - 3) * 0.9 && g.m <= 3 * (500 - 3))
    val g2 = Generators.barabasiAlbert(spark, k = 3, n = 500, seed = 7)
    assert(g2.m == g.m)
    val degs = g.bidirected.groupBy("src").count().orderBy(desc("count"))
      .limit(1).head().getLong(1)
    assert(degs > 20, s"max degree $degs should reflect preferential attachment")
  }

  test("hyperbolic: bucketed candidate join equals brute-force threshold graph") {
    val n = 1500
    val R = 9.0
    val g = Generators.hyperbolic(spark, n = n, R = R, seed = 3)
    val got = g.canonicalUndirected.select("src", "dst").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // Brute force over the SAME deterministic points — bucketing must only prune.
    val pts = Generators.hyperbolicPoints(spark, n, R, seed = 3)
    val brute = pts.as("x").join(pts.as("y"), col("x.id") < col("y.id"))
      .filter(Generators.hyperbolicConnects(R)(
        col("x.r"), col("y.r"), col("x.theta"), col("y.theta")))
      .select(col("x.id"), col("y.id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brute, s"got ${got.size} pairs, brute ${brute.size}")
    assert(got.nonEmpty)
  }

  test("konect reader: header comments, 1-based ids, weight summing for multi-edges") {
    val p = tmpFile("% sym positive\n% 3 3\n1 2 2.0\n2 3 1.0\n1 2 3.0\n", ".konect")
    val g = GraphReaders.readKonect(spark, p)
    val e = g.edges.collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(e == Map((0L, 1L) -> 5.0, (1L, 2L) -> 1.0))
  }

  test("matrix market reader: banner, dims line, 1-based COO") {
    val p = tmpFile("%%MatrixMarket matrix coordinate real general\n% comment\n3 3 2\n1 2 1.5\n3 1 2.5\n", ".mtx")
    val g = GraphReaders.readMatrixMarket(spark, p)
    assert(g.n == 3)
    val e = g.edges.collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(e == Map((0L, 1L) -> 1.5, (2L, 0L) -> 2.5))
  }

  test("cover + partition readers; cover writer roundtrip") {
    val cp = tmpFile("# comment\n0 1 2\n2 3\n", ".cov")
    val cover = GraphReaders.readCover(spark, cp)
    val got = cover.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((0L, 0L), (1L, 0L), (2L, 0L), (2L, 1L), (3L, 1L)))
    val out = Files.createTempDirectory("graftcov").toString + "/c"
    GraphReaders.writeCover(cover, out)
    val back = GraphReaders.readCover(spark, out)
    assert(back.collect().map(r => (r.getLong(0), r.getLong(1))).toSet == got)
    val pp = tmpFile("5\n7\n5\n", ".ptn")
    val part = GraphReaders.readPartition(spark, pp)
    assert(part.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((0L, 5L), (1L, 7L), (2L, 5L)))
  }

  test("append remaps ids disjointly; merge unions edges without duplication") {
    val a = LinkGraph.fromEdges(spark, TestSpark.directed(Seq((0L, 1L, 1.0))))
    val b = LinkGraph.fromEdges(spark, TestSpark.directed(Seq((0L, 1L, 1.0))))
    val ap = LinkGraph.append(a, b)
    assert(ap.n == 4 && ap.m == 2)
    assert(ap.edges.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((0L, 1L), (2L, 3L)))
    val c = LinkGraph.fromEdges(spark, TestSpark.directed(Seq((0L, 1L, 1.0), (1L, 2L, 1.0))))
    val mg = LinkGraph.merge(a, c)
    assert(mg.m == 2 && mg.n == 3)
  }

  test("clustering generators: 1-clustering Q=0 coverage=1; singletons Q<=0") {
    val karate = LinkGraph.fromEdges(spark,
      TestSpark.undirected(Fixtures.karateEdges.map(e => (e._1, e._2, 1.0))))
    val one = Measures.summary(spark, karate, ClusteringGenerator.one(karate)).head()
    assert(one.getAs[Double]("coverage") == 1.0)
    assert(math.abs(one.getAs[Double]("modularity")) < 1e-12)
    val sing = Measures.summary(spark, karate, ClusteringGenerator.singletons(karate)).head()
    assert(sing.getAs[Double]("modularity") <= 0.0)
    val rnd = ClusteringGenerator.random(karate, 4)
    assert(rnd.select("label").distinct().count() <= 4)
    val bal = ClusteringGenerator.continuousBalanced(spark, karate, 2)
    assert(bal.filter(col("label") >= 2).count() == 0)
  }

  test("nmi: identical partitions => nmi 1; ari of identical partitions = 1") {
    val karate = LinkGraph.fromEdges(spark,
      TestSpark.undirected(Fixtures.karateEdges.map(e => (e._1, e._2, 1.0))))
    val p = LabelPropagation.fixedRounds(spark, karate, 5)
    val r = Measures.nmi(spark, p, p).head()
    assert(math.abs(r.getAs[Double]("nmi") - 1.0) < 1e-6)
    val ari = Measures.adjustedRand(spark, p, p).head().getAs[Double]("ari")
    assert(math.abs(ari - 1.0) < 1e-12)
  }

  test("link prediction: karate distance-2 pairs have sane indices") {
    val karate = LinkGraph.fromEdges(spark,
      TestSpark.undirected(Fixtures.karateEdges.map(e => (e._1, e._2, 1.0))))
    val sc = LinkPrediction.scores(spark, karate).collect()
    assert(sc.nonEmpty)
    sc.foreach { r =>
      val (u, v, cn, pa, j, aa) = (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5))
      assert(u < v && cn >= 1 && pa >= 1 && j > 0 && j <= 1.0 && aa > 0)
    }
    // no existing edge may appear as a prediction
    val edges = Fixtures.karateEdges.map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).toSet
    assert(sc.forall(r => !edges.contains((r.getLong(0), r.getLong(1)))))
  }
}
