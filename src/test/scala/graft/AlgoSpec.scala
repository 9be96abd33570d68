package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.algo.{ConnectedComponents, LabelPropagation, PageRank, Triangles}
import graft.model.LinkGraph

class PageRankSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("8-node weighted fixture matches MATLAB golden values (±1e-4)") {
    val g = LinkGraph.fromEdges(spark, TestSpark.undirected(Fixtures.pr8Edges))
    val r = PageRank.run(spark, g, damp = 0.85, tol = 1e-8)
    val scores = r.ranks.collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    Fixtures.pr8Expected.zipWithIndex.foreach { case (exp, i) =>
      assert(math.abs(scores(i.toLong) - exp) < 1e-4, s"node $i: ${scores(i.toLong)} vs $exp")
    }
    assert(math.abs(scores.values.sum - 1.0) < 1e-9)
  }

  test("karate club matches the independent sequential oracle (allclose 1e-6)") {
    val g = LinkGraph.fromEdges(spark,
      TestSpark.undirected(Fixtures.karateEdges.map(e => (e._1, e._2, 1.0))))
    val r = PageRank.run(spark, g, damp = 0.85, tol = 1e-8)
    val scores = r.ranks.collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    Fixtures.karatePageRank.zipWithIndex.foreach { case (exp, i) =>
      assert(math.abs(scores(i.toLong) - exp) < 1e-6, s"node $i: ${scores(i.toLong)} vs $exp")
    }
  }

  test("directed semantics: in-edge contributions, dangling mass not redistributed") {
    // 0 -> 1 -> 2, 2 dangling; 3 isolated. Hand-computed NetworKit semantics.
    val g = LinkGraph.fromEdges(spark,
      TestSpark.directed(Seq((0L, 1L, 1.0), (1L, 2L, 1.0))),
      vertices = Some({ import spark.implicits._; Seq(0L, 1L, 2L, 3L).toDF("id") }))
    val r = PageRank.run(spark, g, damp = 0.85, tol = 1e-12, maxIter = 300)
    val s = r.ranks.collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    // Fixpoint pre-normalization: pr0=pr3=t, pr1=t+d*t, pr2=t+d*t+d^2*t with t=0.0375, d=.85
    val t = 0.15 / 4; val d = 0.85
    val raw = Seq(t, t + d * t, t + d * t + d * d * t, t)
    val tot = raw.sum
    raw.zipWithIndex.foreach { case (exp, i) =>
      assert(math.abs(s(i.toLong) - exp / tot) < 1e-9, s"node $i: ${s(i.toLong)} vs ${exp / tot}")
    }
  }

  test("fixed-point PageRank is invariant to shuffle partitioning") {
    val g = LinkGraph.fromEdges(spark,
      TestSpark.undirected(Fixtures.karateEdges.map(e => (e._1, e._2, 1.0))))
    spark.conf.set("spark.sql.shuffle.partitions", "3")
    val a = PageRank.fixedPoint(spark, g, 10).collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    val b = PageRank.fixedPoint(spark, g, 10).collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    assert(a.sameElements(b))
  }
}

class ComponentsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("20-node fixture: 5 components with exact min-labels") {
    import spark.implicits._
    val g = LinkGraph.fromEdges(spark, TestSpark.directed(Fixtures.cc20Edges),
      vertices = Some((0L to 19L).toDF("id")))
    val r = ConnectedComponents.run(spark, g)
    val labels = r.labels.collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(labels == Fixtures.cc20Labels)
    assert(labels.values.toSet.size == 5)
  }

  test("coarsening path (coarsenAfter=1) reaches the same exact labels") {
    import spark.implicits._
    val g = LinkGraph.fromEdges(spark, TestSpark.directed(Fixtures.cc20Edges),
      vertices = Some((0L to 19L).toDF("id")))
    val r = ConnectedComponents.run(spark, g, coarsenAfter = 1)
    val labels = r.labels.collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(labels == Fixtures.cc20Labels)
  }
}

class TrianglesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  lazy val karate = LinkGraph.fromEdges(spark,
    TestSpark.directed(Fixtures.karateEdges.map(e => (e._1, e._2, 1.0))))

  test("karate global triangle count = 45") {
    assert(Triangles.globalCount(spark, karate) == Fixtures.karateTriangles)
  }

  test("karate per-node triangle counts match the oracle") {
    val got = Triangles.perNode(spark, karate).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    Fixtures.karatePerNodeTriangles.zipWithIndex.foreach { case (exp, i) =>
      assert(got.getOrElse(i.toLong, 0L) == exp, s"node $i")
    }
  }

  test("lcc of a triangle graph is 1.0; counts invariant under id permutation") {
    val tri = LinkGraph.fromEdges(spark, TestSpark.directed(
      Seq((0L, 1L, 1.0), (1L, 2L, 1.0), (0L, 2L, 1.0))))
    val lcc = Triangles.localClusteringCoefficient(spark, tri).collect()
    assert(lcc.forall(_.getDouble(1) == 1.0))
    // permuted karate: same global count
    val perm = Fixtures.karateEdges.map(e => ((e._1 * 7 + 3) % 101, (e._2 * 7 + 3) % 101))
    val g2 = LinkGraph.fromEdges(spark, TestSpark.directed(perm.map(e => (e._1, e._2, 1.0))))
    assert(Triangles.globalCount(spark, g2) == Fixtures.karateTriangles)
  }
}

class PlpSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("two disjoint K5 cliques converge to 2 communities (min id labels)") {
    val k5 = for { a <- 0 to 4; b <- a + 1 to 4 } yield (a.toLong, b.toLong, 1.0)
    val edges = k5 ++ k5.map(e => (e._1 + 5, e._2 + 5, e._3))
    val g = LinkGraph.fromEdges(spark, TestSpark.undirected(edges))
    val r = LabelPropagation.run(spark, g, maxIterations = 20, updateThresholdOpt = Some(0L))
    val labels = r.labels.collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert((0L to 4L).map(labels).toSet.size == 1)
    assert((5L to 9L).map(labels).toSet.size == 1)
    assert(labels(0L) != labels(5L))
  }

  test("labels form a proper partition of the vertex set; compact relabels to 0..k-1") {
    val g = LinkGraph.fromEdges(spark,
      TestSpark.undirected(Fixtures.karateEdges.map(e => (e._1, e._2, 1.0))))
    val labels = LabelPropagation.fixedRounds(spark, g, 5)
    assert(labels.count() == g.n)
    assert(labels.select("id").distinct().count() == g.n)
    val compacted = LabelPropagation.compact(labels)
    val ls = compacted.select("label").distinct().collect().map(_.getLong(0)).sorted.toSeq
    assert(ls == ls.indices.map(_.toLong))
  }
}
