package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.algo._
import graft.model.LinkGraph

class MeasuresSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  lazy val karate = LinkGraph.fromEdges(spark,
    TestSpark.directed(Fixtures.karateEdges.map(e => (e._1, e._2, 1.0))))

  test("1-clustering: coverage 1, modularity <= 0; edge cut 0 (CommunityGTest.cpp:224-289)") {
    val s = spark
    import s.implicits._
    val one = (0L to 33L).map(i => (i, 0L)).toDF("id", "label")
    val r = Measures.summary(spark, karate, one).head()
    assert(r.getAs[Long]("m_und") == 78L)
    assert(r.getAs[Long]("intra") == 78L && r.getAs[Long]("cut") == 0L)
    assert(r.getAs[Double]("coverage") == 1.0)
    assert(r.getAs[Double]("modularity") <= 0.0 + 1e-12)
  }

  test("singleton clustering: coverage 0, modularity < 0") {
    val s = spark
    import s.implicits._
    val singl = (0L to 33L).map(i => (i, i)).toDF("id", "label")
    val r = Measures.summary(spark, karate, singl).head()
    assert(r.getAs[Long]("intra") == 0L)
    assert(r.getAs[Double]("modularity") < 0.0)
  }

  test("coarsening preserves total edge count; self-loop rows carry intra weight") {
    val s = spark
    import s.implicits._
    val labels = (0L to 33L).map(i => (i, i % 2)).toDF("id", "label")
    val c = Measures.coarsen(spark, karate, labels).collect()
    assert(c.map(_.getLong(2)).sum == 78L)
    assert(c.exists(r => r.getLong(0) == r.getLong(1))) // intra self-loops present
  }

  test("rand index of identical partitions is 1.0") {
    val s = spark
    import s.implicits._
    val p = (0L to 33L).map(i => (i, i % 3)).toDF("id", "label")
    val r = Measures.randIndex(spark, p, p).head()
    assert(r.getAs[Double]("rand") == 1.0)
  }

  test("conductance: vol + cut per community are consistent with the 2m total") {
    val s = spark
    import s.implicits._
    val labels = (0L to 33L).map(i => (i, i % 2)).toDF("id", "label")
    val rows = Measures.conductance(spark, karate, labels).collect()
    assert(rows.map(_.getAs[Long]("vol")).sum == 2 * 78L)
    // symmetric 2-partition: both sides see the same cut
    assert(rows.map(_.getAs[Long]("cut")).distinct.length == 1)
  }
}

class KCoreBfsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  lazy val karate = LinkGraph.fromEdges(spark,
    TestSpark.directed(Fixtures.karateEdges.map(e => (e._1, e._2, 1.0))))

  test("karate 4-core is nonempty, 5-core is empty (degeneracy 4)") {
    assert(KCore.kCore(spark, karate, 4).count() > 0)
    assert(KCore.kCore(spark, karate, 5).count() == 0)
  }

  test("coreness: max = 4 on karate; every node with coreness k has degree >= k") {
    val cor = KCore.coreness(spark, karate).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cor.values.max == 4L)
    val deg = karate.bidirected.groupBy(col("src").as("id")).agg(count(lit(1)).as("d"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    cor.foreach { case (id, k) => assert(deg.getOrElse(id, 0L) >= k) }
  }

  test("bfs hops from 0 on karate: dist 0 for source, 1 for its neighbors, all reachable") {
    val d = Distances.bfsHops(spark, karate, 0L).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d(0L) == 0L)
    Fixtures.karateEdges.filter(_._1 == 0L).foreach { case (_, v) => assert(d(v) == 1L) }
    assert(d.values.forall(_ >= 0))
    val ecc = Distances.eccentricity(spark, karate, 0L).head()
    assert(ecc.getAs[Long]("reached") == 34L && ecc.getAs[Long]("ecc") == d.values.max)
  }
}

class CentralitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  lazy val karate = LinkGraph.fromEdges(spark,
    TestSpark.directed(Fixtures.karateEdges.map(e => (e._1, e._2, 1.0))))

  test("degree centrality normalized: hub node 33 has score 1.0") {
    val d = Centralities.degree(spark,
      LinkGraph.fromEdges(spark, TestSpark.undirected(Fixtures.karateEdges.map(e => (e._1, e._2, 1.0)))),
      normalized = true).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(d(33L) == 1.0)
  }

  test("eigenvector centrality on karate: L2 norm 1, non-negative, hub 33 on top") {
    val und = LinkGraph.fromEdges(spark,
      TestSpark.undirected(Fixtures.karateEdges.map(e => (e._1, e._2, 1.0))))
    val x = Centralities.eigenvector(spark, und).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(x.values.map(v => v * v).sum - 1.0) < 1e-6)
    assert(x.values.forall(_ >= 0))
    assert(x.maxBy(_._2)._1 == 33L)
  }

  test("katz: normalized scores positive, hub outranks leaf") {
    val x = Centralities.katz(spark, karate, alpha = 0.01).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(x.values.forall(_ > 0))
    assert(x(33L) > x(11L))
    val rk = Centralities.ranking(
      Centralities.katz(spark, karate, alpha = 0.01)).head()
    assert(rk.getLong(0) == 1L)
  }

  test("assortativity of karate is negative (hubs link to leaves)") {
    val r = Centralities.assortativity(spark, karate).head()
    val a = r.getAs[Double]("assortativity")
    assert(a < 0 && a > -1)
  }
}

class EdgeScoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  lazy val karate = LinkGraph.fromEdges(spark,
    TestSpark.directed(Fixtures.karateEdges.map(e => (e._1, e._2, 1.0))))

  test("per-edge triangle counts sum to 3x the global count") {
    val tot = EdgeScores.triangleEdgeScore(spark, karate).agg(sum("tri")).head().getLong(0)
    assert(tot == 3 * Fixtures.karateTriangles)
  }

  test("jaccard edge score is in [0,1]; threshold filter keeps a subset") {
    val j = EdgeScores.jaccardEdgeScore(spark, karate)
    assert(j.filter(col("jaccard") < 0 || col("jaccard") > 1).count() == 0)
    val kept = EdgeScores.globalThresholdFilter(j, "jaccard", 0.2).count()
    assert(kept > 0 && kept < j.count())
  }
}
