package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.io.GraphReaders
import graft.model.LinkGraph

/** Round-7 additions: GML reader/writer. */
class Round7Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("GML roundtrip: directed graph survives write + read") {
    val g = LinkGraph.fromEdges(spark, TestSpark.directed(Seq(
      (0L, 1L, 1.0), (1L, 2L, 1.0), (2L, 0L, 1.0), (0L, 3L, 1.0))),
      Some(spark.range(4).select(col("id"))))
    val path = java.nio.file.Files.createTempDirectory("gml").toString + "/g.gml"
    GraphReaders.writeGml(g, path, directed = true)
    val r = GraphReaders.readGml(spark, path)
    assert(r.n == 4 && r.m == 4)
    val got = r.edges.collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got == Set((0L, 1L), (1L, 2L), (2L, 0L), (0L, 3L)))
  }

  test("PageRankNibble: recovers a planted clique community from a seed") {
    // two K5 cliques {0..4} and {5..9} joined by the single bridge 4-5
    val k5a = for (i <- 0 until 5; j <- i + 1 until 5) yield (i.toLong, j.toLong, 1.0)
    val k5b = for (i <- 5 until 10; j <- i + 1 until 10) yield (i.toLong, j.toLong, 1.0)
    val g = LinkGraph.fromEdges(spark,
      TestSpark.directed(k5a ++ k5b :+ ((4L, 5L, 1.0))),
      Some(spark.range(10).select(col("id"))))
    val members = graft.algo.Scd.pageRankNibble(spark, g, seed = 0L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(members == Set(0L, 1L, 2L, 3L, 4L))
  }

  test("approximatePageRank: support-sparse, mass bounded, deterministic") {
    val g = LinkGraph.forSf(spark, "/root/testdata/sf0.001")
    val apr = graft.algo.Scd.approximatePageRank(spark, g, seed = 0L,
      maxRounds = 12, fixedRounds = true)
    val rows = apr.collect()
    assert(rows.nonEmpty && rows.length < g.n) // support-sparse
    // truncated fixed-point mass can only LEAK, never grow: sum(p + res) <= Scale
    val total = rows.map(r => r.getAs[Long]("p") + r.getAs[Long]("res")).sum
    assert(total <= graft.algo.Scd.Scale && total > graft.algo.Scd.Scale / 2)
    val apr2 = graft.algo.Scd.approximatePageRank(spark, g, seed = 0L,
      maxRounds = 12, fixedRounds = true)
    assert(apr2.exceptAll(apr).count() == 0)
  }

  test("edge switching: preserves the degree sequence exactly, changes the edge set") {
    val g = LinkGraph.fromEdges(spark,
      TestSpark.directed(Fixtures.karateEdges.map(e => (e._1, e._2, 1.0))),
      Some(spark.range(34).select(col("id"))))
    val r = graft.algo.EdgeSwitching.randomize(spark, g, rounds = 10, seed = 7L)
    def degs(x: LinkGraph) = x.bidirected
      .groupBy("src").agg(count(lit(1)).as("d"))
      .collect().map(row => row.getLong(0) -> row.getLong(1)).toMap
    assert(degs(r) == degs(g)) // exact degree preservation
    assert(r.m == g.m)
    val before = g.canonicalUndirected.select("src", "dst")
    val after = r.canonicalUndirected.select("src", "dst")
    val changed = after.exceptAll(before).count()
    assert(changed > 10, s"only $changed edges rewired — chain not mixing")
    // no self loops, still canonical simple graph
    assert(after.filter(col("src") === col("dst")).count() == 0)
    assert(after.distinct().count() == r.m)
    // deterministic
    val r2 = graft.algo.EdgeSwitching.randomize(spark, g, rounds = 10, seed = 7L)
    assert(r2.canonicalUndirected.select("src", "dst").exceptAll(after).count() == 0)
  }

  test("KPath centrality: star center dominates leaves; deterministic; isolated = 0") {
    // star: center 0 with 12 leaves, plus isolated node 13
    val g = LinkGraph.fromEdges(spark,
      TestSpark.directed((1 to 12).map(i => (0L, i.toLong, 1.0))),
      Some(spark.range(14).select(col("id"))))
    val s = graft.algo.KPath.run(spark, g, kIn = 3, maxWalks = 512)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(s(13L) == 0.0)
    val leaves = (1 to 12).map(i => s(i.toLong))
    assert(s(0L) > leaves.max, s"center ${s(0L)} vs max leaf ${leaves.max}")
    val s2 = graft.algo.KPath.run(spark, g, kIn = 3, maxWalks = 512)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(s == s2)
  }

  test("group closeness: path graph, hand-computed greedy picks and gains") {
    // path 0-1-2-3-4: seed = node 1 (deg 2, smallest id), INF = n = 5
    // d(from 1) = [1,0,1,2,3], seed gain = 25-7 = 18
    // round 1: gain(3) = 4 = gain(4) -> tie-break id 3; round 2: gain(0)=gain(2)=gain(4)=1 -> id 0
    val g = LinkGraph.fromEdges(spark,
      TestSpark.directed(Seq((0L, 1L, 1.0), (1L, 2L, 1.0), (2L, 3L, 1.0), (3L, 4L, 1.0))),
      Some(spark.range(5).select(col("id"))))
    val r = graft.algo.GroupCentrality.groupCloseness(spark, g, k = 3, poolSize = 5)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).sortBy(_._1)
    assert(r.toSeq == Seq((0L, 1L, 18L), (1L, 3L, 4L), (2L, 0L, 1L)))
  }

  test("GML reader: undirected flag canonicalizes; string node ids remap by order") {
    val path = java.nio.file.Files.createTempDirectory("gml2").toString + "/g.gml"
    val text =
      """graph [
        |  directed 0
        |  node [ id 7 ]
        |  node [ id 3 ]
        |  node [ id 9 ]
        |  edge [ source 3 target 7 ]
        |  edge [ source 9 target 3 ]
        |]""".stripMargin
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      text.getBytes("UTF-8"))
    val g = GraphReaders.readGml(spark, path)
    // file-order internal ids: 7 -> 0, 3 -> 1, 9 -> 2 (GMLGraphReader.cpp:57-74)
    assert(g.n == 3 && g.m == 2)
    val got = g.edges.collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got == Set((0L, 1L), (1L, 2L))) // canonicalized (min, max)
  }
}
