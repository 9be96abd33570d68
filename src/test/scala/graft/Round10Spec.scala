package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.algo.{Anf, Centralities, Distances, EdgeScores}
import graft.model.LinkGraph

/** Round-10 operators: Laplacian centrality, local partition coverage, directed /
  * reverse BFS, volume, Adamic-Adar edge distance, hop plot. */
class Round10Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("laplacian centrality: path 0-1-2 exact values") {
    // Unweighted path: wd = (1,2,1).
    // lap(0) = 1 + [1*(1+2*2)] = 6; lap(1) = 4 + [1*(1+2*1)]*2 = 10; lap(2) = 6.
    val g = LinkGraph.fromEdges(spark, TestSpark.directed(Seq((0L, 1L, 1.0), (1L, 2L, 1.0))))
    val got = Centralities.laplacianCentrality(spark, g)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 6L, 1L -> 10L, 2L -> 6L))
  }

  test("local partition coverage: two cliques joined by one edge") {
    // Triangles {0,1,2} and {3,4,5} plus bridge 2-3; partition by triangle.
    val es = Seq((0L, 1L), (0L, 2L), (1L, 2L), (3L, 4L), (3L, 5L), (4L, 5L), (2L, 3L))
      .map { case (a, b) => (a, b, 1.0) }
    val g = LinkGraph.fromEdges(spark, TestSpark.directed(es))
    import spark.implicits._
    val part = Seq((0L, 0L), (1L, 0L), (2L, 0L), (3L, 1L), (4L, 1L), (5L, 1L))
      .toDF("id", "label")
    val got = Centralities.localPartitionCoverage(spark, g, part)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(got(0L) == 1.0 && got(1L) == 1.0 && got(4L) == 1.0 && got(5L) == 1.0)
    assert(math.abs(got(2L) - 2.0 / 3.0) < 1e-12)
    assert(math.abs(got(3L) - 2.0 / 3.0) < 1e-12)
  }

  test("directed and reverse BFS on a cycle with a chord") {
    // 0 -> 1 -> 2 -> 3 -> 0, chord 0 -> 2.
    val es = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L), (0L, 2L)).map { case (a, b) => (a, b, 1.0) }
    val g = LinkGraph.fromEdges(spark, TestSpark.directed(es))
    val fwd = Distances.bfsHopsDirected(spark, g, 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fwd == Map(0L -> 0L, 1L -> 1L, 2L -> 1L, 3L -> 2L))
    val rev = Distances.bfsHopsDirected(spark, g, 0L, reverse = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rev == Map(0L -> 0L, 3L -> 1L, 2L -> 2L, 1L -> 3L))
  }

  test("directed BFS marks unreachable as -1") {
    val es = Seq((0L, 1L), (2L, 0L)).map { case (a, b) => (a, b, 1.0) }
    val g = LinkGraph.fromEdges(spark, TestSpark.directed(es))
    val fwd = Distances.bfsHopsDirected(spark, g, 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fwd == Map(0L -> 0L, 1L -> 1L, 2L -> -1L))
  }

  test("volume on a path graph: exact ball sizes") {
    // Path 0-1-...-9, sources id % 5 == 0 -> {0, 5}.
    // r=1: |B(0)|=2, |B(5)|=3 -> within=5, vol=2.5
    // r=2: |B(0)|=3, |B(5)|=5 -> within=8, vol=4.0
    val es = (0L until 9L).map(i => (i, i + 1, 1.0))
    val g = LinkGraph.fromEdges(spark, TestSpark.directed(es))
    val got = Distances.volume(spark, g, rmax = 2, mod = 5L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSet == Set((1L, 5L, 2.5), (2L, 8L, 4.0)))
  }

  test("adamic-adar distance: triangle plus pendant edge") {
    // Triangle 0-1-2, pendant 2-3. deg = (2,2,3,1).
    // Edge (0,1): common neighbor 2 (deg 3) -> aad = round(1e9/ln 3).
    // Edges (0,2),(1,2): common neighbor deg 2 -> aad = round(1e9/ln 2).
    // Edge (2,3): no triangle -> aad=0, dist=-1.
    val es = Seq((0L, 1L), (0L, 2L), (1L, 2L), (2L, 3L)).map { case (a, b) => (a, b, 1.0) }
    val g = LinkGraph.fromEdges(spark, TestSpark.directed(es))
    val got = EdgeScores.adamicAdarDistance(spark, g)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getDouble(3)))).toMap
    val t3 = math.round(1e9 / math.log(3.0))
    val t2 = math.round(1e9 / math.log(2.0))
    assert(got((0L, 1L)) == ((t3, 1e9 / t3)))
    assert(got((0L, 2L)) == ((t2, 1e9 / t2)))
    assert(got((1L, 2L)) == ((t2, 1e9 / t2)))
    assert(got((2L, 3L)) == ((0L, -1.0)))
  }

  test("regular ring lattice: 4-regular, exact edge set") {
    val g = graft.synth.Generators.regularRingLattice(spark, 20L, 4)
    assert(g.n == 20 && g.m == 40)
    val degs = g.bidirected.groupBy("src").count().select("count")
      .distinct().collect().map(_.getLong(0)).toSet
    assert(degs == Set(4L))
    val edges = g.edges.select("src", "dst").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(edges.contains((0L, 1L)) && edges.contains((0L, 2L)) &&
      edges.contains((19L, 0L)) && edges.contains((19L, 1L)))
  }

  test("neighborhood function heuristic: path graph exact pair counts") {
    // Path 0..9, sources id%5==0 -> {0,5}: pairs at dist<=1: 0->{1}, 5->{4,6} = 3;
    // dist<=2: 0->{1,2}, 5->{3,4,6,7} = 6. nf_est = pairs * 10 // 2.
    val es = (0L until 9L).map(i => (i, i + 1, 1.0))
    val g = LinkGraph.fromEdges(spark, TestSpark.directed(es))
    val got = Distances.neighborhoodFunctionHeuristic(spark, g, maxHops = 2, mod = 5L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 3L, 15L), (2L, 6L, 30L)))
  }

  test("DynBFS warm repair equals cold BFS on the updated graph; affected nodes") {
    // Path 0-1-2-3-4-5; insert (0,4): distances of 4,5 improve.
    val es = (0L until 5L).map(i => (i, i + 1, 1.0))
    val g = LinkGraph.fromEdges(spark, TestSpark.directed(es))
    val prev = Distances.bfsHops(spark, g, 0L)
    import spark.implicits._
    val added = Seq((0L, 4L)).toDF("src", "dst")
    val warm = Distances.bfsHopsWarm(spark, g, prev, added)
    val g2 = LinkGraph.fromEdges(spark, TestSpark.directed(es :+ (0L, 4L, 1.0)))
    val cold = Distances.bfsHops(spark, g2, 0L)
    val wm = warm.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cm = cold.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(wm == cm)
    // Insert (0,4): dist(4) 4->1, dist(5) 5->2, and dist(3) 3->2 through node 4.
    val aff = Distances.affectedNodes(prev, warm)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(aff == Set(3L, 4L, 5L))
  }

  test("DynBFS warm repair connects a previously unreachable node") {
    val es = Seq((0L, 1L, 1.0), (3L, 4L, 1.0))
    val g = LinkGraph.fromEdges(spark, TestSpark.directed(es))
    val prev = Distances.bfsHops(spark, g, 0L)
    import spark.implicits._
    val warm = Distances.bfsHopsWarm(spark, g, prev, Seq((1L, 3L)).toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(warm == Map(0L -> 0L, 1L -> 1L, 3L -> 2L, 4L -> 3L))
  }

  test("all simple paths: diamond with direct edge, cutoff-bounded") {
    val es = Seq((0L, 1L), (0L, 2L), (1L, 3L), (2L, 3L), (0L, 3L), (3L, 4L))
      .map { case (a, b) => (a, b, 1.0) }
    val g = LinkGraph.fromEdges(spark, TestSpark.directed(es))
    val got2 = Distances.allSimplePaths(spark, g, 0L, 3L, cutoff = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got2 == Set(("0->3", 1L), ("0->1->3", 2L), ("0->2->3", 2L)))
    val got1 = Distances.allSimplePaths(spark, g, 0L, 3L, cutoff = 1)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got1 == Set(("0->3", 1L)))
  }

  test("top-k harmonic closeness matches brute force on karate") {
    val g = LinkGraph.fromEdges(spark,
      TestSpark.directed(Fixtures.karateEdges.map(e => (e._1, e._2, 1.0))))
    val S = 1000000000000L
    // Brute force: all-pairs BFS via per-source bfsHops is slow; use msBfs over all.
    val (state, _) = graft.algo.Betweenness.msBfs(spark, g, g.vertices)
    val brute = state.filter(col("dist") > 0)
      .groupBy("s").agg(sum(expr(s"$S div dist")).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (id, h) => (-h, id) }.take(5)
    val got = graft.algo.TopCloseness.harmonic(spark, g, k = 5, batch = 8)
      .select("id", "h_scaled").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == brute.toSeq)
  }

  test("mocnik generator: grid-doubling NN + ring join equals brute force") {
    val (n, k, seed) = (300L, 3, 42L)
    // Scala replay of the arithmetic spec (GraphSpec lcg / Generators.drawSql).
    def lcg(x: Long): Long = {
      val (a, c, m) = (1103515245L, 12345L, 2147483648L)
      (a * ((a * (((x % m) + m) % m) + c) % m) + c) % m
    }
    def draw(x: Long): Long = ((lcg(x) * lcg(x + 1000003)) / 65536) % 2147483648L
    val Q = 1L << 20; val H = Q / 2
    val pts = (0L until 2 * n).iterator
      .map(c => ((draw(c * 2 + seed * 50021) / 128) % Q, (draw(c * 2 + 1 + seed * 50021) / 128) % Q))
      .filter { case (x, y) => (x - H) * (x - H) + (y - H) * (y - H) < H * H }
      .take(n.toInt).toArray
    def d2(i: Int, j: Int): Long = {
      val dx = pts(i)._1 - pts(j)._1; val dy = pts(i)._2 - pts(j)._2
      dx * dx + dy * dy
    }
    val expected = (for {
      i <- pts.indices
      dmin = pts.indices.filter(_ != i).map(d2(i, _)).min
      j <- pts.indices if j != i && d2(i, j) <= k.toLong * k * dmin
    } yield (i.toLong, j.toLong)).toSet
    val got = graft.synth.Generators.mocnik(spark, n, k, seed)
      .edges.select("src", "dst").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected)
    assert(pts.indices.forall(i => got.exists(_._1 == i)), "every node keeps its NN edge")
  }

  test("hop plot: monotone, ends at 1.0, matches nf ratio") {
    val g = LinkGraph.fromEdges(spark,
      TestSpark.directed(Fixtures.karateEdges.map(e => (e._1, e._2, 1.0))))
    val rows = Anf.hopPlot(spark, g, maxHops = 8)
      .orderBy("hop").collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.length == 8)
    assert(rows.last._3 == 1.0)
    assert(rows.sliding(2).forall { case Array(a, b) => a._3 <= b._3 + 1e-12 })
    val den = rows.last._2.toDouble
    rows.foreach { case (_, nf, f) => assert(math.abs(f - nf / den) < 1e-12) }
  }
}
