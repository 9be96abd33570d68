package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.algo.Cliques
import graft.model.LinkGraph

/** Round-13: distributed maximal cliques vs a sequential whole-graph Bron–Kerbosch. */
class Round13Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Sequential reference: pivot Bron–Kerbosch over the WHOLE graph. */
  private def bruteCliques(edges: Seq[(Long, Long)]): Set[List[Long]] = {
    val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val out = scala.collection.mutable.Set[List[Long]]()
    def bk(r: Set[Long], p: Set[Long], x: Set[Long]): Unit =
      if (p.isEmpty && x.isEmpty) { if (r.size >= 2) out += r.toList.sorted }
      else {
        val pivot = (p ++ x).maxBy(u => (p & adj(u)).size)
        var pp = p; var xx = x
        for (w <- (p -- adj(pivot)).toSeq.sorted) {
          bk(r + w, pp & adj(w), xx & adj(w)); pp -= w; xx += w
        }
      }
    bk(Set.empty, adj.keySet, Set.empty)
    out.toSet
  }

  private def graphOf(edges: Seq[(Long, Long)]): LinkGraph =
    LinkGraph.fromEdges(spark, TestSpark.directed(edges.map(e => (e._1, e._2, 1.0))))

  private def engineCliques(g: LinkGraph): Set[List[Long]] =
    Cliques.maximalCliques(spark, g).select("members").collect()
      .map(_.getSeq[Long](0).toList).toSet

  test("maximal cliques equal whole-graph Bron-Kerbosch on karate") {
    val got = engineCliques(graphOf(Fixtures.karateEdges))
    val want = bruteCliques(Fixtures.karateEdges)
    assert(got == want)
    // Karate's maximum clique is a 5-clique; sanity-pin the size profile.
    assert(got.map(_.size).max == 5)
  }

  test("two K4s sharing a vertex, a pendant, and a disjoint edge") {
    val k4a = for (i <- 0 to 3; j <- (i + 1) to 3) yield (i.toLong, j.toLong)
    val k4b = for (i <- 3 to 6; j <- (i + 1) to 6) yield (i.toLong, j.toLong)
    val edges = (k4a ++ k4b ++ Seq((0L, 7L), (8L, 9L))).distinct
    val got = engineCliques(graphOf(edges))
    assert(got == bruteCliques(edges))
    assert(got.contains(List(0L, 1L, 2L, 3L)) && got.contains(List(3L, 4L, 5L, 6L)))
    assert(got.contains(List(0L, 7L)) && got.contains(List(8L, 9L)))
  }

  test("pubWeb: degrees capped by maxNeigh, edges within radius, deterministic") {
    val Q = 1L << 20
    val R = Q / 64
    val g = graft.synth.Generators.pubWeb(spark, 800L, areas = 6, maxNeigh = 5)
    val edges = g.edges.select("src", "dst").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(edges.nonEmpty)
    val deg = edges.flatMap(e => Seq(e._1, e._2)).groupBy(identity).map(_._2.length)
    assert(deg.max <= 5)
    // Every edge is within the torus radius (replay the position formula).
    val pos = spark.range(800L).selectExpr("id",
        graft.synth.Generators.pubWebCoordSql(0, 6, Q, R, 42L, duck = false) + " AS x",
        graft.synth.Generators.pubWebCoordSql(1, 6, Q, R, 42L, duck = false) + " AS y")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    def d2(a: Long, b: Long): Long = {
      val dx0 = math.abs(pos(a)._1 - pos(b)._1); val dy0 = math.abs(pos(a)._2 - pos(b)._2)
      val dx = math.min(dx0, Q - dx0); val dy = math.min(dy0, Q - dy0)
      dx * dx + dy * dy
    }
    assert(edges.forall { case (a, b) => d2(a, b) <= R * R })
    val again = graft.synth.Generators.pubWeb(spark, 800L, areas = 6, maxNeigh = 5)
      .edges.select("src", "dst").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(edges.toSet == again.toSet)
  }

  test("dyn harmonic repair: affected set is local; warm equals cold (paths fixture)") {
    import graft.algo.Betweenness
    // Two disjoint paths 0-1-2-3-4 and 10-11-12: inserting (0,4) shortcuts the first
    // path EXCEPT its midpoint (d(2,0) = d(2,4) = 2 — equidistant, no distance from
    // node 2 changes); the second path sees both endpoints unreachable. Affected set
    // must be exactly {0, 1, 3, 4}.
    val es = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L))
      .map { case (a, b) => (a, b, 1.0) }
    val g = LinkGraph.fromEdges(spark, TestSpark.directed(es))
    val added = Seq((0L, 4L, 1.0)).toDF("src", "dst", "weight")
    val gNew = LinkGraph.fromEdges(spark, g.edges.unionByName(added), Some(g.vertices))
    val all = g.vertices
    val (warm, nAff) = Betweenness.closenessHarmonicWarm(spark, g, gNew, all,
      added.select("src", "dst"))
    assert(nAff == 4L) // {0,1,3,4}: the midpoint and the disjoint path are untouched
    val cold = Betweenness.closenessHarmonic(spark, gNew, all)
    def snap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(snap(warm) == snap(cold))
  }

  test("dyn harmonic repair: sf0.001 star batch, warm == cold on the sampled set") {
    import graft.algo.Betweenness
    val g = LinkGraph.forSf(spark, "/root/testdata/sf0.001")
    val added = g.vertices.filter(col("id") % 211 === 7 && col("id") =!= 0L)
      .select(lit(0L).as("src"), col("id").as("dst"), lit(1.0).as("weight"))
    val gNew = LinkGraph.fromEdges(spark, g.edges.unionByName(added)
      .groupBy("src", "dst").agg(max("weight").as("weight")), Some(g.vertices))
    val sources = g.vertices.filter(col("id") % 100 === 0)
    val (warm, nAff) = Betweenness.closenessHarmonicWarm(spark, g, gNew, sources,
      added.select("src", "dst"))
    assert(nAff >= 1L && nAff <= sources.count())
    val cold = Betweenness.closenessHarmonic(spark, gNew, sources)
    val w = warm.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val c = cold.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(w == c)
    // The dyn top-k (reference DynTopHarmonicCloseness surface) is a TakeOrdered
    // over the repaired rows — assert it against the cold ranking too.
    val topWarm = warm.orderBy(col("harmonic").desc, col("id").asc).limit(10)
      .collect().map(_.getLong(0)).toSeq
    val topCold = cold.orderBy(col("harmonic").desc, col("id").asc).limit(10)
      .collect().map(_.getLong(0)).toSeq
    assert(topWarm == topCold)
  }

  test("triangle-free graph: maximal cliques are exactly the edges") {
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L)) // 4-cycle
    val got = engineCliques(graphOf(edges))
    assert(got == edges.map { case (a, b) => List(a, b).sorted }.toSet)
  }
}
