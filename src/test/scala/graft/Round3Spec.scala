package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.algo.{Centralities, Distances, EdgeScores}
import graft.io.GraphReaders
import graft.model.LinkGraph
import graft.synth.Generators

/** Round-3 operators: Watts–Strogatz generator, SNAP/DOT writers, sfigality,
  * LocalDegreeScore, sampled APSP. */
class Round3Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def karate: LinkGraph = LinkGraph.fromEdges(spark,
    TestSpark.directed(Fixtures.karateEdges.map(e => (e._1, e._2, 1.0))))

  test("watts-strogatz: beta=0 is the exact ring lattice; beta=0.5 rewires") {
    val g0 = Generators.wattsStrogatz(spark, n = 100, k = 4, beta = 0.0, seed = 1)
    assert(g0.n == 100 && g0.m == 200) // n*k/2 lattice edges, none dropped
    val degs = g0.bidirected.groupBy("src").count().select("count")
      .distinct().collect().map(_.getLong(0)).toSet
    assert(degs == Set(4L), s"lattice must be 4-regular, got $degs")
    val g5 = Generators.wattsStrogatz(spark, n = 100, k = 4, beta = 0.5, seed = 1)
    // Rewired: not regular any more, deterministic, and most edges survive the dedup.
    val degs5 = g5.bidirected.groupBy("src").count().select("count")
      .distinct().collect().map(_.getLong(0)).toSet
    assert(degs5.size > 1, "beta=0.5 must break regularity")
    assert(g5.m > 150 && g5.m <= 200)
    assert(Generators.wattsStrogatz(spark, 100, 4, 0.5, seed = 1).m == g5.m)
  }

  test("snap writer/reader roundtrip; dot writer emits a valid graph block") {
    val g = karate
    val dir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/root/repo/target"), "io3")
    GraphReaders.writeSnap(g, s"$dir/snap")
    val back = GraphReaders.readSnap(spark, s"$dir/snap")
    assert(back.canonicalUndirected.select("src", "dst").collect().map(r =>
      (r.getLong(0), r.getLong(1))).toSet ==
      g.canonicalUndirected.select("src", "dst").collect().map(r =>
        (r.getLong(0), r.getLong(1))).toSet)
    GraphReaders.writeDot(g, s"$dir/dot")
    val lines = spark.read.text(s"$dir/dot").collect().map(_.getString(0))
    assert(lines.head == "graph G {" && lines.last == "}")
    assert(lines.count(_.contains(" -- ")) == g.canonicalUndirected.count())
  }

  test("sfigality: star center 0, leaves 1; karate values in [0,1]") {
    val star = LinkGraph.fromEdges(spark,
      TestSpark.directed((1L to 5L).map(i => (0L, i, 1.0))))
    val sf = Centralities.sfigality(spark, star).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(sf(0L) == 0.0)
    (1L to 5L).foreach(i => assert(sf(i) == 1.0))
    val ks = Centralities.sfigality(spark, karate)
      .select("sfigality").collect().map(_.getDouble(0))
    assert(ks.forall(v => v >= 0.0 && v <= 1.0))
  }

  test("local degree score: 1 for degree-1 endpoints, in (0,1] generally, karate spread") {
    val scores = EdgeScores.localDegreeScore(spark, karate)
    val vals = scores.select("score").collect().map(_.getDouble(0))
    // e = 1 - ln(rank)/ln(deg) hits exactly 0 when the worst-ranked neighbor is
    // untied (rank == deg) on both endpoints.
    assert(vals.forall(v => v >= 0.0 && v <= 1.0))
    assert(vals.toSet.size > 3, "karate must produce a spread of local-degree scores")
    assert(scores.count() == karate.canonicalUndirected.count())
  }

  test("algebraic distance: deterministic; bridge edge scores above intra-clique mean") {
    // Two K5 cliques joined by one bridge (0..4) -- (5..9), bridge 4-5.
    val clique = (a: Long) => for (i <- a until a + 5; j <- i + 1 until a + 5) yield (i, j, 1.0)
    val g = LinkGraph.fromEdges(spark,
      TestSpark.directed(clique(0L) ++ clique(5L) :+ ((4L, 5L, 1.0))))
    val ad = graft.algo.AlgebraicDistance.edgeScores(spark, g, iters = 5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val ad2 = graft.algo.AlgebraicDistance.edgeScores(spark, g, iters = 5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(ad == ad2, "must be deterministic")
    val bridge = ad((4L, 5L))
    val intra = ad.view.filterKeys(_ != ((4L, 5L))).values
    assert(bridge > intra.sum / intra.size,
      s"bridge ad $bridge should exceed mean intra ad ${intra.sum / intra.size}")
  }

  test("permanence: clique member with perfect community has perm 1 - something small") {
    // Two K4 cliques + bridge 3-4. With the true partition, internal nodes have
    // c_in = 1, intra = 3, emax = 1, deg = 3 => perm = 3/(1*3) - (1-1) = 1.
    val clique = (a: Long) => for (i <- a until a + 4; j <- i + 1 until a + 4) yield (i, j, 1.0)
    val g = LinkGraph.fromEdges(spark,
      TestSpark.directed(clique(0L) ++ clique(4L) :+ ((3L, 4L, 1.0))))
    val s = spark; import s.implicits._
    val labels = (0L to 7L).map(i => (i, i / 4)).toDF("id", "label")
    val perm = graft.algo.Permanence.run(spark, g, labels).collect()
      .map(r => r.getLong(0) -> r.getDouble(5)).toMap
    assert(math.abs(perm(0L) - 1.0) < 1e-12, s"internal node perm ${perm(0L)}")
    // Bridge node 3: deg 4, intra 3, emax 1, c_in = 1 => 3/4 - 0 = 0.75.
    assert(math.abs(perm(3L) - 0.75) < 1e-12, s"bridge node perm ${perm(3L)}")
  }

  test("neighborhood function: nondecreasing in h, saturates past the diameter") {
    val nf = graft.algo.Anf.neighborhoodFunction(spark, karate, maxHops = 7)
      .orderBy("hop").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(nf.map(_._1).toSeq == (1L to 7L))
    nf.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 >= a._2, s"nf must be nondecreasing: $a -> $b") }
    assert(nf(5)._2 == nf(6)._2, "past the diameter (5) the estimate must saturate")
    // Estimate sanity: within 2x of the true n^2 = 1156 pair count at saturation.
    val est = nf.last._2.toDouble / (1L << 20)
    assert(est > 578 && est < 2312, s"saturated estimate $est vs true 1156")
  }

  test("group degree: greedy star pick — center first, gain = n") {
    // Star 0-(1..9) plus an isolated pair 10-11: greedy must take the center first
    // (gain 10), then a pair node (gain 2), then leaves (gain 0, smallest id).
    val g = LinkGraph.fromEdges(spark,
      TestSpark.directed((1L to 9L).map(i => (0L, i, 1.0)) :+ ((10L, 11L, 1.0))))
    val got = graft.algo.GroupCentrality.groupDegree(spark, g, 3)
      .orderBy("ord").collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(got(0) == ((0L, 10L)), s"first pick ${got(0)}")
    assert(got(1) == ((10L, 2L)), s"second pick ${got(1)}")
    assert(got(2) == ((1L, 0L)), s"third pick ${got(2)}")
  }

  test("dyn pagerank: warm start after an edge batch converges in fewer iterations") {
    import graft.algo.PageRank
    val g0 = karate
    val r0 = PageRank.run(spark, g0, tol = 1e-8)
    // Insert a small edge batch (the DynPageRank delta) and re-solve warm vs cold.
    val extra = TestSpark.directed(Seq((0L, 26L, 1.0), (5L, 30L, 1.0), (12L, 23L, 1.0)))
    val g1 = LinkGraph.fromEdges(spark, g0.edges.union(extra), Some(g0.vertices))
    val cold = PageRank.run(spark, g1, tol = 1e-8)
    val warm = PageRank.run(spark, g1, tol = 1e-8, warmStart = Some(r0.ranks))
    // On a 34-node graph a 3-edge delta still moves the fixpoint noticeably, so warm
    // may only tie cold at tol=1e-8; it must never be slower.
    assert(warm.iterations <= cold.iterations,
      s"warm ${warm.iterations} should not exceed cold ${cold.iterations}")
    val diff = warm.ranks.select(col("id"), col("score").as("w"))
      .join(cold.ranks.select(col("id"), col("score").as("c")), "id")
      .agg(max(abs(col("w") - col("c")))).head().getDouble(0)
    assert(diff < 1e-6, s"warm and cold fixpoints must agree, max diff $diff")
  }

  test("sampled apsp equals per-source bfsHops on karate") {
    val g = karate
    val apsp = Distances.apsp(spark, g, g.vertices.filter(col("id") % 10 === 0))
    val bySource = apsp.collect().groupBy(_.getLong(0))
    for (s0 <- bySource.keys) {
      val exp = Distances.bfsHops(spark, g, s0).filter(col("dist") >= 0)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val got = bySource(s0).map(r => r.getLong(1) -> r.getLong(2)).toMap
      assert(got == exp, s"apsp from $s0 diverges from single-source BFS")
    }
  }
}
