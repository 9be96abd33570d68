package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.algo.{Distances, Matching, PathSampling}
import graft.model.LinkGraph

/** Round-4 additions: exact EffectiveDiameter, PathGrowingMatcher pointer-forest
  * twin, adaptive ApproxBetweenness sample bound. */
class Round16Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def graphOf(edges: Seq[(Long, Long, Double)], n: Long): LinkGraph =
    LinkGraph.fromEdges(spark, TestSpark.directed(edges),
      Some(spark.range(n).select(col("id"))))

  // --- exact EffectiveDiameter (distance/EffectiveDiameter.cpp) ---

  test("effectiveDiameterExact: path graph hop CDF") {
    // Path 0-1-2-3-4, ratio .9 -> threshold ceil(4.5)=5 (all nodes).
    // finish hops = ecc: 4,3,2,3,4 -> sum 16, eff 3.2.
    val g = graphOf(Seq((0L, 1L, 1.0), (1L, 2L, 1.0), (2L, 3L, 1.0), (3L, 4L, 1.0)), 5L)
    val r = Distances.effectiveDiameterExact(spark, g, ratio = 0.9).head()
    assert(r.getLong(0) == 5L)
    assert(r.getLong(1) == 16L)
    assert(math.abs(r.getDouble(2) - 3.2) < 1e-12)
  }

  test("effectiveDiameterExact: star finishes center at 1, leaves at 2; h floors at 1") {
    val star = graphOf((1L to 4L).map(i => (0L, i, 1.0)), 5L)
    val r = Distances.effectiveDiameterExact(spark, star, ratio = 0.9).head()
    assert(r.getLong(1) == 1L + 4L * 2L) // center 1 + four leaves at 2
    // ratio tiny -> threshold 1 is met at hop 0, but the reference's h starts at 1.
    val r2 = Distances.effectiveDiameterExact(spark, star, ratio = 0.01).head()
    assert(r2.getLong(1) == 5L && math.abs(r2.getDouble(2) - 1.0) < 1e-12)
  }

  // --- PathGrowingMatcher twin ---

  test("pathGrowingMatching: hand-traced pointer forest on a weighted path") {
    // Path 0-1-2-3-4-5; synthetic w = 1+(src+dst)%5 = 2,4,1,3,5.
    // Mutual pairs (1,2) and (4,5); edges (0,1) and (3,4) lose acceptance.
    val g = graphOf(Seq((0L, 1L, 1.0), (1L, 2L, 1.0), (2L, 3L, 1.0),
      (3L, 4L, 1.0), (4L, 5L, 1.0)), 6L)
    val m = Matching.pathGrowingMatching(spark, g)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(m == Set((1L, 2L, 4L), (4L, 5L, 5L)), m.toString)
    assert(Matching.isProper(g, Matching.pathGrowingMatching(spark, g)))
  }

  test("pathGrowingMatching: equal-weight path exercises doubling + parity pick") {
    // Path 0-5-10-15-20, all w = 1 (sums ≡ 0 mod 5). Mutual (0,5); 10 becomes a
    // head anchor; its arm 10-15-20 2-colors to {(15,20)} (tie -> even parity).
    val g = graphOf(Seq((0L, 5L, 1.0), (5L, 10L, 1.0), (10L, 15L, 1.0),
      (15L, 20L, 1.0)), 21L)
    val m = Matching.pathGrowingMatching(spark, g)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(m == Set((0L, 5L), (15L, 20L)), m.toString)
  }

  test("pathGrowingMatching: proper and deterministic on a denser graph") {
    // 12-node circulant: i -> i+1, i -> i+3 (mod 12).
    val edges = (0L until 12L).flatMap(i =>
      Seq((i, (i + 1) % 12, 1.0), (i, (i + 3) % 12, 1.0)))
      .map { case (a, b, w) => (math.min(a, b), math.max(a, b), w) }.distinct
    val g = graphOf(edges, 12L)
    val m1 = Matching.pathGrowingMatching(spark, g)
    val m2 = Matching.pathGrowingMatching(spark, g)
    assert(m1.collect().toSet == m2.collect().toSet)
    assert(Matching.isProper(g, m1))
    assert(m1.count() > 0)
  }

  // --- DFSfrom (driver-side fixture-scale twin) ---

  test("dfsFrom: lexicographic preorder on a hand-checked graph") {
    // 0-1, 0-4, 1-2, 1-3, 4-5: smallest-neighbor-first DFS from 0 visits
    // 0,1,2,3,4,5 in that order (backtracks 2->1->3, then 0->4->5).
    val g = graphOf(Seq((0L, 1L, 1.0), (0L, 4L, 1.0), (1L, 2L, 1.0),
      (1L, 3L, 1.0), (4L, 5L, 1.0)), 6L)
    val ord = Distances.dfsFrom(spark, g, 0L)
      .orderBy("ord").collect().map(_.getLong(0)).toSeq
    assert(ord == Seq(0L, 1L, 2L, 3L, 4L, 5L), ord.toString)
  }

  test("dfsFrom: reaches exactly the component; preorder parent property") {
    val g = graphOf(Seq((0L, 1L, 1.0), (1L, 2L, 1.0), (3L, 4L, 1.0)), 5L)
    val rows = Distances.dfsFrom(spark, g, 0L).collect()
    assert(rows.map(_.getLong(0)).toSet == Set(0L, 1L, 2L))
    // Independent recursive oracle on the same adjacency.
    def rec(adj: Map[Long, Seq[Long]], u: Long,
            seen: scala.collection.mutable.LinkedHashSet[Long]): Unit = {
      seen += u
      adj.getOrElse(u, Nil).sorted.foreach(v => if (!seen(v)) rec(adj, v, seen))
    }
    val g2 = graphOf(Seq((0L, 2L, 1.0), (0L, 3L, 1.0), (2L, 3L, 1.0),
      (3L, 1L, 1.0), (1L, 2L, 1.0)), 4L)
    val adj = g2.canonicalUndirected.select("src", "dst").collect()
      .flatMap(r => Seq(r.getLong(0) -> r.getLong(1), r.getLong(1) -> r.getLong(0)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSeq }
    val seen = scala.collection.mutable.LinkedHashSet.empty[Long]
    rec(adj, 0L, seen)
    val got = Distances.dfsFrom(spark, g2, 0L).orderBy("ord")
      .collect().map(_.getLong(0)).toSeq
    assert(got == seen.toSeq, s"got=$got want=${seen.toSeq}")
  }

  // --- exact-LFR generator ---

  test("lfrExact: degree-exact within slack, mu mixing, deterministic") {
    val s = spark
    val (g, planted) = graft.synth.Generators.lfrExact(s, n = 800L,
      minDeg = 4L, maxDeg = 40L, minCommunity = 60L, maxCommunity = 200L,
      muNum = 1L, muDen = 4L)
    val nodes = graft.synth.Generators.lfrExactNodes(s, 800L, 4L, 40L, 60L, 200L, 1L, 4L)
    val target = nodes.agg(sum("deg")).head().getLong(0)
    val targetInt = nodes.agg(sum("intdeg")).head().getLong(0)
    // Realized degree sum within the documented stub-matching slack (self/dup drops).
    assert(2L * g.m >= (0.9 * target).toLong, s"2m=${2 * g.m} target=$target")
    // Mixing: intra-community edge endpoints fraction ~ 1 - mu = 0.75.
    val withBlocks = g.canonicalUndirected
      .join(planted.select(col("id").as("src"), col("block").as("bs")), "src")
      .join(planted.select(col("id").as("dst"), col("block").as("bd")), "dst")
    val intra = withBlocks.filter(col("bs") === col("bd")).count()
    val frac = intra.toDouble / g.m
    val expected = targetInt.toDouble / target
    info(s"lfr intra fraction = $frac (target $expected)")
    assert(math.abs(frac - expected) < 0.08, s"frac=$frac expected=$expected")
    // Per-node realized degree never exceeds the target degree.
    val degs = g.canonicalUndirected.select(col("src").as("id"))
      .union(g.canonicalUndirected.select(col("dst").as("id")))
      .groupBy("id").agg(count(lit(1)).as("d"))
      .join(nodes, "id").filter(col("d") > col("deg")).count()
    assert(degs == 0L, s"$degs nodes exceed their target degree")
    // Deterministic.
    val (g2, _) = graft.synth.Generators.lfrExact(s, 800L, 4L, 40L, 60L, 200L, 1L, 4L)
    assert(g.m == g2.m)
  }

  test("lfrExact: PLM recovers the planted communities (NMI gate)") {
    val (g, planted) = graft.synth.Generators.lfrExact(spark, n = 600L,
      minDeg = 6L, maxDeg = 30L, minCommunity = 80L, maxCommunity = 200L,
      muNum = 1L, muDen = 8L)
    val nmi = graft.algo.Measures.nmi(spark,
      graft.algo.PLM.run(spark, g).labels, planted.withColumnRenamed("block", "label"))
      .head().getAs[Double]("nmi")
    info(s"lfrExact PLM nmi = $nmi")
    // Same gate as the lfrLike planted-recovery test (PlantedRecoverySpec): the
    // harmonic size clamp makes most communities minCommunity-sized, so PLM merges
    // a few of the small blocks — NMI lands ~0.65 at these parameters.
    assert(nmi >= 0.6, s"nmi=$nmi")
  }

  // --- adaptive ApproxBetweenness ---

  test("approxBetweennessAdaptive: vd<=2 early-out is all zeros") {
    val g = graphOf(Seq((0L, 1L, 1.0)), 2L)
    val r = PathSampling.approxBetweennessAdaptive(spark, g).collect()
    assert(r.forall(row => row.getLong(1) == 0L && row.getDouble(2) == 0.0))
  }

  test("approxBetweennessAdaptive: RK sample count on a 7-path; interior mass only") {
    // Path 0..6: two-sweep lb=6, vd=7, floor(log2(5))=2,
    // r = ceil(25*(2+1+2.302585092994046)) = 133.
    val g = graphOf((0L until 6L).map(i => (i, i + 1, 1.0)), 7L)
    val rows = PathSampling.approxBetweennessAdaptive(spark, g)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val byId = rows.map(t => t._1 -> t).toMap
    // endpoints of every sampled path are excluded -> bc_est = cnt/133 exactly
    rows.foreach { case (_, cnt, est) =>
      assert(math.abs(est - cnt.toDouble / 133) < 1e-15) }
    // middle of the path dominates
    assert(byId(3L)._2 >= byId(1L)._2 && byId(3L)._2 >= byId(5L)._2)
    // deterministic
    val again = PathSampling.approxBetweennessAdaptive(spark, g)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(again == rows.toSet)
  }
}
