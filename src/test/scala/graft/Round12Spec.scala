package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.algo.{Centralities, LabelPropagation}
import graft.model.LinkGraph

/** Round-12 operators: DynKatz warm start, LPDegreeOrdered bucketed sweeps. */
class Round12Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("dynKatz: warm restart after an edge batch converges in far fewer iterations") {
    val g = LinkGraph.forSf(spark, "/root/testdata/sf0.001")
    // alpha sized so the affine map contracts SLOWLY (rate ~ alpha*lambda_max):
    // a cold start then needs many iterations and the warm advantage is structural,
    // not an artifact of a fast-converging operator.
    val (cold, _, coldIters) =
      Centralities.katzCore(spark, g, alpha = 0.01, beta = 0.1, tol = 1e-12,
        maxIter = 500, warmStart = None)
    val coldMat = cold.persist(); coldMat.count()
    // Insert a deterministic star batch (0 -> id % 211 == 7) and re-solve.
    val added = g.vertices.filter(col("id") % 211 === 7 && col("id") =!= 0L)
      .select(lit(0L).as("src"), col("id").as("dst"), lit(1.0).as("weight"))
    val g2 = LinkGraph.fromEdges(spark, g.edges.unionByName(added)
      .groupBy("src", "dst").agg(max("weight").as("weight")),
      Some(g.vertices))
    val (coldNew, lenCold, coldNewIters) =
      Centralities.katzCore(spark, g2, 0.01, 0.1, 1e-12, 500, None)
    val (warm, lenWarm, warmIters) =
      Centralities.katzCore(spark, g2, 0.01, 0.1, 1e-12, 500, Some(coldMat))
    // The saving is log_r(dist_cold / dist_warm) iterations (r = contraction rate):
    // warm starts at the OLD fixed point, distance ∝ the edge-delta's perturbation,
    // orders of magnitude closer than the cold all-ones start — but both shrink at
    // the same rate r, so the advantage is a constant iteration offset, not a ratio.
    assert(warmIters < coldNewIters,
      s"warm=$warmIters should beat cold=$coldNewIters")
    assert(warmIters <= coldNewIters - 2)
    // Both converge to the same fixed point (normalized, within tolerance slack).
    val diff = coldNew.select(col("id"), (col("score") / lenCold).as("a"))
      .join(warm.select(col("id"), (col("score") / lenWarm).as("b")), "id")
      .agg(max(abs(col("a") - col("b")))).head().getDouble(0)
    assert(diff < 1e-6, s"max normalized score diff $diff")
    assert(coldIters > 2) // the cold baseline actually iterated
    coldMat.unpersist()
  }

  test("dynBetweenness: warm insert equals cold recompute; only touched sources re-swept") {
    import graft.algo.Betweenness
    // Two disjoint paths: 0-1-2-3 and 10-11-12-13. Insert shortcut (1,3): source 0
    // is affected (dist 1 vs 3), source 10 sees both endpoints unreachable -> skip.
    val es = Seq((0L, 1L), (1L, 2L), (2L, 3L), (10L, 11L), (11L, 12L), (12L, 13L))
      .map { case (a, b) => (a, b, 1.0) }
    val g = LinkGraph.fromEdges(spark, TestSpark.directed(es))
    val added = Seq((1L, 3L, 1.0)).toDF("src", "dst", "weight")
    val gNew = LinkGraph.fromEdges(spark, g.edges.unionByName(added), Some(g.vertices))
    val sources = Seq(0L, 10L).toDF("id")
    val (warm, nAff) = Betweenness.warmInsertFixed(spark, g, gNew, sources,
      added.select("src", "dst"))
    assert(nAff == 1L)
    val cold = Betweenness.fixedPoint(spark, gNew, sources)
    val w = warm.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val c = cold.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(w == c)
  }

  test("dynBetweenness: sf0.001 star batch, warm == cold bit-exact") {
    import graft.algo.Betweenness
    val g = LinkGraph.forSf(spark, "/root/testdata/sf0.001")
    val added = g.vertices.filter(col("id") % 211 === 7 && col("id") =!= 0L)
      .select(lit(0L).as("src"), col("id").as("dst"), lit(1.0).as("weight"))
    val gNew = LinkGraph.fromEdges(spark, g.edges.unionByName(added)
      .groupBy("src", "dst").agg(max("weight").as("weight")), Some(g.vertices))
    val sources = g.vertices.filter(col("id") % 100 === 0)
    val (warm, nAff) = Betweenness.warmInsertFixed(spark, g, gNew, sources,
      added.select("src", "dst"))
    assert(nAff >= 1L && nAff <= sources.count())
    val cold = Betweenness.fixedPoint(spark, gNew, sources)
    val w = warm.orderBy("id").collect().map(_.getLong(1)).toSeq
    val c = cold.orderBy("id").collect().map(_.getLong(1)).toSeq
    assert(w == c)
  }

  test("globalCurveball: degree sequence preserved, graph stays simple, edges move") {
    import graft.algo.Curveball
    val g = LinkGraph.forSf(spark, "/root/testdata/sf0.001")
    val before = g.canonicalUndirected
      .select(col("src").as("s"), col("dst").as("t")).persist()
    val degBefore = before.select(col("s").as("id"))
      .union(before.select(col("t").as("id")))
      .groupBy("id").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val after = Curveball.globalCurveball(spark, g, rounds = 3).persist()
    // Simple: no self-loops, no duplicate undirected edges, same edge count.
    assert(after.filter(col("src") === col("dst")).count() == 0)
    assert(after.groupBy("src", "dst").count().filter(col("count") > 1).count() == 0)
    assert(after.count() == before.count())
    // Degree sequence preserved EXACTLY per node.
    val degAfter = after.select(col("src").as("id"))
      .union(after.select(col("dst").as("id")))
      .groupBy("id").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(degAfter == degBefore)
    // The randomization actually moved edges.
    val moved = after.select(col("src").as("s"), col("dst").as("t"))
      .exceptAll(before).count()
    assert(moved > 0, "curveball rounds should change the edge set")
    // Deterministic: same seed, same result.
    val again = Curveball.globalCurveball(spark, g, rounds = 3)
    assert(after.exceptAll(again).count() == 0 && again.exceptAll(after).count() == 0)
    before.unpersist(); after.unpersist()
  }

  test("degree-ordered LP: low-degree nodes move first (path fixture)") {
    // Path 0-1-2: degrees (1,2,1). Sub-round 0 moves the endpoints to label 1;
    // sub-round 1 then sees both neighbors of node 1 at label 1 -> consensus 1.
    // Plain synchronous PLP round 1 instead gives (1,0,1) (tie at node 1 breaks to 0),
    // so the fixture discriminates the orderings.
    val es = Seq((0L, 1L), (1L, 2L)).map { case (a, b) => (a, b, 1.0) }
    val g = LinkGraph.fromEdges(spark, TestSpark.directed(es))
    val got = LabelPropagation.degreeOrderedFixed(spark, g, sweeps = 1, buckets = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 1L, 1L -> 1L, 2L -> 1L))
    val plp = LabelPropagation.fixedRounds(spark, g, 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(plp == Map(0L -> 1L, 1L -> 0L, 2L -> 1L))
  }

  test("degree-ordered LP: isolated nodes keep their singleton label") {
    val es = Seq((0L, 1L, 1.0))
    val g = LinkGraph.fromEdges(spark, TestSpark.directed(es),
      Some(Seq(0L, 1L, 5L).toDF("id")))
    val got = LabelPropagation.degreeOrderedFixed(spark, g, sweeps = 2, buckets = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(5L) == 5L)
    // A same-bucket pair swaps labels synchronously each sweep (the standard
    // synchronous-LP 2-cycle); after an even sweep count it is back at the start.
    assert(got(0L) == 0L && got(1L) == 1L)
    val odd = LabelPropagation.degreeOrderedFixed(spark, g, sweeps = 1, buckets = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(odd(0L) == 1L && odd(1L) == 0L)
  }

  test("degree-ordered LP: deterministic across shuffle-partition settings") {
    val g = LinkGraph.forSf(spark, "/root/testdata/sf0.001")
    val a = LabelPropagation.degreeOrderedFixed(spark, g, sweeps = 2, buckets = 4)
      .orderBy("id").collect().map(_.getLong(1)).toSeq
    val b = LabelPropagation.degreeOrderedFixed(spark, g, sweeps = 2, buckets = 4)
      .orderBy("id").collect().map(_.getLong(1)).toSeq
    assert(a == b)
  }
}
