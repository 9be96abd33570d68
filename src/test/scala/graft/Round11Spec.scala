package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.algo.{Distances, Epidemic, Measures, Scd}
import graft.model.LinkGraph
import graft.streaming.GraphEvents

/** Round-11 operators: partition-similarity tail (Jaccard / graph-structural Rand /
  * intersection), cover hub dominance, graph difference, SEIR, approx closeness, GCE. */
class Round11Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // Two triangles bridged by one edge: {0,1,2} + {3,4,5} + (2,3).
  private def twoTriangles: LinkGraph = {
    val es = Seq((0L, 1L), (0L, 2L), (1L, 2L), (3L, 4L), (3L, 5L), (4L, 5L), (2L, 3L))
      .map { case (a, b) => (a, b, 1.0) }
    LinkGraph.fromEdges(spark, TestSpark.directed(es))
  }

  test("jaccard measure: identical partitions dissimilarity 0; vs singletons") {
    val a = Seq((0L, 0L), (1L, 0L), (2L, 1L), (3L, 1L)).toDF("id", "label")
    val same = Measures.jaccardMeasure(spark, a, a).head()
    assert(same.getAs[Double]("jaccard") == 0.0)
    // vs all-singletons: s_both=0, s_a=2, s_b=0 -> divisor 2*(2+0-0)=4, jaccard=1.
    val singles = Seq((0L, 0L), (1L, 1L), (2L, 2L), (3L, 3L)).toDF("id", "label")
    val diss = Measures.jaccardMeasure(spark, a, singles).head()
    assert(diss.getAs[Double]("jaccard") == 1.0)
    // both singletons: divisor 0 -> defined 0.
    val both = Measures.jaccardMeasure(spark, singles, singles).head()
    assert(both.getAs[Double]("jaccard") == 0.0)
  }

  test("graph-structural rand: hand-computed on the bridged triangles") {
    val g = twoTriangles
    val byTri = Seq((0L, 0L), (1L, 0L), (2L, 0L), (3L, 1L), (4L, 1L), (5L, 1L))
      .toDF("id", "label")
    val one = Seq.tabulate(6)(i => (i.toLong, 0L)).toDF("id", "label")
    // a = byTri vs b = one: e11 = 6 intra-triangle edges (agree in both), e00 = 0
    // (b never separates), bridge edge: a disagrees, b agrees -> neither.
    val r = Measures.graphStructuralRand(spark, g, byTri, one).head()
    assert(r.getAs[Long]("m") == 7L && r.getAs[Long]("e11") == 6L
      && r.getAs[Long]("e00") == 0L)
    assert(math.abs(r.getAs[Double]("rand_g") - (1.0 - 6.0 / 7.0)) < 1e-12)
    // identical partitions: e11 + e00 = m -> dissimilarity 0.
    val self = Measures.graphStructuralRand(spark, g, byTri, byTri).head()
    assert(self.getAs[Double]("rand_g") == 0.0)
  }

  test("partition intersection: dense pair ranks in (la, lb) order") {
    val a = Seq((0L, 0L), (1L, 0L), (2L, 5L), (3L, 5L)).toDF("id", "label")
    val b = Seq((0L, 9L), (1L, 2L), (2L, 2L), (3L, 2L)).toDF("id", "label")
    // pairs: 0->(0,9), 1->(0,2), 2->(5,2), 3->(5,2); order (0,2)<(0,9)<(5,2).
    val got = Measures.partitionIntersection(spark, a, b)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 1L, 1L -> 0L, 2L -> 2L, 3L -> 2L))
  }

  test("cover hub dominance on an overlapping cover of the bridged triangles") {
    val g = twoTriangles
    // cluster 0 = {0,1,2,3} (triangle + bridge end), cluster 1 = {3,4,5}; 3 overlaps.
    val cover = Seq((0L, 0L), (1L, 0L), (2L, 0L), (3L, 0L), (3L, 1L), (4L, 1L), (5L, 1L))
      .toDF("id", "label")
    val got = Measures.coverHubDominance(spark, g, cover)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // cluster 0: sizes 4; internal degs: 0:2, 1:2, 2:3 (0,1,3), 3:1 -> max 3, dom 1.
    assert(got(0L) == ((4L, 3L, 1.0)))
    // cluster 1: size 3; internal degs 3:2, 4:2, 5:2 -> dom 1.
    assert(got(1L) == ((3L, 2L, 1.0)))
  }

  test("graph difference: edit script replays onto e1 to give e2") {
    val e1 = Seq((0L, 1L, 1.0), (1L, 2L, 2.0), (2L, 3L, 1.0)).toDF("src", "dst", "weight")
    val e2 = Seq((0L, 1L, 1.0), (1L, 2L, 5.0), (4L, 5L, 1.0)).toDF("src", "dst", "weight")
    val diff = GraphEvents.graphDifference(e1, e2)
    val byType = diff.collect().groupBy(_.getString(0))
    assert(byType("re").map(r => (r.getLong(1), r.getLong(2))).toSet == Set((2L, 3L)))
    assert(byType("ae").map(r => (r.getLong(1), r.getLong(2))).toSet == Set((4L, 5L)))
    assert(byType("ce").map(r => (r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
      == Set((1L, 2L, 5.0)))
    // Replay: applyBatch(e1, diff) == e2 exactly.
    val replayed = GraphEvents.applyBatch(e1, diff)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val want = e2.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(replayed == want)
  }

  test("seir census invariants on the sf0.001 graph") {
    val g = LinkGraph.forSf(spark, "/root/testdata/sf0.001")
    val rows = Epidemic.seir(spark, g, tMax = 6, transP = 0.5, eTime = 1, iTime = 2,
      zero = 0L).orderBy("t").collect()
    assert(rows.length == 7)
    val n = g.n
    rows.foreach { r =>
      assert(r.getLong(1) + r.getLong(2) + r.getLong(3) + r.getLong(4) == n)
    }
    // S never increases, R never decreases, t=0 census is (n-1, 0, 1, 0).
    assert(rows.head.getLong(1) == n - 1 && rows.head.getLong(3) == 1L)
    rows.sliding(2).foreach { case Array(p, c) =>
      assert(c.getLong(1) <= p.getLong(1) && c.getLong(4) >= p.getLong(4))
    }
    // With transP=0.5 on a connected hub graph the infection must actually spread.
    assert(rows.last.getLong(1) < n - 1)
  }

  test("approx closeness equals exact closeness with a full sample") {
    // Path 0-1-2-3: closeness(0) = 3/(1+2+3) = 1/2 etc.; mod=1 samples every node,
    // so the EW estimate k(n-1)/(n*sum) = (n-1)/sum is EXACT closeness.
    val es = Seq((0L, 1L), (1L, 2L), (2L, 3L)).map { case (a, b) => (a, b, 1.0) }
    val g = LinkGraph.fromEdges(spark, TestSpark.directed(es))
    val got = Distances.approxCloseness(spark, g, mod = 1L)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(math.abs(got(0L) - 3.0 / 6.0) < 1e-12)
    assert(math.abs(got(1L) - 3.0 / 4.0) < 1e-12)
    assert(math.abs(got(2L) - 3.0 / 4.0) < 1e-12)
    assert(math.abs(got(3L) - 3.0 / 6.0) < 1e-12)
  }

  test("gce absorbs its component and stops at the ext=0 boundary") {
    // 5-clique {0..4} plus a DISJOINT edge (5,6): expansion from 0 must add exactly
    // the clique (ids ascending per the M'-then-id order) and stop when ext hits 0,
    // well before the maxSteps budget.
    val clique = for (i <- 0 to 4; j <- (i + 1) to 4) yield (i.toLong, j.toLong)
    val g = LinkGraph.fromEdges(spark,
      TestSpark.directed((clique ++ Seq((5L, 6L))).map { case (a, b) => (a, b, 1.0) }))
    val rows = Scd.gce(spark, g, seed = 0L, maxSteps = 8)
      .orderBy("ord").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.toSeq == Seq((0L, 0L), (1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L)))
  }

  test("randomMsf equals sequential Kruskal under the same total edge order") {
    val g = LinkGraph.forSf(spark, "/root/testdata/sf0.001")
    val seed = 42L
    import graft.synth.GraphSpec.{A, C, M}
    def lcg(x: Long): Long = (A * ((A * (x % M) + C) % M) + C) % M
    def draw(src: Long, dst: Long): Long = {
      val x = src * 1000003L + dst * 97L + seed
      ((lcg(x) * lcg(x + 1000003L)) / 65536L) % M
    }
    // Brute maximum-spanning-forest: Kruskal over (draw, src, dst) descending.
    val edges = g.canonicalUndirected.select("src", "dst").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      parent(x) = r; r
    }
    val acc = Set.newBuilder[(Long, Long, Long)]
    for ((w, s, d) <- edges.map { case (s, d) => (draw(s, d), s, d) }
           .sortBy { case (w, s, d) => (-w, -s, -d) }) // descending total order
      if (find(s) != find(d)) { parent(find(s)) = find(d); acc += ((s, d, w)) }
    val want = acc.result()
    val got = graft.algo.Forest.randomMsf(spark, g, seed)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
  }

  test("dorogovtsevMendes equals the sequential reference loop") {
    // Sequential replay of DorogovtsevMendesGenerator.cpp: each new node t picks a
    // uniform edge (the same draw the engine chases) and links to both endpoints.
    val n = 200L
    val seed = 42L
    import graft.synth.GraphSpec.{A, C, M}
    def lcg(x: Long): Long = (A * ((A * (x % M) + C) % M) + C) % M
    def draw(x: Long): Long = ((lcg(x) * lcg(x + 1000003L)) / 65536L) % M
    val edges = scala.collection.mutable.ArrayBuffer[(Long, Long)](
      (0L, 1L), (1L, 2L), (0L, 2L))
    val out = Set.newBuilder[(Long, Long)]
    out ++= Seq((0L, 1L), (1L, 2L), (0L, 2L))
    for (t <- 3L until n) {
      val q = draw(t * 31L + seed * 1299709L) % (2L * t - 3L)
      val (a, b) = edges(q.toInt)
      edges += ((a, t)); edges += ((b, t))
      out += ((math.min(a, t), math.max(a, t))); out += ((math.min(b, t), math.max(b, t)))
    }
    val got = graft.synth.Generators.dorogovtsevMendes(spark, n, seed).edges
      .select("src", "dst").collect()
      .map(r => (math.min(r.getLong(0), r.getLong(1)), math.max(r.getLong(0), r.getLong(1))))
      .toSet
    assert(got == out.result())
  }

  test("gce prefers the denser side before a budget-capped tail") {
    // 5-clique {0..4} + path 5-6-7 via (4,5): the first 4 additions must be the
    // remaining clique members (every clique add beats any path add on M').
    val clique = for (i <- 0 to 4; j <- (i + 1) to 4) yield (i.toLong, j.toLong)
    val tail = Seq((4L, 5L), (5L, 6L), (6L, 7L))
    val g = LinkGraph.fromEdges(spark,
      TestSpark.directed((clique ++ tail).map { case (a, b) => (a, b, 1.0) }))
    val first5 = Scd.gce(spark, g, seed = 0L, maxSteps = 4)
      .collect().map(_.getLong(0)).toSet
    assert(first5 == Set(0L, 1L, 2L, 3L, 4L))
  }
}
