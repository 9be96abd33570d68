package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.algo.{Forest, IndependentSet, Matching}
import graft.model.LinkGraph

/** Round-8 operators: local-max matching, Luby MIS, BFS spanning forest, UMSF. */
class Round8Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def karate: LinkGraph = LinkGraph.fromEdges(spark,
    TestSpark.directed(Fixtures.karateEdges.map(e => (e._1, e._2, 1.0))))

  test("local-max matching: proper + maximal on karate; drains on a path") {
    val g = karate
    val m = Matching.localMaxMatching(spark, g, rounds = 30)
    assert(Matching.isProper(g, m), "matched pairs must be disjoint existing edges")
    assert(Matching.isMaximal(g, m), "no edge may have both endpoints unmatched")
    // Worst case for round count: a path graph matches greedily from the heavy end.
    val path = LinkGraph.fromEdges(spark,
      TestSpark.directed((0L until 19L).map(i => (i, i + 1, 1.0))))
    val pm = Matching.localMaxMatching(spark, path, rounds = 30)
    assert(Matching.isProper(path, pm) && Matching.isMaximal(path, pm))
  }

  test("local-max matching: deterministic across partition settings") {
    val g = karate
    val a = Matching.localMaxMatching(spark, g, rounds = 30)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Matching.localMaxMatching(spark,
      LinkGraph.fromEdges(spark,
        TestSpark.directed(Fixtures.karateEdges.reverse.map(e => (e._1, e._2, 1.0)))),
      rounds = 30).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b, "matching must not depend on input row order")
  }

  test("luby: independent after every prefix, maximal once drained; star keeps leaves") {
    val g = karate
    val mis = IndependentSet.lubyFixed(spark, g, rounds = 50)
    assert(IndependentSet.isIndependent(g, mis))
    assert(IndependentSet.isMaximal(g, mis), "50 rounds must drain karate")
    // A small prefix is still independent (just maybe not maximal).
    val prefix = IndependentSet.lubyFixed(spark, g, rounds = 2)
    assert(IndependentSet.isIndependent(g, prefix))
    // Star: either the center alone or all leaves — both independent+maximal; with
    // wdeg(center)=5 >> wdeg(leaf)=1 the leaves win any conflict they enter.
    val star = LinkGraph.fromEdges(spark,
      TestSpark.directed((1L to 5L).map(i => (0L, i, 1.0))))
    val sm = IndependentSet.lubyFixed(spark, star, rounds = 50)
    assert(IndependentSet.isIndependent(star, sm) && IndependentSet.isMaximal(star, sm))
  }

  test("spanning forest: n - #components tree edges, each to a closer node (karate + 2 comps)") {
    val g = karate
    val f = Forest.spanningForest(spark, g, maxLevels = 20)
    assert(f.count() == g.n - 1, "karate is connected: spanning tree has n-1 edges")
    // Root = min id (0); parents are strictly closer to the root.
    val rows = f.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(!rows.exists(_._2 == 0L), "root has no parent edge")
    val dist = rows.map(r => r._2 -> r._3).toMap + (0L -> 0L)
    rows.foreach { case (p, c, d) => assert(dist.getOrElse(p, 0L) == d - 1) }
    // Two components: forest has n - 2 edges, roots are each component's min id.
    val two = LinkGraph.fromEdges(spark, TestSpark.directed(
      Seq((0L, 1L, 1.0), (1L, 2L, 1.0), (10L, 11L, 1.0))))
    val f2 = Forest.spanningForest(spark, two, maxLevels = 20)
    assert(f2.count() == two.n - 2)
    assert(!f2.select("dst").collect().map(_.getLong(0)).toSet.exists(Set(0L, 10L)))
  }

  test("umsf: converged path equals brute Kruskal union on a weighted fixture") {
    // Two triangles (att 2: each edge closes 1 triangle) joined by a bridge (att 1):
    // triangle edges all tie at the top level -> all in UMSF; the bridge connects two
    // components not connected by heavier edges -> in UMSF.
    val g = LinkGraph.fromEdges(spark, TestSpark.directed(Seq(
      (0L, 1L, 1.0), (1L, 2L, 1.0), (0L, 2L, 1.0),
      (3L, 4L, 1.0), (4L, 5L, 1.0), (3L, 5L, 1.0),
      (2L, 3L, 1.0))))
    val u = Forest.umsfTriangle(spark, g, levelCap = 8, roundsPerLevel = 0)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(3))).toMap
    assert(u.size == 7 && u.values.forall(_ == 1L),
      s"every edge here is in some maximum spanning forest: $u")
    // A true exclusion: (0,1) and (1,2) each close TWO triangles (att 3) while (0,2)
    // closes one (att 2) — 0 and 2 are connected by strictly heavier edges alone, so
    // (0,2) is in NO maximum spanning forest.
    val g2 = LinkGraph.fromEdges(spark, TestSpark.directed(Seq(
      (0L, 1L, 1.0), (1L, 2L, 1.0), (0L, 2L, 1.0),
      (0L, 4L, 1.0), (1L, 4L, 1.0), (1L, 5L, 1.0), (2L, 5L, 1.0))))
    val u2 = Forest.umsfTriangle(spark, g2, levelCap = 8, roundsPerLevel = 0)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(3))).toMap
    assert(u2((0L, 2L)) == 0L,
      s"(0,2) is shadowed by the strictly heavier path 0-1-2: $u2")
    assert(u2.filterKeys(_ != (0L, 2L)).values.forall(_ == 1L), s"all others in: $u2")
  }

  test("ivf topk: deterministic, valid ranks, decent recall vs brute force") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val brute = graft.emb.Embeddings.bruteTopK(emb).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivf = graft.emb.Embeddings.ivfTopK(emb).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall >= 0.5, s"4/16-probe IVF recall vs brute force too low: $recall")
    val again = graft.emb.Embeddings.ivfTopK(emb).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(ivf == again, "ivf must be deterministic")
    // Every query returns exactly k rows with ranks 1..k (lists are never empty at
    // this corpus/queries ratio).
    val byQ = graft.emb.Embeddings.ivfTopK(emb).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).sorted.toSeq)
    byQ.foreach { case (q, rs) => assert(rs == (1L to 5L), s"query $q ranks $rs") }
  }

  test("dynamic BA event stream folds back to the static graph; prefixes are valid") {
    import graft.streaming.DynamicGenerators
    val g = graft.synth.Generators.barabasiAlbert(spark, k = 3, n = 200, seed = 7)
    val ev = DynamicGenerators.dynamicBarabasiAlbert(spark, k = 3, n = 200, seed = 7)
    // Full replay == the static edge set.
    val folded = DynamicGenerators.prefixEdges(ev, Long.MaxValue)
      .select("src", "dst").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val static0 = g.edges.select("src", "dst")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(folded == static0, "replaying all events must rebuild the generator's graph")
    // A prefix only contains edges among already-arrived nodes, and grows monotonically.
    val half = DynamicGenerators.prefixEdges(ev, 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(half.subsetOf(static0) && half.nonEmpty && half.size < static0.size)
    val arrived = ev.filter(col("etype") === "an" && col("t") <= 100)
      .select("u").collect().map(_.getLong(0)).toSet
    assert(half.forall { case (s, d) => arrived(s) && arrived(d) },
      "prefix edges must touch only arrived nodes")
  }

  test("bpe pre-tokenizer: letter runs, digit runs, single punctuation") {
    import spark.implicits._
    val rows = Seq("https://example.org/p00001234").toDF("url")
    val toks = graft.text.TextOps.bpeTokenFreq(rows, "url")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(toks == Map("https" -> 1L, ":" -> 1L, "/" -> 3L, "example" -> 1L,
      "." -> 1L, "org" -> 1L, "p" -> 1L, "00001234" -> 1L), s"got $toks")
  }

  test("umsf: fixed-round twin schedule equals converged labels at sf0.001") {
    val g = LinkGraph.forSf(spark, "/root/testdata/sf0.001")
    val fixed = Forest.umsfTriangle(spark, g, levelCap = 6, roundsPerLevel = 16)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(3))).toMap
    val conv = Forest.umsfTriangle(spark, g, levelCap = 6, roundsPerLevel = 0)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(3))).toMap
    val diff = fixed.keySet.filter(k => fixed(k) != conv(k))
    assert(fixed == conv, s"16 doubling rounds/level must converge at this scale; ${diff.size} differ: ${diff.take(5)}")
  }
}
