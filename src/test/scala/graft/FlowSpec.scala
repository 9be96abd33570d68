package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.algo.Flow

/** Edmonds-Karp + CutClustering (flow/EdmondsKarp.cpp, community/CutClustering.cpp):
  * values and minimal source sides checked against an in-test sequential reference
  * (augmenting-path max-flow on driver-local adjacency) and hand-computed fixtures. */
class FlowSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Driver-local Edmonds-Karp on an undirected integer-capacity graph:
    * (value, residual-reachable source side). */
  private def seqMaxFlow(edges: Seq[(Long, Long, Long)], s: Long, t: Long): (Long, Set[Long]) = {
    val cap = scala.collection.mutable.Map[(Long, Long), Long]().withDefaultValue(0L)
    edges.foreach { case (u, v, w) => cap((u, v)) += w; cap((v, u)) += w }
    val adj = edges.flatMap { case (u, v, _) => Seq(u -> v, v -> u) }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).distinct.sorted }
    var value = 0L
    var found = true
    while (found) {
      // BFS for an augmenting path
      val pred = scala.collection.mutable.Map[Long, Long](s -> s)
      val q = scala.collection.mutable.Queue(s)
      while (q.nonEmpty && !pred.contains(t)) {
        val u = q.dequeue()
        adj.getOrElse(u, Nil).foreach { v =>
          if (!pred.contains(v) && cap((u, v)) > 0) { pred(v) = u; q.enqueue(v) }
        }
      }
      if (!pred.contains(t)) found = false
      else {
        var g = Long.MaxValue
        var c = t
        while (c != s) { g = math.min(g, cap((pred(c), c))); c = pred(c) }
        c = t
        while (c != s) { cap((pred(c), c)) -= g; cap((c, pred(c))) += g; c = pred(c) }
        value += g
      }
    }
    // residual reachability
    val seen = scala.collection.mutable.Set(s)
    val q2 = scala.collection.mutable.Queue(s)
    while (q2.nonEmpty) {
      val u = q2.dequeue()
      adj.getOrElse(u, Nil).foreach { v =>
        if (!seen.contains(v) && cap((u, v)) > 0) { seen += v; q2.enqueue(v) }
      }
    }
    (value, seen.toSet)
  }

  private def edgesDf(edges: Seq[(Long, Long, Long)]) = {
    val s = spark; import s.implicits._
    edges.toDF("u", "v", "cap")
  }

  // Two K4 cliques (0-3, 4-7) joined by one bridge 3-4; caps 4, alpha 2 (=1/2 in
  // original units): clusters must be exactly the cliques.
  private val twoCliques: Seq[(Long, Long, Long)] =
    (for (a <- 0L to 3L; b <- (a + 1) to 3L) yield (a, b, 4L)) ++
      (for (a <- 4L to 7L; b <- (a + 1) to 7L) yield (a, b, 4L)) ++
      Seq((3L, 4L, 4L))

  test("maxFlow matches a sequential Edmonds-Karp on a weighted fixture (value + minimal source side)") {
    val fx = Seq[(Long, Long, Long)](
      (0, 1, 3), (0, 2, 2), (1, 2, 1), (1, 3, 2), (2, 3, 3), (2, 4, 1), (3, 4, 4),
      (3, 5, 1), (4, 5, 2))
    val (ev, eset) = seqMaxFlow(fx, 0L, 5L)
    val r = Flow.maxFlow(spark, edgesDf(fx), 0L, 5L)
    assert(r.value == ev)
    assert(r.sourceSet.collect().map(_.getLong(0)).toSet == eset)
  }

  test("maxFlow is symmetric on undirected graphs: value(s,t) == value(t,s)") {
    val fx = twoCliques
    val a = Flow.maxFlow(spark, edgesDf(fx), 0L, 7L)
    val b = Flow.maxFlow(spark, edgesDf(fx), 7L, 0L)
    assert(a.value == b.value)
    assert(a.value == 4L) // bridge capacity bounds the flow
    assert(a.sourceSet.collect().map(_.getLong(0)).toSet == Set(0L, 1L, 2L, 3L))
  }

  test("batched runs equal independent single runs") {
    val fx = twoCliques
    val pairs = Seq((0L, 0L, 7L), (1L, 1L, 6L), (2L, 5L, 2L))
    val batched = Flow.edmondsKarpBatched(spark, edgesDf(fx), pairs)
    pairs.foreach { case (run, s, t) =>
      val (ev, eset) = seqMaxFlow(fx, s, t)
      assert(batched.values(run) == ev, s"run $run value")
      val got = batched.sourceSets.filter(col("run") === run)
        .collect().map(_.getLong(1)).toSet
      assert(got == eset, s"run $run source side")
    }
  }

  test("cutClustering recovers two cliques joined by a bridge (alpha = 1/2 via cap scaling)") {
    val part = Flow.cutClustering(spark, edgesDf(twoCliques), alpha = 2L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(part.keySet == (0L to 7L).toSet)
    val c0 = (0L to 3L).map(part).toSet
    val c1 = (4L to 7L).map(part).toSet
    assert(c0.size == 1 && c1.size == 1 && c0 != c1)
  }

  test("clusterHierarchy: components at 0, cliques at a middle breakpoint, singletons at the top") {
    val hier = Flow.clusterHierarchy(spark, edgesDf(twoCliques))
    val byKey = hier.map { case ((n, d), p) =>
      (n.toDouble / d, p.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)
    }
    // alpha = 0: one connected component labeled by min id
    assert(byKey(0.0).values.toSet == Set(0L))
    // some level separates the two cliques exactly
    val hasCliques = byKey.values.exists { p =>
      (0L to 3L).map(p).toSet.size == 1 && (4L to 7L).map(p).toSet.size == 1 &&
        p(0L) != p(7L) && p.values.toSet.size == 2
    }
    assert(hasCliques, s"hierarchy levels: ${byKey.map { case (a, p) => a -> p.values.toSet.size }}")
    // the top entry is the singleton clustering
    val top = byKey.maxBy(_._1)._2
    assert(top.forall { case (id, c) => id == c })
    // keys strictly increase cluster counts (nested hierarchy)
    val counts = byKey.toSeq.sortBy(_._1).map(_._2.values.toSet.size)
    assert(counts == counts.sorted && counts.distinct == counts)
  }

  test("cutClustering at huge alpha yields singletons; at alpha near 0 one cluster") {
    val fx = twoCliques
    val singl = Flow.cutClustering(spark, edgesDf(fx), alpha = 100L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(singl.forall { case (id, c) => id == c })
    // alpha=2 on caps*100: effective alpha = 0.02 -> whole graph merges
    val s = spark; import s.implicits._
    val scaled = fx.map { case (u, v, w) => (u, v, w * 100L) }.toDF("u", "v", "cap")
    val one = Flow.cutClustering(spark, scaled, alpha = 2L)
      .collect().map(_.getLong(1)).toSet
    assert(one.size == 1)
  }
}
