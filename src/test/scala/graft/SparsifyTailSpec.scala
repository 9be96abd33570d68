package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.algo.{EdgeScores, ForestFire}
import graft.model.LinkGraph

/** Round-3 sparsification tail: Simmelian overlap, multiscale, geometric mean,
  * linearizer, prefix-Jaccard, node-edge baseline, forest fire.
  * Hand-checked fixture: triangle 0-1-2 plus pendant edge 2-3.
  *   degrees 0:2 1:2 2:3 3:1; tri(0,1)=tri(0,2)=tri(1,2)=1, tri(2,3)=0. */
class SparsifyTailSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def g = LinkGraph.fromEdges(spark, TestSpark.directed(
    Seq((0L, 1L), (0L, 2L), (1L, 2L), (2L, 3L)).map(e => (e._1, e._2, 1.0))))

  private def triPlus1(gr: LinkGraph) =
    EdgeScores.triangleEdgeScore(spark, gr)
      .select(col("src"), col("dst"), (col("tri") + 1L).as("att"))

  private def edgeMap(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), Double] =
    df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

  test("simmelian overlap: common neighbors within rank budget on both sides") {
    val gr = g
    val got = EdgeScores.simmelianOverlapScore(spark, gr, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map((0L, 1L) -> 1L, (0L, 2L) -> 1L, (1L, 2L) -> 1L, (2L, 3L) -> 0L))
    // rank budget 0 only admits rank-0 neighbors: for edge (2,3), node 3's list is just
    // {2} (excluded); overlaps unchanged for the triangle (all tri ties at rank 0).
    val tight = EdgeScores.simmelianOverlapScore(spark, gr, 0).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(tight((0L, 1L)) == 1L && tight((2L, 3L)) == 0L)
  }

  test("multiscale score matches the hand-computed null-model probabilities") {
    val gr = g
    val got = edgeMap(EdgeScores.multiscaleScore(spark, gr, triPlus1(gr)))
    assert(math.abs(got((0L, 1L)) - 0.5) < 1e-9)
    assert(math.abs(got((0L, 2L)) - 0.64) < 1e-9)
    assert(math.abs(got((1L, 2L)) - 0.64) < 1e-9)
    assert(math.abs(got((2L, 3L)) - 0.36) < 1e-9)
  }

  test("geometric mean score = att / sqrt(Su*Sv)") {
    val gr = g
    val got = edgeMap(EdgeScores.geometricMeanScore(spark, gr, triPlus1(gr)))
    assert(math.abs(got((0L, 1L)) - 0.5) < 1e-9)
    assert(math.abs(got((0L, 2L)) - 2.0 / math.sqrt(20.0)) < 1e-6)
    assert(math.abs(got((2L, 3L)) - 1.0 / math.sqrt(5.0)) < 1e-6)
  }

  test("linearizer maps scores to positions/(m-1) preserving order") {
    val gr = g
    val scored = EdgeScores.scanScore(spark, gr).select("src", "dst", "score")
    val lin = edgeMap(EdgeScores.linearizeScore(scored, "score"))
    assert(lin.values.toSet.subsetOf(Set(0.0, 1.0 / 3, 2.0 / 3, 1.0)))
    assert(lin.values.toSet.size == 4) // distinct positions (src,dst tie-break)
    val raw = edgeMap(scored)
    // order preserved: higher raw score never maps to lower position than a strictly
    // lower raw score
    for (a <- raw.keys; b <- raw.keys if raw(a) > raw(b)) assert(lin(a) > lin(b))
  }

  test("prefix jaccard: best rank-prefix jaccard per edge") {
    val gr = g
    val attr = EdgeScores.triangleEdgeScore(spark, gr)
      .select(col("src"), col("dst"), col("tri").as("att"))
    val got = edgeMap(EdgeScores.prefixJaccardScore(spark, gr, attr))
    assert(math.abs(got((0L, 1L)) - 1.0) < 1e-9)
    assert(math.abs(got((0L, 2L)) - 1.0) < 1e-9)
    assert(math.abs(got((1L, 2L)) - 1.0) < 1e-9)
    assert(got((2L, 3L)) == 0.0)
  }

  test("random node-edge score is a permutation 0/m..(m-1)/m and deterministic") {
    val gr = g
    val s1 = edgeMap(EdgeScores.randomNodeEdgeScore(spark, gr))
    val s2 = edgeMap(EdgeScores.randomNodeEdgeScore(spark, gr))
    assert(s1 == s2)
    assert(s1.values.toSet == Set(0.0, 0.25, 0.5, 0.75))
  }

  test("forest fire: deterministic, normalized, burns the karate club") {
    val karate = LinkGraph.fromEdges(spark,
      TestSpark.directed(Fixtures.karateEdges.map(e => (e._1, e._2, 1.0))))
    val f1 = ForestFire.score(spark, karate, pf = 0.6, targetBurntRatio = 0.5,
      firesPerWave = 8)
    val rows = f1.collect()
    assert(rows.length == 78)
    val burnt = rows.map(_.getLong(2))
    assert(burnt.sum > 0, "something burnt")
    val scores = rows.map(_.getDouble(3))
    assert(scores.forall(x => x >= 0.0 && x <= 1.0) && scores.max == 1.0)
    val f2 = ForestFire.score(spark, karate, pf = 0.6, targetBurntRatio = 0.5,
      firesPerWave = 8).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet ==
      f2.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet)
  }
}
