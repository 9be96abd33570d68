package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.algo.{AlgebraicDistance, LinkPredIndices}
import graft.model.LinkGraph

/** Hand-checked fixtures for the LinkPredictor index tail. */
class LinkPredIndicesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Path 0-1-2: the single candidate pair (0,2) has every index enumerable. */
  private lazy val path3 = LinkGraph.fromEdges(spark, TestSpark.directed(Seq(
    (0L, 1L, 1.0), (1L, 2L, 1.0))), Some(spark.range(3).select(col("id"))))

  private def singletons(n: Long) =
    spark.range(n).select(col("id"), col("id").as("label"))
  private def allSame(n: Long) =
    spark.range(n).select(col("id"), lit(0L).as("label"))

  test("indices on a path: cn/union/degrees/distance/measure/rand by hand") {
    val rows = LinkPredIndices.indices(spark, path3, allSame(3)).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert((r.getLong(0), r.getLong(1)) == (0L, 2L))
    assert(r.getLong(2) == 1L)                   // cn = {1}
    assert(r.getLong(3) == 1L)                   // union = {1}
    assert(r.getLong(4) == 1L && r.getLong(5) == 1L) // degrees
    assert(r.getDouble(6) == 1.0)                // 1 / sqrt(1*1)
    // NeighborsMeasure: x=1,y=1 coincide (1), no neighbor-neighbor edge => 1.
    assert(r.getLong(7) == 1L)
    assert(r.getLong(8) == 1L)                   // same community (all label 0)
    // AdjustedRandIndex with the reference's b=c=|union| behavior:
    // a=1, b=c=1, d=3-1=2 => 2(ad-bc)/(ab+ac+2ad+b^2+bd+c^2+cd) = 2(2-1)/12.
    assert(math.abs(r.getDouble(9) - 2.0 / 12.0) < 1e-6)
  }

  test("neighbors_measure counts neighborhood-to-neighborhood edges") {
    // 0-1, 0-2, 1-3, 2-3: candidates include (0,3) with N(0)={1,2}, N(3)={1,2};
    // coincidences: (1,1),(2,2) = 2 = cn; cross edges: none (1~2 absent) => 2.
    // Adding 1-2 makes (1,2),(2,1) adjacent pairs too => 2 + 2 = 4.
    val base = Seq((0L, 1L, 1.0), (0L, 2L, 1.0), (1L, 3L, 1.0), (2L, 3L, 1.0))
    val g1 = LinkGraph.fromEdges(spark, TestSpark.directed(base),
      Some(spark.range(4).select(col("id"))))
    val m1 = LinkPredIndices.indices(spark, g1, singletons(4))
      .filter(col("u") === 0L && col("v") === 3L).head()
    assert(m1.getAs[Long]("neighbors_measure") == 2L)
    assert(m1.getAs[Long]("same_community") == 0L)
    val g2 = LinkGraph.fromEdges(spark, TestSpark.directed(base :+ (1L, 2L, 1.0)),
      Some(spark.range(4).select(col("id"))))
    val m2 = LinkPredIndices.indices(spark, g2, singletons(4))
      .filter(col("u") === 0L && col("v") === 3L).head()
    assert(m2.getAs[Long]("neighbors_measure") == 4L)
  }

  test("missingLinks finds exactly the distance-k pairs") {
    // Path 0-1-2-3: distance-2 pairs {(0,2),(1,3)}; distance-3 pairs {(0,3)}.
    val p4 = LinkGraph.fromEdges(spark, TestSpark.directed(Seq(
      (0L, 1L, 1.0), (1L, 2L, 1.0), (2L, 3L, 1.0))),
      Some(spark.range(4).select(col("id"))))
    val d2 = LinkPredIndices.missingLinks(spark, p4, k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(d2 == Set((0L, 2L), (1L, 3L)))
    val d3 = LinkPredIndices.missingLinks(spark, p4, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(d3 == Set((0L, 3L)))
  }

  test("thresholder: byScore / byCount / byPercentage") {
    import spark.implicits._
    val preds = Seq((0L, 1L, 0.9), (0L, 2L, 0.5), (1L, 2L, 0.5), (2L, 3L, 0.1))
      .toDF("u", "v", "score")
    assert(LinkPredIndices.byScore(preds, "score", 0.5).count() == 3)
    // byCount tie-break at 0.5: (0,2) beats (1,2) on (u,v) ascending.
    val top2 = LinkPredIndices.byCount(preds, "score", 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(top2 == Set((0L, 1L), (0L, 2L)))
    assert(LinkPredIndices.byPercentage(preds, "score", 0.5).count() == 2)
  }

  test("algebraic pairScores: candidate set matches the wedge candidates") {
    val g = LinkGraph.forSf(spark, "/root/testdata/sf0.001")
    val pairs = AlgebraicDistance.pairScores(spark, g, iters = 2, uMod = 20L)
    val viaIdx = LinkPredIndices.indices(spark, g, singletons(g.n), uMod = 20L)
      .select("u", "v")
    assert(pairs.select("u", "v").exceptAll(viaIdx).count() == 0)
    assert(viaIdx.exceptAll(pairs.select("u", "v")).count() == 0)
    assert(pairs.filter(col("ad") < 0).count() == 0)
  }
}
