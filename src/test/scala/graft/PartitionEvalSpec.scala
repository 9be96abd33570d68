package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.algo.{ConnectedComponents, PartitionEval}
import graft.model.LinkGraph

/** Hand-computed fixture for the partition-evaluation family (PartitionEval):
  * path 0-1-2-3 + triangle-ish tail 3-4, 3-5, 4-5, isolated node 6, separate pair 7-8.
  * Partition: l0 = {0,1,2,3}, l4 = {4,5,6}, l7 = {7,8}. Every expected value below is
  * worked out by hand against the reference semantics
  * (community/PartitionHubDominance.cpp etc.). */
class PartitionEvalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val g = LinkGraph.fromEdges(spark, TestSpark.directed(Seq(
    (0L, 1L, 1.0), (1L, 2L, 1.0), (2L, 3L, 1.0),
    (3L, 4L, 1.0), (4L, 5L, 1.0), (3L, 5L, 1.0),
    (7L, 8L, 1.0))),
    Some(spark.range(9).select(col("id"))))

  private lazy val labels = {
    val s = spark; import s.implicits._
    Seq(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L,
      4L -> 4L, 5L -> 4L, 6L -> 4L,
      7L -> 7L, 8L -> 7L).toDF("id", "label")
  }

  private def byLabel(df: org.apache.spark.sql.DataFrame): Map[Long, org.apache.spark.sql.Row] =
    df.collect().map(r => r.getAs[Long]("label") -> r).toMap

  test("hubDominance") {
    val m = byLabel(PartitionEval.hubDominance(spark, g, labels))
    assert(m(0L).getAs[Long]("max_internal_deg") == 2L)
    assert(math.abs(m(0L).getAs[Double]("dominance") - 2.0 / 3) < 1e-12)
    assert(math.abs(m(4L).getAs[Double]("dominance") - 0.5) < 1e-12)
    assert(m(7L).getAs[Double]("dominance") == 1.0)
  }

  test("intrapartitionDensity") {
    val m = byLabel(PartitionEval.intrapartitionDensity(spark, g, labels))
    assert(m(0L).getAs[Long]("intra_edges") == 3L)
    assert(m(0L).getAs[Double]("density") == 0.5)
    assert(math.abs(m(4L).getAs[Double]("density") - 1.0 / 3) < 1e-12)
    assert(m(7L).getAs[Double]("density") == 1.0)
  }

  test("isolatedInterpartition conductance + expansion") {
    val m = byLabel(PartitionEval.isolatedInterpartition(spark, g, labels))
    assert(m(0L).getAs[Long]("vol") == 8L && m(0L).getAs[Long]("cut") == 2L)
    assert(math.abs(m(0L).getAs[Double]("conductance") - 1.0 / 3) < 1e-12)
    assert(m(0L).getAs[Double]("expansion") == 0.5)
    assert(m(4L).getAs[Double]("conductance") == 0.5)
    assert(math.abs(m(4L).getAs[Double]("expansion") - 2.0 / 3) < 1e-12)
    assert(m(7L).getAs[Double]("conductance") == 0.0)
    assert(m(7L).getAs[Double]("expansion") == 0.0)
  }

  test("fragmentation against connected components") {
    val cc = ConnectedComponents.run(spark, g).labels
    val m = byLabel(PartitionEval.fragmentation(spark, g, labels, cc))
    assert(m(0L).getAs[Double]("fragmentation") == 0.0)
    // l4 = {4,5} in the big component + isolated {6}: largest piece 2 of 3.
    assert(math.abs(m(4L).getAs[Double]("fragmentation") - (1.0 - 2.0 / 3)) < 1e-12)
    assert(m(7L).getAs[Double]("fragmentation") == 0.0)
  }

  test("stablePartitionNodes") {
    val m = byLabel(PartitionEval.stablePartitionNodes(spark, g, labels))
    // l0: 0,1,2 stable; 3 has own=1 vs foreign(l4)=2 -> unstable.
    assert(m(0L).getAs[Long]("stable") == 3L && m(0L).getAs[Double]("stable_frac") == 0.75)
    // l4: 4 and 5 tie own=1 vs foreign=1 (ties are unstable, :108 `>=`); isolated 6 stable.
    assert(m(4L).getAs[Long]("stable") == 1L)
    assert(m(7L).getAs[Double]("stable_frac") == 1.0)
  }
}
