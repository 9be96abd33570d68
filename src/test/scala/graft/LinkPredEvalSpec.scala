package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.algo.LinkPredEval
import graft.model.LinkGraph

/** Hand-checked fixtures for the link-prediction evaluation family. */
class LinkPredEvalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Path 0-1-2-3 plus spur 1-4: candidates and walk counts are enumerable. */
  private lazy val g = LinkGraph.fromEdges(spark, TestSpark.directed(Seq(
    (0L, 1L, 1.0), (1L, 2L, 1.0), (2L, 3L, 1.0), (1L, 4L, 1.0))),
    Some(spark.range(5).select(col("id"))))

  test("katzScores: beta-weighted walk counts on a path") {
    // betaDen = 10 (beta = 0.1); katz_num is in beta^3 units: c1*100 + c2*10 + c3.
    val k = LinkPredEval.katzScores(spark, g, uMod = 1L, maxPathLength = 3, betaDen = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // Candidates (distance-2, non-adjacent): (0,2) via 1; (0,4) via 1; (2,4) via 1;
    // (1,3) via 2.
    assert(k.keySet == Set((0L, 2L), (0L, 4L), (2L, 4L), (1L, 3L)))
    // walks(0,2): l2 = 1 (0-1-2), l3 = 0 => 10. Same for (1,3) via 1-2-3 and (2,4)
    // via 2-1-4 (no length-3 walks close any of these pairs).
    assert(k((0L, 2L)) == 10L)
    assert(k((1L, 3L)) == 10L)
    assert(k((2L, 4L)) == 10L)
  }

  test("holdoutSplit: deterministic, exact sizes, disjoint, union = edges") {
    val big = LinkGraph.forSf(spark, "/root/testdata/sf0.001")
    val (tr, ho) = LinkPredEval.holdoutSplit(spark, big, 0.9, seed = 42L)
    val m = big.canonicalUndirected.count()
    val k = m - math.floor(0.9 * m).toLong
    assert(ho.count() == k)
    assert(tr.count() == m - k)
    assert(tr.intersect(ho).count() == 0)
    val (tr2, ho2) = LinkPredEval.holdoutSplit(spark, big, 0.9, seed = 42L)
    assert(ho2.exceptAll(ho).count() == 0) // same seed -> same split
  }

  test("evaluate: exact confusion counts on a tiny ranked set") {
    val s = spark; import s.implicits._
    // 4 predictions, scores force the order (3,4) > (0,2) > (0,3) > (1,3);
    // positives = {(0,2), (1,3)}.
    val preds = Seq((3L, 4L, 0.9), (0L, 2L, 0.8), (0L, 3L, 0.5), (1L, 3L, 0.2))
      .toDF("u", "v", "score")
    val pos = Seq((0L, 2L), (1L, 3L)).toDF("src", "dst")
    val rows = LinkPredEval.evaluate(spark, preds, pos, "score", numThresholds = 5)
      .collect().map(r => r.getAs[Long]("thr") -> r).toMap
    // thresholds: ceil(4*i/4) = 0,1,2,3,4
    assert(rows.keySet == Set(0L, 1L, 2L, 3L, 4L))
    assert(rows(0L).getAs[Long]("tp") == 0L && rows(0L).getAs[Long]("fp") == 0L)
    assert(rows(1L).getAs[Long]("tp") == 0L && rows(1L).getAs[Long]("fp") == 1L)
    assert(rows(2L).getAs[Long]("tp") == 1L && rows(2L).getAs[Long]("fp") == 1L)
    assert(rows(4L).getAs[Long]("tp") == 2L && rows(4L).getAs[Long]("fp") == 2L)
    assert(rows(4L).getAs[Double]("tpr") == 1.0)
    assert(rows(2L).getAs[Double]("precision") == 0.5)
    assert(rows(0L).getAs[Double]("precision") == 1.0) // undefined -> 1 (reference)
    assert(rows(4L).getAs[Double]("recall") == 1.0)
  }

  test("run: end-to-end on sf0.001 produces a monotone ROC") {
    val big = LinkGraph.forSf(spark, "/root/testdata/sf0.001")
    val out = LinkPredEval.run(spark, big, trainRatio = 0.9, uMod = 10L,
      numThresholds = 10).orderBy("thr").collect()
    assert(out.length >= 2)
    val tps = out.map(_.getAs[Long]("tp"))
    assert(tps.zip(tps.tail).forall { case (a, b) => a <= b }) // cumulative
    val last = out.last
    assert(last.getAs[Long]("tp") + last.getAs[Long]("fn") ==
      out.head.getAs[Long]("tp") + out.head.getAs[Long]("fn")) // npos constant
  }
}
