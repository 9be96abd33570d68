package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.model.LinkGraph
import graft.numerics.ConjugateGradient

/** Distributed CG on the grounded Laplacian (numerics/ConjugateGradient.h). */
class CgSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  lazy val karate = LinkGraph.fromEdges(spark,
    TestSpark.directed(Fixtures.karateEdges.map(e => (e._1, e._2, 1.0))))

  test("CG recovers a planted solution on the karate Laplacian (ground = 0)") {
    val s = spark; import s.implicits._
    // planted x*: deterministic values in [-1, 1] for nodes 1..33
    val xs = (1L to 33L).map(i => (i, math.sin(i.toDouble) * 0.7)).toDF("id", "x")
    val b = ConjugateGradient.applyLaplacian(spark, karate, xs, ground = 0L)
    val sol = ConjugateGradient.solveLaplacian(spark, karate, b, ground = 0L,
      iters = 300, tol = 1e-14)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val planted = xs.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(sol(0L) == 0.0)
    val maxErr = planted.map { case (i, v) => math.abs(sol(i) - v) }.max
    assert(maxErr < 1e-7, s"max error $maxErr")
  }

  test("CG solves a weighted path Laplacian exactly (closed-form check)") {
    val s = spark; import s.implicits._
    // path 0-1-2-3 with weights 1,2,4; ground 0; b = e_3 (unit current into 3)
    // => x = potentials: x1 = 1/1, x2 = 1 + 1/2, x3 = 1.5 + 1/4
    val g = LinkGraph.fromEdges(spark,
      Seq((0L, 1L, 1.0), (1L, 2L, 2.0), (2L, 3L, 4.0)).toDF("src", "dst", "weight"))
    val b = Seq((3L, 1.0)).toDF("id", "b")
    val sol = ConjugateGradient.solveLaplacian(spark, g, b, ground = 0L,
      iters = 50, tol = 1e-14, useWeights = true)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(sol(1L) - 1.0) < 1e-9)
    assert(math.abs(sol(2L) - 1.5) < 1e-9)
    assert(math.abs(sol(3L) - 1.75) < 1e-9)
  }

  test("residual after solve is tiny: ||L x - b||_inf") {
    val s = spark; import s.implicits._
    val b = (1L to 33L).map(i => (i, if (i % 5 == 0) 1.0 else -0.1)).toDF("id", "b")
    // make b consistent: grounded Laplacian is nonsingular for connected karate, any b works
    val x = ConjugateGradient.solveLaplacian(spark, karate, b, ground = 0L, iters = 300)
      .filter(col("id") =!= 0L)
    val lx = ConjugateGradient.applyLaplacian(spark, karate, x, ground = 0L)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val bm = b.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val res = (1L to 33L).map(i => math.abs(lx(i) - bm.getOrElse(i, 0.0))).max
    assert(res < 1e-7, s"residual $res")
  }
}
