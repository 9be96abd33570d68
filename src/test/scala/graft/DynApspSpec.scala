package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.algo.Distances
import graft.model.LinkGraph

/** DynAPSP closed-form insert repair == cold APSP on the mutated graph, including
  * component-merging inserts (the case where the candidate set contributes pairs
  * absent from the old table entirely). */
class DynApspSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def graphOf(edges: Seq[(Long, Long, Double)], n: Long): LinkGraph =
    LinkGraph.fromEdges(spark, TestSpark.directed(edges),
      Some(spark.range(n).select(col("id"))))

  private def table(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
    df.select("s", "id", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("shortcut insert: warm repair equals cold recompute") {
    // Cycle 0-1-2-3-4-5-0; insert the chord {0, 3} (halves opposite distances).
    val g = graphOf(Seq((0L, 1L, 1.0), (1L, 2L, 1.0), (2L, 3L, 1.0),
      (3L, 4L, 1.0), (4L, 5L, 1.0), (5L, 0L, 1.0)), 6L)
    val sources = g.vertices
    val prev = Distances.apsp(spark, g, sources)
    val warm = Distances.dynApspInsert(spark, g, prev, 0L, 3L)
    val gNew = graphOf(Seq((0L, 1L, 1.0), (1L, 2L, 1.0), (2L, 3L, 1.0),
      (3L, 4L, 1.0), (4L, 5L, 1.0), (5L, 0L, 1.0), (0L, 3L, 1.0)), 6L)
    val cold = Distances.apsp(spark, gNew, sources)
    assert(table(warm) == table(cold))
  }

  test("component-merging insert: new pairs appear with exact distances") {
    // Path 0-1-2 and path 3-4; insert {2, 3}.
    val g = graphOf(Seq((0L, 1L, 1.0), (1L, 2L, 1.0), (3L, 4L, 1.0)), 5L)
    val prev = Distances.apsp(spark, g, g.vertices)
    val warm = Distances.dynApspInsert(spark, g, prev, 2L, 3L)
    val gNew = graphOf(Seq((0L, 1L, 1.0), (1L, 2L, 1.0), (3L, 4L, 1.0),
      (2L, 3L, 1.0)), 5L)
    val cold = Distances.apsp(spark, gNew, g.vertices)
    assert(table(warm) == table(cold))
    // Sanity: d(0,4) = 4 via the new bridge.
    assert(table(warm).contains((0L, 4L, 4L)))
  }

  test("already-optimal insert is a no-op on the table") {
    val g = graphOf(Seq((0L, 1L, 1.0), (1L, 2L, 1.0), (0L, 2L, 1.0)), 3L)
    val prev = Distances.apsp(spark, g, g.vertices)
    val warm = Distances.dynApspInsert(spark, g, prev, 0L, 2L)
    assert(table(warm) == table(prev))
  }
}
