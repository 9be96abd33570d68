package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.layout.Layout

/** Layout primitives: distributed dense rank and the explicit hub-salting helpers
  * (north rule: explicit handling for high-degree hubs) — correctness is equality with
  * the unsalted/naive formulation on a graph with a PLANTED 10^5-degree hub. */
class LayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("zipWithRank equals a global row_number over the same order") {
    val s = spark
    import s.implicits._
    val df = (0 until 5000).map(i => ((i * 2654435761L) % 100000L).toString).distinct
      .toDF("k")
    val ranked = Layout.zipWithRank(df, "k", "r")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = df.collect().map(_.getString(0)).sorted.zipWithIndex
    expected.foreach { case (k, i) => assert(ranked(k) == i.toLong, s"key $k") }
  }

  test("salted sum and argmax equal unsalted on a planted 100k-degree hub") {
    val s = spark
    import s.implicits._
    // Hub vertex 0 receives 100k edges from distinct sources with skewed labels.
    val edges = (1 to 100000).map(i => (i.toLong, 0L, (i % 7).toLong, 1.0))
      .toDF("src", "dst", "label", "weight")
    val naiveSum = edges.groupBy("dst", "label").agg(sum("weight").as("w"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val salted = Layout.saltedSum(edges, Seq("dst", "label"), "weight",
        col("src"), salts = 16, out = "w")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(salted == naiveSum)

    val naiveTop = edges.groupBy("dst", "label").agg(sum("weight").as("w"))
      .groupBy("dst").agg(max(struct(col("w"), (-col("label")).as("nl"))).as("top"))
      .select(col("dst"), col("top.w"), (-col("top.nl")).as("lbl"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    val saltedTop = Layout.saltedArgMax(
        Layout.saltedSum(edges, Seq("dst", "label"), "weight", col("src"), 16, "w"),
        Seq("dst"), struct(col("w"), (-col("label")).as("nl")), col("label"), 16)
      .select(col("dst"), col("top.w"), (-col("top.nl")).as("lbl"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    assert(saltedTop == naiveTop)
  }

  test("salted state join equals plain join on the hub graph") {
    val s = spark
    import s.implicits._
    val edges = (1 to 50000).map(i => (i.toLong, 0L)).toDF("src", "dst")
    val state = (0 to 50000).map(i => (i.toLong, (i % 13).toLong)).toDF("sid", "lab")
    val plain = edges.join(state.withColumnRenamed("sid", "dst"), "dst")
      .select("src", "dst", "lab")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Layout.saltedStateJoin(edges, "dst", col("src"), state, "sid", 8)
      .select("src", "dst", "lab")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == plain)
  }
}
