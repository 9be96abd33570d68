package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.io.GraphReaders
import graft.model.LinkGraph

/** IO tail: binary partition, edge-list partition/cover, dot-partition, DGS writer. */
class IoTailSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/root/repo/target"), "iotail").resolve(name).toString

  private def labelMap(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("binary partition roundtrips at width 4 and 8") {
    import spark.implicits._
    val labels = (0L until 100L).map(i => (i, i * 37 % 11)).toDF("id", "label")
    for (w <- Seq(4, 8)) {
      val p = tmp(s"bp$w")
      GraphReaders.writeBinaryPartition(labels, p, width = w)
      assert(labelMap(GraphReaders.readBinaryPartition(spark, p, width = w)) ==
        labelMap(labels))
    }
  }

  test("binary edge-list partition (explicit pairs) roundtrips at width 4 and 8 with firstNode") {
    import spark.implicits._
    val labels = (0L until 80L).map(i => (i, i * 31 % 9)).toDF("id", "label")
    for (w <- Seq(4, 8)) {
      val p = tmp(s"belp$w")
      GraphReaders.writeBinaryEdgeListPartition(labels, p, firstNode = 2L, width = w)
      assert(labelMap(GraphReaders.readBinaryEdgeListPartition(spark, p, firstNode = 2L,
        width = w)) == labelMap(labels))
    }
  }

  test("edge-list partition roundtrips with firstNode shift") {
    import spark.implicits._
    val labels = (0L until 50L).map(i => (i, i % 7)).toDF("id", "label")
    val p = tmp("elp")
    GraphReaders.writeEdgeListPartition(labels, p, firstNode = 1L)
    assert(labelMap(GraphReaders.readEdgeListPartition(spark, p, firstNode = 1L)) ==
      labelMap(labels))
    // The written file is 1-based.
    val first = spark.read.text(p).orderBy("value").head().getString(0)
    assert(first.startsWith("1\t"))
  }

  test("edge-list cover roundtrips overlapping memberships") {
    import spark.implicits._
    val cover = Seq((0L, 1L), (0L, 2L), (1L, 2L), (2L, 3L)).toDF("id", "label")
    val p = tmp("elc")
    GraphReaders.writeEdgeListCover(cover, p, firstNode = 1L)
    val back = GraphReaders.readEdgeListCover(spark, p, firstNode = 1L)
    assert(back.exceptAll(cover).count() == 0 && cover.exceptAll(back).count() == 0)
  }

  test("dot partition writer emits graph block, colored nodes, edges") {
    import spark.implicits._
    val g = LinkGraph.fromEdges(spark, TestSpark.directed(Seq(
      (0L, 1L, 1.0), (1L, 2L, 1.0))), Some(spark.range(4).select(col("id"))))
    val labels = Seq((0L, 0L), (1L, 0L), (2L, 1L), (3L, 1L)).toDF("id", "label")
    val p = tmp("dotp")
    GraphReaders.writeDotPartition(g, labels, p)
    val lines = spark.read.text(p).as[String].collect()
    assert(lines.head == "graph {" && lines.last == "}")
    assert(lines.count(_.contains("style=filled")) == 3) // node 3 is isolated
    assert(lines.exists(_.contains("0 -- 1;")) && lines.exists(_.contains("1 -- 2;")))
  }

  test("DGS writer roundtrips through parseDgs") {
    import spark.implicits._
    val events = Seq(
      (0L, "ae", 0L, 1L, 1.0), (1L, "ae", 1L, 2L, 2.0),
      (2L, "re", 0L, 1L, 1.0), (3L, "ce", 1L, 2L, 5.0))
      .toDF("ord", "etype", "u", "v", "w")
    val p = tmp("dgs")
    GraphReaders.writeDgs(events, p)
    val back = graft.streaming.GraphEvents.parseDgs(spark.read.text(p))
    val expect = events.select("etype", "u", "v", "w")
    assert(back.exceptAll(expect).count() == 0 && expect.exceptAll(back).count() == 0)
  }
}
