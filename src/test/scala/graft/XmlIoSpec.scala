package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.io.XmlGraphIO
import graft.model.LinkGraph

/** GraphML / GEXF interchange + LineFileReader (GraphMLIO.py, GEXFIO.py,
  * io/LineFileReader.cpp). */
class XmlIoSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/root/repo/target"), "xmlio").resolve(name).toString

  private def edgeSet(g: LinkGraph): Set[(Long, Long)] =
    g.edges.select("src", "dst").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private lazy val fixture = LinkGraph.fromEdges(spark,
    TestSpark.directed(Seq((0L, 1L, 1.0), (0L, 2L, 1.0), (1L, 2L, 1.0), (2L, 3L, 1.0),
      (3L, 4L, 1.0), (4L, 0L, 1.0))))

  test("GraphML roundtrip: directed unweighted") {
    val p = tmp("gml1")
    XmlGraphIO.writeGraphMl(fixture, p, directed = true)
    val back = XmlGraphIO.readGraphMl(spark, p)
    assert(back.n == fixture.n)
    assert(edgeSet(back) == edgeSet(fixture))
    assert(back.edges.select("weight").distinct().head().getDouble(0) == 1.0)
  }

  test("GraphML roundtrip: weighted keeps per-edge weights via the d1 key") {
    val s = spark; import s.implicits._
    val g = LinkGraph.fromEdges(spark,
      Seq((0L, 1L, 2.5), (1L, 2L, 0.5), (2L, 0L, 7.0)).toDF("src", "dst", "weight"))
    val p = tmp("gml2")
    XmlGraphIO.writeGraphMl(g, p, directed = true, weighted = true)
    val back = XmlGraphIO.readGraphMl(spark, p)
    val w = back.edges.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(w == Map((0L, 1L) -> 2.5, (1L, 2L) -> 0.5, (2L, 0L) -> 7.0))
  }

  test("GraphML undirected write canonicalizes; reader honors edgedefault") {
    val p = tmp("gml3")
    XmlGraphIO.writeGraphMl(fixture, p, directed = false)
    val back = XmlGraphIO.readGraphMl(spark, p)
    assert(edgeSet(back) == edgeSet(fixture).map { case (a, b) => (math.min(a, b), math.max(a, b)) })
  }

  test("GEXF static roundtrip with weights") {
    val s = spark; import s.implicits._
    val g = LinkGraph.fromEdges(spark,
      Seq((0L, 1L, 2.0), (1L, 2L, 3.0), (0L, 2L, 1.0)).toDF("src", "dst", "weight"))
    val p = tmp("gexf1")
    XmlGraphIO.writeGexf(g, p, directed = true)
    val back = XmlGraphIO.readGexf(spark, p)
    val w = back.edges.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(w == Map((0L, 1L) -> 2.0, (1L, 2L) -> 3.0, (0L, 2L) -> 1.0))
  }

  test("GEXF reader maps string node ids densely in document order") {
    val s = spark; import s.implicits._
    val p = tmp("gexf2")
    val xml = Seq(
      """<?xml version="1.0"?>""",
      """<gexf><graph defaultedgetype="undirected" mode="static">""",
      """<nodes><node id="alpha" /><node id="beta" /><node id="gamma" /></nodes>""",
      """<edges><edge id="0" source="beta" target="alpha" /></edges>""",
      """</graph></gexf>""")
    Seq(xml.mkString("\n")).toDF("value").coalesce(1).write.mode("overwrite").text(p)
    val g = XmlGraphIO.readGexf(spark, p)
    assert(g.n == 3)
    assert(edgeSet(g) == Set((0L, 1L))) // alpha=0, beta=1; undirected canonical
  }

  test("GEXF dynamic spells become event rows with time steps") {
    val s = spark; import s.implicits._
    val p = tmp("gexf3")
    val xml =
      """<?xml version="1.0"?>
        |<gexf><graph defaultedgetype="undirected" mode="dynamic" timeformat="double">
        |<nodes>
        |  <node id="0" />
        |  <node id="1" />
        |  <node id="2" start="1.0" />
        |</nodes>
        |<edges>
        |  <edge id="0" source="0" target="1" />
        |  <edge id="1" source="0" target="2">
        |    <spells><spell start="1.0" end="3.0" /></spells>
        |  </edge>
        |</edges>
        |</graph></gexf>""".stripMargin
    Seq(xml).toDF("value").coalesce(1).write.mode("overwrite").text(p)
    val ev = XmlGraphIO.readGexfEvents(spark, p)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(4)))
    // node 2 added at t=1, edge (0,2) added at t=1 and removed at t=3, one step between
    assert(ev.contains(("an", 2L, 0L, 1.0)))
    assert(ev.contains(("ae", 0L, 2L, 1.0)))
    assert(ev.contains(("re", 0L, 2L, 3.0)))
    assert(ev.count(_._1 == "st") == 1)
    // static members (node 0/1, edge 0-1) produce no events
    assert(!ev.exists(e => e._1 == "ae" && e._3 == 1L))
  }

  test("LineFileReader preserves global line order") {
    val s = spark; import s.implicits._
    val p = tmp("lines")
    val lines = (0 until 500).map(i => f"line-$i%04d")
    lines.toDF("value").coalesce(1).write.mode("overwrite").text(p)
    val back = XmlGraphIO.readLineFile(spark, p)
      .orderBy("lineno").collect().map(_.getString(1))
    assert(back.toSeq == lines)
  }
}
