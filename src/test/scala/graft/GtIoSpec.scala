package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.io.GraphReaders
import graft.model.LinkGraph

/** graph-tool binary exchange: sharded roundtrips, header/width handling,
  * single-file reference-format compatibility (incl. big-endian + comment). */
class GtIoSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/root/repo/target"), "gtio").resolve(name).toString

  private def canon(g: LinkGraph) =
    g.canonicalUndirected.select("src", "dst")

  test("undirected roundtrip at width 1 (n < 256), degree-0 nodes preserved") {
    val g = LinkGraph.fromEdges(spark, TestSpark.directed(Seq(
      (0L, 1L, 1.0), (1L, 2L, 1.0), (2L, 0L, 1.0), (3L, 1L, 1.0))),
      Some(spark.range(6).select(col("id")))) // nodes 4, 5 isolated
    val p = tmp("u1")
    GraphReaders.writeGraphToolBinary(g, p)
    val back = GraphReaders.readGraphToolBinary(spark, p)
    assert(back.n == 6)
    assert(canon(back).exceptAll(canon(g)).count() == 0 &&
      canon(g).exceptAll(canon(back)).count() == 0)
  }

  test("directed roundtrip keeps the exact arc set") {
    val es = Seq((0L, 1L, 1.0), (1L, 0L, 1.0), (1L, 2L, 1.0), (2L, 0L, 1.0))
    val g = LinkGraph.fromEdges(spark, TestSpark.directed(es),
      Some(spark.range(3).select(col("id"))))
    val p = tmp("d1")
    GraphReaders.writeGraphToolBinary(g, p, directed = true)
    val back = GraphReaders.readGraphToolBinary(spark, p)
    val a = back.edges.select("src", "dst")
    val b = g.edges.select("src", "dst")
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }

  test("width 2 kicks in at n >= 256") {
    val g = LinkGraph.fromEdges(spark, TestSpark.directed(Seq(
      (0L, 300L, 1.0), (299L, 300L, 1.0))),
      Some(spark.range(301).select(col("id"))))
    val p = tmp("w2")
    GraphReaders.writeGraphToolBinary(g, p)
    val back = GraphReaders.readGraphToolBinary(spark, p)
    assert(back.n == 301)
    assert(canon(back).exceptAll(canon(g)).count() == 0 &&
      canon(g).exceptAll(canon(back)).count() == 0)
  }

  test("SNAP cover roundtrips; comment lines consume subset ids on read") {
    import spark.implicits._
    val cover = Seq((10L, 1L), (11L, 1L), (12L, 2L), (10L, 2L), (13L, 3L))
      .toDF("id", "label")
    val p = tmp("snapcov")
    GraphReaders.writeSnapCover(cover, p)
    val back = GraphReaders.readSnapCover(spark, p)
    // Labels are line numbers — compare the family of member SETS.
    def fam(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("label").agg(sort_array(collect_list(col("id"))).as("m"))
        .select("m").collect().map(_.getSeq[Long](0).toList).toSet
    assert(fam(back) == fam(cover))
    // An id dictionary remaps snap ids.
    val dict = Seq((10L, 0L), (11L, 1L), (12L, 2L), (13L, 3L))
      .toDF("snap_id", "id")
    val mapped = GraphReaders.readSnapCover(spark, p, Some(dict))
    assert(fam(mapped) == Set(List(0L, 1L), List(0L, 2L), List(3L)))
  }

  test("reads a single reference-format file: big-endian with a comment") {
    // Hand-crafted per GraphToolBinaryReader.cpp:38-120: magic, v1, BE flag,
    // u64 comment len + "hi", directed=0, n=3, lower adjacencies
    // {0:[], 1:[0], 2:[0,1]} — a triangle.
    val dir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/root/repo/target"), "gtio")
    val f = dir.resolve("ref.gt")
    val out = new java.io.ByteArrayOutputStream()
    def be8(v: Long): Unit =
      (7 to 0 by -1).foreach(i => out.write(((v >>> (8 * i)) & 0xFF).toInt))
    out.write(Array(0xe2, 0x9b, 0xbe, 0x20, 0x67, 0x74, 0x01, 0x01).map(_.toByte))
    be8(2L); out.write('h'); out.write('i')
    out.write(0)     // undirected
    be8(3L)          // n = 3 -> width 1
    be8(0L)          // node 0: no lower neighbors
    be8(1L); out.write(0)              // node 1: [0]
    be8(2L); out.write(0); out.write(1) // node 2: [0, 1]
    java.nio.file.Files.write(f, out.toByteArray)
    val back = GraphReaders.readGraphToolBinary(spark, f.toString)
    assert(back.n == 3)
    val got = canon(back).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((0L, 1L), (0L, 2L), (1L, 2L)))
  }
}
