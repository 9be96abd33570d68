package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.algo.{Anf, Triangles}
import graft.io.GraphReaders
import graft.media.Multimodal
import graft.model.LinkGraph
import graft.streaming.GraphEvents
import graft.synth.Generators

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  lazy val pages = graft.synth.PageTableGen.fromDocuments(spark,
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(20))
  lazy val media = Multimodal.mediaTable(pages)

  test("metadata: byte lengths, sha256 and frame counts are consistent") {
    val m = Multimodal.metadata(media)
    assert(m.columns.toSeq == Seq("url", "n_bytes", "sha256", "magic", "n_frames"))
    val r = m.orderBy("url").head()
    assert(r.getAs[String]("magic") == "<html>")
    assert(r.getAs[Long]("n_frames") == (r.getAs[Long]("n_bytes") + 255) / 256)
    assert(r.getAs[String]("sha256").length == 64)
  }

  test("frame sampling yields bounded binary slices; resize truncates exactly") {
    val f = media.select(col("url"),
      Multimodal.frameSample(col("blob"), 256, 4, 64).as("frames"),
      Multimodal.resize(col("blob"), 128).as("small")).head()
    val frames = f.getSeq[Array[Byte]](1)
    assert(frames.nonEmpty && frames.forall(_.length <= 64))
    assert(f.getAs[Array[Byte]]("small").length == 128)
  }

  test("feature extraction stub: typed batches, histogram sums to byte count, deterministic") {
    val a = Multimodal.extractFeatures(spark, media).collect().sortBy(_.url)
    val b = Multimodal.extractFeatures(spark, media).collect().sortBy(_.url)
    assert(a.length == 400)
    a.zip(b).foreach { case (x, y) =>
      assert(x.url == y.url && x.histogram.sameElements(y.histogram))
      assert(x.histogram.sum == x.n_bytes)
    }
  }
}

class ReadersSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tmp(content: String, name: String): String = {
    val p = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/root/repo/target"), "io").resolve(name)
    java.nio.file.Files.writeString(p, content)
    p.toString
  }

  test("METIS reader on vendored karate content: 34 nodes, 78 edges, 45 triangles") {
    val adj = Array.fill(34)(List.empty[Long])
    Fixtures.karateEdges.foreach { case (u, v) =>
      adj(u.toInt) = (v + 1) :: adj(u.toInt); adj(v.toInt) = (u + 1) :: adj(v.toInt)
    }
    val metis = "34 78 0\n" + adj.map(_.sorted.mkString(" ")).mkString("\n") + "\n"
    val g = GraphReaders.readMetis(spark, tmp(metis, "karate.graph"))
    assert(g.n == 34)
    assert(g.canonicalUndirected.count() == 78)
    assert(Triangles.globalCount(spark, g) == Fixtures.karateTriangles)
  }

  test("weighted METIS: fmt=1 parses (weight, node) pairs") {
    val metis = "3 2 1\n2 5 3 7\n1 5\n1 7\n"
    val g = GraphReaders.readMetis(spark, tmp(metis, "w.graph"))
    val e = g.canonicalUndirected.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(e == Set((0L, 1L, 5.0), (0L, 2L, 7.0)))
  }

  test("edge list reader: comments, 1-based offset, weights; SNAP roundtrip via writer") {
    val el = "# comment\n1 2 0.5\n2 3\n3 1 2.0\n"
    val g = GraphReaders.readEdgeList(spark, tmp(el, "e.txt"), firstNode = 1)
    assert(g.m == 3 && g.n == 3)
    val w = g.edges.filter(col("src") === 0 && col("dst") === 1).head().getDouble(2)
    assert(w == 0.5)
    val out = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/root/repo/target"), "io").resolve("out").toString
    GraphReaders.writeEdgeList(g, out)
    val back = GraphReaders.readEdgeList(spark, out, sep = "\t")
    assert(back.m == 3)
  }

  test("non-continuous string ids build a deterministic dictionary") {
    val el = "alpha beta\nbeta gamma\n"
    val g = GraphReaders.readEdgeList(spark, tmp(el, "s.txt"), continuous = false)
    assert(g.n == 3 && g.m == 2)
    assert(g.edges.select(min("src")).head().getLong(0) == 0L)
  }
}

class GeneratorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("rmat: deterministic, self-loop-free, power-law-ish hubs") {
    val g1 = Generators.rmat(spark, scale = 10, edgeFactor = 8, seed = 7)
    val g2 = Generators.rmat(spark, scale = 10, edgeFactor = 8, seed = 7)
    assert(g1.m == g2.m && g1.m > 1000)
    assert(g1.edges.exceptAll(g2.edges).count() == 0)
    val degs = g1.edges.groupBy("src").count()
    val maxDeg = degs.agg(max("count")).head().getLong(0)
    val avgDeg = g1.m.toDouble / g1.n
    assert(maxDeg > avgDeg * 5, s"max=$maxDeg avg=$avgDeg") // hubby degree distribution
  }

  test("erdos-renyi: edge endpoints within range, deterministic") {
    val g = Generators.erdosRenyi(spark, 1000, 5000, seed = 3)
    assert(g.edges.filter(col("src") >= 1000 || col("dst") >= 1000 || col("src") < 0).count() == 0)
    assert(g.m > 4000)
  }
}

class AnfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("effective diameter estimate on karate is near the exact value") {
    val und = LinkGraph.fromEdges(spark,
      TestSpark.undirected(Fixtures.karateEdges.map(e => (e._1, e._2, 1.0))))
    // Exact: per-node min hop h where |reach_h(u)| >= ceil(.9 * 34), averaged.
    val adj = Array.fill(34)(Set.empty[Int])
    Fixtures.karateEdges.foreach { case (u, v) =>
      adj(u.toInt) += v.toInt; adj(v.toInt) += u.toInt
    }
    val thr = math.ceil(0.9 * 34).toInt
    val exact = (0 until 34).map { s =>
      var reach = Set(s); var h = 0
      while (reach.size < thr) { reach = reach ++ reach.flatMap(adj); h += 1 }
      h
    }.sum.toDouble / 34
    val est = Anf.effectiveDiameter(spark, und).effectiveDiameter
    assert(math.abs(est - exact) <= 1.5, s"anf=$est exact=$exact")
  }
}

class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("DGS parse + batch fold: additions, weight update, removal") {
    val s = spark
    import s.implicits._
    val lines = Seq("ae 0 1", "ae 1 2 2.0", "ce 0 1 9.0", "re 1 2", "st", "# junk")
      .toDF("value")
    val ev = GraphEvents.parseDgs(lines)
    val empty = Seq.empty[(Long, Long, Double)].toDF("src", "dst", "weight")
    val folded = GraphEvents.applyBatch(empty, ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(folded == Set((0L, 1L, 9.0)))
  }

  test("streaming ingestion: memory-stream events are parsed and folded per micro-batch") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val input = MemoryStream[String]
    var state = Seq.empty[(Long, Long, Double)].toDF("src", "dst", "weight")
    val q = input.toDF().writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        state = GraphEvents.applyBatch(state, GraphEvents.parseDgs(batch)).localCheckpoint(true)
      }
      .start()
    input.addData("ae 0 1", "ae 1 2")
    q.processAllAvailable()
    input.addData("ae 2 3", "re 0 1")
    q.processAllAvailable()
    q.stop()
    val edges = state.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(edges == Set((1L, 2L), (2L, 3L)))
  }

  test("incremental CC merges components through a new edge without full recompute") {
    val s = spark
    import s.implicits._
    // two chains 0-1-2 and 10-11-12 with labels already at fixpoint
    val labels = Seq((0L, 0L), (1L, 0L), (2L, 0L), (10L, 10L), (11L, 10L), (12L, 10L))
      .toDF("id", "label")
    val oldEdges = Seq((0L, 1L), (1L, 2L), (10L, 11L), (11L, 12L))
    val newEdge = Seq((2L, 10L))
    val all = (oldEdges ++ newEdge).flatMap(e => Seq(e, (e._2, e._1)))
      .toDF("src", "dst")
    val upd = GraphEvents.incrementalCC(spark, labels, all, newEdge.toDF("src", "dst"))
    val got = upd.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.values.toSet == Set(0L))
  }

  test("decremental CC repairs a split component; add->remove->add = cold recompute") {
    val s = spark
    import s.implicits._
    def biOf(es: Seq[(Long, Long)]) =
      es.flatMap(e => Seq(e, (e._2, e._1))).toDF("src", "dst")
    // ring 0-1-2-3-0 plus tail 3-4, separate pair 10-11; labels at fixpoint.
    val edges0 = Seq((0L, 1L), (1L, 2L), (2L, 3L), (0L, 3L), (3L, 4L), (10L, 11L))
    val labels0 = Seq((0L, 0L), (1L, 0L), (2L, 0L), (3L, 0L), (4L, 0L),
      (10L, 10L), (11L, 10L)).toDF("id", "label")
    // remove 2-3 (ring survives via 0-3: no split) then 0-3 (now 3,4 split off... no:
    // 3 still reaches 2 via... edges left: 0-1,1-2,3-4 -> {0,1,2} and {3,4}).
    val edges1 = edges0.filterNot(e => e == (2L, 3L) || e == (0L, 3L))
    val l1 = GraphEvents.decrementalCC(spark, labels0, biOf(edges1),
      Seq((2L, 3L), (0L, 3L)).toDF("src", "dst"))
    val got1 = l1.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got1 == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 3L, 4L -> 3L,
      10L -> 10L, 11L -> 10L))
    // re-add 0-3: incremental insert merges back to the original labeling.
    val l2 = GraphEvents.incrementalCC(spark, l1,
      biOf(edges1 :+ (0L -> 3L)), Seq((0L, 3L)).toDF("src", "dst"))
    val got2 = l2.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // cold recompute on the same edge set for comparison
    val cold = graft.algo.ConnectedComponents.run(spark,
      graft.model.LinkGraph.fromEdges(spark,
        (edges1 :+ (0L -> 3L)).map(e => (e._1, e._2, 1.0)).toDF("src", "dst", "weight"),
        Some(Seq(0L, 1L, 2L, 3L, 4L, 10L, 11L).toDF("id")))).labels
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got2 == cold)
  }
}
