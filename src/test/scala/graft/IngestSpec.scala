package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ingest.Ingest
import graft.model.LinkGraph
import graft.synth.{GraphSpec, PageTableGen}

class IngestSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"
  lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(50)
  lazy val pages = PageTableGen.fromDocuments(spark, docs)

  test("row-level invariant: extracted text is byte-identical per url") {
    val bad = pages
      .withColumn("back", Ingest.extractText(col("html")))
      .filter(col("back") =!= col("text") ||
        sha2(col("back").cast("binary"), 256) =!= sha2(col("text").cast("binary"), 256))
      .count()
    assert(bad == 0L)
    assert(pages.count() == 50L * GraphSpec.PagesPerDoc)
  }

  test("dense dictionary reproduces page ids (url order == id order)") {
    val dict = Ingest.denseDictionary(pages)
    val mism = dict
      .withColumn("p", regexp_extract(col("url"), "p(\\d+)$", 1).cast("long"))
      .filter(col("p") =!= col("id")).count()
    assert(mism == 0L)
  }

  test("pipeline edges == arithmetic-spec edges (html roundtrip is lossless)") {
    // Engine path: html -> regex extraction -> dictionary joins.
    val g = LinkGraph.build(spark, pages)
    // Spec path: the same edge set straight from the LCG arithmetic (Spark dialect).
    val view = "ingest_spec_docs"
    docs.createOrReplaceTempView(view)
    val dst = GraphSpec.dstSql("p", "j", "n", duck = false)
    val spec = spark.sql(
      s"""WITH nn AS (SELECT count(*)*${GraphSpec.PagesPerDoc} AS n FROM $view),
         |pg AS (SELECT doc_id*${GraphSpec.PagesPerDoc} + s AS p, n FROM $view CROSS JOIN nn
         |       LATERAL VIEW explode(sequence(0, ${GraphSpec.PagesPerDoc - 1})) t AS s),
         |lk AS (SELECT p AS src, $dst AS dst FROM pg
         |       LATERAL VIEW explode(sequence(0, 14)) u AS j
         |       WHERE j < ${GraphSpec.degSql("p", duck = false)})
         |SELECT DISTINCT src, dst FROM lk WHERE src != dst""".stripMargin)
    assert(g.edges.select("src", "dst").exceptAll(spec).count() == 0L)
    assert(spec.exceptAll(g.edges.select("src", "dst")).count() == 0L)
  }

  test("hashed dictionary has no collisions on this corpus") {
    val dict = Ingest.hashedDictionary(pages)
    assert(dict.select("id").distinct().count() == dict.count())
  }
}

class ResumeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("PageRank resumes from the last complete checkpoint and matches a fresh run") {
    val dir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/root/repo/target"), "ckpt").toString
    val g = LinkGraph.fromEdges(spark,
      TestSpark.undirected(Fixtures.karateEdges.map(e => (e._1, e._2, 1.0))))
    // Phase 1: run 3 iterations, then "die".
    graft.algo.PageRank.run(spark, g, tol = 0.0, maxIter = 3, checkpointDir = Some(dir))
    val job = graft.iterate.IterativeJob(spark, Some(dir), "pagerank")
    assert(job.lastCompleteIteration == 2)
    // Phase 2: resume to 8 total iterations.
    val resumed = graft.algo.PageRank.run(spark, g, tol = 0.0, maxIter = 8, checkpointDir = Some(dir))
    val fresh = graft.algo.PageRank.run(spark, g, tol = 0.0, maxIter = 8)
    val a = resumed.ranks.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = fresh.ranks.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    a.foreach { case (k, v) => assert(math.abs(v - b(k)) < 1e-12) }
    assert(job.lastCompleteIteration == 7)
    // Manifest carries per-partition lineage + convergence metrics.
    val manifest = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$dir/pagerank/manifest.jsonl"))
    assert(manifest.contains("\"checksum\""))
    assert(manifest.contains("\"metric\":\"l2_delta\""))
  }
}
