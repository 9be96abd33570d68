package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.algo.{ConnectedComponents, LabelPropagation, PageRank, Triangles}
import graft.model.LinkGraph
import graft.text.{Dedup, TextOps}
import graft.emb.Embeddings

/** Round benchmark (driver contract): ONE JSON line on stdout.
  *
  * Headline metric (BASELINE.json): edges processed per second per PageRank iteration +
  * iterations-to-convergence on the synthetic Common-Crawl-style link graph, plus
  * throughput scaling efficiency between two parallelism levels (local[N] vs local[4N]
  * stands in for the N- vs 4N-executor cluster — same input, shuffle partitions scaled
  * proportionally; see BENCH.md).
  *
  * Protocol (mirrors /root/reference/benchmark/Benchmark.py:166-283): warm-up run of the
  * iterate loop via graph materialization, then timed kernels; per-kernel edges/s rows.
  */
object Bench {

  private def session(cores: Int, partitions: Int = 0): SparkSession = {
    // AQE off for the benchmark sessions: the iterative loops rely on stable
    // co-partitioning across iterations (see PageRank's shuffle_hash notes); AQE's
    // per-stage re-planning would re-coalesce the exchange and break partitioning
    // reuse, and its per-query-stage scheduling adds driver latency per iteration.
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-$cores")
      .config("spark.sql.shuffle.partitions",
        if (partitions > 0) partitions else cores)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def timed[T](body: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  /** PageRank edge-iteration throughput at `cores` parallelism: fixed 10 damped float
    * iterations (tol=0 disables early exit) over the pre-built scale graph loaded from
    * `edgesDir` (built ONCE at full parallelism — the low-core legs must not pay a
    * low-core ingest). The scaling measurement replicates the page table until
    * per-iteration compute dominates Spark's fixed job overhead (otherwise the
    * efficiency ratio measures scheduler latency, not the engine) — same input at every
    * parallelism level, so the comparison is apples-to-apples. */
  private def pagerankThroughput(edgesDir: String, cores: Int,
                                 iters: Int = 10): (Double, Long) = {
    // 4 partitions per core: measured sweet spot (BENCH.md partMult sweep) — per-task
    // aggregation maps shrink to ~n/P keys and stay cache-resident.
    val spark = session(cores, cores * 4)
    val g = LinkGraph.fromEdges(spark,
      spark.read.parquet(s"$edgesDir/edges"),
      Some(spark.read.parquet(s"$edgesDir/verts")))
    PageRank.run(spark, g, tol = 0.0, maxIter = 2) // warm-up (JIT + shuffle files)
    val (_, secs) = timed {
      PageRank.run(spark, g, damp = 0.85, tol = 0.0, maxIter = iters)
        .ranks.agg(sum("score")).head()
    }
    val eps = g.m.toDouble * iters / secs
    spark.stop()
    (eps, g.m)
  }

  /** Build the replicated scale graph once (at full parallelism) and park it as
    * parquet for the per-core scaling legs. Returns (dir, m). */
  private def buildScaleGraph(sfDir: String, cpus: Int, replicate: Long): (String, Long) = {
    val spark = session(cpus, cpus * 4)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val g = LinkGraph.build(spark,
      graft.synth.PageTableGen.fromDocuments(spark, docs, replicate))
    val dir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/root/repo/target"), "bench_scale").toString
    g.edges.write.mode("overwrite").parquet(s"$dir/edges")
    g.vertices.write.mode("overwrite").parquet(s"$dir/verts")
    val m = g.m
    spark.stop()
    (dir, m)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = session(cpus)

    val (g, buildSecs) = timed(LinkGraph.forSf(spark, sfDir))
    val m = g.m

    // Headline: PageRank to convergence at the reference benchmark tolerance
    // (nk.py:152 uses tol=1e-6).
    val (pr, prSecs) = timed(PageRank.run(spark, g, damp = 0.85, tol = 1e-6, maxIter = 100))
    pr.ranks.count()
    val prIters = pr.iterations
    val prEps = m.toDouble * prIters / prSecs

    val (cc, ccSecs) = timed {
      val r = ConnectedComponents.run(spark, g); r.labels.count(); r
    }
    val (_, plpSecs) = timed { LabelPropagation.fixedRounds(spark, g, 5).count() }
    val (tri, triSecs) = timed(Triangles.globalCount(spark, g))

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val (_, dedupSecs) = timed(TextOps.dedupExact(docs).count())
    val (_, mhSecs) = timed(Dedup.minhashNearDups(docs, 0.5).count())
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val (_, annSecs) = timed(Embeddings.bruteTopK(emb).count())
    spark.stop()

    // Scaling evidence: identical fixed-iteration PageRank job over the SAME pre-built
    // graph at three parallelism levels — two 4x pairs (2->8 and 8->32). The low pair
    // runs in the regime below the box's memory-subsystem saturation; BENCH.md carries
    // the microbenchmark that pins the machine's own 4x-process ceiling (~0.75).
    val scaleJson =
      if (sys.env.get("SPARK_GRAFT_NO_SCALING").contains("1")) "null"
      else {
        val nCores = math.max(1, cpus / 4)
        val lowCores = math.max(1, cpus / 16)
        // Target ~30M edges for the scaling runs: iterations must cost seconds of real
        // compute or the ratio measures the per-iteration driver floor (BENCH.md).
        val replicate = sys.env.get("SPARK_GRAFT_REPLICATE").map(_.toLong)
          .getOrElse(math.max(1L, 30000000L / math.max(1L, m)))
        val (dir, scaleM) = buildScaleGraph(sfDir, cpus, replicate)
        val (epsLow, _) = pagerankThroughput(dir, lowCores)
        val (epsN, _) = pagerankThroughput(dir, nCores)
        val (eps4N, _) = pagerankThroughput(dir, cpus)
        val eff = eps4N / (4.0 * epsN)
        val effLow = epsN / (4.0 * epsLow)
        s"""{"cores_low":$lowCores,"cores_n":$nCores,"cores_4n":$cpus,"scale_m":$scaleM,""" +
          s""""eps_low":$epsLow,"eps_n":$epsN,"eps_4n":$eps4N,""" +
          s""""efficiency_low":$effLow,"efficiency":$eff}"""
      }

    val queries = Seq(
      "build_graph" -> buildSecs, "pagerank_conv" -> prSecs, "components" -> ccSecs,
      "plp5" -> plpSecs, "triangles" -> triSecs, "dedup_exact" -> dedupSecs,
      "minhash_lsh" -> mhSecs, "ann_topk" -> annSecs)
      .map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")

    println(
      s"""{"metric":"pagerank_edges_per_iter_per_sec","value":$prEps,"unit":"edges/s",""" +
        s""""queries":$queries,"sf":"$sfDir","m":$m,"n":${g.n},""" +
        s""""pagerank_iterations":$prIters,"pagerank_secs":$prSecs,""" +
        s""""cc_rounds":${cc.rounds},"triangles":$tri,""" +
        s""""cores":$cpus,"scaling":$scaleJson}""")
  }
}
