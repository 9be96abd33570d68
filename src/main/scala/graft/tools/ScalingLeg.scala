package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.algo.PageRank
import graft.model.LinkGraph

/** One scaling-measurement leg in a FRESH JVM: `ScalingLeg <edgesDir> <cores> <iters>`
  * loads the pre-built scale graph, runs a 3-iteration warm-up + `iters` fixed damped
  * PageRank iterations at local[cores], and prints ONE line `eps=<edges/s/iter>`.
  *
  * Child-process isolation is the point: when all legs share one JVM, heap aging and
  * accumulated shuffle/GC state from earlier (bigger) legs degrade later legs by 2×
  * (measured in BENCH.md round 3) — a fresh process per leg makes the legs
  * order-independent, the same reason [[ProcBench]] spawns children for the hardware
  * ceiling. */
object ScalingLeg {
  /** Shuffle home for the measurement legs: this box's /tmp sits on a virtio disk,
    * and 32 concurrent shuffle writers + host-level disk contention made the wide
    * legs bimodal (r3 recorded 32-core samples [3.0, 3.1, 9.8] M eps; with tmpfs
    * shuffle the same legs measure [11.3, 11.7] M — stable). Shuffle files are
    * transient per-leg, so tmpfs is their right home; on a real cluster this is
    * NVMe/local-SSD spark.local.dir provisioning, standard practice. */
  def fastLocalDir: Option[String] = {
    val d = new java.io.File("/dev/shm")
    if (d.isDirectory && d.canWrite) Some("/dev/shm/graft-shuffle") else None
  }

  /** Shared measurement-session shuffle tuning:
    *   - spark.local.dir on tmpfs when available (see [[fastLocalDir]]);
    *   - bypassMergeThreshold 64: Spark's bypass-merge shuffle writes
    *     maps × reduces files per exchange — at 128 reduce partitions the
    *     concatenation churn (FileChannel map/copy, measured via thread dumps: all
    *     32 workers inside copyFileStreamNIO) cost the 32-core minhash leg 5× and
    *     the 32-core PageRank gate leg ~20%. Above 64 reduces the regular sort
    *     shuffle (one output file per map task) takes over — which is also what any
    *     real cluster runs, since production partition counts exceed the default
    *     200 threshold anyway; below it, bypass-merge stays (faster at ≤32
    *     partitions, measured 14.1 vs 12.1 M eps at pm=1). */
  def withFastShuffle(b: SparkSession.Builder): SparkSession.Builder =
    fastLocalDir.fold(b)(d => b.config("spark.local.dir", d))
      .config("spark.shuffle.sort.bypassMergeThreshold", "64")

  def main(args: Array[String]): Unit = {
    // Optional leading mode selector: `pagerank` (default) measures PageRank
    // edge-iteration throughput on a pre-built scale graph; `minhash` / `ann`
    // measure the LLM-pipeline flagships (MinHash-LSH near-dup, brute cosine top-k)
    // on the sf dir's documents/embeddings tables — same fresh-JVM leg protocol, so
    // the dedup/ANN 100 TB claims carry a measured N->4N number too (VERDICT r3).
    val (mode, rest) =
      if (args.nonEmpty && Set("pagerank", "minhash", "ann").contains(args(0)))
        (args(0), args.drop(1))
      else ("pagerank", args)
    if (mode != "pagerank") { pipelineLeg(mode, rest); return }
    val args2 = rest
    val edgesDir = args2(0)
    val cores = args2(1).toInt
    val iters = args2(2).toInt
    // Warm-up sized for a FRESH JVM: C2/codegen compilation costs near-constant
    // wall-clock, which is a negligible fraction of a 2-core leg but 25-45% of an
    // 8/32-core leg at 3 warm-up iterations (measured: 8-core eps 5.5M cold vs 7.2M
    // JIT-warm in the r2 shared-JVM first round). Default 8 restores parity.
    val warm = if (args2.length > 3) args2(3).toInt else 8
    // partitions-per-core: 4 = the scaling-gate protocol (constant per-core task
    // granularity across legs); 1 = peak-throughput configuration (fewest task
    // switches — measured 2x faster at 32 cores on the same input)
    val partMult = if (args2.length > 4) args2(4).toInt
      else sys.env.getOrElse("SPARK_GRAFT_PART_MULT", "4").toInt
    // SPARK_GRAFT_EXEC_CORES=c: run the leg as local-cluster[cores/c, c, mem] —
    // separate executor JVMs of a FIXED shape, so the N->4N step is 4x executors of
    // the same size (the cluster-scaling simulation; shuffle blocks cross real
    // process + netty boundaries instead of a shared heap). Default: local[cores].
    val execCores = sys.env.get("SPARK_GRAFT_EXEC_CORES").map(_.toInt).getOrElse(0)
    val execMemMb = sys.env.getOrElse("SPARK_GRAFT_EXEC_MEM_MB", "6144")
    val builder0 = withFastShuffle(SparkSession.builder())
      .master(if (execCores > 0) s"local-cluster[${cores / execCores},$execCores,$execMemMb]"
              else s"local[$cores]")
      .appName(s"graft-scaling-leg-$cores")
      .config("spark.sql.shuffle.partitions", cores * partMult)
      .config("spark.sql.adaptive.enabled", "false") // stable co-partitioning (Bench.session)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    val spark = (if (execCores > 0)
      builder0
        .config("spark.executor.extraClassPath", sys.props.getOrElse("java.class.path", ""))
        .config("spark.executor.memory", s"${execMemMb}m")
      else builder0).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val g = LinkGraph.fromEdges(spark,
      spark.read.parquet(s"$edgesDir/edges"),
      Some(spark.read.parquet(s"$edgesDir/verts")))
    PageRank.run(spark, g, tol = 0.0, maxIter = warm) // warm-up (JIT + shuffle files)
    val t0 = System.nanoTime()
    PageRank.run(spark, g, damp = 0.85, tol = 0.0, maxIter = iters)
      .ranks.agg(sum("score")).head()
    val secs = (System.nanoTime() - t0) / 1e9
    val eps = g.m.toDouble * iters / secs
    spark.stop()
    println(s"eps=$eps m=${g.m} secs=$secs")
  }

  /** LLM-pipeline scaling leg: `ScalingLeg minhash|ann <sfDir> <cores> <reps> <warm>`.
    * Runs `warm` unmeasured + `reps` measured passes of the flagship operator and
    * prints `eps=<rows/s>` (rows = input docs/embeddings per pass). Each pass calls
    * the SAME entry the per-round bench times (Dedup.minhashNearDups /
    * Embeddings.bruteTopK); repetition makes the measured phase long enough that the
    * per-job driver floor doesn't dominate the wide leg. */
  private def pipelineLeg(mode: String, args: Array[String]): Unit = {
    val sfDir = args(0)
    val cores = args(1).toInt
    val reps = args(2).toInt
    val warm = if (args.length > 3) args(3).toInt else 2
    val pipePartMult = sys.env.getOrElse("SPARK_GRAFT_PART_MULT", "4").toInt
    val spark = withFastShuffle(SparkSession.builder())
      .master(s"local[$cores]")
      .appName(s"graft-$mode-leg-$cores")
      .config("spark.sql.shuffle.partitions", cores * pipePartMult)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // The sf tables are fixture-sized (5k docs / 2k vectors at sf0.1) — far too
    // small to exercise 32 cores: the first recording measured a 32-core minhash
    // leg 3.6x SLOWER than 8-core purely on fixed scheduling overhead. Like the
    // PageRank legs' replicated page table, the corpus is replicated to a
    // measurement scale; each doc replica gets a per-word replica suffix so
    // replicas are NOT near-duplicates of each other (shingle sets are disjoint
    // across replicas — the dedup structure per replica matches the original).
    // SPARK_GRAFT_LEG_STATS=1: per-stage task-time breakdown of the measured passes
    // (the ScalingProbe listener, here for the pipeline legs) — used to attribute
    // the dedup/ANN wide-leg efficiency.
    val stageTime = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long, Int)]()
    val taskTime = new java.util.concurrent.atomic.AtomicLong(0)
    val cpuTime = new java.util.concurrent.atomic.AtomicLong(0)
    val gcTime = new java.util.concurrent.atomic.AtomicLong(0)
    if (sys.env.get("SPARK_GRAFT_LEG_STATS").contains("1"))
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          taskTime.addAndGet(te.taskInfo.duration)
          cpuTime.addAndGet(te.taskMetrics.executorCpuTime)
          gcTime.addAndGet(te.taskMetrics.jvmGCTime)
          stageTime.merge(te.stageId, ("", te.taskInfo.duration, 1),
            (a, b) => (a._1, a._2 + b._2, a._3 + b._3))
        }
        override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          stageTime.merge(sc.stageInfo.stageId, (sc.stageInfo.name, 0L, 0),
            (a, b) => (sc.stageInfo.name, a._2, a._3))
      })
    def timedPasses(n: Long, pass: () => Unit): Unit = {
      (1 to warm).foreach(_ => pass())
      stageTime.clear(); taskTime.set(0); cpuTime.set(0); gcTime.set(0)
      val t0 = System.nanoTime()
      (1 to reps).foreach(_ => pass())
      val secs = (System.nanoTime() - t0) / 1e9
      println(s"eps=${n.toDouble * reps / secs} m=$n secs=$secs")
      if (sys.env.get("SPARK_GRAFT_LEG_STATS").contains("1")) {
        println(f"STATS taskSum=${taskTime.get() / 1000.0}%.1fs avgPar=${taskTime.get() / 1000.0 / secs}%.1f " +
          f"cpu=${cpuTime.get() / 1e9}%.1fs gc=${gcTime.get() / 1000.0}%.1fs")
        import scala.jdk.CollectionConverters._
        stageTime.asScala.toSeq.sortBy(-_._2._2).take(8).foreach { case (id, (nm, t, c)) =>
          println(f"  STAGE $id%d ${nm.take(70)}%s tasks=$c%d sum=${t / 1000.0}%.1fs")
        }
      }
    }
    mode match {
      case "minhash" =>
        val raw = spark.read.parquet(s"$sfDir/documents.parquet")
        val rep = math.max(1L, 200000L / math.max(1L, raw.count()))
        val docs = raw
          .crossJoin(spark.range(rep).select(col("id").as("rep")))
          .select((col("doc_id") * rep + col("rep")).as("doc_id"),
            expr("array_join(transform(split(text, ' '), " +
              "w -> concat(w, '_', CAST(rep AS STRING))), ' ')").as("text"),
            col("lang"), col("source"), col("n_chars"))
          // The fixture parquet is ONE file = ONE input partition; without this the
          // whole shingling stage runs in a single task (31 of 32 threads parked —
          // measured; this, not fixture size, was the "32 cores slower than 8").
          .repartition(cores * pipePartMult, col("doc_id"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val n = docs.count()
        timedPasses(n, () => { graft.text.Dedup.minhashNearDups(docs, 0.5).count(); () })
      case "ann" =>
        val raw = spark.read.parquet(s"$sfDir/embeddings.parquet")
        val rep = math.max(1L, 200000L / math.max(1L, raw.count()))
        val emb = raw
          .crossJoin(spark.range(rep).select(col("id").as("rep")))
          .select((col("vec_id") * rep + col("rep")).as("vec_id"),
            col("embedding"), col("label"))
          .repartition(cores * pipePartMult, col("vec_id")) // one-file fixture -> one partition
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val n = emb.count()
        timedPasses(n, () => { graft.emb.Embeddings.bruteTopK(emb).count(); () })
    }
    spark.stop()
  }
}
