package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.algo.PageRank
import graft.model.LinkGraph
import graft.synth.PageTableGen

/** Throwaway experiment harness: PageRank iteration throughput across (cores,
  * partition-multiplier, graph-size) — drives the scaling-efficiency tuning in
  * BENCH.md. Args: sfDir replicate iters cores[,cores...] partMult */
object ScalingProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val replicate = args(1).toLong
    val iters = args(2).toInt
    val coresList = args(3).split(",").map(_.toInt)
    val partMult = args(4).toInt
    coresList.foreach { cores =>
      // PROBE_EXECUTORS=k: local-cluster[k, cores/k, mem] — real executor JVMs.
      // PROBE_EXEC_CORES=c: local-cluster[cores/c, c, mem] — FIXED executor shape, the
      // cluster-scaling simulation (4N cores = 4x executors of the same size).
      val execs = sys.env.get("PROBE_EXECUTORS").map(_.toInt).getOrElse(0)
      val execCores = sys.env.get("PROBE_EXEC_CORES").map(_.toInt).getOrElse(0)
      val execMem = sys.env.get("PROBE_EXEC_MEM").getOrElse("8192")
      val master =
        if (execCores > 0) s"local-cluster[${cores / execCores},$execCores,$execMem]"
        else if (execs > 0) s"local-cluster[$execs,${cores / execs},$execMem]"
        else s"local[$cores]"
      val b = SparkSession.builder()
        .master(master)
        .appName(s"probe$cores")
        .config("spark.sql.shuffle.partitions", cores * partMult)
        .config("spark.executor.extraClassPath",
          sys.props.getOrElse("java.class.path", ""))
        .config("spark.ui.enabled", "false")
      // local-cluster workers advertise capacity; the executor JVM heap still comes
      // from spark.executor.memory — without this they run on the 1g default.
      if (execCores > 0 || execs > 0) b.config("spark.executor.memory", s"${execMem}m")
      if (sys.env.get("PROBE_TUNED").contains("1")) {
        b.config("spark.sql.adaptive.enabled", "false")
          .config("spark.sql.autoBroadcastJoinThreshold", "-1")
          .config("spark.sql.join.preferSortMergeJoin", "false")
      }
      if (sys.env.get("PROBE_NOAQE").contains("1"))
        b.config("spark.sql.adaptive.enabled", "false")
      sys.env.get("PROBE_PAGE").foreach(p => b.config("spark.buffer.pageSize", p))
      if (sys.env.get("PROBE_NOCOMP").contains("1")) {
        b.config("spark.shuffle.compress", "false")
          .config("spark.shuffle.spill.compress", "false")
          .config("spark.local.dir", "/dev/shm/spark-graft")
      }
      if (sys.env.get("PROBE_NOBC").contains("1")) {
        b.config("spark.sql.autoBroadcastJoinThreshold", "-1")
          .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      }
      val spark = b.getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      // PROBE_EDGES=dir caches the built edge/vertex tables as parquet so the N- and
      // 4N-core sessions (and repeated sweeps) skip the ~6 min ingest.
      val g = sys.env.get("PROBE_EDGES") match {
        case Some(dir) if new java.io.File(s"$dir/edges").exists() =>
          LinkGraph.fromEdges(spark, spark.read.parquet(s"$dir/edges"),
            Some(spark.read.parquet(s"$dir/verts")))
        case cache =>
          val docs = spark.read.parquet(s"$sfDir/documents.parquet")
          val built = LinkGraph.build(spark, PageTableGen.fromDocuments(spark, docs, replicate))
          cache.foreach { dir =>
            built.edges.write.mode("overwrite").parquet(s"$dir/edges")
            built.vertices.write.mode("overwrite").parquet(s"$dir/verts")
          }
          built
      }
      // warmup: 2 iterations
      PageRank.run(spark, g, tol = 0.0, maxIter = 2)
      val taskTime = new java.util.concurrent.atomic.AtomicLong(0)
      val taskCount = new java.util.concurrent.atomic.AtomicLong(0)
      val gcTime = new java.util.concurrent.atomic.AtomicLong(0)
      val cpuTime = new java.util.concurrent.atomic.AtomicLong(0)
      val memSpill = new java.util.concurrent.atomic.AtomicLong(0)
      val diskSpill = new java.util.concurrent.atomic.AtomicLong(0)
      val shWrite = new java.util.concurrent.atomic.AtomicLong(0)
      val deserTime = new java.util.concurrent.atomic.AtomicLong(0)
      val stageTime = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long, Int)]()
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          taskTime.addAndGet(te.taskInfo.duration)
          gcTime.addAndGet(te.taskMetrics.jvmGCTime)
          cpuTime.addAndGet(te.taskMetrics.executorCpuTime)
          memSpill.addAndGet(te.taskMetrics.memoryBytesSpilled)
          diskSpill.addAndGet(te.taskMetrics.diskBytesSpilled)
          shWrite.addAndGet(te.taskMetrics.shuffleWriteMetrics.bytesWritten)
          deserTime.addAndGet(te.taskMetrics.executorDeserializeTime)
          taskCount.incrementAndGet()
          stageTime.merge(te.stageId, ("", te.taskInfo.duration, 1),
            (a, b) => (a._1, a._2 + b._2, a._3 + b._3))
        }
        override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          stageTime.merge(sc.stageInfo.stageId, (sc.stageInfo.name, 0L, 0),
            (a, b) => (sc.stageInfo.name, a._2, a._3))
      })
      val t0 = System.nanoTime()
      PageRank.run(spark, g, tol = 0.0, maxIter = iters)
      val secs = (System.nanoTime() - t0) / 1e9
      val eps = g.m.toDouble * iters / secs
      val par = taskTime.get() / 1000.0 / secs
      println(f"PROBE cores=$cores%d partMult=$partMult%d m=${g.m}%d iters=$iters%d secs=$secs%.2f eps=$eps%.0f tasks=${taskCount.get()}%d taskSum=${taskTime.get() / 1000.0}%.1fs avgPar=$par%.1f gc=${gcTime.get() / 1000.0}%.1fs cpu=${cpuTime.get() / 1e9}%.1fs deser=${deserTime.get() / 1000.0}%.1fs spillMem=${memSpill.get() / 1e6}%.0fMB spillDisk=${diskSpill.get() / 1e6}%.0fMB shWrite=${shWrite.get() / 1e6}%.0fMB")
      import scala.jdk.CollectionConverters._
      stageTime.asScala.toSeq.sortBy(-_._2._2).take(6).foreach { case (id, (nm, t, c)) =>
        println(f"  STAGE $id%d ${nm.take(60)}%s tasks=$c%d sum=${t / 1000.0}%.1fs")
      }
      spark.stop()
    }
  }
}
