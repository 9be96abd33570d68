package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths, StandardOpenOption}
import java.util.concurrent.{ConcurrentLinkedQueue, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Round-4 hardening (VERDICT r3 item 1 — the r3 artifact recorded ZERO queries
  * because the serial 190-query pass outran the driver's wall clock):
  *   - oracle_sql.json is written FIRST, before any query runs, so a mid-pass
  *     timeout still leaves the driver a comparable partial artifact;
  *   - independent queries run concurrently on a small thread pool (they share
  *     the session; the per-graph caches in LinkGraph / Triangles /
  *     LabelPropagation are computeIfAbsent-safe), cutting the wall ~4x;
  *   - each query runs under its own Spark job group with a watchdog cancel at
  *     SPARK_GRAFT_QUERY_CAP_SEC (default 1800 s), so one pathological query can
  *     never stall the whole pass;
  *   - per-query status/timing appends to progress.jsonl as each query lands.
  */
object Verify {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    // optional 3rd arg: comma-separated query names — run only those (local iteration;
    // the driver always runs the full set with 2 args)
    val only: Option[Set[String]] = args.lift(2).map(_.split(",").toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val threads = sys.env.getOrElse("SPARK_GRAFT_VERIFY_THREADS", "4").toInt
    // Cap sized from the measured tail: the slowest query (q_erd_matrix) runs ~16 min
    // when 4 queries share the cores; the cap is a hang backstop, not a budget.
    val capSec = sys.env.getOrElse("SPARK_GRAFT_QUERY_CAP_SEC", "1800").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()

    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // Oracle SQL lands BEFORE the first query so a wall-clock kill mid-pass still
    // yields a partial-but-comparable artifact instead of {}.
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)

    val progress = Paths.get(s"$outDir/progress.jsonl")
    def logProgress(line: String): Unit = synchronized {
      Files.writeString(progress, line + "\n",
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    }

    val todo = SparkEntry.queries.toSeq
      .filter { case (name, _) => only.forall(_.contains(name)) }
    // Budget classes (VERDICT r4 item 6): the five known-heavy queries (measured
    // 216-819 s at 4-way concurrency in the r4 progress.jsonl) run FIRST at 2-way
    // concurrency — each gets ~half the cores instead of a quarter — under a 4x cap,
    // so a future sf bump can't push the tail into the watchdog and zero the round.
    val heavySet = Set("q_erd_matrix", "q_eff_diameter_exact", "q_diameter_exact",
      "q_eff_resistance", "q_electrical_closeness")
    val done = new AtomicInteger(0)
    val failures = new ConcurrentLinkedQueue[String]()
    val watchdog = Executors.newScheduledThreadPool(1)
    val t0 = System.nanoTime()

    def runOne(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
               cap: Long): Unit = {
      val group = s"verify-$name"
      spark.sparkContext.setJobGroup(group, name, interruptOnCancel = true)
      val worker = Thread.currentThread()
      val finished = new java.util.concurrent.atomic.AtomicBoolean(false)
      // The job-group cancel only interrupts Spark jobs; driver-side loops between
      // jobs (iterative while-loops, collected traversals, generator logic) need the
      // worker thread itself interrupted or they'd pin a pool slot to the 24h join.
      val cancel = watchdog.schedule(new Runnable {
        def run(): Unit = if (!finished.get) {
          System.err.println(s"[verify] $name exceeded ${cap}s — cancelling job group + interrupting worker")
          spark.sparkContext.cancelJobGroup(group)
          if (!finished.get) worker.interrupt()
        }
      }, cap, TimeUnit.SECONDS)
      val qt0 = System.nanoTime()
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        val secs = (System.nanoTime() - qt0) / 1e9
        logProgress(s"""{"query": ${q(name)}, "status": "ok", "secs": $secs}""")
      } catch { case e: Throwable =>
        val secs = (System.nanoTime() - qt0) / 1e9
        failures.add(name)
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        logProgress(s"""{"query": ${q(name)}, "status": "fail", "secs": $secs, "error": ${q(String.valueOf(e.getMessage))}}""")
      } finally {
        finished.set(true)
        cancel.cancel(false)
        Thread.interrupted() // clear a late watchdog interrupt so it can't poison the pool slot's next task
        spark.sparkContext.clearJobGroup()
        val d = done.incrementAndGet()
        if (d % 20 == 0 || d == todo.size)
          System.err.println(f"[verify] $d/${todo.size} queries done, wall ${(System.nanoTime() - t0) / 1e9}%.0f s")
      }
    }

    def runBatch(batch: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)],
                 nThreads: Int, cap: Long): Unit = {
      if (batch.isEmpty) return
      val pool = Executors.newFixedThreadPool(nThreads)
      batch.foreach { case (name, fn) =>
        pool.submit(new Runnable { def run(): Unit = runOne(name, fn, cap) })
      }
      pool.shutdown()
      pool.awaitTermination(24, TimeUnit.HOURS)
    }

    val (heavy, light) = todo.partition { case (name, _) => heavySet.contains(name) }
    runBatch(heavy, math.min(2, threads), capSec * 4)
    runBatch(light, threads, capSec)
    watchdog.shutdownNow()
    val wall = (System.nanoTime() - t0) / 1e9
    System.err.println(f"[verify] complete: ${todo.size - failures.size}/${todo.size} ok, wall $wall%.0f s, failures: ${failures.toString}")
    spark.stop()
  }
}
