package graft.tools

/** Spark-free process-scaling microbenchmark — the box's own ceiling.
  *
  * The north rule asks for >=0.8 throughput scaling efficiency from N to 4N workers.
  * On a single shared-memory VM that target is only meaningful relative to what the
  * MACHINE can do for an embarrassingly parallel, zero-communication workload: if 4x
  * independent processes only deliver ~3x aggregate throughput, no engine on top of
  * them can do better. This main is that control experiment, invoked by
  * [[graft.Bench]] as `k` SEPARATE OS processes (fresh JVMs, no Spark classes touched,
  * no shared heap, no locks, no shuffle) so the measured ceiling is a property of the
  * hardware/VM, not of Spark or of a shared JVM.
  *
  * Child protocol: `ProcBench <mode> <millis>` runs the workload for a fixed wall
  * duration after a warmup and prints ONE line `ops=<count>`; the parent sums
  * children's ops and divides by the duration.
  *
  *   - mode=alu: xorshift64 loop, fully cache/register resident — pure core scaling.
  *   - mode=stream: strided sums over a 64 MB long array — DRAM bandwidth scaling,
  *     the resource PageRank's hash exchanges actually contend on.
  */
object ProcBench {

  private def aluChunk(seed: Long, iters: Int): Long = {
    var x = seed | 1L
    var i = 0
    while (i < iters) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      i += 1
    }
    x
  }

  private def streamChunk(a: Array[Long]): Long = {
    var s = 0L
    var i = 0
    val n = a.length
    while (i < n) { s += a(i); i += 8 } // one touch per 64B cache line
    s
  }

  /** Run `body` repeatedly for `millis` wall time; returns (chunks completed, sink). */
  private def runFor(millis: Long)(body: Int => Long): (Long, Long) = {
    val deadline = System.nanoTime() + millis * 1000000L
    var chunks = 0L
    var sink = 0L
    while (System.nanoTime() < deadline) {
      sink ^= body(chunks.toInt + 1)
      chunks += 1
    }
    (chunks, sink)
  }

  def main(args: Array[String]): Unit = {
    val mode = args(0)
    val millis = args(1).toLong
    val (warm, timed) = (millis / 4, millis)
    mode match {
      case "alu" =>
        runFor(warm)(i => aluChunk(i, 1 << 20)) // JIT warmup
        val (chunks, sink) = runFor(timed)(i => aluChunk(i, 1 << 20))
        println(s"ops=${chunks * (1L << 20)} sink=$sink")
      case "stream" =>
        val a = new Array[Long](8 * 1024 * 1024) // 64 MB — far beyond L3 per process
        var i = 0
        while (i < a.length) { a(i) = i.toLong; i += 1 }
        runFor(warm)(_ => streamChunk(a))
        val (chunks, sink) = runFor(timed)(_ => streamChunk(a))
        println(s"ops=${chunks * (a.length / 8)} sink=$sink")
      case other => sys.error(s"unknown mode $other")
    }
  }

  /** Parent-side harness: spawn `k` fresh JVM children of this main, sum their ops.
    * Returns aggregate ops/sec at parallelism k. */
  def aggregateThroughput(mode: String, k: Int, millis: Long = 2000L): Double = {
    val java = s"${System.getProperty("java.home")}/bin/java"
    val cp = System.getProperty("java.class.path")
    val procs = (0 until k).map { _ =>
      new ProcessBuilder(java, "-Xmx256m", "-cp", cp, "graft.tools.ProcBench",
        mode, millis.toString)
        .redirectErrorStream(true).start()
    }
    val ops = procs.map { p =>
      val out = new String(p.getInputStream.readAllBytes())
      p.waitFor()
      out.linesIterator.collectFirst {
        case l if l.startsWith("ops=") => l.drop(4).takeWhile(_.isDigit).toLong
      }.getOrElse(0L)
    }.sum
    ops.toDouble / (millis / 1000.0)
  }
}
