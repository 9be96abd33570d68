package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.scalatest.funsuite.AnyFunSuite

import graft.algo.KCore
import graft.model.LinkGraph

/** Round-6 (round 3 of the build): incremental-degree core decomposition + the
  * process-ceiling microbenchmark harness. */
class Round6Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("coreness on a planted path: shuffle volume ∝ frontier, not rounds×m") {
    // Path 0-1-2-...-119: stage k=2 peels 2 endpoints per micro-round, ~60 rounds.
    // The old full-recompute plan shuffled the 2m-row bidirected table per round
    // (~60 × 238 × 2 joins ≈ 30k+ records); the incremental plan shuffles the initial
    // degree aggregation once plus per-round frontier contributions (~2-4 rows).
    val n = 120
    val edges = (0L until (n - 1).toLong).map(i => (i, i + 1, 1.0))
    val g = LinkGraph.fromEdges(spark, TestSpark.directed(edges))
    g.canonicalUndirected.count() // pre-materialize the shared view outside the window

    val shuffled = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null)
          shuffled.addAndGet(te.taskMetrics.shuffleWriteMetrics.recordsWritten)
    }
    spark.sparkContext.addSparkListener(listener)
    val result = try {
      val out = KCore.coreness(spark, g).collect()
      Thread.sleep(1000) // let the async listener bus drain
      out
    } finally spark.sparkContext.removeSparkListener(listener)

    assert(result.length == n)
    assert(result.forall(_.getLong(1) == 1L), "every path node has coreness 1")
    // Setup ≈ 3×m (bi repartition + degree agg + state) ≈ 1000; per-round ≈ frontier
    // ≈ 10 records × ~60 rounds. Full-recompute would exceed 30k.
    val recs = shuffled.get()
    assert(recs < 8000, s"coreness shuffled $recs records on a 120-node path")
  }

  test("coreness and kCore still match the direct peel on karate") {
    val g = LinkGraph.fromEdges(spark,
      TestSpark.directed(Fixtures.karateEdges.map(e => (e._1, e._2, 1.0))))
    val cn = KCore.coreness(spark, g).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // Karate degeneracy = 4; spot values from the reference's CoreDecomposition test
    // semantics: hubs 0/33 are 4-core, leaf 9 is 2-core.
    assert(cn(0L) == 4L && cn(33L) == 4L && cn(9L) == 2L)
    assert(cn.values.max == 4L)
    val core4 = KCore.kCore(spark, g, 4).collect().map(_.getLong(0)).toSet
    assert(core4 == cn.filter(_._2 >= 4L).keySet)
    val core3 = KCore.kCore(spark, g, 3).collect().map(_.getLong(0)).toSet
    assert(core3 == cn.filter(_._2 >= 3L).keySet)
  }

  test("coreness of an edgeless graph is all zeros; star center peels with leaves") {
    val iso = LinkGraph.fromEdges(spark,
      TestSpark.directed(Seq.empty[(Long, Long, Double)]),
      Some(spark.range(3).toDF("id")))
    assert(KCore.coreness(spark, iso).collect().forall(_.getLong(1) == 0L))
    // Star: center 0 with 5 leaves — all coreness 1 (center drops to deg 0 as leaves go).
    val star = LinkGraph.fromEdges(spark,
      TestSpark.directed((1L to 5L).map(i => (0L, i, 1.0))))
    assert(KCore.coreness(spark, star).collect().forall(_.getLong(1) == 1L))
  }

  test("SCC: bowtie fixture with trim tails, nested cycles, and min-id labels") {
    // SCCs: {0,1,2} (3-cycle), {3,4} (2-cycle fed by 2->3), trivial {5} (tail),
    // {6,7} (isolated 2-cycle), trivial {8} (pure source into the 3-cycle).
    val edges = Seq(
      (0L, 1L), (1L, 2L), (2L, 0L),
      (2L, 3L), (3L, 4L), (4L, 3L),
      (1L, 5L),
      (6L, 7L), (7L, 6L),
      (8L, 0L)).map(e => (e._1, e._2, 1.0))
    val g = LinkGraph.fromEdges(spark, TestSpark.directed(edges))
    val got = graft.algo.Scc.run(spark, g).labels.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 3L, 4L -> 3L,
      5L -> 5L, 6L -> 6L, 7L -> 6L, 8L -> 8L)
    assert(got == want)
  }

  test("SCC: a DAG is all-trivial; a full cycle is one component") {
    val dag = LinkGraph.fromEdges(spark,
      TestSpark.directed(Seq((0L, 1L), (0L, 2L), (1L, 3L), (2L, 3L)).map(e => (e._1, e._2, 1.0))))
    assert(graft.algo.Scc.run(spark, dag).labels.collect()
      .forall(r => r.getLong(0) == r.getLong(1)))
    val n = 9L
    val cyc = LinkGraph.fromEdges(spark,
      TestSpark.directed((0L until n).map(i => (i, (i + 1) % n, 1.0))))
    assert(graft.algo.Scc.run(spark, cyc).labels.collect()
      .forall(_.getLong(1) == 0L))
  }

  test("exact diameter (iFub): path, cycle, and karate golden value") {
    import graft.algo.Distances
    val path = LinkGraph.fromEdges(spark,
      TestSpark.directed((0L until 7L).map(i => (i, i + 1, 1.0))))
    assert(Distances.diameterExact(spark, path, 0L).head().getLong(0) == 7L)
    // Cycle of 10: diameter 5. Start off-zero to exercise non-default start.
    val cyc = LinkGraph.fromEdges(spark,
      TestSpark.directed((0L until 10L).map(i => (i, (i + 1) % 10, 1.0))))
    assert(Distances.diameterExact(spark, cyc, 3L).head().getLong(0) == 5L)
    // Karate diameter = 5 (well-known; the two-sweep estimate brackets it).
    val karate = LinkGraph.fromEdges(spark,
      TestSpark.directed(Fixtures.karateEdges.map(e => (e._1, e._2, 1.0))))
    assert(Distances.diameterExact(spark, karate, 0L).head().getLong(0) == 5L)
    // Disconnected: diameter of the component containing start only.
    val two = LinkGraph.fromEdges(spark,
      TestSpark.directed(Seq((0L, 1L, 1.0), (1L, 2L, 1.0), (10L, 11L, 1.0))))
    assert(Distances.diameterExact(spark, two, 0L).head().getLong(0) == 2L)
    assert(Distances.diameterExact(spark, two, 10L).head().getLong(0) == 1L)
  }

  test("process-ceiling microbenchmark spawns children and returns throughput") {
    val t = graft.tools.ProcBench.aggregateThroughput("alu", k = 2, millis = 400L)
    assert(t > 0.0)
    val s = graft.tools.ProcBench.aggregateThroughput("stream", k = 2, millis = 400L)
    assert(s > 0.0)
  }
}
