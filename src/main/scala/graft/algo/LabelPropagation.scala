package graft.algo

import graft.DataFrameLineageOps

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.model.LinkGraph
import graft.iterate.IterativeJob

/** PLP — community detection by label propagation
  * (/root/reference/networkit/cpp/community/PLP.cpp:25-118; the
  * CommunityDetectionAlgorithm.h run/getPartition surface maps to these
  * fixed-rounds/converged entry points).
  *
  * Semantics per round, for every node with degree > 0:
  *   - weighted label frequencies over *neighbors* (not self): labelWeights[zeta[w]] += w
  *     (:80-86);
  *   - adopt the heaviest label; ties break to the SMALLEST label id (std::max_element
  *     over an ordered map, :89-92);
  *   - isolated nodes keep their singleton label (:50-56);
  *   - stop when the number of updated nodes <= updateThreshold (default n/1e5) or after
  *     maxIterations (:41-43,69).
  *
  * The reference's OpenMP execution is racy/non-deterministic by design; we run the
  * synchronous (Jacobi) variant with the same tie-break, which is deterministic and
  * engine/partitioning-independent — see SURVEY.md §2.4. The argmax-with-tie-break is a
  * single max(struct(weight, -label)) aggregation: one shuffle per round, no window sort.
  */
object LabelPropagation {

  final case class Result(labels: DataFrame, rounds: Int, lastUpdated: Long)

  def run(spark: SparkSession, g: LinkGraph, maxIterations: Int = 100,
          updateThresholdOpt: Option[Long] = None,
          checkpointDir: Option[String] = None): Result = {
    val threshold = updateThresholdOpt.getOrElse(math.max(1L, g.n / 100000L))
    val bi = g.bidirected.persist(StorageLevel.MEMORY_AND_DISK)
    bi.count()
    val job = IterativeJob(spark, checkpointDir, "plp")
    var labels = job.init(g.vertices.select(col("id"), col("id").as("label")))
    // Active-set frontier (the reference's reactivation sets, PLP.cpp:63-102): a node
    // can only change if some neighbor changed last round, so label frequencies are
    // recomputed ONLY for neighbors of last round's movers — exactly equivalent to the
    // full Jacobi update (untouched nodes keep their label via the left join), and
    // once communities stabilize each round's shuffle shrinks with the frontier.
    var changed: DataFrame = null // null = round 0, everyone active
    var round = 0
    var updated = Long.MaxValue
    while (round < maxIterations && updated > threshold) {
      val active = if (changed == null) bi
        else bi.join(
          bi.join(changed.withColumnRenamed("id", "src"), "src")
            .select(col("dst").as("aid")).distinct()
            .withColumnRenamed("aid", "dst"),
          Seq("dst"), "left_semi")
      // Heaviest neighbor label, smallest-id tie-break, in one aggregation:
      // max(struct(w, -label)) orders by weight then by -label (= smallest label wins).
      val freq = active
        .join(labels.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst"), col("label"))
        .agg(sum("weight").as("w"))
      // Hub-salted argmax (north rule; Layout.saltedArgMax): a 10^6-degree hub's
      // (dst, label) rows would otherwise all land on ONE reducer keyed by dst at the
      // argmax stage (early rounds have ~degree distinct labels, so map-side partial
      // agg cannot compress them). Two-level max(struct) is order-independent, hence
      // bit-identical to the direct aggregation — verified against the unsalted plan
      // on a planted 100k-degree hub in LayoutSpec.
      val best = graft.layout.Layout.saltedArgMax(freq, Seq("dst"),
          struct(col("w"), (-col("label")).as("nl")), col("label"), salts = 32)
        .select(col("dst").as("id"), (-col("top.nl")).as("cand"))
      val next = labels.join(best, Seq("id"), "left")
        .select(col("id"), coalesce(col("cand"), col("label")).as("label"),
          (coalesce(col("cand"), col("label")) =!= col("label")).as("changed"))
      val stepped = job.step(round, next)
      updated = stepped.filter(col("changed")).count()
      job.recordMetric(round, "updated", updated.toDouble)
      val prevChanged = changed
      changed = stepped.filter(col("changed")).select("id").cutLineage
      if (prevChanged != null) prevChanged.releaseState()
      labels = stepped.select("id", "label")
      round += 1
    }
    bi.unpersist()
    Result(labels, round, updated)
  }

  /** Fixed-rounds partition cache, one persisted frame per (graph, rounds) — the same
    * pattern as Triangles.orientedCache: SparkEntry's measure/coarsen/partition-eval
    * queries all consume PLP-5 or PLP-10 labels of the same graph, and recomputing the
    * full multi-round recurrence per query dominated the round-3 Verify wall (27 calls).
    * computeIfAbsent keeps it safe under Verify's concurrent query pool. Blocks live as
    * long as the graph value (one graph per job at production scale). */
  private val fixedCache =
    new java.util.concurrent.ConcurrentHashMap[(LinkGraph, Int), DataFrame]()

  /** Exactly `rounds` synchronous rounds with no early stop — the deterministic form used
    * by the cross-engine oracle (both sides unroll the same recurrence). Memoized and
    * persisted per (graph, rounds). */
  def fixedRounds(spark: SparkSession, g: LinkGraph, rounds: Int): DataFrame =
    fixedCache.computeIfAbsent((g, rounds), { _ =>
      val labels = run(spark, g, maxIterations = rounds,
        updateThresholdOpt = Some(-1L)).labels.persist(StorageLevel.MEMORY_AND_DISK)
      labels.count()
      labels
    })

  /** Drop `g`'s memoized fixed-round labels (benchmark re-measurement needs the
    * re-run to do the FULL work — a memo hit would record a cache read as the
    * operator's time). */
  def evictFixedRounds(g: LinkGraph): Unit = {
    import scala.jdk.CollectionConverters._
    fixedCache.keySet.asScala.filter(_._1 == g).toSeq.foreach { k =>
      Option(fixedCache.remove(k)).foreach(_.unpersist())
    }
  }

  /** Compact labels to 0..k-1 preserving order of the original ids —
    * Partition::compact(useTurbo=false) (/root/reference/networkit/cpp/structures/
    * Partition.cpp:91-119). Distributed rank via Layout.zipWithRank (no global window). */
  def compact(labels: DataFrame): DataFrame = {
    val distinctLabels = graft.layout.Layout
      .zipWithRank(labels.select(col("label")).distinct(), "label", "clabel")
    labels.join(distinctLabels, "label").select(col("id"), col("clabel").as("label"))
  }

  /** LPDegreeOrdered (/root/reference/networkit/cpp/community/LPDegreeOrdered.cpp:18-86):
    * label propagation where lower-degree nodes update BEFORE higher-degree nodes in
    * each sweep. The reference's strictly sequential degree-ordered sweep becomes
    * `buckets` synchronous sub-rounds per sweep: sub-round b updates ONLY the nodes in
    * degree bucket b (ascending — bucket = min(buckets−1, ⌊log₂ deg⌋), integer-exact
    * via binary-string length in both engines), reading labels that already include
    * this sweep's lower-bucket moves — degree-ordered Gauss–Seidel at bucket
    * granularity, deterministic and partitioning-independent. Heaviest-label /
    * smallest-id tie-break and isolated-node behavior are PLP's. Each sub-round's
    * frequency shuffle is restricted (left-semi) to edges INTO the active bucket, so a
    * full sweep costs one m-row exchange total — the same per-sweep cost as PLP. */
  def degreeOrderedFixed(spark: SparkSession, g: LinkGraph, sweeps: Int,
                         buckets: Int = 4): DataFrame = {
    val bi = g.bidirected.persist(StorageLevel.MEMORY_AND_DISK)
    bi.count()
    val bkt = bi.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
      .select(col("id"),
        least(lit(buckets - 1L), (length(bin(col("deg"))) - 1).cast("long")).as("bkt"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    bkt.count()
    var labels = g.vertices.select(col("id"), col("id").as("label")).cutLineage
    for (_ <- 0 until sweeps; b <- 0 until buckets) {
      val active = bi.join(
        bkt.filter(col("bkt") === b).select(col("id").as("dst")), Seq("dst"), "left_semi")
      val freq = active
        .join(labels.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst"), col("label"))
        .agg(sum("weight").as("w"))
      val best = graft.layout.Layout.saltedArgMax(freq, Seq("dst"),
          struct(col("w"), (-col("label")).as("nl")), col("label"), salts = 32)
        .select(col("dst").as("id"), (-col("top.nl")).as("cand"))
      val prev = labels
      labels = labels.join(best, Seq("id"), "left")
        .select(col("id"), coalesce(col("cand"), col("label")).as("label"))
        .cutLineage
      prev.releaseState()
    }
    bi.unpersist(); bkt.unpersist()
    labels
  }
}
