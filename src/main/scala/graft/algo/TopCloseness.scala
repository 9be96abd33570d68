package graft.algo

import scala.collection.mutable.ArrayBuffer

import graft.DataFrameLineageOps

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.model.LinkGraph

/** Exact top-k closeness with upper-bound pruning — the distributed re-architecture of
  * the reference's TopCloseness
  * (/root/reference/networkit/cpp/centrality/TopCloseness.cpp: per-node BFS with the
  * Bergamini/Borassi/Crescenzi level-based cutoff bound).
  *
  * The reference prunes *inside* each BFS with a per-level bound; a faithful port would
  * be n driver-sequential BFS loops. The Spark-first shape inverts it: one cheap
  * closed-form upper bound for ALL nodes, then exact batched multi-source BFS
  * ([[Betweenness.msBfs]]) over candidates in bound order until the bound certifies the
  * current top-k — typically 1–2 batches instead of n BFS runs.
  *
  *   - UB(v) = 1 / (deg(v) + 2*(R(v) − 1 − deg(v))): deg(v) neighbors sit at distance
  *     exactly 1 and the other R−1−deg(v) nodes of v's component (size R, from
  *     [[ConnectedComponents]]) at distance ≥ 2, so sumdist(v) ≥ that denominator and
  *     closeness(v) = 1/sumdist(v) ≤ UB(v). (The reference's level-cut bound at L=1,
  *     computed relationally from the degree table instead of per-BFS.)
  *   - Candidates are processed in (UB desc, id asc) batches via orderBy().limit(b) —
  *     a distributed TakeOrdered, no global sort materialization. Exact sumdist for a
  *     batch comes from one multi-source BFS whose state is (source, reached) pairs
  *     within each source's component only.
  *   - Stop when the k-th best exact closeness strictly beats every remaining UB —
  *     all comparisons in exact integer space (sumdist vs denominator), so the result
  *     is identical across engines and partitionings.
  *
  * Driver state is O(k + batch) rows — the bounded output of a top-k operator, not a
  * collect of distributed state. Ranking: closeness desc, id asc; unreachable
  * (isolated) nodes have closeness 0 and fill trailing slots by id when fewer than k
  * nodes have positive closeness.
  */
object TopCloseness {

  /** Top-k rows (id, reached, sumdist, closeness), exact. */
  def run(spark: SparkSession, g: LinkGraph, k: Int, batch: Int = 256): DataFrame = {
    require(k > 0)
    val comps = ConnectedComponents.run(spark, g).labels
    val sizes = comps.groupBy(col("label")).agg(count(lit(1)).as("csize"))
    val und = g.canonicalUndirected
    val deg = und.select(col("src").as("id")).union(und.select(col("dst").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    // lbden = exact-integer lower bound on sumdist (0 for isolated nodes).
    val cand = g.vertices
      .join(deg, Seq("id"), "left")
      .join(comps, Seq("id"))
      .join(sizes, Seq("label"))
      .select(col("id"),
        (coalesce(col("deg"), lit(0L)) +
          lit(2L) * (col("csize") - 1L - coalesce(col("deg"), lit(0L)))).as("lbden"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    cand.count()

    // (id, reached, sumdist), ranked best-first: sumdist asc, id asc (all processed
    // candidates have deg >= 1 hence sumdist >= 1).
    val top = ArrayBuffer.empty[(Long, Long, Long)]
    def sortTop(): Unit = {
      val s = top.sortBy { case (id, _, sd) => (sd, id) }
      top.clear(); top ++= s.take(k)
    }

    var processed = cand.filter(lit(false)).select("id")
    var done = false
    while (!done) {
      val pick = cand.join(processed, Seq("id"), "left_anti")
        .filter(col("lbden") > 0L)
        .orderBy(col("lbden").asc, col("id").asc).limit(batch)
        .select("id").persist(StorageLevel.MEMORY_AND_DISK)
      if (pick.count() == 0L) done = true
      else {
        val (state, _) = Betweenness.msBfs(spark, g, pick)
        val res = state.groupBy(col("s"))
          .agg((count(lit(1)) - 1L).as("reached"), sum("dist").as("sumdist"))
          .collect()
        res.foreach(r => top += ((r.getLong(0), r.getLong(1), r.getLong(2))))
        sortTop()
        // Same per-batch lineage cut as harmonicCore (plan doubles per batch
        // without it).
        processed = processed.union(pick.select("id")).cutLineage
        if (top.size >= k) {
          val kthSumdist = top(k - 1)._3
          val minRemaining = cand.join(processed, Seq("id"), "left_anti")
            .filter(col("lbden") > 0L)
            .agg(min("lbden")).collect()(0)
          // Every unprocessed v has sumdist >= lbden(v) >= minRemaining; strictly
          // worse than the kth best means no remaining node can enter the top-k.
          if (minRemaining.isNullAt(0) || minRemaining.getLong(0) > kthSumdist) done = true
        }
      }
    }

    // Fewer than k positive-closeness nodes: trailing slots go to isolated nodes
    // (closeness exactly 0) in id order — matches the oracle's deterministic LIMIT.
    val fill =
      if (top.size >= k) Nil
      else cand.filter(col("lbden") === 0L).orderBy(col("id").asc)
        .limit(k - top.size).collect().map(r => (r.getLong(0), 0L, 0L)).toSeq
    cand.unpersist()

    import spark.implicits._
    (top.toSeq ++ fill).toDF("id", "reached", "sumdist")
      .select(col("id"), col("reached"), col("sumdist"),
        when(col("sumdist") > 0L, lit(1.0) / col("sumdist").cast("double"))
          .otherwise(lit(0.0)).as("closeness"))
  }

  /** Harmonic-closeness scale: even, and large enough that SCALE // dist separates
    * real score differences at any plausible diameter. */
  private val HScale = 1000000000000L

  /** Top-k HARMONIC closeness
    * (/root/reference/networkit/cpp/centrality/TopHarmonicCloseness.cpp:20-160,
    * Bergamini et al., ALENEX16): same batched-msBFS inversion as [[run]], with the
    * harmonic upper bound — deg(v) neighbors contribute 1 each at distance 1 and the
    * other R(v)-1-deg(v) nodes of v's component at most 1/2 each:
    *   ub_scaled(v) = deg(v)*S + (R-1-deg(v))*(S/2)  >=  h_scaled(v) = Σ_u S // d(v,u).
    * All compares are exact integers, so the top-k set and order are
    * engine-independent. Candidates run best-bound-first in msBFS batches; stop when
    * the k-th exact score strictly beats every remaining bound. Ranking: h_scaled
    * desc, id asc; isolated nodes (h=0) fill trailing slots by id. */
  def harmonic(spark: SparkSession, g: LinkGraph, k: Int, batch: Int = 256): DataFrame = {
    require(k > 0)
    val comps = ConnectedComponents.run(spark, g).labels
    val sizes = comps.groupBy(col("label")).agg(count(lit(1)).as("csize"))
    val und = g.canonicalUndirected
    val deg = und.select(col("src").as("id")).union(und.select(col("dst").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    val cand = g.vertices
      .join(deg, Seq("id"), "left")
      .join(comps, Seq("id"))
      .join(sizes, Seq("label"))
      .select(col("id"),
        (coalesce(col("deg"), lit(0L)) * HScale +
          (col("csize") - 1L - coalesce(col("deg"), lit(0L))) * (HScale / 2L)).as("ub"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    cand.count()

    // (id, reached, h_scaled), ranked best-first: h desc, id asc.
    val top = ArrayBuffer.empty[(Long, Long, Long)]
    def sortTop(): Unit = {
      val s = top.sortBy { case (id, _, h) => (-h, id) }
      top.clear(); top ++= s.take(k)
    }

    var processed = cand.filter(lit(false)).select("id")
    def processBatch(pick: DataFrame): Unit = {
      val (state, _) = Betweenness.msBfs(spark, g, pick)
      val res = state.groupBy(col("s"))
        .agg((count(lit(1)) - 1L).as("reached"),
          sum(when(col("dist") > 0L, expr(s"$HScale div dist")).otherwise(0L)).as("h"))
        .collect()
      res.foreach(r => top += ((r.getLong(0), r.getLong(1), r.getLong(2))))
      sortTop()
      // Lineage cut: processed_{i+1} references processed_i both inside the next
      // pick's anti-join AND in this union — without a cut the plan DOUBLES per
      // batch (exponential plan strings once a run needs many batches).
      processed = processed.union(pick.select("id")).cutLineage
    }
    def certified(): Boolean = top.size >= k && {
      val kthH = top(k - 1)._3
      val maxRemaining = cand.join(processed, Seq("id"), "left_anti")
        .filter(col("ub") > 0L)
        .agg(max("ub")).collect()(0)
      // Strict: a remaining bound equal to the k-th score could still displace it
      // on the id tie-break, so only a strictly smaller bound certifies.
      maxRemaining.isNullAt(0) || maxRemaining.getLong(0) < kthH
    }
    var done = false
    while (!done) {
      val pick = cand.join(processed, Seq("id"), "left_anti")
        .filter(col("ub") > 0L)
        .orderBy(col("ub").desc, col("id").asc).limit(batch)
        .select("id").persist(StorageLevel.MEMORY_AND_DISK)
      if (pick.count() == 0L) done = true
      else {
        processBatch(pick)
        done = certified()
      }
    }

    val fill =
      if (top.size >= k) Nil
      else cand.filter(col("ub") === 0L).orderBy(col("id").asc)
        .limit(k - top.size).collect().map(r => (r.getLong(0), 0L, 0L)).toSeq
    cand.unpersist()

    import spark.implicits._
    (top.toSeq ++ fill).toDF("id", "reached", "h_scaled")
      .select(col("id"), col("reached"), col("h_scaled"),
        (col("h_scaled").cast("double") / HScale.toDouble).as("harmonic"))
  }
}
