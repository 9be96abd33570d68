package graft.algo

import graft.DataFrameLineageOps

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.LinkGraph

/** Local-max (Preis) matching — the reference's LocalMaxMatcher
  * (/root/reference/networkit/cpp/matching/LocalMaxMatcher.cpp:20-82): per round,
  * every remaining edge checks whether it is the locally dominant edge at BOTH
  * endpoints; dominant pairs match, their endpoints leave, repeat until no edges
  * remain. Half-approximation of maximum weight matching.
  *
  * The reference jitters weights with a per-run RNG to break ties
  * (LocalMaxMatcher.cpp:36); we instead use a STRICT deterministic total order
  * (weight DESC, src ASC, dst ASC), so "locally maximum" is the per-node argmin of
  * an order key — reproducible across engines and partitionings, which is what lets
  * the DuckDB twin replay the rounds bit-for-bit.
  *
  * Distributed shape: per round the per-node dominant edge is one partial-aggregable
  * min(struct) over the remaining incident edges (map-side combine absorbs hubs); the
  * mutual-agreement check and the endpoint removal are semi/anti joins against the
  * (frontier-sized, shrinking) matched-node set. No collect, no windows.
  */
object Matching {

  /** Deterministic synthetic integer weight for the unweighted web edge table — the
    * same (src+dst)-derived weight family as q_sssp_weighted, so oracle replay is
    * exact integer arithmetic. */
  def syntheticWeight: org.apache.spark.sql.Column =
    lit(1L) + pmod(col("src") + col("dst"), lit(5L))

  /** `rounds` fixed local-max rounds over the canonical undirected edge set.
    * Returns the matched pairs (src, dst, w), src < dst. On graphs where the process
    * drains within `rounds` (spec-checked) this IS the LocalMaxMatcher matching. */
  def localMaxMatching(spark: SparkSession, g: LinkGraph, rounds: Int): DataFrame =
    matchEdges(
      g.canonicalUndirected.select(col("src"), col("dst"), syntheticWeight.as("w")),
      rounds)

  /** The general local-max rounds over ANY weighted edge set (src, dst, w) with
    * src < dst — also the matching engine inside the agglomerative clusterer, where
    * w is the integer modularity score. */
  def matchEdges(edges: DataFrame, rounds: Int): DataFrame = {
    var rem = edges.cutLineage
    var acc = rem.filter(lit(false)) // empty, typed (src, dst, w)
    var r = 0
    var drained = false
    while (r < rounds && !drained) {
      if (rem.isEmpty) drained = true
      else {
        // Dominant edge per node: argmin of (-w, src, dst) over incident edges.
        val inc = rem.select(col("src").as("x"), col("src"), col("dst"), col("w"))
          .union(rem.select(col("dst").as("x"), col("src"), col("dst"), col("w")))
        val best = inc
          .groupBy("x")
          .agg(min(struct((-col("w")).as("nw"), col("src"), col("dst"))).as("b"))
          .select(col("x"), col("b.src").as("bsrc"), col("b.dst").as("bdst"))
        val matched = rem
          .join(best.where(col("x") === col("bsrc"))
            .select(col("bsrc").as("src"), col("bdst").as("dst")), Seq("src", "dst"), "left_semi")
          .join(best.where(col("x") === col("bdst"))
            .select(col("bsrc").as("src"), col("bdst").as("dst")), Seq("src", "dst"), "left_semi")
          .cutLineage
        val mnodes = matched.select(col("src").as("id"))
          .union(matched.select(col("dst").as("id"))).distinct()
        val prevRem = rem
        val prevAcc = acc
        rem = rem
          .join(mnodes.withColumnRenamed("id", "src"), Seq("src"), "left_anti")
          .join(mnodes.withColumnRenamed("id", "dst"), Seq("dst"), "left_anti")
          .select("src", "dst", "w")
          .cutLineage
        acc = acc.union(matched).cutLineage
        prevRem.releaseState(); prevAcc.releaseState(); matched.releaseState()
        r += 1
      }
    }
    acc
  }

  /** PathGrowingMatcher (/root/reference/networkit/cpp/matching/
    * PathGrowingMatcher.cpp:26-140 — Drake–Hougardy: grow a path by repeatedly
    * following the heaviest incident edge, 2-color the path edges alternately into
    * M1/M2, keep the heavier side; ½-approximation): the reference's single
    * sequential walk with a global bucket-PQ cannot distribute, so this is the
    * pointer-forest twin — the SAME grow-by-heaviest-edge / alternate / keep-heavier
    * structure, executed for ALL paths at once:
    *
    *  1. every vertex points to its heaviest incident edge (strict total order
    *     w DESC, neighbor ASC — the same determinism substitution LocalMaxMatcher
    *     uses for the reference's RNG jitter);
    *  2. each vertex additionally ACCEPTS at most its best incoming pointer, so the
    *     kept pointer edges form a max-degree-2 subgraph. Following pointers
    *     strictly increases (w, tiebreak), so the only cycles are mutual pairs —
    *     the components are exactly the grown paths;
    *  3. edge depth along each path = pointer-hop distance of its owner to the
    *     path's anchor (its mutual pair, or the head whose own pointer was
    *     rejected), computed by pointer doubling — O(log path-length) rounds of an
    *     n-row self-join, no sequential walk;
    *  4. depth parity 2-colors each path (adjacent edges have consecutive depths);
    *     per component keep the heavier parity class (ties → even) — the
    *     reference's max(M1, M2) taken per path, which is only stronger.
    *
    * Vertices whose pointer is rejected and that receive no accepted pointer leave
    * unmatched — the reference likewise kills every traversed vertex, matched or
    * not. Returns matched pairs (src, dst, w), src < dst; proper by construction
    * (each vertex has ≤ 2 pointer edges, of consecutive depths → different
    * parities). */
  def pathGrowingMatching(spark: SparkSession, g: LinkGraph): DataFrame = {
    val e = g.canonicalUndirected
      .select(col("src"), col("dst"), syntheticWeight.as("w")).cutLineage
    // p(x): heaviest incident edge per vertex — argmin of (-w, neighbor).
    val inc = e.select(col("src").as("x"), col("dst").as("y"), col("w"))
      .union(e.select(col("dst").as("x"), col("src").as("y"), col("w")))
    val ptr = inc.groupBy("x")
      .agg(min(struct((-col("w")).as("nw"), col("y"))).as("b"))
      .select(col("x"), col("b.y").as("y"), (-col("b.nw")).as("w"))
      .cutLineage
    // acc(v): best incoming pointer per target — argmin of (-w, owner).
    val acc = ptr.groupBy("y")
      .agg(min(struct((-col("w")).as("nw"), col("x"))).as("b"))
      .select(col("y"), col("b.x").as("accx"))
    // Kept pointer edges: owner x -> y where x is y's accepted incoming.
    val sedge = ptr.join(acc, Seq("y")).filter(col("x") === col("accx"))
      .select(col("x"), col("y"), col("w")).cutLineage
    // Mutual pairs p(p(x)) = x; anchors = mutual members ∪ rejected-pointer owners.
    val mutual = ptr.select(col("x"), col("y"))
      .join(ptr.select(col("y").as("x"), col("x").as("y")), Seq("x", "y"), "left_semi")
      .select(col("x").as("id"))
    val owners = sedge.select(col("x").as("id"))
    val anchors = ptr.select(col("x").as("id"))
      .join(owners, Seq("id"), "left_anti")
      .union(mutual).distinct().cutLineage
    // comp label of an anchor: min(a, p(a)) for mutual members, a itself for heads.
    val anchorComp = anchors
      .join(mutual.withColumn("m", lit(1L)), Seq("id"), "left")
      .join(ptr.select(col("x").as("id"), col("y").as("py")), Seq("id"))
      .select(col("id"),
        when(col("m").isNotNull, least(col("id"), col("py")))
          .otherwise(col("id")).as("comp"))
    // Pointer doubling to (anchor, depth): state (id, t, d, fin).
    val aFlag = anchors.withColumn("fin0", lit(true))
    var state = ptr.select(col("x").as("id"), col("y").as("t"))
      .join(aFlag.select(col("id"), col("fin0")), Seq("id"), "left")
      .select(col("id"),
        when(col("fin0"), col("id")).otherwise(col("t")).as("t"),
        when(col("fin0"), lit(0L)).otherwise(lit(1L)).as("d"),
        coalesce(col("fin0"), lit(false)).as("fin"))
      .cutLineage
    var unfinished = state.filter(!col("fin")).limit(1).count() > 0
    while (unfinished) {
      val hop = state.select(col("id").as("t"), col("t").as("t2"),
        col("d").as("d2"), col("fin").as("fin2"))
      val prev = state
      state = state.join(hop, Seq("t"), "left")
        .select(col("id"),
          when(col("fin"), col("t")).otherwise(col("t2")).as("t"),
          when(col("fin"), col("d")).otherwise(col("d") + col("d2")).as("d"),
          when(col("fin"), col("fin")).otherwise(col("fin2")).as("fin"))
        .cutLineage
      prev.releaseState()
      unfinished = state.filter(!col("fin")).limit(1).count() > 0
    }
    // Canonical S edges with (comp, parity): owner x carries depth d(x); mutual
    // edges appear from both owners at depth 0 and collapse under DISTINCT.
    val edged = sedge
      .join(state.select(col("id").as("x"), col("t"), col("d")), Seq("x"))
      .join(anchorComp.select(col("id").as("t"), col("comp")), Seq("t"))
      .select(least(col("x"), col("y")).as("src"),
        greatest(col("x"), col("y")).as("dst"), col("w"),
        col("comp"), pmod(col("d"), lit(2L)).as("parity"))
      .distinct().cutLineage
    // Heavier parity class per component (ties -> even parity).
    val pick = edged.groupBy("comp", "parity").agg(sum("w").as("pw"))
      .groupBy("comp")
      .agg(min(struct((-col("pw")).as("npw"), col("parity"))).as("b"))
      .select(col("comp"), col("b.parity").as("parity"))
    edged.join(pick, Seq("comp", "parity"), "left_semi")
      .select(col("src"), col("dst"), col("w"))
  }

  /** True iff `matching(src,dst)` is a valid matching of g (no shared endpoints,
    * edges exist) — spec helper mirroring Matching::isProper
    * (matching/Matching.cpp:20-60). */
  def isProper(g: LinkGraph, matching: DataFrame): Boolean = {
    val ends = matching.select(col("src").as("id"))
      .union(matching.select(col("dst").as("id")))
    val dup = ends.groupBy("id").count().filter(col("count") > 1).count()
    val missing = matching.select("src", "dst")
      .join(g.canonicalUndirected.select("src", "dst"), Seq("src", "dst"), "left_anti")
      .count()
    dup == 0 && missing == 0
  }

  /** True iff no remaining edge has both endpoints unmatched (maximality). */
  def isMaximal(g: LinkGraph, matching: DataFrame): Boolean = {
    val ends = matching.select(col("src").as("id"))
      .union(matching.select(col("dst").as("id"))).distinct()
    g.canonicalUndirected
      .join(ends.withColumnRenamed("id", "src"), Seq("src"), "left_anti")
      .join(ends.withColumnRenamed("id", "dst"), Seq("dst"), "left_anti")
      .isEmpty
  }
}
