package graft.algo

import graft.DataFrameLineageOps

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.model.LinkGraph

/** Spanning forests — the reference's graph/ MSF family:
  *   - SpanningForest (/root/reference/networkit/cpp/graph/SpanningForest.cpp:24-42):
  *     BFS tree edges from one root per component.
  *   - UnionMaximumSpanningForest (graph/UnionMaximumSpanningForest.cpp:10-85) /
  *     KruskalMSF / RandomMaximumSpanningForest: Kruskal over descending attributes
  *     with equal-attribute groups merged only after the whole group is tested —
  *     an edge of attribute w is in the union of all maximum spanning forests iff its
  *     endpoints are NOT connected using strictly heavier edges alone.
  *
  * Distributed shapes:
  *   - SpanningForest = per-component min-id roots (one connected-components run) +
  *     one multi-source level-synchronous BFS + a per-node argmin over the
  *     level-(d−1) neighbors: parent(v) = min neighbor one level closer to the root.
  *     Deterministic, so the DuckDB twin replays it exactly.
  *   - UMSF = descending sweep over the (small, capped) set of distinct attribute
  *     levels, maintaining min-label components incrementally: mark level-w edges
  *     against the current labels (components of the strictly-heavier subgraph), then
  *     union the level in and propagate. The reference's sequential union-find sweep
  *     becomes O(levels) label-propagation passes whose active edge set only grows —
  *     no per-edge connectivity queries.
  */
object Forest {

  /** BFS spanning forest: (src=parent, dst=child, dist) rows, one per non-root node
    * of each component (roots are the per-component min ids). `maxLevels` bounds the
    * BFS (any component with larger radius keeps its fringe unparented — sized
    * generously by callers; the engine stops early once frontiers drain). */
  def spanningForest(spark: SparkSession, g: LinkGraph, maxLevels: Int = 40): DataFrame = {
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val bi = g.bidirected.select("src", "dst")
      .repartition(parts, col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    bi.count()
    val labels = ConnectedComponents.run(spark, g).labels
    val roots = labels.filter(col("id") === col("label")).select("id")

    // Level-synchronous multi-source BFS from all roots at once.
    var frontier = roots.cutLineage
    var seen = frontier.withColumn("dist", lit(0)).cutLineage
    var level = 1
    while (level <= maxLevels && !frontier.isEmpty) {
      val next = bi.join(frontier.withColumnRenamed("id", "src").hint("shuffle_hash"), "src")
        .select(col("dst").as("id")).distinct()
        .join(seen.select("id"), Seq("id"), "left_anti")
        .cutLineage
      val prevSeen = seen; val prevFrontier = frontier
      seen = seen.union(next.withColumn("dist", lit(level))).cutLineage
      frontier = next
      prevSeen.releaseState(); prevFrontier.releaseState()
      level += 1
    }
    // parent(v) = min neighbor u with dist(u) = dist(v) - 1.
    val out = bi
      .join(seen.withColumnRenamed("id", "dst").withColumnRenamed("dist", "dd"), "dst")
      .join(seen.withColumnRenamed("id", "src").withColumnRenamed("dist", "ds"), "src")
      .filter(col("ds") === col("dd") - 1)
      .groupBy(col("dst")).agg(min(col("src")).as("src"), first(col("dd")).as("dist"))
      .select(col("src"), col("dst"), col("dist").cast("long").as("dist"))
      .cutLineage
    bi.unpersist()
    out
  }

  /** Union-of-maximum-spanning-forests attribute over the triangle-count edge
    * attribute, capped at `levelCap` distinct levels (att = min(tri, levelCap−1) + 1 —
    * heavy-triangle edges share the top level, exactly like the reference's
    * equal-attribute groups). Returns (src, dst, att, in_umsf 0/1).
    *
    * `roundsPerLevel` > 0 runs that many fixed min-label rounds after each level is
    * unioned in (the DuckDB-twin schedule); 0 propagates each level to convergence
    * (the production path — labels are then exactly the components of the
    * strictly-heavier subgraph at every step, i.e. true UMSF membership). */
  def umsfTriangle(spark: SparkSession, g: LinkGraph, levelCap: Int = 15,
                   roundsPerLevel: Int = 0): DataFrame = {
    val scored = EdgeScores.triangleEdgeScore(spark, g)
      .select(col("src"), col("dst"),
        (least(col("tri"), lit(levelCap - 1L)) + 1L).as("att"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    scored.count()

    var labels = g.vertices.select(col("id"), col("id").as("label")).cutLineage
    var out = scored.filter(lit(false)).withColumn("in_umsf", lit(0L)) // empty, typed
    var active = scored.filter(lit(false)).select("src", "dst")       // heavier-than-level edges

    for (lvl <- levelCap to 1 by -1) {
      val lvlEdges = scored.filter(col("att") === lvl)
      // Membership test against components of the strictly-heavier subgraph.
      val marked = lvlEdges
        .join(labels.select(col("id").as("src"), col("label").as("ls")), "src")
        .join(labels.select(col("id").as("dst"), col("label").as("ld")), "dst")
        .select(col("src"), col("dst"), col("att"),
          when(col("ls") =!= col("ld"), 1L).otherwise(0L).as("in_umsf"))
        .cutLineage
      val prevOut = out
      out = out.union(marked).cutLineage
      prevOut.releaseState(); marked.releaseState()
      // Union the level in and propagate min labels — except after level 1: labels
      // only feed the NEXT level's membership test, and level 1 is the last (and its
      // subgraph is the whole edge set — the most expensive propagation for nothing).
      if (lvl > 1) {
        active = active.union(lvlEdges.select("src", "dst")).cutLineage
        val biA = active.union(active.select(col("dst").as("src"), col("src").as("dst")))
        var changed = true
        var round = 0
        while (changed && (roundsPerLevel == 0 || round < roundsPerLevel)) {
          // Propagate (min over neighbors) then pointer-jump (label := label(label)):
          // convergence distance DOUBLES per round, so a fixed budget of r rounds
          // covers components of label-radius ~2^r — what lets the DuckDB twin replay
          // a small fixed schedule and still be converged (spec-checked).
          val upd = biA
            .join(labels.select(col("id").as("src"), col("label").as("nl")), "src")
            .groupBy(col("dst").as("id")).agg(min("nl").as("ml"))
          val prop = labels.join(upd, Seq("id"), "left")
            .select(col("id"), least(col("label"), coalesce(col("ml"), col("label"))).as("label"))
          val next = prop.as("a")
            .join(prop.select(col("id").as("jid"), col("label").as("jl")).as("b"),
              col("a.label") === col("jid"))
            .select(col("a.id").as("id"), col("jl").as("label"))
            .cutLineage
          if (roundsPerLevel == 0) {
            changed = next.join(labels.withColumnRenamed("label", "old"), "id")
              .filter(col("label") =!= col("old")).limit(1).count() > 0
          }
          labels.releaseState()
          labels = next
          round += 1
        }
      }
    }
    scored.unpersist()
    out
  }

  /** RandomMaximumSpanningForest / KruskalMSF
    * (/root/reference/networkit/cpp/graph/RandomMaximumSpanningForest.cpp:14-90,
    * KruskalMSF.cpp): the unique maximum spanning forest under a TOTAL edge order —
    * deterministic pseudo-random draw, ties broken by (src, dst) — so the result is
    * exactly what the reference's sequential Kruskal sweep produces with the same
    * order (Round12Spec replays brute Kruskal and asserts set equality).
    *
    * Re-architecture: Kruskal's sorted sweep with union-find is inherently
    * sequential; the distributed shape is BORŮVKA — each round every component hooks
    * its maximum incident cross edge (distinct weights ⇒ no cycles except mutual
    * pairs, resolved to the smaller label), components contract by pointer-jumping,
    * and the picked edges join the forest. O(log n) rounds, each one m-row labeled
    * join + a component-level argmax (`max(struct)` — order-independent), which is
    * the textbook MSF plan at 10^12 edges.
    *
    * Returns forest edges (src, dst, draw). (components/RandomSpanningForest.h's
    * uniform-forest role is filled by this random-weight MSF — the reference's
    * Wilson loop-erased walk is inherently sequential.) */
  def randomMsf(spark: SparkSession, g: LinkGraph, seed: Long = 42L,
                maxRounds: Int = 40): DataFrame = {
    import graft.synth.GraphSpec.lcg
    val x = s"(src*1000003 + dst*97 + $seed)"
    val drawExpr = s"(((${lcg(x)} * ${lcg(s"($x) + 1000003")}) div 65536) % ${graft.synth.GraphSpec.M})"
    val edges = g.canonicalUndirected.select(col("src"), col("dst"))
      .withColumn("draw", expr(drawExpr))
      .persist(StorageLevel.MEMORY_AND_DISK)
    edges.count()

    var labels = g.vertices.select(col("id"), col("id").as("label")).cutLineage
    var forest = edges.filter(lit(false)) // empty, typed (src, dst, draw)
    var round = 0
    var done = false
    while (!done && round < maxRounds) {
      val cross = edges
        .join(labels.select(col("id").as("src"), col("label").as("ls")), "src")
        .join(labels.select(col("id").as("dst"), col("label").as("ld")), "dst")
        .filter(col("ls") =!= col("ld"))
        .cutLineage
      done = cross.limit(1).count() == 0
      if (!done) {
        // Per component: the maximum incident cross edge (total order draw, src, dst).
        val inc = cross.select(col("ls").as("c"),
            struct(col("draw"), col("src"), col("dst"), col("ld").as("oc")).as("pick"))
          .union(cross.select(col("ld").as("c"),
            struct(col("draw"), col("src"), col("dst"), col("ls").as("oc")).as("pick")))
        val picked = inc.groupBy("c").agg(max("pick").as("pick"))
          .select(col("c"), col("pick.draw").as("draw"), col("pick.src").as("src"),
            col("pick.dst").as("dst"), col("pick.oc").as("oc"))
          .cutLineage
        val prevForest = forest
        forest = forest.union(picked.select("src", "dst", "draw").distinct()).cutLineage
        prevForest.releaseState()
        // Hook: parent(c) = oc, except a mutual pair's smaller label roots itself
        // (the globally-max edge between two hooked components is picked by BOTH).
        val mutual = picked.select(col("c"), col("oc"))
          .join(picked.select(col("c").as("oc"), col("oc").as("back")), "oc")
          .filter(col("back") === col("c"))
          .select(col("c"), col("oc"))
        var parent = picked.select(col("c"), col("oc").as("p"))
          .join(mutual.select(col("c"), lit(true).as("is_mut")), Seq("c"), "left")
          .select(col("c"),
            when(col("is_mut") && col("c") < col("p"), col("c"))
              .otherwise(col("p")).as("p"))
          .cutLineage
        // Pointer-jump to the roots (doubling ⇒ logarithmic in hook-tree depth).
        var jumping = true
        while (jumping) {
          val jumped = parent.as("a")
            .join(parent.select(col("c").as("pc"), col("p").as("pp")).as("b"),
              col("a.p") === col("pc"), "left")
            .select(col("a.c").as("c"), coalesce(col("pp"), col("a.p")).as("p"))
            .cutLineage
          jumping = jumped.join(parent.withColumnRenamed("p", "old"), "c")
            .filter(col("p") =!= col("old")).limit(1).count() > 0
          parent.releaseState()
          parent = jumped
        }
        val prevLabels = labels
        labels = labels.join(parent.withColumnRenamed("c", "label"), Seq("label"), "left")
          .select(col("id"), coalesce(col("p"), col("label")).as("label"))
          .cutLineage
        prevLabels.releaseState(); cross.releaseState(); picked.releaseState()
        parent.releaseState()
      }
      round += 1
    }
    edges.unpersist()
    forest
  }
}
