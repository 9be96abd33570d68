package graft.algo

import graft.DataFrameLineageOps

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.LinkGraph

/** Degree-preserving edge-switching randomization
  * (/root/reference/networkit/cpp/generators/EdgeSwitchingMarkovChainGenerator
  * .cpp:13-50): repeatedly pick two edges (s1,t1), (s2,t2) and rewire to (s1,t2),
  * (s2,t1) unless that would create a self-loop or a duplicate edge — the classic
  * Markov chain whose stationary distribution is uniform over simple graphs with the
  * given degree sequence. The reference performs 10·m sequential switches off a
  * global RNG.
  *
  * Distributed re-architecture: per ROUND, a deterministic LCG key permutes the edge
  * set, consecutive pairs of the permutation become simultaneous swap proposals
  * (~m/2 per round — a round ≈ m/2 sequential attempts), and a proposal commits only
  * if (a) it creates no self-loop, (b) neither new edge exists in the current graph,
  * and (c) no OTHER accepted proposal in the round creates the same edge (conflicts
  * reject conservatively — the chain mixes across rounds regardless). Degrees are
  * preserved exactly by construction; the whole process is a pure function of
  * (edges, seed), reproducible at any parallelism.
  */
object EdgeSwitching {

  /** `rounds` switching rounds over the canonical undirected edge set (default 20
    * rounds ≈ the reference's 10·m attempts). Returns a LinkGraph with the SAME
    * degree sequence and vertex set. */
  def randomize(spark: SparkSession, g: LinkGraph, rounds: Int = 20,
                seed: Long = 42L): LinkGraph = {
    import graft.synth.GraphSpec.lcg
    var e = g.canonicalUndirected.select("src", "dst").cutLineage
    for (r <- 1 to rounds) {
      val key = expr(lcg(s"(src * 1000003 + dst + ${seed + r * 10007L})"))
      val ranked = graft.layout.Layout.zipWithRankBy(
        e.withColumn("k", key), Seq(col("k").asc, col("src").asc, col("dst").asc),
        "pos")
      val side0 = ranked.filter(col("pos") % 2 === 0)
        .select((col("pos") / 2).cast("long").as("p"), col("src").as("s1"), col("dst").as("t1"))
      val side1 = ranked.filter(col("pos") % 2 === 1)
        .select((col("pos") / 2).cast("long").as("p"), col("src").as("s2"), col("dst").as("t2"))
      val prop = side0.join(side1, "p")
        // proposed rewiring: (s1,t2) and (s2,t1), canonicalized
        .select(col("p"), col("s1"), col("t1"), col("s2"), col("t2"),
          least(col("s1"), col("t2")).as("na1"), greatest(col("s1"), col("t2")).as("nb1"),
          least(col("s2"), col("t1")).as("na2"), greatest(col("s2"), col("t1")).as("nb2"))
        .filter(col("s1") =!= col("t2") && col("s2") =!= col("t1") &&
          !(col("na1") === col("na2") && col("nb1") === col("nb2")))
      // reject proposals whose new edges already exist in the graph
      val cur = e.select(col("src").as("na1"), col("dst").as("nb1"))
      val ok1 = prop.join(cur, Seq("na1", "nb1"), "left_anti")
      val ok2 = ok1.join(e.select(col("src").as("na2"), col("dst").as("nb2")),
        Seq("na2", "nb2"), "left_anti")
      // reject round-internal conflicts: two proposals creating the same new edge
      val newEdges = ok2.select(col("p"), col("na1").as("a"), col("nb1").as("b"))
        .union(ok2.select(col("p"), col("na2"), col("nb2")))
      val clash = newEdges.groupBy("a", "b").agg(count(lit(1)).as("c"))
        .filter(col("c") > 1L).select("a", "b")
      val badP = newEdges.join(clash, Seq("a", "b"), "left_semi").select("p").distinct()
      val accepted = ok2.join(badP, Seq("p"), "left_anti")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      accepted.count()
      val removed = accepted
        .select(least(col("s1"), col("t1")).as("src"), greatest(col("s1"), col("t1")).as("dst"))
        .union(accepted
          .select(least(col("s2"), col("t2")).as("src"), greatest(col("s2"), col("t2")).as("dst")))
      val added = accepted.select(col("na1").as("src"), col("nb1").as("dst"))
        .union(accepted.select(col("na2").as("src"), col("nb2").as("dst")))
      val prev = e
      e = e.join(removed, Seq("src", "dst"), "left_anti").union(added).cutLineage
      prev.releaseState(); accepted.unpersist(); ranked.unpersist()
    }
    LinkGraph.fromEdges(spark, e.withColumn("weight", lit(1.0)), Some(g.vertices))
  }
}
