package graft.algo

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.LinkGraph

/** Partition quality measures and partition ops over `labels(id, label)` — the
  * reference's QualityMeasure.h / DissimilarityMeasure.h / LocalCommunityEvaluation.h
  * / LocalPartitionEvaluation.h / LocalCoverEvaluation.h surfaces as plain
  * aggregations:
  *
  *   - Modularity (/root/reference/networkit/cpp/community/Modularity.cpp:28-92):
  *     Q = coverage − Σ_c (vol_c/ω)²/4 with vol_c = Σ_{v∈c} weightedDegree(v) and
  *     ω = total edge weight; here unweighted ⇒ all terms are exact integers and Q is a
  *     single double expression over them (Σ vol_c² aggregated exactly, then divided —
  *     algebraically identical to the reference's per-cluster sum).
  *   - Coverage (community/Coverage.cpp:14-60): intra-cluster edge fraction.
  *   - EdgeCut (community/EdgeCut.cpp:13-21): weight of inter-cluster edges.
  *   - Per-community conductance cut(C)/min(vol(C), vol(V)−vol(C))
  *     (community/Conductance.cpp semantics per cluster-vs-rest).
  *   - ParallelPartitionCoarsening (coarsening/ParallelPartitionCoarsening.cpp:22-136):
  *     cluster graph with summed edge weights, intra-cluster edges kept once as
  *     self-loop rows.
  *   - Rand index between two partitions (community/PartitionIntersection / NMIDistance
  *     family): pair-counting over the contingency table.
  *
  * Every aggregate is a hash-partitioned groupBy on label keys — 2 joins + 1 agg, the
  * shape that scales to 10^12 edges (labels broadcast when small; AQE handles skewed
  * giant communities).
  */
object Measures {

  /** Logical undirected edges with both endpoint labels attached. */
  private def labeledEdges(g: LinkGraph, labels: DataFrame): DataFrame =
    g.canonicalUndirected
      .join(labels.select(col("id").as("src"), col("label").as("lsrc")), "src")
      .join(labels.select(col("id").as("dst"), col("label").as("ldst")), "dst")

  /** Weighted undirected degree per vertex (isolated vertices absent). Weights are
    * integer-valued (1 at ingest, sums after antiparallel merge/coarsening), so the
    * long cast is exact. */
  private def undDegrees(g: LinkGraph): DataFrame =
    g.bidirected.groupBy(col("src").as("id"))
      .agg(sum("weight").cast("long").as("deg"))

  /** One-row summary: total weight ω (= edge count on an unweighted simple graph),
    * intra- and cut-edge weight, Σ vol_c², coverage, edge cut, modularity
    * (Modularity.cpp:49-81 — weighted throughout). Exact integers + two fixed double
    * expressions. */
  def summary(spark: SparkSession, g: LinkGraph, labels: DataFrame): DataFrame = {
    val le = labeledEdges(g, labels)
    val base = le.agg(
      sum("weight").cast("long").as("m_und"),
      sum(when(col("lsrc") === col("ldst"), col("weight")).otherwise(lit(0.0)))
        .cast("long").as("intra"))
    val vol = undDegrees(g).join(labels, "id")
      .groupBy("label").agg(sum("deg").as("vol"))
      .agg(sum(col("vol") * col("vol")).as("sum_vol2"))
    base.crossJoin(vol).select(
      col("m_und"), col("intra"), (col("m_und") - col("intra")).as("cut"), col("sum_vol2"),
      (col("intra").cast("double") / col("m_und")).as("coverage"),
      (col("intra").cast("double") / col("m_und") -
        col("sum_vol2").cast("double") / (lit(4.0) * col("m_und") * col("m_und")))
        .as("modularity"))
  }

  /** Per-community (label, vol, cut, conductance), all weight sums; vol-0 communities
    * get conductance 0. */
  def conductance(spark: SparkSession, g: LinkGraph, labels: DataFrame): DataFrame = {
    val mu = g.canonicalUndirected.agg(sum("weight").cast("long")).head().getLong(0)
    val biLab = g.bidirected
      .join(labels.select(col("id").as("src"), col("label").as("lsrc")), "src")
      .join(labels.select(col("id").as("dst"), col("label").as("ldst")), "dst")
    val cut = biLab.filter(col("lsrc") =!= col("ldst"))
      .groupBy(col("lsrc").as("label")).agg(sum("weight").cast("long").as("cut"))
    val vol = undDegrees(g).join(labels, "id").groupBy("label").agg(sum("deg").as("vol"))
    labels.select("label").distinct()
      .join(vol, Seq("label"), "left").join(cut, Seq("label"), "left")
      .select(col("label"),
        coalesce(col("vol"), lit(0L)).as("vol"),
        coalesce(col("cut"), lit(0L)).as("cut"))
      .withColumn("conductance",
        when(least(col("vol"), lit(2L) * mu - col("vol")) === 0L, lit(0.0))
          .otherwise(col("cut").cast("double") /
            least(col("vol"), lit(2L) * mu - col("vol"))))
  }

  /** Coarsen the undirected graph by a partition: one node per label, edge weight =
    * sum of fine edge weights between the label pair; intra-cluster edges become
    * self-loop rows (a == b). Output (a, b, w) with a <= b. */
  def coarsen(spark: SparkSession, g: LinkGraph, labels: DataFrame): DataFrame =
    labeledEdges(g, labels)
      .select(least(col("lsrc"), col("ldst")).as("a"),
        greatest(col("lsrc"), col("ldst")).as("b"), col("weight"))
      .groupBy("a", "b").agg(sum("weight").cast("long").as("w"))

  /** Rand index between two partitions of the same vertex set: one row
    * (n, s_both, s_a, s_b, rand). Pair counts are exact integers via C(x,2). */
  def randIndex(spark: SparkSession, a: DataFrame, b: DataFrame): DataFrame = {
    val joined = a.select(col("id"), col("label").as("la"))
      .join(b.select(col("id"), col("label").as("lb")), "id")
    val cont = joined.groupBy("la", "lb").agg(count(lit(1)).as("nij"))
    val sBoth = cont.agg(sum(expr("nij*(nij-1) div 2")).as("s_both"))
    val sA = cont.groupBy("la").agg(sum("nij").as("ai"))
      .agg(sum(expr("ai*(ai-1) div 2")).as("s_a"))
    val sB = cont.groupBy("lb").agg(sum("nij").as("bj"))
      .agg(sum(expr("bj*(bj-1) div 2")).as("s_b"))
    val n = joined.agg(count(lit(1)).as("n"))
    n.crossJoin(sBoth).crossJoin(sA).crossJoin(sB)
      .select(col("n"), col("s_both"), col("s_a"), col("s_b"),
        ((expr("n*(n-1) div 2") + lit(2L) * col("s_both") - col("s_a") - col("s_b"))
          .cast("double") / expr("n*(n-1) div 2")).as("rand"))
  }

  /** Adjusted Rand index (chance-corrected pair counting, the AdjustedRandMeasure of
    * the NMIDistance family): ARI = (s_both − E) / ((s_a+s_b)/2 − E) with
    * E = s_a·s_b / C(n,2). All inputs are exact integers and the double arithmetic is
    * one fixed expression tree, so the value is engine-deterministic. */
  def adjustedRand(spark: SparkSession, a: DataFrame, b: DataFrame): DataFrame =
    randIndex(spark, a, b).select(
      col("n"), col("s_both"), col("s_a"), col("s_b"),
      ((col("s_both").cast("double") -
        (col("s_a") * col("s_b")).cast("double") / expr("n*(n-1) div 2").cast("double")) /
        ((col("s_a") + col("s_b")).cast("double") / 2.0 -
          (col("s_a") * col("s_b")).cast("double") / expr("n*(n-1) div 2").cast("double")))
        .as("ari"))

  /** GraphClusteringTools invariants (community/GraphClusteringTools.cpp): one row
    * (n_nodes, n_labeled, n_clusters, max_cluster, min_cluster, is_proper,
    * is_singleton, is_one) — `is_proper` = every vertex labeled exactly once. */
  def clusteringProperties(spark: SparkSession, g: LinkGraph, labels: DataFrame): DataFrame = {
    val perNode = g.vertices
      .join(labels.groupBy("id").agg(count(lit(1)).as("c")), Seq("id"), "left")
      .agg(count(lit(1)).as("n_nodes"),
        sum(when(col("c") === 1L, 1L).otherwise(0L)).as("n_labeled"))
    val sizes = labels.groupBy("label").agg(count(lit(1)).as("sz"))
      .agg(count(lit(1)).as("n_clusters"), max("sz").as("max_cluster"),
        min("sz").as("min_cluster"))
    perNode.crossJoin(sizes).select(
      col("n_nodes"), col("n_labeled"), col("n_clusters"),
      col("max_cluster"), col("min_cluster"),
      (col("n_labeled") === col("n_nodes")).as("is_proper"),
      (col("n_clusters") === col("n_nodes")).as("is_singleton"),
      (col("n_clusters") === 1L).as("is_one"))
  }

  /** Jaccard dissimilarity between two partitions
    * (community/JaccardMeasure.cpp:15-70): over the same pair counts as randIndex,
    * s00 = C(n,2) + s_both − s_a − s_b and jaccard = 1 − 2·s11 / (n(n−1) − 2·s00)
    * (0 when the divisor is 0 — both partitions all-singletons). Exact integers into
    * one fixed double expression. */
  def jaccardMeasure(spark: SparkSession, a: DataFrame, b: DataFrame): DataFrame =
    randIndex(spark, a, b).select(
      col("n"), col("s_both"), col("s_a"), col("s_b"),
      when(expr("n*(n-1) - 2*(n*(n-1) div 2 + s_both - s_a - s_b)") <= 0L, lit(0.0))
        .otherwise(lit(1.0) - (lit(2L) * col("s_both")).cast("double") /
          expr("n*(n-1) - 2*(n*(n-1) div 2 + s_both - s_a - s_b)"))
        .as("jaccard"))

  /** Graph-structural Rand dissimilarity
    * (community/GraphStructuralRandMeasure.cpp:14-40): over the undirected edge set,
    * e11 = edges whose endpoints agree in BOTH partitions, e00 = edges whose endpoints
    * disagree in both; rand_g = 1 − (e11+e00)/m. One labeled-edge pass, exact
    * integers. */
  def graphStructuralRand(spark: SparkSession, g: LinkGraph,
      a: DataFrame, b: DataFrame): DataFrame = {
    val la = a.select(col("id"), col("label").as("l1"))
    val lb = b.select(col("id"), col("label").as("l2"))
    g.canonicalUndirected
      .join(la.select(col("id").as("src"), col("l1").as("a_src")), "src")
      .join(la.select(col("id").as("dst"), col("l1").as("a_dst")), "dst")
      .join(lb.select(col("id").as("src"), col("l2").as("b_src")), "src")
      .join(lb.select(col("id").as("dst"), col("l2").as("b_dst")), "dst")
      .agg(count(lit(1)).as("m"),
        sum(when(col("a_src") === col("a_dst") && col("b_src") === col("b_dst"), 1L)
          .otherwise(0L)).as("e11"),
        sum(when(col("a_src") =!= col("a_dst") && col("b_src") =!= col("b_dst"), 1L)
          .otherwise(0L)).as("e00"))
      .select(col("m"), col("e11"), col("e00"),
        (lit(1.0) - (col("e11") + col("e00")).cast("double") / col("m")).as("rand_g"))
  }

  /** PartitionIntersection (community/PartitionIntersection.cpp:5-15): the coarsest
    * partition refining both inputs — each distinct (label_a, label_b) pair becomes one
    * subset, compacted to dense ids in (la, lb) order (the reference's
    * `s·ub(eta)+eta[u]` then `compact()` yields exactly this order). Output (id, label).
    * The pair→rank dictionary is label-cardinality-sized and distributed
    * (Layout.zipWithRankBy — no global window). */
  def partitionIntersection(spark: SparkSession, a: DataFrame, b: DataFrame): DataFrame = {
    val joined = a.select(col("id"), col("label").as("la"))
      .join(b.select(col("id"), col("label").as("lb")), "id")
    val dict = graft.layout.Layout.zipWithRankBy(
      joined.select("la", "lb").distinct(), Seq(col("la"), col("lb")), "label")
    // Layout ownership contract: materialize the (small) result, then release the
    // pair dictionary's blocks — the output stays correct either way (ranks are a
    // pure function of the data), this just avoids the session-lifetime cache leak.
    val out = joined.join(dict, Seq("la", "lb")).select(col("id"), col("label"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    dict.unpersist()
    out
  }

  /** CoverHubDominance (community/CoverHubDominance.cpp:11-80) over an exploded
    * membership table `cover(id, label)` (a node may carry several labels): per
    * cluster, dominance = max over members of the member's internal degree (neighbors
    * sharing that cluster) / (clusterSize − 1); size-1 clusters get dominance 1.
    * Output one row per cluster (label, size, max_int_deg, dominance). Internal
    * degrees come from one bidirected-edge ⋈ membership ⋈ membership join — the same
    * labeled-edge shape as modularity, hash-partitioned on the cluster key. */
  def coverHubDominance(spark: SparkSession, g: LinkGraph, cover: DataFrame): DataFrame = {
    val sizes = cover.groupBy("label").agg(count(lit(1)).as("size"))
    val maxInt = g.bidirected.select(col("src"), col("dst"))
      .join(cover.select(col("id").as("src"), col("label")), "src")
      .join(cover.select(col("id").as("dst"), col("label")), Seq("dst", "label"))
      .groupBy("src", "label").agg(count(lit(1)).as("int_deg"))
      .groupBy("label").agg(max("int_deg").as("max_int_deg"))
    sizes.join(maxInt, Seq("label"), "left")
      .select(col("label"), col("size"),
        coalesce(col("max_int_deg"), lit(0L)).as("max_int_deg"))
      .withColumn("dominance",
        when(col("size") <= 1L, lit(1.0))
          .otherwise(col("max_int_deg").cast("double") / (col("size") - 1L)))
  }

  /** Normalized mutual information between two partitions
    * (community/NMIDistance.cpp:19-131): MI = Σ_cells (n_ij/n)·log2(n_ij·n/(a_i·b_j)),
    * H = −Σ p·log2 p, NMI = 2·MI/(H_a+H_b), NMID = 1 − NMI. The log sums are the one
    * place the oracle surface is not exact-integer (reassociation noise ~1e-15), so the
    * output columns are rounded to 7 decimals on BOTH engines. */
  /** Node-structural Rand DISSIMILARITY (community/NodeStructuralRandMeasure.cpp:
    * 14-60): 1 − 2A/(n(n−1)) with A = C(n,2) + 2·Σ_I C(s_I,2) − Σ_ζ C(s,2) − Σ_η
    * C(s,2) — the same pair counts as [[randIndex]] (sumIntersection = s_both),
    * reported as a distance. Exact integers + one double division. */
  def nodeStructuralRand(spark: SparkSession, a: DataFrame, b: DataFrame): DataFrame =
    randIndex(spark, a, b).select(
      col("n"), col("s_both"), col("s_a"), col("s_b"),
      (lit(1.0) -
        (lit(2L) * (expr("n*(n-1) div 2") + lit(2L) * col("s_both")
          - col("s_a") - col("s_b"))).cast("double") /
          expr("n*(n-1)").cast("double")).as("rand_dissim"))

  /** SampledNodeStructuralRandMeasure (community/SampledNodeStructuralRandMeasure
    * .cpp:18-53): dissimilarity 1 − (n11+n00)/samples over sampled node pairs.
    * Deterministic twin: pair k draws u = mix(2k), v = mix(2k+1) over the dense id
    * range via the shared LCG (the reference draws off the ambient RNG and redraws
    * on u = v; here invalid draws are dropped — same uniform-pair estimator,
    * replayable at any parallelism). */
  def sampledNodeStructuralRand(spark: SparkSession, g: LinkGraph,
      a: DataFrame, b: DataFrame, samples: Int, seed: Long = 42L): DataFrame = {
    val n = g.n
    val draws = spark.range(samples).select(
      expr(s"${sampleDraw(s"2*id + $seed*1000003")} % $n").as("u"),
      expr(s"${sampleDraw(s"2*id + 1 + $seed*1000003")} % $n").as("v"))
      .filter(col("u") =!= col("v"))
    pairAgreement(draws, a, b, "rand_node_sampled")
  }

  /** SampledGraphStructuralRandMeasure (community/SampledGraphStructuralRandMeasure
    * .cpp:19-56): dissimilarity 1 − (e11+e00)/samples over sampled EDGES, drawn as
    * (uniform node u with deg > 0, uniform neighbor of u) — the reference's
    * degree-biased edge sampling, reproduced with the shared LCG and neighbors
    * ranked by ascending id (the reference indexes its adjacency arrays; a
    * deterministic total order replaces insertion order). Draws hitting isolated
    * nodes are dropped. */
  def sampledGraphStructuralRand(spark: SparkSession, g: LinkGraph,
      a: DataFrame, b: DataFrame, samples: Int, seed: Long = 42L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val n = g.n
    val bi = g.bidirected.select("src", "dst")
    val deg = bi.groupBy(col("src").as("u")).agg(count(lit(1)).as("deg"))
    val adj = bi.select(col("src").as("u"), col("dst").as("w"))
      .withColumn("i", row_number().over(
        Window.partitionBy("u").orderBy("w")) - 1L)
    val draws = spark.range(samples).select(
      expr(s"${sampleDraw(s"2*id + $seed*999983")} % $n").as("u"),
      expr(sampleDraw(s"2*id + 1 + $seed*999983")).as("r"))
      .join(deg, "u") // isolated nodes never join: the draw is dropped
      .select(col("u"), pmod(col("r"), col("deg")).as("i"))
      .join(adj, Seq("u", "i"))
      .select(col("u"), col("w").as("v"))
    pairAgreement(draws, a, b, "rand_graph_sampled")
  }

  /** Shared LCG pair-draw mix (same shape as LinkPredEval.holdoutSplit). */
  private def sampleDraw(x: String): String = {
    import graft.synth.GraphSpec.{lcg, M}
    s"(((${lcg(x)} * ${lcg(s"($x) + 1000003")}) div 65536) % $M)"
  }

  /** Agreement counts over sampled (u, v) pairs: (samples, n11, n00, <name>) with
    * dissimilarity 1 − (n11+n00)/samples. */
  private def pairAgreement(pairs: DataFrame, a: DataFrame, b: DataFrame,
                            name: String): DataFrame =
    pairs
      .join(a.select(col("id").as("u"), col("label").as("au")), "u")
      .join(a.select(col("id").as("v"), col("label").as("av")), "v")
      .join(b.select(col("id").as("u"), col("label").as("bu")), "u")
      .join(b.select(col("id").as("v"), col("label").as("bv")), "v")
      .agg(count(lit(1)).as("samples"),
        sum(when(col("au") === col("av") && col("bu") === col("bv"), 1L)
          .otherwise(0L)).as("n11"),
        sum(when(col("au") =!= col("av") && col("bu") =!= col("bv"), 1L)
          .otherwise(0L)).as("n00"))
      .select(col("samples"), col("n11"), col("n00"),
        (lit(1.0) - (col("n11") + col("n00")).cast("double") / col("samples"))
          .as(name))

  /** DynamicNMIDistance (community/DynamicNMIDistance.cpp:25-137): the NMI machinery
    * of [[nmi]] restricted to nodes present in BOTH clusterings (the inner id join),
    * reported as the distance NMID = 1 − NMI (0 when H(ζ)+H(η) = 0) — the
    * old-vs-new-clustering comparison for dynamic community tracking. */
  def dynamicNmiDistance(spark: SparkSession, a: DataFrame, b: DataFrame): DataFrame =
    nmi(spark, a, b).select(col("n"), col("mi"), col("h_a"), col("h_b"), col("nmi"),
      when(col("h_a") + col("h_b") === 0.0, lit(0.0))
        .otherwise(round(lit(1.0) - col("nmi"), 7)).as("nmid"))

  def nmi(spark: SparkSession, a: DataFrame, b: DataFrame): DataFrame = {
    val joined = a.select(col("id"), col("label").as("la"))
      .join(b.select(col("id"), col("label").as("lb")), "id")
    val cont = joined.groupBy("la", "lb").agg(count(lit(1)).as("nij"))
    val n = joined.count().toDouble
    val ai = cont.groupBy("la").agg(sum("nij").as("ai"))
    val bj = cont.groupBy("lb").agg(sum("nij").as("bj"))
    val mi = cont.join(ai, "la").join(bj, "lb")
      .agg(sum(col("nij") / n * log2(col("nij") * n / (col("ai") * col("bj")))).as("mi"))
    val ha = ai.agg((-sum(col("ai") / n * log2(col("ai") / n))).as("h_a"))
    val hb = bj.agg((-sum(col("bj") / n * log2(col("bj") / n))).as("h_b"))
    mi.crossJoin(ha).crossJoin(hb).select(
      lit(n.toLong).as("n"),
      round(col("mi"), 7).as("mi"),
      round(col("h_a"), 7).as("h_a"),
      round(col("h_b"), 7).as("h_b"),
      round(when(col("h_a") + col("h_b") === 0.0, 0.0)
        .otherwise(lit(2.0) * col("mi") / (col("h_a") + col("h_b"))), 7).as("nmi"))
  }
}
