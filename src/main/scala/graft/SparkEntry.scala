package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.algo.{Betweenness, Centralities, ConnectedComponents, Distances, EdgeScores,
  KCore, LabelPropagation, Measures, PLM, PageRank, TopCloseness, Triangles}
import graft.model.LinkGraph
import graft.emb.Embeddings
import graft.oracle.{DedupOracleSql, DocOracleSql, EmbOracleSql, MediaOracleSql, OracleSql}
import graft.text.{Dedup, TextOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every graph query runs the FULL engine pipeline: synthetic page table
  * (url, warc_ts, html, text, lang) -> html link extraction -> url dictionary ->
  * edge table -> algorithm. The DuckDB oracles re-derive the edge set from the shared
  * integer-arithmetic spec (GraphSpec) and replay the same recurrences, so a hash match
  * verifies the whole pipeline end to end.
  */
object SparkEntry {

  /** Flagship: full page-table -> edges -> PageRank pipeline on sf0.001, top pages. */
  def entry(spark: SparkSession): DataFrame = {
    val g = LinkGraph.forSf(spark, "/root/testdata/sf0.001")
    val pr = PageRank.run(spark, g, damp = 0.85, tol = 1e-8, maxIter = 100)
    pr.ranks.orderBy(desc("score"), asc("id")).limit(20)
  }

  private def graph(s: SparkSession, dir: String): LinkGraph = LinkGraph.forSf(s, dir)

  /** Small weighted fixture for the max-flow family: the undirected simple subgraph
    * induced on ids < f (connected at sf0.01), integer caps 1+(u+v)%5 — small enough
    * for the oracle's brute-force min-cut subset enumeration. */
  private def flowFixture(g: LinkGraph, f: Long): DataFrame =
    g.canonicalUndirected.filter(col("src") < f && col("dst") < f)
      .select(col("src").as("u"), col("dst").as("v"),
        (lit(1L) + pmod(col("src") + col("dst"), lit(5L))).as("cap"))

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_edges" -> ((s, dir) => graph(s, dir).edges.select(col("src"), col("dst"))),

    "q_degrees" -> ((s, dir) => {
      val g = graph(s, dir)
      val od = g.edges.groupBy(col("src").as("id")).agg(count(lit(1)).as("oc"))
      val id = g.edges.groupBy(col("dst").as("id")).agg(count(lit(1)).as("ic"))
      g.vertices
        .join(od, Seq("id"), "left").join(id, Seq("id"), "left")
        .select(col("id"), coalesce(col("oc"), lit(0L)).as("out_deg"),
          coalesce(col("ic"), lit(0L)).as("in_deg"))
    }),

    "q_pagerank_fixed" -> ((s, dir) =>
      PageRank.fixedPoint(s, graph(s, dir), iterations = 20)),

    // HITS hubs & authorities, L1-normalized scaled-integer fixed point.
    "q_hits" -> ((s, dir) =>
      PageRank.hitsFixed(s, graph(s, dir), iterations = 12)),

    // TrustRank: teleport restricted to the id % 100 trusted-seed set.
    "q_trustrank" -> ((s, dir) => {
      val g = graph(s, dir)
      PageRank.trustRankFixed(s, g, g.vertices.filter(col("id") % 100 === 0),
        iterations = 20)
    }),

    "q_components" -> ((s, dir) =>
      ConnectedComponents.run(s, graph(s, dir)).labels),

    "q_plp" -> ((s, dir) =>
      LabelPropagation.fixedRounds(s, graph(s, dir), rounds = 10)),

    // Degree-ordered LP: low-degree buckets update first within each sweep
    // (bucketed Gauss-Seidel re-expression of the sequential degree-ordered sweep).
    "q_lp_degree_ordered" -> ((s, dir) =>
      LabelPropagation.degreeOrderedFixed(s, graph(s, dir), sweeps = 3, buckets = 4)),

    "q_triangles_global" -> ((s, dir) => {
      import s.implicits._
      Seq(Triangles.globalCount(s, graph(s, dir))).toDF("triangles")
    }),

    "q_triangles_node" -> ((s, dir) =>
      Triangles.perNode(s, graph(s, dir))),

    "q_lcc" -> ((s, dir) =>
      Triangles.localClusteringCoefficient(s, graph(s, dir))),

    // --- partition measures / coarsening / partition similarity over PLP labels ---
    "q_modularity" -> ((s, dir) => {
      val g = graph(s, dir)
      Measures.summary(s, g, LabelPropagation.fixedRounds(s, g, 10))
    }),
    "q_conductance" -> ((s, dir) => {
      val g = graph(s, dir)
      Measures.conductance(s, g, LabelPropagation.fixedRounds(s, g, 10))
    }),
    "q_coarsen" -> ((s, dir) => {
      val g = graph(s, dir)
      Measures.coarsen(s, g, LabelPropagation.fixedRounds(s, g, 10))
    }),
    "q_rand_index" -> ((s, dir) => {
      val g = graph(s, dir)
      Measures.randIndex(s,
        LabelPropagation.fixedRounds(s, g, 5), LabelPropagation.fixedRounds(s, g, 10))
    }),
    "q_adjusted_rand" -> ((s, dir) => {
      val g = graph(s, dir)
      Measures.adjustedRand(s,
        LabelPropagation.fixedRounds(s, g, 5), LabelPropagation.fixedRounds(s, g, 10))
    }),
    "q_nmi" -> ((s, dir) => {
      val g = graph(s, dir)
      Measures.nmi(s,
        LabelPropagation.fixedRounds(s, g, 5), LabelPropagation.fixedRounds(s, g, 10))
    }),
    "q_jaccard_measure" -> ((s, dir) => {
      val g = graph(s, dir)
      Measures.jaccardMeasure(s,
        LabelPropagation.fixedRounds(s, g, 5), LabelPropagation.fixedRounds(s, g, 10))
    }),
    "q_node_rand" -> ((s, dir) => {
      val g = graph(s, dir)
      Measures.nodeStructuralRand(s,
        LabelPropagation.fixedRounds(s, g, 5), LabelPropagation.fixedRounds(s, g, 10))
    }),
    "q_sampled_node_rand" -> ((s, dir) => {
      val g = graph(s, dir)
      Measures.sampledNodeStructuralRand(s, g,
        LabelPropagation.fixedRounds(s, g, 5), LabelPropagation.fixedRounds(s, g, 10),
        samples = 2000, seed = 42L)
    }),
    "q_sampled_graph_rand" -> ((s, dir) => {
      val g = graph(s, dir)
      Measures.sampledGraphStructuralRand(s, g,
        LabelPropagation.fixedRounds(s, g, 5), LabelPropagation.fixedRounds(s, g, 10),
        samples = 2000, seed = 42L)
    }),
    "q_hash_overlap" -> ((s, dir) => {
      val g = graph(s, dir)
      graft.algo.Overlap.hashingOverlapper(s, Seq(
        LabelPropagation.fixedRounds(s, g, 5), LabelPropagation.fixedRounds(s, g, 10)))
    }),
    "q_dynamic_nmi" -> ((s, dir) => {
      val g = graph(s, dir)
      Measures.dynamicNmiDistance(s,
        LabelPropagation.fixedRounds(s, g, 5), LabelPropagation.fixedRounds(s, g, 10))
    }),
    "q_graph_rand" -> ((s, dir) => {
      val g = graph(s, dir)
      Measures.graphStructuralRand(s, g,
        LabelPropagation.fixedRounds(s, g, 5), LabelPropagation.fixedRounds(s, g, 10))
    }),
    "q_partition_intersection" -> ((s, dir) => {
      val g = graph(s, dir)
      Measures.partitionIntersection(s,
        LabelPropagation.fixedRounds(s, g, 5), LabelPropagation.fixedRounds(s, g, 10))
    }),
    // Cover = PLP(10) ∪ an id%64 slicing shifted past the PLP label space.
    "q_cover_hub_dominance" -> ((s, dir) => {
      val g = graph(s, dir)
      val cover = LabelPropagation.fixedRounds(s, g, 10)
        .unionByName(g.vertices.select(col("id"),
          (lit(10000000L) + col("id") % 64L).as("label")))
      Measures.coverHubDominance(s, g, cover)
    }),
    // Edit script between the graph and its deterministic mutation (drop %13, bump
    // weight %17, add the 0-star to id%997==0).
    "q_graph_difference" -> ((s, dir) => {
      val g = graph(s, dir)
      val e1 = g.canonicalUndirected
      val e2 = e1.filter((col("src") + col("dst")) % 13L =!= 0L)
        .select(col("src"), col("dst"),
          when((col("src") + col("dst")) % 17L === 0L, col("weight") + 1.0)
            .otherwise(col("weight")).as("weight"))
        .unionByName(g.vertices.filter(col("id") % 997L === 0L && col("id") =!= 0L)
          .select(lit(0L).as("src"), col("id").as("dst"), lit(1.0).as("weight")))
        .groupBy("src", "dst").agg(max("weight").as("weight"))
      graft.streaming.GraphEvents.graphDifference(e1, e2)
    }),
    // Deterministic synchronous SEIR census over the contact graph.
    "q_seir" -> ((s, dir) =>
      graft.algo.Epidemic.seir(s, graph(s, dir), tMax = 10, transP = 0.3,
        eTime = 2, iTime = 3, zero = 0L)),
    "q_approx_closeness" -> ((s, dir) =>
      Distances.approxCloseness(s, graph(s, dir), mod = 100L, maxLevels = 15)),
    "q_gce" -> ((s, dir) => graft.algo.Scd.gce(s, graph(s, dir), seed = 0L, maxSteps = 15)),
    "q_diameter_est" -> ((s, dir) => Distances.diameterTwoSweep(s, graph(s, dir))),
    "q_link_pred" -> ((s, dir) =>
      graft.algo.LinkPrediction.scores(s, graph(s, dir), uMod = 50L)),
    "q_anf" -> ((s, dir) => graft.algo.Anf.finishHops(s, graph(s, dir), maxHops = 15)),
    // Reader/writer oracle gates: the synthetic graph round-trips through the text
    // formats and must land exactly back on the arithmetic-spec edge set.
    "q_edgelist_roundtrip" -> ((s, dir) => {
      val g = graph(s, dir)
      val p = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get("/root/repo/target"), "vrt").resolve("el").toString
      graft.io.GraphReaders.writeEdgeList(g, p)
      graft.io.GraphReaders.readEdgeList(s, p, sep = "\t")
        .edges.select(col("src"), col("dst"))
    }),
    "q_thrill_roundtrip" -> ((s, dir) => {
      val g = graph(s, dir)
      val p = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get("/root/repo/target"), "vrt").resolve("thrill").toString
      graft.io.GraphReaders.writeThrillBinary(g, p)
      graft.io.GraphReaders.readThrillBinary(s, p)
        .canonicalUndirected.select(col("src"), col("dst"))
    }),
    "q_dibap_roundtrip" -> ((s, dir) => {
      val g = graph(s, dir)
      val p = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get("/root/repo/target"), "vrt")
        .resolve("g.dibap").toString
      graft.io.GraphReaders.writeDibap(g, p)
      graft.io.GraphReaders.readDibap(s, p)
        .canonicalUndirected.select(col("src"), col("dst"))
    }),
    "q_gt_roundtrip" -> ((s, dir) => {
      val g = graph(s, dir)
      val p = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get("/root/repo/target"), "vrt").resolve("gt").toString
      graft.io.GraphReaders.writeGraphToolBinary(g, p)
      graft.io.GraphReaders.readGraphToolBinary(s, p)
        .canonicalUndirected.select(col("src"), col("dst"))
    }),
    "q_binpart_roundtrip" -> ((s, dir) => {
      val g = graph(s, dir)
      val p = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get("/root/repo/target"), "vrt").resolve("binpart").toString
      graft.io.GraphReaders.writeBinaryPartition(
        LabelPropagation.fixedRounds(s, g, 5), p, width = 8)
      graft.io.GraphReaders.readBinaryPartition(s, p, width = 8)
    }),
    "q_elpart_roundtrip" -> ((s, dir) => {
      val g = graph(s, dir)
      val p = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get("/root/repo/target"), "vrt").resolve("elpart").toString
      graft.io.GraphReaders.writeEdgeListPartition(
        LabelPropagation.fixedRounds(s, g, 5), p, firstNode = 1L)
      graft.io.GraphReaders.readEdgeListPartition(s, p, firstNode = 1L)
    }),
    "q_graphml_roundtrip" -> ((s, dir) => {
      val g = graph(s, dir)
      val p = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get("/root/repo/target"), "vrt").resolve("graphml").toString
      graft.io.XmlGraphIO.writeGraphMl(g, p, directed = true)
      graft.io.XmlGraphIO.readGraphMl(s, p).edges.select(col("src"), col("dst"))
    }),
    "q_gexf_roundtrip" -> ((s, dir) => {
      val g = graph(s, dir)
      val p = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get("/root/repo/target"), "vrt").resolve("gexf").toString
      graft.io.XmlGraphIO.writeGexf(g, p, directed = true)
      graft.io.XmlGraphIO.readGexf(s, p).edges.select(col("src"), col("dst"))
    }),
    "q_metis_roundtrip" -> ((s, dir) => {
      val g = graph(s, dir)
      val p = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get("/root/repo/target"), "vrt").resolve("metis").toString
      graft.io.GraphReaders.writeMetis(g, p)
      graft.io.GraphReaders.readMetis(s, p)
        .canonicalUndirected.select(col("src"), col("dst"))
    }),
    "q_snap_roundtrip" -> ((s, dir) => {
      val g = graph(s, dir)
      val p = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get("/root/repo/target"), "vrt").resolve("snap").toString
      graft.io.GraphReaders.writeSnap(g, p)
      graft.io.GraphReaders.readSnap(s, p).edges.select(col("src"), col("dst"))
    }),
    "q_konect_roundtrip" -> ((s, dir) => {
      val g = graph(s, dir)
      val p = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get("/root/repo/target"), "vrt").resolve("konect").toString
      graft.io.GraphReaders.writeKonect(g, p)
      graft.io.GraphReaders.readKonect(s, p).edges.select(col("src"), col("dst"))
    }),
    "q_mm_roundtrip" -> ((s, dir) => {
      val g = graph(s, dir)
      val p = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get("/root/repo/target"), "vrt").resolve("mm").toString
      graft.io.GraphReaders.writeMatrixMarket(g, p)
      graft.io.GraphReaders.readMatrixMarket(s, p).edges.select(col("src"), col("dst"))
    }),
    "q_gml_roundtrip" -> ((s, dir) => {
      val g = graph(s, dir)
      val p = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get("/root/repo/target"), "vrt").resolve("gml").toString + "/g.gml"
      graft.io.GraphReaders.writeGml(g, p, directed = true)
      graft.io.GraphReaders.readGml(s, p).edges.select(col("src"), col("dst"))
    }),
    // Generator gates: pure (seed,index) arithmetic — DuckDB replays the formula.
    "q_gen_er"   -> ((s, _) =>
      graft.synth.Generators.erdosRenyi(s, 5000L, 20000L, 42L).edges
        .select(col("src"), col("dst"))),
    "q_gen_ws"   -> ((s, _) =>
      graft.synth.Generators.wattsStrogatz(s, 3000L, 6, 0.1, 42L).edges
        .select(col("src"), col("dst"))),
    "q_gen_rmat" -> ((s, _) =>
      graft.synth.Generators.rmat(s, 12, 8, 42L).edges
        .select(col("src"), col("dst"))),
    "q_gen_ring" -> ((s, _) =>
      graft.synth.Generators.regularRingLattice(s, 4000L, 6).edges
        .select(col("src"), col("dst"))),
    // Geometric generator: grid-doubling exact NN + cell-ring spatial join; the
    // oracle replays the O(n^2) definition brute-force.
    "q_gen_mocnik" -> ((s, _) =>
      graft.synth.Generators.mocnik(s, 2000L, 3, 42L).edges
        .select(col("src"), col("dst"))),
    // Full multi-layer Mocnik: shared points, per-layer k*dmin rule over the first
    // ns(j) points, first layer wins with its relativeWeight.
    "q_gen_mocnik_multi" -> ((s, _) =>
      graft.synth.Generators.mocnikMultiLayer(s, Seq(1200L, 2000L), Seq(3, 2),
        Seq(1.0, 0.5), 42L).edges
        .select(col("src"), col("dst"), col("weight"))),
    // Preferential-attachment-by-edge generator; the oracle replays the identical
    // pointer chase as a recursive CTE over the same draw formula.
    "q_gen_dm" -> ((s, _) =>
      graft.synth.Generators.dorogovtsevMendes(s, 3000L, 42L).edges
        .select(col("src"), col("dst"))),
    // Geometric torus generator with dense areas + mutual-kNN degree cap; the
    // oracle replays the O(n^2) definition brute-force.
    "q_gen_pubweb" -> ((s, _) =>
      graft.synth.Generators.pubWeb(s, 1500L, areas = 10, maxNeigh = 8, rDiv = 64)
        .edges.select(col("src"), col("dst"))),
    // Erdős–Gallai realizability profile of the web graph's own degree sequence
    // (every k must pass — it IS a graph); rank/prefix layout + broadcast histogram.
    "q_erdos_gallai" -> ((s, dir) => {
      val g = graph(s, dir)
      val deg = g.vertices.join(
        g.bidirected.groupBy(col("src").as("id")).agg(count(lit(1)).as("d")),
        Seq("id"), "left")
        .select(col("id"), coalesce(col("d"), lit(0L)).as("deg"))
      graft.synth.Generators.erdosGallai(s, deg)
    }),
    // Havel–Hakimi realization of the LCG degree sequence: the constructed graph's
    // degree histogram must equal the input sequence's (exact realization); the
    // oracle replays the sequence formula.
    "q_havel_hakimi" -> ((s, _) => {
      val seq = graft.synth.Generators.lcgDegreeSequence(s, 2000L, 2L, 6L, 42L)
      val g = graft.synth.Generators.havelHakimi(s, seq)
      g.bidirected.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
        .groupBy("deg").agg(count(lit(1)).as("cnt"))
    }),
    // Clustered random graph: the planted membership is the pure draw formula (the
    // oracle replays it); edge realization is SBM-machinery, gated by
    // PlantedRecoverySpec (planted recovery + determinism + density).
    "q_clustered_random" -> ((s, _) =>
      graft.synth.Generators.clusteredRandomGraph(s, 3000L, 5, 0.02, 0.002, 42L)._2),
    // Exact-LFR node table: powerlaw degrees + community sizes + integer mu-split;
    // the edge realization (deterministic stub matching) is spec-gated (Round16Spec:
    // degree exactness within slack, mu mixing, planted NMI recovery).
    "q_gen_lfr" -> ((s, _) =>
      graft.synth.Generators.lfrExactNodes(s, 3000L, 4L, 60L, 40L, 300L, 1L, 4L)),
    // Dynamic generator event streams (etype,u,v,w,t), each foldable back to the
    // static graph at any prefix (DynamicGeneratorsSpec): path + DM + pubweb have
    // exact oracles; hyperbolic is rows-only (geometric floats).
    "q_dyn_path" -> ((s, _) => graft.streaming.DynamicGenerators.dynamicPath(s, 50L)),
    // Forest-fire event stream: burn set depends on the evolving graph state, so no
    // SQL twin (rows-only); DynTailSpec asserts shape/connectivity/determinism.
    "q_dyn_forest_fire" -> ((s, _) =>
      graft.streaming.DynamicGenerators.dynamicForestFire(s, steps = 25, p = 0.4)),
    "q_dyn_dm" -> ((s, _) =>
      graft.streaming.DynamicGenerators.dynamicDorogovtsevMendes(s, 2000L, 42L)),
    "q_dyn_pubweb" -> ((s, _) =>
      graft.streaming.DynamicGenerators.dynamicPubWeb(s, 800L, steps = 3)),
    "q_dyn_hyperbolic" -> ((s, _) =>
      graft.streaming.DynamicGenerators.dynamicHyperbolic(s, 600L, R = 4.0, steps = 3)),
    "q_group_closeness" -> ((s, dir) =>
      graft.algo.GroupCentrality.groupCloseness(s, graph(s, dir), k = 4,
        poolSize = 16, maxLevels = 15)),
    // Tarjan-Vishkin biconnectivity: no tractable SQL twin (the DuckDB side would
    // need per-articulation reachability); correctness gated by BiconnectedSpec's
    // sequential Hopcroft-Tarjan oracle, driver records the rows-only check.
    "q_bicc" -> ((s, dir) =>
      graft.algo.Biconnected.run(s, graph(s, dir)).edgeComponents
        .select(col("src"), col("dst"), col("comp"))),

    // --- k-core / distances / edge scores / assortativity / Katz ---
    "q_kcore3"        -> ((s, dir) => KCore.kCore(s, graph(s, dir), 3)),
    "q_coreness"      -> ((s, dir) => KCore.coreness(s, graph(s, dir))),
    "q_scan_score"    -> ((s, dir) => EdgeScores.scanScore(s, graph(s, dir))),
    "q_quadrangle"    -> ((s, dir) =>
      EdgeScores.quadrangleEdgeScore(s, graph(s, dir))),
    "q_score_normalize" -> ((s, dir) => {
      val g = graph(s, dir)
      EdgeScores.normalizeScore(EdgeScores.triangleEdgeScore(s, g), "tri")
    }),
    "q_chance_tri"    -> ((s, dir) => EdgeScores.chanceCorrectedTriangleScore(s, graph(s, dir))),
    "q_local_sim"     -> ((s, dir) => EdgeScores.localSimilarityScore(s, graph(s, dir))),
    // Generic LocalFilterScore over the integer triangle attribute, both variants
    // (log keeps top d^e, linear keeps top 1+e(d-1)); RANK() tie semantics.
    "q_local_filter_log" -> ((s, dir) => {
      val g = graph(s, dir)
      EdgeScores.localFilterScore(s, g, EdgeScores.triangleEdgeScore(s, g), "tri",
        logarithmic = true)
    }),
    "q_local_filter_lin" -> ((s, dir) => {
      val g = graph(s, dir)
      EdgeScores.localFilterScore(s, g, EdgeScores.triangleEdgeScore(s, g), "tri",
        logarithmic = false)
    }),
    "q_sparsify_size" -> ((s, dir) =>
      EdgeScores.sparsifiedGraphOfSize(EdgeScores.scanScore(s, graph(s, dir)), "score", 0.2)),
    "q_random_edge"   -> ((s, dir) => EdgeScores.randomEdgeScore(s, graph(s, dir))),
    // --- sparsification tail: Simmelian overlap / multiscale / geometric mean /
    //     linearizer / prefix-Jaccard / node-edge baseline / forest fire ---
    "q_simmelian" -> ((s, dir) =>
      EdgeScores.simmelianOverlapScore(s, graph(s, dir), maxRank = 10)),
    "q_multiscale" -> ((s, dir) => {
      val g = graph(s, dir)
      EdgeScores.multiscaleScore(s, g,
        EdgeScores.triangleEdgeScore(s, g)
          .select(col("src"), col("dst"), (col("tri") + 1L).as("att")))
    }),
    "q_geometric_mean" -> ((s, dir) => {
      val g = graph(s, dir)
      EdgeScores.geometricMeanScore(s, g,
        EdgeScores.triangleEdgeScore(s, g)
          .select(col("src"), col("dst"), (col("tri") + 1L).as("att")))
    }),
    "q_linearize" -> ((s, dir) =>
      EdgeScores.linearizeScore(
        EdgeScores.scanScore(s, graph(s, dir)).select("src", "dst", "score"), "score")),
    "q_prefix_jaccard" -> ((s, dir) => {
      val g = graph(s, dir)
      EdgeScores.prefixJaccardScore(s, g,
        EdgeScores.triangleEdgeScore(s, g)
          .select(col("src"), col("dst"), col("tri").as("att")))
    }),
    "q_random_node_edge" -> ((s, dir) =>
      EdgeScores.randomNodeEdgeScore(s, graph(s, dir), rneRatio = 0.8, seed = 42L)),
    // Stochastic spreading process — no SQL twin; driver records the rows-only check.
    "q_forest_fire" -> ((s, dir) =>
      graft.algo.ForestFire.score(s, graph(s, dir), pf = 0.6,
        targetBurntRatio = 0.3, firesPerWave = 256)
        .select(col("src"), col("dst"), col("burnt"))),
    "q_bfs_hops"      -> ((s, dir) => Distances.bfsHops(s, graph(s, dir), 0L)),
    "q_graph_distance" -> ((s, dir) =>
      Distances.graphDistance(s, graph(s, dir), 0L, 4242L)),
    // DynWeaklyConnectedComponents: cold labels on the old DIRECTED graph, then a
    // remove(all edges at node 0) + insert(3, max-id) batch; warm repair must equal
    // the oracle's cold recompute on the mutated graph.
    "q_dyn_weak_cc" -> ((s, dir) => {
      val g = graph(s, dir)
      val vmax = g.vertices.agg(max("id")).head().getLong(0)
      import s.implicits._
      val cold = ConnectedComponents.run(s, g).labels
      val removals = g.edges.filter(col("src") === 0 || col("dst") === 0)
        .select(lit("re").as("etype"), col("src").as("u"), col("dst").as("v"),
          lit(1.0).as("w"))
      val events = removals.union(
        Seq(("ae", 3L, vmax, 1.0)).toDF("etype", "u", "v", "w"))
      graft.streaming.GraphEvents.dynWeaklyCC(s, cold, g.edges, events)
    }),
    "q_eccentricity"  -> ((s, dir) => Distances.eccentricity(s, graph(s, dir), 0L)),
    // Directed / reverse BFS over the raw directed edge table (ReverseBFS.cpp analog).
    "q_bfs_directed"  -> ((s, dir) => Distances.bfsHopsDirected(s, graph(s, dir), 0L)),
    "q_bfs_reverse"   -> ((s, dir) =>
      Distances.bfsHopsDirected(s, graph(s, dir), 0L, reverse = true)),
    // Volume battery: avg ball size at radius 1..5 from the %100 source sample,
    // all radii from ONE capped multi-source BFS.
    "q_volume"        -> ((s, dir) =>
      Distances.volume(s, graph(s, dir), rmax = 5, mod = 100L)),
    // Hop plot: cumulative connected-pair fraction per hop from the ANF sketches.
    "q_hop_plot"      -> ((s, dir) =>
      graft.algo.Anf.hopPlot(s, graph(s, dir), maxHops = 15)),
    "q_laplacian"     -> ((s, dir) => Centralities.laplacianCentrality(s, graph(s, dir))),
    "q_local_coverage" -> ((s, dir) => {
      val g = graph(s, dir)
      Centralities.localPartitionCoverage(s, g, LabelPropagation.fixedRounds(s, g, 10))
    }),
    // Adamic-Adar edge distance (common-neighbor inverse-log weight per existing edge).
    "q_adamic_adar"   -> ((s, dir) => EdgeScores.adamicAdarDistance(s, graph(s, dir))),
    // Sampled-BFS neighborhood-function estimate (the heuristic sibling of the ANF row).
    "q_nf_heuristic"  -> ((s, dir) =>
      Distances.neighborhoodFunctionHeuristic(s, graph(s, dir), maxHops = 10, mod = 100L)),
    // DynBFS: warm-repair after a deterministic insert batch (star 0 -> id%997==0);
    // must equal the cold BFS on the updated graph (the oracle computes the cold side).
    "q_dyn_bfs" -> ((s, dir) => {
      val g = graph(s, dir)
      val prev = Distances.bfsHops(s, g, 0L)
      val added = g.vertices.filter(col("id") % 997 === 0 && col("id") =!= 0L)
        .select(lit(0L).as("src"), col("id").as("dst"))
      Distances.bfsHopsWarm(s, g, prev, added)
    }),
    "q_dyn_sssp" -> ((s, dir) => {
      val g = graph(s, dir)
      val wExpr = lit(1L) + pmod(col("src") + col("dst"), lit(5L))
      val prev = Distances.weightedSssp(s, g, 0L, wExpr)
      val added = g.vertices.filter(col("id") % 997 === 0 && col("id") =!= 0L)
        .select(lit(0L).as("src"), col("id").as("dst"))
        .withColumn("w", lit(1L) + pmod(col("src") + col("dst"), lit(5L)))
      Distances.weightedSsspWarm(s, g, prev, added, wExpr)
    }),
    // All simple directed paths 0 -> 1 within 5 hops (reverse-BFS-pruned frontier).
    "q_simple_paths" -> ((s, dir) =>
      Distances.allSimplePaths(s, graph(s, dir), source = 0L, target = 1L, cutoff = 5)),
    // Exact top-k HARMONIC closeness with UB pruning, on the %7 subgraph (same
    // tractability split as q_top_closeness; the operator runs on the full graph).
    "q_top_harmonic" -> ((s, dir) => {
      val g = graph(s, dir)
      TopCloseness.harmonic(s,
        g.subgraphFromNodes(g.vertices.filter(col("id") % 7 === 0)), k = 25)
    }),
    "q_edge_jaccard"  -> ((s, dir) => EdgeScores.jaccardEdgeScore(s, graph(s, dir))),
    "q_sparsify_tri"  -> ((s, dir) =>
      EdgeScores.globalThresholdFilter(
        EdgeScores.triangleEdgeScore(s, graph(s, dir)), "tri", 1.0)
        .select(col("src"), col("dst"))),
    "q_assortativity" -> ((s, dir) => Centralities.assortativity(s, graph(s, dir))),
    "q_katz_fixed"    -> ((s, dir) => Centralities.katzFixedPoint(s, graph(s, dir), 10)),
    "q_eigen_fixed"   -> ((s, dir) => Centralities.eigenvectorFixedPoint(s, graph(s, dir), 10)),
    // Sampled-source Brandes (ApproxBetweenness-style batch of sources id%1000==0)
    // and exact closeness/harmonic of the same sources, from ONE multi-source BFS.
    "q_betweenness_fixed" -> ((s, dir) => {
      val g = graph(s, dir)
      Betweenness.fixedPoint(s, g, g.vertices.filter(col("id") % 1000 === 0))
    }),
    // KADABRA twin with the reference's ADAPTIVE two-phase stopping: ω from the
    // two-sweep diameter, τ warm-up phase → power-of-two δ-guess, round-doubling
    // status checks with the Borassi–Natale f/g Chernoff bounds, t* = first
    // finishing round else ω. The oracle replays the full schedule, not a fixed
    // budget (r5: closes the last "partial" semantics from VERDICT r4).
    "q_kadabra_est" -> ((s, dir) =>
      graft.algo.PathSampling.kadabraAdaptive(s, graph(s, dir),
        maxSamples = 512, seed = 42L, maxLevels = 18)),
    // Adaptive ApproxBetweenness: Riondato–Kornaropoulos ε-δ sample bound from the
    // two-sweep vertex-diameter estimate (integer log2, literal −ln δ — no library
    // log whose ulp could flip the ceil across engines), then the path-sampling
    // harness at that budget.
    "q_approx_betweenness" -> ((s, dir) =>
      graft.algo.PathSampling.approxBetweennessAdaptive(s, graph(s, dir))),
    // Mahmoody greedy max-coverage group betweenness over the same sampled paths.
    "q_group_betweenness" -> ((s, dir) =>
      graft.algo.PathSampling.approxGroupBetweenness(s, graph(s, dir), k = 4,
        samples = 64, seed = 42L)),
    // DynBetweenness: incremental affected-source update after a star insert batch;
    // the oracle computes the COLD Brandes on the mutated graph — equality proves
    // the warm path.
    "q_dyn_betweenness" -> ((s, dir) => {
      val g = graph(s, dir)
      val added = g.vertices.filter(col("id") % 997 === 0 && col("id") =!= 0L)
        .select(lit(0L).as("src"), col("id").as("dst"), lit(1.0).as("weight"))
      val gNew = graft.model.LinkGraph.fromEdges(s,
        g.edges.unionByName(added).groupBy("src", "dst")
          .agg(max("weight").as("weight")), Some(g.vertices))
      Betweenness.warmInsertFixed(s, g, gNew,
        g.vertices.filter(col("id") % 1000 === 0), added.select("src", "dst"))._1
    }),
    "q_closeness" -> ((s, dir) => {
      val g = graph(s, dir)
      Betweenness.closenessHarmonic(s, g, g.vertices.filter(col("id") % 1000 === 0))
    }),
    // DynTopHarmonicCloseness path: repair only the affected maintained rows after
    // a star insert batch; the oracle recomputes COLD on the mutated graph.
    "q_dyn_harmonic" -> ((s, dir) => {
      val g = graph(s, dir)
      val added = g.vertices.filter(col("id") % 997 === 0 && col("id") =!= 0L)
        .select(lit(0L).as("src"), col("id").as("dst"), lit(1.0).as("weight"))
      val gNew = graft.model.LinkGraph.fromEdges(s,
        g.edges.unionByName(added).groupBy("src", "dst")
          .agg(max("weight").as("weight")), Some(g.vertices))
      Betweenness.closenessHarmonicWarm(s, g, gNew,
        g.vertices.filter(col("id") % 1000 === 0), added.select("src", "dst"))._1
    }),
    // Sampled-source APSP from the same multi-source BFS harness (100 sources).
    "q_apsp" -> ((s, dir) => {
      val g = graph(s, dir)
      Distances.apsp(s, g, g.vertices.filter(col("id") % 100 === 0))
    }),
    // DynAPSP: closed-form repair of the sampled APSP table after inserting the
    // single edge {0, max id}; the oracle computes the COLD APSP on the mutated
    // graph — equality proves the warm path.
    "q_dyn_apsp" -> ((s, dir) => {
      val g = graph(s, dir)
      val vmax = g.vertices.agg(max("id")).head().getLong(0)
      val prev = Distances.apsp(s, g, g.vertices.filter(col("id") % 100 === 0))
      Distances.dynApspInsert(s, g, prev, 0L, vmax)
    }),
    // DynBetweennessOneNode: warm (dist, sigma, sigmax) repair for tracked node 7
    // after inserting {0, max-id}; oracle = cold state on the mutated graph.
    "q_dyn_bet_one_node" -> ((s, dir) => {
      val g = graph(s, dir)
      val vmax = g.vertices.agg(max("id")).head().getLong(0)
      val prev = Betweenness.msBfs(s, g,
        g.vertices.filter(col("id") % 100 === 0 || col("id") === 7))._1
      Betweenness.dynBetweennessOneNode(s, g, prev, 0L, vmax, 7L)
    }),
    // --- Electrical (Laplacian) family: one batched integer-Jacobi solver
    // (Electrical.solveBatch) behind exact pair probes (resistance/commute) and
    // JLT probes (all-edges SEC, all-nodes closeness); the oracle replays the
    // truncating-integer iteration bit-exactly. ---
    // Bounded-exploration Dijkstra: only the distance-<=12 ball around node 0.
    "q_incomplete_dijkstra" -> ((s, dir) => {
      val g = graph(s, dir)
      val wExpr = lit(1L) + pmod(col("src") + col("dst"), lit(5L))
      Distances.incompleteDijkstra(s, g, 0L, wExpr, bound = 12L)
    }),
    // Current-flow (effective-resistance) group closeness: greedy over the shared
    // JLT probe solutions — no extra solves per candidate.
    "q_cf_group_closeness" -> ((s, dir) =>
      graft.algo.Electrical.currentFlowGroupCloseness(s, graph(s, dir), k = 4,
        poolMod = 500L, targetMod = 100L, probes = 6, iters = 40, seed = 42L)),
    "q_eff_resistance" -> ((s, dir) => {
      val g = graph(s, dir)
      val pairs = g.vertices.filter(col("id") % 500 === 0 && col("id") =!= 0L)
        .select(col("id").as("q"), lit(0L).as("u"), col("id").as("v"))
      graft.algo.Electrical.effectiveResistance(s, g, pairs, iters = 40)
    }),
    // LAMG-style two-level multigrid solve of the same grounded pair probes:
    // matching aggregation + Galerkin contraction + V(2,2)-cycles, all int64.
    "q_lamg" -> ((s, dir) => {
      val g = graph(s, dir)
      val scale = graft.algo.Multigrid.Scale
      val pairs = g.vertices.filter(col("id") % 500 === 0 && col("id") =!= 0L)
        .select(col("id").as("q"), lit(0L).as("u"), col("id").as("v"))
      val b = pairs.select(col("u").as("id"), col("q"), lit(1L).as("b"))
        .union(pairs.select(col("v").as("id"), col("q"), lit(-1L).as("b")))
        .groupBy("id", "q").agg(sum("b").as("b"))
      val x = graft.algo.Multigrid.solve(s, g, b, levels = 2, matchRounds = 2,
        nu1 = 2, nu2 = 2, coarseIters = 16, cycles = 3)
      val xv = x.join(pairs.select(col("q"), col("v").as("id")), Seq("q", "id"))
        .select(col("q"), (-col("x")).as("r_scaled"))
      x.groupBy("q")
        .agg(sum("x").as("chk"), sum(abs(col("x"))).as("chk_abs"))
        .join(xv, Seq("q"))
        .select(col("q"), col("r_scaled"),
          (col("r_scaled").cast("double") / scale).as("r"),
          col("chk"), col("chk_abs"))
    }),
    "q_spanning_edge" -> ((s, dir) =>
      graft.algo.Electrical.spanningEdgeCentrality(s, graph(s, dir), k = 6,
        iters = 40, seed = 42L)),
    // ERD2 — the fork's own effective-resistance-distance matrix with the degree-1
    // coarsening level, over the id % 997 subset (11 nodes, 55 pairs).
    "q_erd_matrix" -> ((s, dir) => {
      val g = graph(s, dir)
      graft.algo.Electrical.erdMatrix(s, g,
        g.vertices.filter(col("id") % 997 === 0), iters = 40)
    }),
    "q_electrical_closeness" -> ((s, dir) =>
      graft.algo.Electrical.electricalCloseness(s, graph(s, dir), k = 6,
        iters = 40, seed = 42L)),
    "q_sfigality" -> ((s, dir) => Centralities.sfigality(s, graph(s, dir))),
    "q_algebraic_dist" -> ((s, dir) =>
      graft.algo.AlgebraicDistance.edgeScores(s, graph(s, dir), iters = 5)),
    "q_group_degree" -> ((s, dir) =>
      graft.algo.GroupCentrality.groupDegree(s, graph(s, dir), k = 5)),
    "q_permanence" -> ((s, dir) => {
      val g = graph(s, dir)
      graft.algo.Permanence.run(s, g, LabelPropagation.fixedRounds(s, g, 10))
    }),
    // Selective community detection: PageRankNibble sweep table (fixed 12 batched
    // push rounds so the DuckDB twin can unroll them; all columns exact integers).
    "q_pr_nibble" -> ((s, dir) => {
      val g = graph(s, dir)
      graft.algo.Scd.sweep(s, g,
        graft.algo.Scd.approximatePageRank(s, g, seed = 0L,
          maxRounds = 12, fixedRounds = true))
    }),
    // --- link-prediction evaluation (LinkPredEval) ---
    "q_katz" -> ((s, dir) =>
      graft.algo.LinkPredEval.katzScores(s, graph(s, dir), uMod = 50L,
        maxPathLength = 3, betaDen = 200L)),
    "q_linkpred_eval" -> ((s, dir) =>
      graft.algo.LinkPredEval.run(s, graph(s, dir), trainRatio = 0.9,
        uMod = 50L, numThresholds = 20, seed = 42L)),
    // --- LinkPredictor index tail (LinkPredIndices) ---
    "q_linkpred_indices" -> ((s, dir) => {
      val g = graph(s, dir)
      graft.algo.LinkPredIndices.indices(s, g,
        LabelPropagation.fixedRounds(s, g, 5), uMod = 50L)
    }),
    "q_missing_links" -> ((s, dir) =>
      graft.algo.LinkPredIndices.missingLinks(s, graph(s, dir), k = 3, uMod = 100L)),
    "q_link_threshold" -> ((s, dir) =>
      graft.algo.LinkPredIndices.byCount(
        graft.algo.LinkPrediction.scores(s, graph(s, dir), uMod = 50L),
        "jaccard", 200L)),
    "q_algebraic_index" -> ((s, dir) =>
      graft.algo.AlgebraicDistance.pairScores(s, graph(s, dir), iters = 5,
        seed = 42L, uMod = 50L)),
    // --- partition-evaluation family (PartitionEval; per-community quality rows) ---
    "q_hub_dominance" -> ((s, dir) => {
      val g = graph(s, dir)
      graft.algo.PartitionEval.hubDominance(s, g, LabelPropagation.fixedRounds(s, g, 10))
    }),
    "q_intra_density" -> ((s, dir) => {
      val g = graph(s, dir)
      graft.algo.PartitionEval.intrapartitionDensity(s, g, LabelPropagation.fixedRounds(s, g, 10))
    }),
    "q_isolated_cut" -> ((s, dir) => {
      val g = graph(s, dir)
      graft.algo.PartitionEval.isolatedInterpartition(s, g, LabelPropagation.fixedRounds(s, g, 10))
    }),
    "q_fragmentation" -> ((s, dir) => {
      val g = graph(s, dir)
      graft.algo.PartitionEval.fragmentation(s, g, LabelPropagation.fixedRounds(s, g, 10),
        ConnectedComponents.run(s, g).labels)
    }),
    "q_stable_nodes" -> ((s, dir) => {
      val g = graph(s, dir)
      graft.algo.PartitionEval.stablePartitionNodes(s, g, LabelPropagation.fixedRounds(s, g, 10))
    }),
    "q_clustering_props" -> ((s, dir) => {
      val g = graph(s, dir)
      Measures.clusteringProperties(s, g, LabelPropagation.fixedRounds(s, g, 10))
    }),
    "q_local_degree" -> ((s, dir) => EdgeScores.localDegreeScore(s, graph(s, dir))),
    "q_neighborhood_fn" -> ((s, dir) =>
      graft.algo.Anf.neighborhoodFunction(s, graph(s, dir), maxHops = 10)),
    "q_eff_diameter" -> ((s, dir) => {
      val hops = graft.algo.Anf.finishHops(s, graph(s, dir), maxHops = 15)
      hops.agg(count(lit(1)).as("n"), sum("hop").as("sum_hops"))
        .select(col("n"), col("sum_hops"),
          (col("sum_hops").cast("double") / col("n")).as("eff_diameter"))
    }),
    "q_sssp_weighted" -> ((s, dir) =>
      Distances.weightedSssp(s, graph(s, dir), 0L,
        lit(1L) + pmod(col("src") + col("dst"), lit(5L)))),
    "q_subgraph"      -> ((s, dir) => {
      val g = graph(s, dir)
      g.subgraphFromNodes(g.vertices.filter(col("id") % 7 === 0))
        .edges.select("src", "dst")
    }),
    // Exact top-k closeness with UB pruning, on the %7 subgraph (the oracle's
    // all-source BFS stays tractable there; the operator itself scales to the full
    // graph — the UB phase is one join pipeline and each batch is one msBFS).
    "q_top_closeness" -> ((s, dir) => {
      val g = graph(s, dir)
      TopCloseness.run(s,
        g.subgraphFromNodes(g.vertices.filter(col("id") % 7 === 0)), k = 25)
    }),
    // Strongly connected components of the DIRECTED graph (distributed trim +
    // forward-backward coloring; min-node-id labels). Oracle = recursive reachability
    // closure, tractable on the %5 induced subgraph; the operator itself runs on the
    // full graph (SccSpec + the bench kernel).
    "q_scc" -> ((s, dir) => {
      val g = graph(s, dir)
      graft.algo.Scc.run(s,
        g.subgraphFromNodes(g.vertices.filter(col("id") % 5 === 0))).labels
    }),
    // Edmonds-Karp max flow + minimal min-cut source side on the id<18 fixture
    // subgraph with caps 1+(u+v)%5; oracle = brute-force min-cut subset enumeration
    // (flow value and the minimal source side are flow-decomposition-independent).
    "q_maxflow" -> ((s, dir) => {
      val g = graph(s, dir)
      val r = graft.algo.Flow.maxFlow(s, flowFixture(g, 18L), 1L, 2L)
      g.vertices.filter(col("id") < 18)
        .join(r.sourceSet.select(col("id"), lit(1L).as("one")), Seq("id"), "left")
        .select(col("id"), coalesce(col("one"), lit(0L)).as("in_src"),
          lit(r.value).as("flow"))
    }),
    // Flake-Tarjan cut clustering (alpha=1) on the same fixture: one BATCHED
    // Edmonds-Karp over all sources against the augmented sink, then the maximal
    // minimal-source-sides with the reference's degree-desc/id-asc creator labels.
    "q_cutclustering" -> ((s, dir) => {
      val g = graph(s, dir)
      graft.algo.Flow.cutClustering(s, flowFixture(g, 18L), alpha = 1L)
    }),
    // PivotMDS centering stage on the %7 subgraph — pivot choice + batched pivot BFS
    // + double centering, integer-exact (scaled by n·k) so the oracle replays it.
    "q_pivot_mds_center" -> ((s, dir) => {
      val g = graph(s, dir)
      graft.viz.GraphViz.pivotMdsCentered(s,
        g.subgraphFromNodes(g.vertices.filter(col("id") % 7 === 0)), numPivots = 10)
    }),
    // Full PivotMDS layout (eigen step is float — rows-only check; VizSpec asserts
    // the geometry: monotone path embedding, determinism).
    "q_pivot_mds" -> ((s, dir) => {
      val g = graph(s, dir)
      graft.viz.GraphViz.pivotMds(s,
        g.subgraphFromNodes(g.vertices.filter(col("id") % 7 === 0)), numPivots = 10)
    }),
    // Fruchterman-Reingold spring layout, grid-binned repulsion (rows-only check;
    // VizSpec asserts clique separation + unit-square bounds).
    "q_fr_layout" -> ((s, dir) => {
      val g = graph(s, dir)
      graft.viz.GraphViz.fruchtermanReingold(s,
        g.subgraphFromNodes(g.vertices.filter(col("id") % 7 === 0)),
        maxIter = 10, gridRes = 6)
    }),
    // Exact diameter via iFub on the %7 subgraph (oracle = all-source unrolled BFS,
    // diameter of the component containing node 0); replaces estimate-only coverage.
    "q_diameter_exact" -> ((s, dir) => {
      val g = graph(s, dir)
      Distances.diameterExact(s,
        g.subgraphFromNodes(g.vertices.filter(col("id") % 7 === 0)), 0L)
    }),
    // DFS preorder from node 0 (driver-side fixture-scale primitive, like the
    // reference's sequential DFSfrom; rows-only — a stack does not express in SQL).
    "q_dfs" -> ((s, dir) => Distances.dfsFrom(s, graph(s, dir), 0L)),
    // EXACT effective diameter (hop CDF from a batched all-source msBFS) on the
    // component of node 0 in the same id % 7 induced subgraph as q_diameter_exact;
    // the ANF sketch twin (q_eff_diameter) is the whole-graph scale path.
    "q_eff_diameter_exact" -> ((s, dir) => {
      val g = graph(s, dir)
      Distances.effectiveDiameterExact(s,
        g.subgraphFromNodes(g.vertices.filter(col("id") % 7 === 0)),
        ratio = 0.9, start = 0L)
    }),
    // Network-profile battery: one exact-integer summary row (profiling.py analog).
    "q_graph_profile" -> ((s, dir) =>
      graft.algo.Profile.run(s, graph(s, dir))),

    // --- matching / independent set / spanning forests (§2.9 family) ---
    // Local-max (Preis) matching, 15 fixed rounds (drains well before that at sf0.01;
    // spec asserts maximality on fixtures); strict (w DESC, src, dst) total order.
    "q_matching" -> ((s, dir) =>
      graft.algo.Matching.localMaxMatching(s, graph(s, dir), rounds = 15)),
    // PathGrowingMatcher pointer-forest twin: grow all heaviest-edge paths at once,
    // 2-color by depth parity, keep the heavier class per path.
    "q_path_growing" -> ((s, dir) =>
      graft.algo.Matching.pathGrowingMatching(s, graph(s, dir))),
    // GlobalCurveball degree-preserving randomization, 2 global trade rounds;
    // the oracle replays the identical pairing/ownership/pool-deal arithmetic.
    "q_curveball" -> ((s, dir) =>
      graft.algo.Curveball.globalCurveball(s, graph(s, dir), rounds = 2)),
    // Uniform-trade Curveball, checked against the exact invariant the operator
    // must preserve: the original degree sequence (CurveballSpec covers simplicity,
    // determinism, and that trades actually rewire).
    "q_curveball_uniform" -> ((s, dir) => {
      val g = graph(s, dir)
      val rnd = graft.algo.Curveball.uniformCurveball(s, g, rounds = 3,
        tradesPerRound = (g.n / 2).toInt)
      val deg = rnd.select(col("src").as("id"))
        .union(rnd.select(col("dst").as("id")))
        .groupBy("id").agg(count(lit(1)).as("c"))
      g.vertices.join(deg, Seq("id"), "left")
        .select(col("id"), coalesce(col("c"), lit(0L)).as("deg"))
    }),
    // Maximal cliques (distributed Bron-Kerbosch over per-min-member neighborhoods).
    // No SQL oracle (recursive enumeration) - rows-only check; Round13Spec replays
    // a whole-graph sequential Bron-Kerbosch and asserts set equality. The members
    // array is emitted as its canonical sorted comma-joined string so the driver's
    // pandas row-sort can hash it (an array<long> column crashes the checker); the
    // Scala API (Cliques.maximalCliques) keeps the typed array.
    "q_cliques" -> ((s, dir) =>
      graft.algo.Cliques.maximalCliques(s, graph(s, dir))
        .select(col("rep"), col("k"), concat_ws(",", col("members")).as("members"))),
    // MaxClique: rows-only gate (single row; the members list is spec-checked
    // against whole-graph sequential Bron-Kerbosch in CliquesSpec).
    "q_max_clique" -> ((s, dir) =>
      graft.algo.Cliques.maxClique(s, graph(s, dir))
        .select(col("k"), concat_ws(",", col("members")).as("members"))),
    "q_matching_coarsen" -> ((s, dir) => {
      val g = graph(s, dir)
      graft.algo.Coarsening.matchingCoarsening(s, g,
        graft.algo.Matching.localMaxMatching(s, g, 15))
    }),
    "q_project_back" -> ((s, dir) => {
      val g = graph(s, dir)
      val f2c = graft.algo.Coarsening.matchingPartition(s, g,
        graft.algo.Matching.localMaxMatching(s, g, 15))
      val coarseLabels = f2c.select(col("label").as("id")).distinct()
        .select(col("id"), pmod(col("id"), lit(10L)).as("label"))
      graft.algo.Coarsening.projectBack(f2c, coarseLabels)
    }),
    // Luby MIS, 12 fixed deterministic-LCG rounds (spec asserts independence always,
    // maximality on drained fixtures).
    "q_luby" -> ((s, dir) =>
      graft.algo.IndependentSet.lubyFixed(s, graph(s, dir), rounds = 12, seed = 42L)),
    // BFS spanning forest: per-component min-id roots, parent = min neighbor one
    // level closer; (parent, child, dist) rows.
    "q_spanning_forest" -> ((s, dir) =>
      graft.algo.Forest.spanningForest(s, graph(s, dir), maxLevels = 20)),
    // Union-of-maximum-spanning-forests membership over the capped triangle attribute
    // (6 levels, 16 fixed propagate+jump rounds per level — the DuckDB-twin schedule; the
    // production path propagates each level to convergence).
    "q_umsf" -> ((s, dir) =>
      graft.algo.Forest.umsfTriangle(s, graph(s, dir), levelCap = 6, roundsPerLevel = 16)),
    // RandomMaximumSpanningForest (Borůvka over the deterministic total edge order).
    // No SQL-expressible oracle (Kruskal is a sequential sweep) — driver records the
    // rows-only check; Round11Spec replays brute Kruskal and asserts exact equality.
    "q_msf_random" -> ((s, dir) =>
      graft.algo.Forest.randomMsf(s, graph(s, dir), seed = 42L)),

    // Parallel agglomerative clusterer: 3 fixed levels of modularity-scored
    // local-max matching + contraction (the reference's PAC with the parallel
    // matcher sibling); integer-exact scoring, unrolled DuckDB twin.
    "q_pac" -> ((s, dir) =>
      graft.algo.Agglomerative.runFixed(s, graph(s, dir), levels = 3, matchRounds = 10)),

    // Deterministic multilevel Louvain, fixed schedule (6 rounds x 2 levels) so the
    // DuckDB twin can unroll the identical recursion; integer-exact gain compares.
    // The adaptive PLM.run is the production path (PlmSpec covers it).
    "q_plm" -> ((s, dir) => PLM.runFixed(s, graph(s, dir), rounds = 6, levels = 2)),

    // --- training-data pipeline: text analysis + dedup over `documents` ---
    "q_text_stats"  -> ((s, dir) => TextOps.stats(docs(s, dir))),
    "q_repetition"  -> ((s, dir) => TextOps.repetitionStats(docs(s, dir))),
    // Gopher-rules keep/drop verdict with per-rule failure bitmask.
    "q_gopher_filter" -> ((s, dir) => TextOps.gopherFilter(docs(s, dir))),
    "q_redact_pii"  -> ((s, dir) => TextOps.redactPii(docs(s, dir),
      when(pmod(col("doc_id"), lit(10L)) === 0L,
        concat(col("text"),
          lit(" contact bob@example.com or 555-123-4567 at 10.0.0.1")))
        .otherwise(col("text")))),
    "q_contamination" -> ((s, dir) => {
      val d = docs(s, dir)
      graft.text.Dedup.contamination(d,
        d.filter(pmod(col("doc_id"), lit(101L)) === 0L)
          .select(col("doc_id").as("bench_id"), col("text")),
        n = 8, minOverlap = 1L, maxGramFreq = 100L)
    }),
    "q_langid"      -> ((s, dir) => TextOps.langId(docs(s, dir))),
    "q_fingerprint" -> ((s, dir) => TextOps.fingerprint(docs(s, dir))),
    "q_token_freq"  -> ((s, dir) => TextOps.tokenFreq(docs(s, dir))),
    // BPE-style pre-tokenizer frequency over the page urls (letter runs / digit runs /
    // single punctuation — the vocab-trainer input shape).
    "q_bpe_tokens"  -> ((s, dir) =>
      TextOps.bpeTokenFreq(graft.synth.PageTableGen.pages(s, dir), "url")),
    // URL hygiene: normalizer parity on deterministic messy variants, latest-
    // snapshot dedup, domain blocklist filter (dialect-shared SQL fragments).
    "q_url_normalize" -> ((s, dir) => {
      import graft.text.UrlOps
      docs(s, dir).select(col("doc_id"))
        .withColumn("raw_url", expr(UrlOps.messySql("doc_id", 5, duck = false)))
        .withColumn("norm_url", expr(UrlOps.normalizeSql("raw_url", duck = false)))
        .withColumn("host", expr(UrlOps.hostSql("norm_url", duck = false)))
        .withColumn("domain", expr(UrlOps.domainSql("norm_url", duck = false)))
    }),
    "q_url_dedup" -> ((s, dir) => {
      import graft.text.UrlOps
      val d = docs(s, dir)
      val captures = d.select(
          expr(graft.synth.GraphSpec.urlSql("doc_id")).as("url"),
          (col("doc_id") * 2).as("ts"))
        .union(d.select(
          expr(UrlOps.messySql("doc_id", 4, duck = false)).as("url"),
          (col("doc_id") * 2 + 1).as("ts")))
      UrlOps.urlDedupLatest(captures)
    }),
    "q_domain_filter" -> ((s, dir) => {
      import graft.text.UrlOps
      import s.implicits._
      val pages = docs(s, dir).select(col("doc_id"),
        expr(UrlOps.multiDomainSql("doc_id", duck = false)).as("url"))
      val blocked = Seq("blocked.test", "ads-site.com").toDF("domain")
      UrlOps.domainFilter(pages, blocked).select(col("doc_id"), col("domain"))
    }),
    "q_dedup_exact" -> ((s, dir) => TextOps.dedupExact(docs(s, dir))),
    // CCNet-style span-level dedup: 8-token chunks, keep-first corpus-wide.
    "q_span_dedup" -> ((s, dir) => Dedup.spanDedup(docs(s, dir), span = 8)),
    // Bloom-prefiltered blocklist membership: broadcast (word,bits) filter +
    // exact verification of the candidate superset.
    "q_bloom_filter" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"), TextOps.mdint(col("text")).as("key"))
      val block = d.filter(col("doc_id") % 37 === 0).select(col("key"))
      val words = graft.text.Bloom.build(block, "key", mBits = 4096L, k = 3)
      val cand = graft.text.Bloom
        .candidates(d, "key", "doc_id", words, mBits = 4096L, k = 3)
      val actual = d
        .join(block.distinct().withColumnRenamed("key", "bkey"),
          col("key") === col("bkey"), "left")
        .select(col("doc_id"),
          when(col("bkey").isNotNull, 1L).otherwise(0L).as("in_blocklist"))
      cand.select(col("doc_id"), col("candidate")).join(actual, Seq("doc_id"))
    }),

    // --- near-duplicate detection (shingle Jaccard / MinHash-LSH / SimHash) ---
    "q_neardup_jaccard" -> ((s, dir) => Dedup.ngramJaccardPairs(docs(s, dir), 0.5)),
    "q_neardup_minhash" -> ((s, dir) => Dedup.minhashNearDups(docs(s, dir), 0.5)),
    "q_dedup_clusters"  -> ((s, dir) => Dedup.nearDupClusters(s, docs(s, dir), 0.5)),
    // maxHamming=3 = the chunk-banding exact-recall bound (pigeonhole over 4 chunks).
    "q_neardup_simhash" -> ((s, dir) => Dedup.simhashNearDups(docs(s, dir), 3)),

    // --- multimodal binary-column plumbing over the page table ---
    "q_media_meta" -> ((s, dir) =>
      graft.media.Multimodal.metadata(
        graft.media.Multimodal.mediaTable(graft.synth.PageTableGen.pages(s, dir)))),

    // --- similarity search over embeddings (brute-force + LSH scale path) ---
    "q_ann_topk"        -> ((s, dir) =>
      Embeddings.bruteTopK(s.read.parquet(s"$dir/embeddings.parquet"))),
    "q_emb_neardup_lsh" -> ((s, dir) =>
      Embeddings.lshNearDups(s.read.parquet(s"$dir/embeddings.parquet"), 0.35)),
    // SemDeDup-style semantic dedup: LSH pair graph -> min-id clusters -> keep reps.
    "q_semantic_dedup" -> ((s, dir) =>
      graft.text.Corpus.semanticDedup(s, s.read.parquet(s"$dir/embeddings.parquet"), 0.35)),
    // Per-domain quota and exact-quota stratified sampling over the documents table.
    "q_source_cap" -> ((s, dir) => graft.text.Corpus.sourceCap(docs(s, dir), k = 20)),
    // GPT-style concat-then-chunk sample packing over the distributed prefix sum.
    "q_pack_sequences" -> ((s, dir) =>
      graft.text.Corpus.packSequences(docs(s, dir), budget = 512L)),
    "q_stratified_sample" -> ((s, dir) =>
      graft.text.Corpus.stratifiedSample(docs(s, dir), frac = 0.25)),
    // IVF ANN: deterministic k-means coarse quantizer (16 lists, 3 Lloyd rounds) +
    // 4-probe exact-cosine re-rank — the indexed scale path next to q_ann_topk.
    "q_emb_ivf"         -> ((s, dir) =>
      Embeddings.ivfTopK(s.read.parquet(s"$dir/embeddings.parquet"))),
  )

  def oracleSql: Map[String, String] = Map(
    "q_edges"            -> OracleSql.edges,
    "q_degrees"          -> OracleSql.degrees,
    "q_pagerank_fixed"   -> OracleSql.pagerankFixed(20),
    "q_trustrank"        -> OracleSql.trustRankFixed(100L, 20),
    "q_hits"             -> OracleSql.hitsFixed(12),
    "q_components"       -> OracleSql.components(12),
    "q_plp"              -> OracleSql.plp(10),
    "q_lp_degree_ordered" -> OracleSql.lpDegreeOrdered(3, 4),
    "q_triangles_global" -> OracleSql.trianglesGlobal,
    "q_triangles_node"   -> OracleSql.trianglesPerNode,
    "q_lcc"              -> OracleSql.lcc,
    "q_modularity"       -> OracleSql.modularity(10),
    "q_conductance"      -> OracleSql.conductance(10),
    "q_coarsen"          -> OracleSql.coarsen(10),
    "q_rand_index"       -> OracleSql.randIndex(5, 10),
    "q_adjusted_rand"    -> OracleSql.adjustedRand(5, 10),
    "q_nmi"              -> OracleSql.nmi(5, 10),
    "q_jaccard_measure"  -> OracleSql.jaccardMeasure(5, 10),
    "q_binpart_roundtrip" -> OracleSql.plp(5),
    "q_elpart_roundtrip" -> OracleSql.plp(5),
    "q_node_rand"        -> OracleSql.nodeRand(5, 10),
    "q_sampled_node_rand" -> OracleSql.sampledNodeRand(5, 10, 2000, 42L),
    "q_sampled_graph_rand" -> OracleSql.sampledGraphRand(5, 10, 2000, 42L),
    "q_hash_overlap"     -> OracleSql.hashOverlap(5, 10),
    "q_dynamic_nmi"      -> OracleSql.dynamicNmi(5, 10),
    "q_graph_rand"       -> OracleSql.graphStructuralRand(5, 10),
    "q_partition_intersection" -> OracleSql.partitionIntersection(5, 10),
    "q_cover_hub_dominance" -> OracleSql.coverHubDominance(10, 64L, 10000000L),
    "q_graph_difference" -> OracleSql.graphDifference(13L, 17L, 997L),
    "q_seir"             -> OracleSql.seir(10, 0.3, 2, 3, 0L),
    "q_approx_closeness" -> OracleSql.approxCloseness(100L, 15),
    "q_gce"              -> OracleSql.gce(0L, 15),
    "q_diameter_est"     -> OracleSql.diameterTwoSweep(15),
    "q_link_pred"        -> OracleSql.linkPrediction(50L),
    "q_anf"              -> OracleSql.anfHops(15),
    "q_edgelist_roundtrip" -> OracleSql.edges,
    "q_metis_roundtrip"  -> OracleSql.undirectedEdges,
    "q_thrill_roundtrip" -> OracleSql.undirectedEdges,
    "q_graphml_roundtrip" -> OracleSql.edges,
    "q_gexf_roundtrip"   -> OracleSql.edges,
    "q_gt_roundtrip"     -> OracleSql.undirectedEdges,
    "q_dibap_roundtrip"  -> OracleSql.undirectedEdges,
    "q_snap_roundtrip"   -> OracleSql.edges,
    "q_group_closeness"  -> OracleSql.groupCloseness(4, 16, 15),
    "q_gen_er"           -> OracleSql.generatorEr(5000L, 20000L, 42L),
    "q_clustered_random" -> OracleSql.clusteredRandomMembership(3000L, 5, 42L),
    "q_gen_lfr"          -> OracleSql.lfrNodes(3000L, 4L, 60L, 40L, 300L, 1L, 4L),
    "q_erdos_gallai"     -> OracleSql.erdosGallai,
    "q_dyn_path"         -> OracleSql.dynPath(50L),
    "q_dyn_dm"           -> OracleSql.dynDm(2000L, 42L),
    "q_dyn_pubweb"       -> OracleSql.dynPubWeb(800L, 3, 10, 8, 64),
    "q_havel_hakimi"     -> OracleSql.lcgDegreeHistogram(2000L, 2L, 6L, 42L),
    "q_gen_ws"           -> OracleSql.generatorWs(3000L, 6, 0.1, 42L),
    "q_gen_rmat"         -> OracleSql.generatorRmat(12, 8, 42L),
    "q_konect_roundtrip" -> OracleSql.edges,
    "q_mm_roundtrip"     -> OracleSql.edges,
    "q_gml_roundtrip"    -> OracleSql.edges,
    "q_kcore3"           -> OracleSql.kcore(3, 20),
    "q_coreness"         -> OracleSql.coreness(16, 35),
    "q_scan_score"       -> OracleSql.scanScore,
    "q_quadrangle"       -> OracleSql.quadrangleScore,
    "q_score_normalize"  -> OracleSql.scoreNormalize,
    "q_chance_tri"       -> OracleSql.chanceCorrectedTri,
    "q_local_sim"        -> OracleSql.localSimilarity,
    "q_local_filter_log" -> OracleSql.localFilter(logarithmic = true),
    "q_local_filter_lin" -> OracleSql.localFilter(logarithmic = false),
    "q_sparsify_size"    -> OracleSql.sparsifySizeScan(0.2),
    "q_random_edge"      -> OracleSql.randomEdge(42L),
    "q_bfs_hops"         -> OracleSql.bfsHops(0L, 15),
    "q_graph_distance"   -> OracleSql.graphDistance(0L, 4242L, 15),
    "q_dyn_weak_cc"      -> OracleSql.dynWeakCC(12),
    "q_eccentricity"     -> OracleSql.eccentricity(0L, 15),
    "q_bfs_directed"     -> OracleSql.bfsDirected(0L, 40, reverse = false),
    "q_bfs_reverse"      -> OracleSql.bfsDirected(0L, 40, reverse = true),
    "q_volume"           -> OracleSql.volume(5, 100L),
    "q_hop_plot"         -> OracleSql.hopPlot(15),
    "q_laplacian"        -> OracleSql.laplacian,
    "q_local_coverage"   -> OracleSql.localPartitionCoverage(10),
    "q_adamic_adar"      -> OracleSql.adamicAdarDistance,
    "q_gen_ring"         -> OracleSql.generatorRing(4000L, 6),
    "q_gen_mocnik"       -> OracleSql.generatorMocnik(2000L, 3, 42L),
    "q_gen_mocnik_multi" -> OracleSql.generatorMocnikMulti(
      Seq(1200L, 2000L), Seq(3, 2), Seq(1.0, 0.5), 42L),
    "q_gen_dm"           -> OracleSql.generatorDm(3000L, 42L),
    "q_gen_pubweb"       -> OracleSql.generatorPubWeb(1500L, 10, 8, 64),
    "q_nf_heuristic"     -> OracleSql.nfHeuristic(10, 100L),
    "q_dyn_bfs"          -> OracleSql.dynBfs(0L, 15, 997L),
    "q_dyn_sssp"         -> OracleSql.dynSssp(0L, 40, 997L),
    "q_simple_paths"     -> OracleSql.allSimplePaths(0L, 1L, 5),
    "q_top_harmonic"     -> OracleSql.topHarmonic(7, 25, 28),
    "q_edge_jaccard"     -> OracleSql.edgeJaccard,
    "q_sparsify_tri"     -> OracleSql.sparsifyTri,
    "q_assortativity"    -> OracleSql.assortativity,
    "q_katz_fixed"       -> OracleSql.katzFixed(10),
    "q_eigen_fixed"      -> OracleSql.eigenvectorFixed(10),
    "q_betweenness_fixed" -> OracleSql.betweennessFixed(1000, 15),
    "q_dyn_betweenness"  -> OracleSql.betweennessFixedDyn(1000, 15, 997),
    "q_closeness"        -> OracleSql.closenessHarmonic(1000, 15),
    "q_dyn_harmonic"     -> OracleSql.closenessHarmonicDyn(1000, 15, 997),
    "q_apsp"             -> OracleSql.apsp(100, 15),
    "q_dyn_apsp"         -> OracleSql.apspDyn(100, 15),
    "q_dyn_bet_one_node" -> OracleSql.dynBetweennessOneNode(100, 7L, 15),
    "q_kadabra_est"      -> OracleSql.kadabraAdaptive(
      0.1, 1.6094379124341003, 2.995732273553991, 100L, 512, 42L, 15, 18),
    "q_approx_betweenness" -> OracleSql.approxBetweennessAdaptive(
      25L, 2.302585092994046, 512, 42L, 15, 18),
    "q_group_betweenness" -> OracleSql.approxGroupBetweenness(4, 64, 42L, 18),
    "q_incomplete_dijkstra" -> OracleSql.incompleteDijkstra(0L, 40, 12L),
    "q_cf_group_closeness"  -> OracleSql.cfGroupCloseness(4, 500L, 100L, 6, 40, 42L, 16384L),
    "q_eff_resistance"   -> OracleSql.effectiveResistance(500L, 40, 16384L),
    "q_lamg"             -> OracleSql.lamg(500L, 2, 2, 2, 16, 3, 16384L),
    "q_erd_matrix"       -> OracleSql.erdMatrix(997L, 40, 16384L),
    "q_spanning_edge"    -> OracleSql.spanningEdge(6, 40, 42L, 16384L),
    "q_electrical_closeness" -> OracleSql.electricalCloseness(6, 40, 42L, 16384L),
    "q_sfigality"        -> OracleSql.sfigality,
    "q_algebraic_dist"   -> OracleSql.algebraicDistance(5),
    "q_group_degree"     -> OracleSql.groupDegree(5),
    "q_permanence"       -> OracleSql.permanence(10),
    "q_pr_nibble"        -> OracleSql.prNibbleSweep(0L, 12),
    "q_katz"             -> OracleSql.katz(50L, 200L),
    "q_linkpred_eval"    -> OracleSql.linkpredEval(0.9, 50L, 20, 42L),
    "q_linkpred_indices" -> OracleSql.linkpredIndices(50L, 5),
    "q_missing_links"    -> OracleSql.missingLinks(100L, 3),
    "q_link_threshold"   -> OracleSql.linkThreshold(50L, 200L),
    "q_algebraic_index"  -> OracleSql.algebraicIndex(5, 50L),
    "q_hub_dominance"    -> OracleSql.hubDominance(10),
    "q_intra_density"    -> OracleSql.intrapartitionDensity(10),
    "q_isolated_cut"     -> OracleSql.isolatedInterpartition(10),
    "q_fragmentation"    -> OracleSql.fragmentation(10, 12),
    "q_stable_nodes"     -> OracleSql.stablePartitionNodes(10),
    "q_clustering_props" -> OracleSql.clusteringProperties(10),
    "q_local_degree"     -> OracleSql.localDegree,
    "q_neighborhood_fn"  -> OracleSql.neighborhoodFunction(10),
    "q_eff_diameter"     -> OracleSql.effectiveDiameter(15),
    "q_eff_diameter_exact" -> OracleSql.effectiveDiameterExact(7L, 0L, 35, 0.9),
    "q_sssp_weighted"    -> OracleSql.weightedSssp(0L, 40),
    "q_subgraph"         -> OracleSql.subgraph7,
    "q_top_closeness"    -> OracleSql.topCloseness(7, 25, 28),
    "q_plm"              -> OracleSql.plm(6, 2),
    "q_graph_profile"    -> OracleSql.graphProfile(12),
    "q_matching"         -> OracleSql.localMaxMatching(15),
    "q_path_growing"     -> OracleSql.pathGrowingMatching(12),
    "q_matching_coarsen" -> OracleSql.matchingCoarsen(15),
    "q_project_back"     -> OracleSql.projectBack(15),
    "q_curveball"        -> OracleSql.globalCurveball(2),
    "q_curveball_uniform" -> OracleSql.undirectedDegreesSimple,
    "q_pac"              -> OracleSql.pac(3, 10),
    "q_luby"             -> OracleSql.luby(12, 42L),
    "q_spanning_forest"  -> OracleSql.spanningForest(12, 20),
    "q_umsf"             -> OracleSql.umsfTriangle(6, 16),
    "q_scc"              -> OracleSql.scc(5),
    "q_maxflow"          -> OracleSql.maxflow(18, 1L, 2L),
    "q_pivot_mds_center" -> OracleSql.pivotMdsCenter(7, 10, 42L, 35),
    "q_cutclustering"    -> OracleSql.cutClustering(18, 1L),
    "q_diameter_exact"   -> OracleSql.diameterExact(7, 0L, 35),
    "q_simmelian"        -> OracleSql.simmelianOverlap(10),
    "q_multiscale"       -> OracleSql.multiscale,
    "q_geometric_mean"   -> OracleSql.geometricMean,
    "q_linearize"        -> OracleSql.linearizeScan,
    "q_prefix_jaccard"   -> OracleSql.prefixJaccard,
    "q_random_node_edge" -> OracleSql.randomNodeEdge(0.8, 42L),
    "q_text_stats"       -> DocOracleSql.stats,
    "q_repetition"       -> DocOracleSql.repetitionStats,
    "q_gopher_filter"    -> DocOracleSql.gopherFilter,
    "q_redact_pii"       -> DocOracleSql.redactPii,
    "q_contamination"    -> DocOracleSql.contamination(8, 101L, 1L, 100L),
    "q_langid"           -> DocOracleSql.langId,
    "q_fingerprint"      -> DocOracleSql.fingerprint,
    "q_token_freq"       -> DocOracleSql.tokenFreq,
    "q_bpe_tokens"       -> DocOracleSql.bpeUrlTokenFreq,
    "q_url_normalize"    -> DocOracleSql.urlNormalize,
    "q_semantic_dedup"   -> EmbOracleSql.semanticDedup(0.35),
    "q_source_cap"       -> DocOracleSql.sourceCap(20),
    "q_stratified_sample" -> DocOracleSql.stratifiedSample(0.25, 42L),
    "q_pack_sequences"   -> DocOracleSql.packSequences(512L),
    "q_url_dedup"        -> DocOracleSql.urlDedup,
    "q_domain_filter"    -> DocOracleSql.domainFilter,
    "q_dedup_exact"      -> DocOracleSql.dedupExact,
    "q_span_dedup"       -> DedupOracleSql.spanDedup(8),
    "q_bloom_filter"     -> DedupOracleSql.bloomPrefilter(37L, 4096L, 3),
    "q_neardup_jaccard"  -> DedupOracleSql.ngramJaccard(0.5),
    "q_neardup_minhash"  -> DedupOracleSql.minhashNearDups(0.5),
    "q_dedup_clusters"   -> DedupOracleSql.nearDupClusters(0.5),
    "q_neardup_simhash"  -> DedupOracleSql.simhashNearDups(3),
    "q_media_meta"       -> MediaOracleSql.mediaMeta(),
    "q_ann_topk"         -> EmbOracleSql.bruteTopK(),
    "q_emb_neardup_lsh"  -> EmbOracleSql.lshNearDups(0.35),
    "q_emb_ivf"          -> EmbOracleSql.ivfTopK(),
  )
}
