package graft.oracle

import graft.synth.GraphSpec

/** DuckDB-dialect oracle SQL for every graph query in SparkEntry.
  *
  * Strategy: the synthetic link graph is a pure integer-arithmetic function of the
  * documents table's doc_id range (see [[graft.synth.GraphSpec]]), so the oracle
  * re-derives the edge set arithmetically and then runs the *same recurrence* the Spark
  * engine runs — unrolled as chained CTEs since DuckDB recursive CTEs cannot aggregate.
  * Iterative numeric state is fixed-point (scaled-integer): exact and order-independent,
  * so Spark and DuckDB agree bit-for-bit regardless of partitioning or join order.
  */
object OracleSql {

  /** Shared prologue: edges(src,dst) + verts(id) + nn(n). */
  private val base = s"WITH ${GraphSpec.duckEdgeCte()}"

  val edges: String =
    s"$base SELECT src, dst FROM edges"

  val undirectedEdges: String =
    s"$base SELECT DISTINCT least(src, dst) AS src, greatest(src, dst) AS dst FROM edges"

  val degrees: String =
    s"""$base,
       |od AS MATERIALIZED (SELECT src AS id, count(*) AS c FROM edges GROUP BY src),
       |idg AS MATERIALIZED (SELECT dst AS id, count(*) AS c FROM edges GROUP BY dst)
       |SELECT v.id, CAST(coalesce(od.c, 0) AS BIGINT) AS out_deg,
       |       CAST(coalesce(idg.c, 0) AS BIGINT) AS in_deg
       |FROM verts v LEFT JOIN od ON v.id = od.id LEFT JOIN idg ON v.id = idg.id
       |""".stripMargin

  /** Degree sequence of the simple undirected view — the exact invariant a
    * degree-preserving randomization (uniform-trade Curveball) must reproduce;
    * the q_curveball_uniform oracle. */
  val undirectedDegreesSimple: String =
    s"""$base,
       |cu AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS s, greatest(src, dst) AS t
       |  FROM edges WHERE src <> dst),
       |dg2 AS MATERIALIZED (SELECT id, count(*) AS c FROM (
       |  SELECT s AS id FROM cu UNION ALL SELECT t FROM cu) GROUP BY id)
       |SELECT v.id, CAST(coalesce(dg2.c, 0) AS BIGINT) AS deg
       |FROM verts v LEFT JOIN dg2 ON v.id = dg2.id""".stripMargin

  /** Fixed-point PageRank, `iters` unrolled iterations (mirrors PageRank.fixedPoint). */
  def pagerankFixed(iters: Int, scale: Long = 1000000000000L): String = {
    val steps = (1 to iters).map { i =>
      s"""pr$i AS MATERIALIZED (SELECT v.id,
         |  CAST(85 * coalesce(m.mass, 0) // 100 + (15 * ($scale // (SELECT n FROM nn))) // 100 AS BIGINT) AS pr
         |  FROM verts v LEFT JOIN (
         |    SELECT e.dst AS id, CAST(sum(p.pr // e.d) AS BIGINT) AS mass
         |    FROM ed e JOIN pr${i - 1} p ON e.src = p.id GROUP BY e.dst) m
         |  ON v.id = m.id)""".stripMargin
    }.mkString(",\n")
    s"""$base,
       |od AS MATERIALIZED (SELECT src, count(*) AS d FROM edges GROUP BY src),
       |ed AS MATERIALIZED (SELECT edges.src, edges.dst, od.d FROM edges JOIN od USING (src)),
       |pr0 AS MATERIALIZED (SELECT id, CAST($scale // (SELECT n FROM nn) AS BIGINT) AS pr FROM verts),
       |$steps
       |SELECT id, pr FROM pr$iters""".stripMargin
  }

  /** Mirrors PageRank.hitsFixed: alternating in-/out-edge sums, L1-normalized to
    * `scale` by truncating division each half-step. */
  def hitsFixed(iters: Int, scale: Long = 1000000L): String = {
    val steps = (1 to iters).map { i =>
      s"""ar$i AS MATERIALIZED (SELECT e.dst AS id, CAST(sum(h.h) AS BIGINT) AS r
         |  FROM edges e JOIN h${i - 1} h ON e.src = h.id GROUP BY 1),
         |at$i AS MATERIALIZED (SELECT CAST(coalesce(sum(r), 0) AS BIGINT) AS t FROM ar$i),
         |a$i AS MATERIALIZED (SELECT v.id,
         |  CAST(CASE WHEN (SELECT t FROM at$i) = 0 THEN 0
         |       ELSE coalesce(ar.r, 0) * $scale // (SELECT t FROM at$i) END AS BIGINT) AS a
         |  FROM verts v LEFT JOIN ar$i ar ON v.id = ar.id),
         |hr$i AS MATERIALIZED (SELECT e.src AS id, CAST(sum(a.a) AS BIGINT) AS r
         |  FROM edges e JOIN a$i a ON e.dst = a.id GROUP BY 1),
         |ht$i AS MATERIALIZED (SELECT CAST(coalesce(sum(r), 0) AS BIGINT) AS t FROM hr$i),
         |h$i AS MATERIALIZED (SELECT v.id,
         |  CAST(CASE WHEN (SELECT t FROM ht$i) = 0 THEN 0
         |       ELSE coalesce(hr.r, 0) * $scale // (SELECT t FROM ht$i) END AS BIGINT) AS h
         |  FROM verts v LEFT JOIN hr$i hr ON v.id = hr.id)""".stripMargin
    }.mkString(",\n")
    s"""$base,
       |h0 AS MATERIALIZED (SELECT id, CAST(1 AS BIGINT) AS h FROM verts),
       |$steps
       |SELECT h.id, h.h AS hub, a.a AS auth
       |FROM h$iters h JOIN a$iters a ON h.id = a.id""".stripMargin
  }

  /** Mirrors PageRank.trustRankFixed: teleport only to seeds (id % seedMod = 0). */
  def trustRankFixed(seedMod: Long, iters: Int,
                     scale: Long = 1000000000000L): String = {
    val steps = (1 to iters).map { i =>
      s"""tr$i AS MATERIALIZED (SELECT v.id,
         |  CAST(85 * coalesce(m.mass, 0) // 100 + v.s * (SELECT t FROM tl) AS BIGINT) AS pr
         |  FROM sv v LEFT JOIN (
         |    SELECT e.dst AS id, CAST(sum(p.pr // e.d) AS BIGINT) AS mass
         |    FROM ed e JOIN tr${i - 1} p ON e.src = p.id GROUP BY e.dst) m
         |  ON v.id = m.id)""".stripMargin
    }.mkString(",\n")
    s"""$base,
       |od AS MATERIALIZED (SELECT src, count(*) AS d FROM edges GROUP BY src),
       |ed AS MATERIALIZED (SELECT edges.src, edges.dst, od.d FROM edges JOIN od USING (src)),
       |sv AS MATERIALIZED (SELECT id,
       |  CASE WHEN id % $seedMod = 0 THEN 1 ELSE 0 END AS s FROM verts),
       |sc AS MATERIALIZED (SELECT count(*) AS c FROM sv WHERE s = 1),
       |ini AS MATERIALIZED (SELECT CAST($scale // c AS BIGINT) AS v FROM sc),
       |tl AS MATERIALIZED (SELECT CAST((15 * (SELECT v FROM ini)) // 100 AS BIGINT) AS t),
       |tr0 AS MATERIALIZED (SELECT id, CAST(s * (SELECT v FROM ini) AS BIGINT) AS pr FROM sv),
       |$steps
       |SELECT id, pr FROM tr$iters""".stripMargin
  }

  private val biCte =
    "bi AS MATERIALIZED (SELECT src AS a, dst AS b FROM edges UNION SELECT dst, src FROM edges)"

  /** Min-label CC rounds l0..l{rounds} (shared by components + fragmentation). */
  private def ccSteps(rounds: Int): String = {
    val steps = (1 to rounds).map { i =>
      s"""l$i AS MATERIALIZED (SELECT l.id, least(l.label, coalesce(m.ml, l.label)) AS label
         |  FROM l${i - 1} l LEFT JOIN (
         |    SELECT bi.b AS id, min(x.label) AS ml FROM bi JOIN l${i - 1} x ON bi.a = x.id
         |    GROUP BY bi.b) m ON l.id = m.id)""".stripMargin
    }.mkString(",\n")
    s"""l0 AS MATERIALIZED (SELECT id, id AS label FROM verts),
       |$steps""".stripMargin
  }

  /** Min-label propagation to fixpoint — `rounds` must exceed the graph's label-diameter
    * (measured 5 at sf0.01; 12 gives margin). Mirrors ConnectedComponents.run. */
  def components(rounds: Int = 12): String =
    s"""$base,
       |$biCte,
       |${ccSteps(rounds)}
       |SELECT id, label FROM l$rounds""".stripMargin

  /** PLP round CTEs p0..p{rounds} (shared by plp + the measure oracles). Label
    * frequencies are WEIGHTED by the merged antiparallel multiplicity (mirrors
    * LabelPropagation's `sum(weight)` over LinkGraph.canonicalUndirected, where an
    * a→b/b→a directed pair merges to one undirected edge of weight 2). */
  private def plpSteps(rounds: Int): String = {
    val steps = (1 to rounds).map { i =>
      s"""p$i AS MATERIALIZED (SELECT v.id, coalesce(b.cand, v.label) AS label
         |  FROM p${i - 1} v LEFT JOIN (
         |    SELECT id, cand FROM (
         |      SELECT plpbi.b AS id, x.label AS cand,
         |             row_number() OVER (PARTITION BY plpbi.b ORDER BY sum(plpbi.w) DESC, x.label ASC) AS rn
         |      FROM plpbi JOIN p${i - 1} x ON plpbi.a = x.id GROUP BY plpbi.b, x.label) t
         |    WHERE rn = 1) b ON v.id = b.id)""".stripMargin
    }.mkString(",\n")
    s"""plpund AS MATERIALIZED (SELECT least(src, dst) AS s, greatest(src, dst) AS t, count(*) AS w
       |  FROM edges GROUP BY 1, 2),
       |plpbi AS MATERIALIZED (SELECT s AS a, t AS b, w FROM plpund UNION ALL SELECT t, s, w FROM plpund),
       |p0 AS MATERIALIZED (SELECT id, id AS label FROM verts),
       |$steps""".stripMargin
  }

  /** PLP, `rounds` fixed synchronous rounds, heaviest-label / smallest-id tie-break.
    * Mirrors LabelPropagation.fixedRounds. */
  def plp(rounds: Int): String =
    s"""$base,
       |$biCte,
       |${plpSteps(rounds)}
       |SELECT id, label FROM p$rounds""".stripMargin

  /** LPDegreeOrdered, fixed degree-bucketed Gauss–Seidel sweeps (mirrors
    * LabelPropagation.degreeOrderedFixed): sub-step (s,b) updates only bucket-b
    * nodes (bucket = min(buckets−1, ⌊log₂ deg⌋) via binary-string length — integer-
    * exact in both engines), reading labels including this sweep's earlier buckets. */
  def lpDegreeOrdered(sweeps: Int, buckets: Int): String = {
    val steps = (for (s <- 0 until sweeps; b <- 0 until buckets) yield {
      val t = s * buckets + b + 1
      s"""dord$t AS MATERIALIZED (SELECT v.id, coalesce(c.cand, v.label) AS label
         |  FROM dord${t - 1} v LEFT JOIN (
         |    SELECT id, cand FROM (
         |      SELECT plpbi.b AS id, x.label AS cand,
         |             row_number() OVER (PARTITION BY plpbi.b ORDER BY sum(plpbi.w) DESC, x.label ASC) AS rn
         |      FROM plpbi JOIN dord${t - 1} x ON plpbi.a = x.id
         |      WHERE plpbi.b IN (SELECT id FROM dbkt WHERE bkt = $b)
         |      GROUP BY plpbi.b, x.label) t
         |    WHERE rn = 1) c ON v.id = c.id)""".stripMargin
    }).mkString(",\n")
    s"""$base,
       |plpund AS MATERIALIZED (SELECT least(src, dst) AS s, greatest(src, dst) AS t, count(*) AS w
       |  FROM edges GROUP BY 1, 2),
       |plpbi AS MATERIALIZED (SELECT s AS a, t AS b, w FROM plpund UNION ALL SELECT t, s, w FROM plpund),
       |dbkt AS MATERIALIZED (SELECT a AS id, least($buckets - 1, length(bin(count(*))) - 1) AS bkt
       |  FROM plpbi GROUP BY a),
       |dord0 AS MATERIALIZED (SELECT id, id AS label FROM verts),
       |$steps
       |SELECT id, label FROM dord${sweeps * buckets}""".stripMargin
  }

  /** Canonical undirected edge set with merged antiparallel weight (mirrors
    * LinkGraph.canonicalUndirected: w = number of directed edges between the pair) +
    * weighted undirected degrees. */
  private val undDegCte =
    s"""und AS MATERIALIZED (SELECT least(src, dst) AS s, greatest(src, dst) AS t, count(*) AS w
       |  FROM edges GROUP BY 1, 2),
       |deg AS MATERIALIZED (SELECT id, sum(w) AS deg FROM
       |  (SELECT s AS id, w FROM und UNION ALL SELECT t, w FROM und) GROUP BY id)""".stripMargin

  /** Mirrors Measures.summary over PLP labels at `rounds` (weighted). */
  def modularity(rounds: Int): String =
    s"""$base,
       |$biCte,
       |${plpSteps(rounds)},
       |$undDegCte,
       |le AS MATERIALIZED (SELECT ls.label AS lsrc, ld.label AS ldst, und.w FROM und
       |  JOIN p$rounds ls ON und.s = ls.id JOIN p$rounds ld ON und.t = ld.id),
       |b0 AS MATERIALIZED (SELECT sum(w) AS m_und,
       |  sum(CASE WHEN lsrc = ldst THEN w ELSE 0 END) AS intra FROM le),
       |vol AS MATERIALIZED (SELECT p.label, sum(deg.deg) AS vol FROM deg JOIN p$rounds p ON deg.id = p.id GROUP BY p.label),
       |v2 AS MATERIALIZED (SELECT sum(vol*vol) AS sum_vol2 FROM vol)
       |SELECT CAST(m_und AS BIGINT) AS m_und, CAST(intra AS BIGINT) AS intra,
       |  CAST(m_und - intra AS BIGINT) AS cut, CAST(sum_vol2 AS BIGINT) AS sum_vol2,
       |  intra::double / m_und AS coverage,
       |  intra::double / m_und - sum_vol2::double / (4.0 * m_und * m_und) AS modularity
       |FROM b0 CROSS JOIN v2""".stripMargin

  /** Mirrors Measures.conductance over PLP labels at `rounds` (weighted). */
  def conductance(rounds: Int): String =
    s"""$base,
       |$biCte,
       |${plpSteps(rounds)},
       |$undDegCte,
       |biw AS MATERIALIZED (SELECT s AS a, t AS b, w FROM und UNION ALL SELECT t, s, w FROM und),
       |mu AS MATERIALIZED (SELECT sum(w) AS mu FROM und),
       |cut AS MATERIALIZED (SELECT ls.label, sum(biw.w) AS cut FROM biw
       |  JOIN p$rounds ls ON biw.a = ls.id JOIN p$rounds ld ON biw.b = ld.id
       |  WHERE ls.label != ld.label GROUP BY ls.label),
       |vol AS MATERIALIZED (SELECT p.label, sum(deg.deg) AS vol FROM deg JOIN p$rounds p ON deg.id = p.id GROUP BY p.label),
       |lbls AS MATERIALIZED (SELECT DISTINCT label FROM p$rounds)
       |SELECT l.label, CAST(coalesce(vol.vol, 0) AS BIGINT) AS vol,
       |  CAST(coalesce(cut.cut, 0) AS BIGINT) AS cut,
       |  CASE WHEN least(coalesce(vol.vol, 0), 2 * mu.mu - coalesce(vol.vol, 0)) = 0 THEN 0.0
       |       ELSE coalesce(cut.cut, 0)::double /
       |            least(coalesce(vol.vol, 0), 2 * mu.mu - coalesce(vol.vol, 0)) END AS conductance
       |FROM lbls l CROSS JOIN mu
       |LEFT JOIN vol ON l.label = vol.label LEFT JOIN cut ON l.label = cut.label""".stripMargin

  /** Mirrors Measures.coarsen over PLP labels at `rounds` (weighted). */
  def coarsen(rounds: Int): String =
    s"""$base,
       |$biCte,
       |${plpSteps(rounds)},
       |und AS MATERIALIZED (SELECT least(src, dst) AS s, greatest(src, dst) AS t, count(*) AS w
       |  FROM edges GROUP BY 1, 2)
       |SELECT least(ls.label, ld.label) AS a, greatest(ls.label, ld.label) AS b,
       |  CAST(sum(und.w) AS BIGINT) AS w
       |FROM und JOIN p$rounds ls ON und.s = ls.id JOIN p$rounds ld ON und.t = ld.id
       |GROUP BY 1, 2""".stripMargin

  /** Mirrors Measures.clusteringProperties over PLP labels at `rounds`. */
  def clusteringProperties(rounds: Int): String =
    s"""$base,
       |$biCte,
       |${plpSteps(rounds)},
       |cnts AS MATERIALIZED (SELECT id, count(*) AS c FROM p$rounds GROUP BY id),
       |pn AS MATERIALIZED (SELECT count(*) AS n_nodes,
       |  sum(CASE WHEN coalesce(c, 0) = 1 THEN 1 ELSE 0 END) AS n_labeled
       |  FROM verts v LEFT JOIN cnts ON v.id = cnts.id),
       |sz AS MATERIALIZED (SELECT count(*) AS n_clusters, max(s) AS max_cluster,
       |  min(s) AS min_cluster FROM (SELECT label, count(*) AS s FROM p$rounds GROUP BY label))
       |SELECT CAST(n_nodes AS BIGINT) AS n_nodes, CAST(n_labeled AS BIGINT) AS n_labeled,
       |  CAST(n_clusters AS BIGINT) AS n_clusters, CAST(max_cluster AS BIGINT) AS max_cluster,
       |  CAST(min_cluster AS BIGINT) AS min_cluster,
       |  n_labeled = n_nodes AS is_proper,
       |  n_clusters = n_nodes AS is_singleton,
       |  n_clusters = 1 AS is_one
       |FROM pn CROSS JOIN sz""".stripMargin

  /** Mirrors Measures.randIndex between PLP at `ra` and `rb` rounds (ra < rb). */
  def randIndex(ra: Int, rb: Int): String =
    s"""$base,
       |$biCte,
       |${plpSteps(rb)},
       |cont AS MATERIALIZED (SELECT x.label AS la, y.label AS lb, count(*) AS nij
       |  FROM p$ra x JOIN p$rb y ON x.id = y.id GROUP BY 1, 2),
       |sb AS MATERIALIZED (SELECT sum(nij*(nij-1)//2) AS s_both FROM cont),
       |sa AS MATERIALIZED (SELECT sum(ai*(ai-1)//2) AS s_a FROM (SELECT sum(nij) AS ai FROM cont GROUP BY la)),
       |sc AS MATERIALIZED (SELECT sum(bj*(bj-1)//2) AS s_b FROM (SELECT sum(nij) AS bj FROM cont GROUP BY lb)),
       |nn2 AS MATERIALIZED (SELECT count(*) AS n FROM verts)
       |SELECT CAST(n AS BIGINT) AS n, CAST(s_both AS BIGINT) AS s_both,
       |  CAST(s_a AS BIGINT) AS s_a, CAST(s_b AS BIGINT) AS s_b,
       |  (n*(n-1)//2 + 2*s_both - s_a - s_b)::double / (n*(n-1)//2) AS rand
       |FROM nn2 CROSS JOIN sb CROSS JOIN sa CROSS JOIN sc""".stripMargin

  /** Mirrors Measures.adjustedRand between PLP at `ra` and `rb` rounds: same pair
    * counts as randIndex + the chance-corrected index as one fixed expression tree. */
  def adjustedRand(ra: Int, rb: Int): String =
    s"""$base,
       |$biCte,
       |${plpSteps(rb)},
       |cont AS MATERIALIZED (SELECT x.label AS la, y.label AS lb, count(*) AS nij
       |  FROM p$ra x JOIN p$rb y ON x.id = y.id GROUP BY 1, 2),
       |sb AS MATERIALIZED (SELECT sum(nij*(nij-1)//2) AS s_both FROM cont),
       |sa AS MATERIALIZED (SELECT sum(ai*(ai-1)//2) AS s_a FROM (SELECT sum(nij) AS ai FROM cont GROUP BY la)),
       |sc AS MATERIALIZED (SELECT sum(bj*(bj-1)//2) AS s_b FROM (SELECT sum(nij) AS bj FROM cont GROUP BY lb)),
       |nn2 AS MATERIALIZED (SELECT count(*) AS n FROM verts)
       |SELECT CAST(n AS BIGINT) AS n, CAST(s_both AS BIGINT) AS s_both,
       |  CAST(s_a AS BIGINT) AS s_a, CAST(s_b AS BIGINT) AS s_b,
       |  (CAST(s_both AS DOUBLE) - CAST(s_a*s_b AS DOUBLE) / CAST(n*(n-1)//2 AS DOUBLE)) /
       |  (CAST(s_a+s_b AS DOUBLE) / 2.0 - CAST(s_a*s_b AS DOUBLE) / CAST(n*(n-1)//2 AS DOUBLE)) AS ari
       |FROM nn2 CROSS JOIN sb CROSS JOIN sa CROSS JOIN sc""".stripMargin

  /** Mirrors Measures.nmi between PLP at `ra` and `rb` rounds; the log sums are rounded
    * to 7 decimals on both engines (the only non-exact aggregation in the oracle
    * surface — reassociation noise ~1e-15). */
  def nmi(ra: Int, rb: Int): String =
    s"""$base,
       |$biCte,
       |${plpSteps(rb)},
       |cont AS MATERIALIZED (SELECT x.label AS la, y.label AS lb, count(*) AS nij
       |  FROM p$ra x JOIN p$rb y ON x.id = y.id GROUP BY 1, 2),
       |nn2 AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM verts),
       |ai AS MATERIALIZED (SELECT la, sum(nij) AS ai FROM cont GROUP BY la),
       |bj AS MATERIALIZED (SELECT lb, sum(nij) AS bj FROM cont GROUP BY lb),
       |mi AS MATERIALIZED (SELECT sum(nij / n * log2(nij * n / (ai * bj))) AS mi
       |  FROM cont JOIN ai USING (la) JOIN bj USING (lb) CROSS JOIN nn2),
       |ha AS MATERIALIZED (SELECT -sum(ai / n * log2(ai / n)) AS h_a FROM ai CROSS JOIN nn2),
       |hb AS MATERIALIZED (SELECT -sum(bj / n * log2(bj / n)) AS h_b FROM bj CROSS JOIN nn2)
       |SELECT CAST(n AS BIGINT) AS n, round(mi, 7) AS mi,
       |  round(h_a, 7) AS h_a, round(h_b, 7) AS h_b,
       |  round(CASE WHEN h_a + h_b = 0 THEN 0.0 ELSE 2.0 * mi / (h_a + h_b) END, 7) AS nmi
       |FROM nn2 CROSS JOIN mi CROSS JOIN ha CROSS JOIN hb""".stripMargin

  /** Node-structural Rand dissimilarity (mirrors Measures.nodeStructuralRand). */
  def nodeRand(ra: Int, rb: Int): String =
    s"""SELECT n, s_both, s_a, s_b,
       |  1.0 - CAST(2 * (n*(n-1)//2 + 2*s_both - s_a - s_b) AS DOUBLE)
       |      / CAST(n*(n-1) AS DOUBLE) AS rand_dissim
       |FROM (${randIndex(ra, rb)}) t""".stripMargin

  /** Shared LCG pair-draw mix (mirrors Measures.sampleDraw). */
  private def sampleDrawSql(x: String): String = {
    import graft.synth.GraphSpec.{lcg, M}
    s"(((${lcg(x)} * ${lcg(s"($x) + 1000003")}) // 65536) % $M)"
  }

  private def pairAgreementSql(ra: Int, rb: Int, name: String): String =
    s"""ag AS MATERIALIZED (
       |  SELECT count(*) AS samples,
       |    sum(CASE WHEN au.label = av.label AND bu.label = bv.label THEN 1 ELSE 0 END) AS n11,
       |    sum(CASE WHEN au.label <> av.label AND bu.label <> bv.label THEN 1 ELSE 0 END) AS n00
       |  FROM pairs
       |  JOIN p$ra au ON pairs.u = au.id JOIN p$ra av ON pairs.v = av.id
       |  JOIN p$rb bu ON pairs.u = bu.id JOIN p$rb bv ON pairs.v = bv.id)
       |SELECT CAST(samples AS BIGINT) AS samples, CAST(n11 AS BIGINT) AS n11,
       |  CAST(n00 AS BIGINT) AS n00,
       |  1.0 - CAST(n11 + n00 AS DOUBLE) / samples AS $name
       |FROM ag""".stripMargin

  /** Mirrors Measures.sampledNodeStructuralRand over PLP at ra/rb rounds. */
  def sampledNodeRand(ra: Int, rb: Int, samples: Int, seed: Long): String =
    s"""$base,
       |$biCte,
       |${plpSteps(rb)},
       |nn2 AS MATERIALIZED (SELECT count(*) AS n FROM verts),
       |pairs AS MATERIALIZED (
       |  SELECT u, v FROM (
       |    SELECT ${sampleDrawSql(s"2*k + $seed*1000003")} % nn2.n AS u,
       |           ${sampleDrawSql(s"2*k + 1 + $seed*1000003")} % nn2.n AS v
       |    FROM range($samples) r(k) CROSS JOIN nn2)
       |  WHERE u <> v),
       |${pairAgreementSql(ra, rb, "rand_node_sampled")}""".stripMargin

  /** Mirrors Measures.sampledGraphStructuralRand over PLP at ra/rb rounds. */
  def sampledGraphRand(ra: Int, rb: Int, samples: Int, seed: Long): String =
    s"""$base,
       |$biCte,
       |${plpSteps(rb)},
       |nn2 AS MATERIALIZED (SELECT count(*) AS n FROM verts),
       |sgdeg AS MATERIALIZED (SELECT a AS u, count(*) AS deg FROM bi GROUP BY a),
       |sgadj AS MATERIALIZED (SELECT a AS u, b AS w,
       |    row_number() OVER (PARTITION BY a ORDER BY b) - 1 AS i FROM bi),
       |draws AS MATERIALIZED (
       |  SELECT ${sampleDrawSql(s"2*k + $seed*999983")} % nn2.n AS u,
       |         ${sampleDrawSql(s"2*k + 1 + $seed*999983")} AS r
       |  FROM range($samples) r(k) CROSS JOIN nn2),
       |pairs AS MATERIALIZED (
       |  SELECT d.u, sgadj.w AS v
       |  FROM draws d JOIN sgdeg ON d.u = sgdeg.u
       |  JOIN sgadj ON d.u = sgadj.u AND (d.r % sgdeg.deg) = sgadj.i),
       |${pairAgreementSql(ra, rb, "rand_graph_sampled")}""".stripMargin

  /** HashingOverlapper over PLP at ra/rb rounds (mirrors Overlap.hashingOverlapper,
    * two-partition djb2 key, ascending-dense-rank compact). */
  def hashOverlap(ra: Int, rb: Int): String = {
    val h = graft.algo.Overlap.pairHashSql("x.label", "y.label", duck = true)
    s"""$base,
       |$biCte,
       |${plpSteps(rb)},
       |raw AS MATERIALIZED (SELECT x.id, $h AS h
       |  FROM p$ra x JOIN p$rb y ON x.id = y.id),
       |dict AS MATERIALIZED (SELECT h, rank - 1 AS label FROM (
       |  SELECT h, row_number() OVER (ORDER BY h) AS rank FROM (SELECT DISTINCT h FROM raw)))
       |SELECT raw.id, CAST(dict.label AS BIGINT) AS label
       |FROM raw JOIN dict USING (h)""".stripMargin
  }

  /** DynamicNMIDistance = the nmi columns + NMID = 1 − NMI (mirrors
    * Measures.dynamicNmiDistance). */
  def dynamicNmi(ra: Int, rb: Int): String =
    s"""SELECT n, mi, h_a, h_b, nmi,
       |  CASE WHEN h_a + h_b = 0 THEN 0.0 ELSE round(1.0 - nmi, 7) END AS nmid
       |FROM (${nmi(ra, rb)}) t""".stripMargin

  /** Double-sweep diameter bounds (mirrors Distances.diameterTwoSweep): BFS from 0,
    * farthest node u (smallest id on ties), BFS from u; lb = ecc(u), ub = 2*lb. */
  def diameterTwoSweep(rounds: Int): String = {
    val inf = 999999L
    def sweep(prefix: String, sourceExpr: String): String = {
      val steps = (1 to rounds).map { i =>
        s"""$prefix$i AS MATERIALIZED (SELECT d.id, least(d.dist, coalesce(m.md, d.dist)) AS dist
           |  FROM $prefix${i - 1} d LEFT JOIN (
           |    SELECT bi.b AS id, min(x.dist) + 1 AS md FROM bi JOIN $prefix${i - 1} x ON bi.a = x.id
           |    GROUP BY bi.b) m ON d.id = m.id)""".stripMargin
      }.mkString(",\n")
      s"""${prefix}0 AS MATERIALIZED (SELECT id, CASE WHEN id = ($sourceExpr) THEN 0 ELSE $inf END AS dist FROM verts),
         |$steps""".stripMargin
    }
    s"""$base,
       |$biCte,
       |${sweep("da", "0")},
       |uu AS MATERIALIZED (SELECT min(id) AS u FROM da$rounds
       |  WHERE dist < $inf AND dist = (SELECT max(dist) FROM da$rounds WHERE dist < $inf)),
       |${sweep("db", "SELECT u FROM uu")}
       |SELECT CAST(max(dist) AS BIGINT) AS lb, CAST(2 * max(dist) AS BIGINT) AS ub
       |FROM db$rounds WHERE dist < $inf""".stripMargin
  }

  /** Mirrors LinkPrediction.scores with u-sample `uMod`: distance-2 non-adjacent pairs
    * with common-neighbor / preferential-attachment / Jaccard / Adamic-Adar indices. */
  def linkPrediction(uMod: Long): String =
    s"""$base,
       |$biCte,
       |deg AS MATERIALIZED (SELECT a AS id, count(*) AS deg FROM bi GROUP BY a),
       |und AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS s, greatest(src, dst) AS t FROM edges),
       |wu AS MATERIALIZED (SELECT a AS z, b AS u FROM bi WHERE b % $uMod = 0),
       |pairs AS MATERIALIZED (
       |  SELECT wu.u, wv.b AS v, count(*) AS cn, sum(1.0 / ln(dg.deg)) AS aa
       |  FROM wu JOIN bi wv ON wu.z = wv.a JOIN deg dg ON wu.z = dg.id
       |  WHERE wu.u < wv.b GROUP BY 1, 2),
       |cand AS MATERIALIZED (
       |  SELECT p.* FROM pairs p LEFT JOIN und e ON e.s = p.u AND e.t = p.v
       |  WHERE e.s IS NULL)
       |SELECT c.u, c.v, CAST(c.cn AS BIGINT) AS cn,
       |  CAST(du.deg * dv.deg AS BIGINT) AS pa,
       |  CAST(c.cn AS DOUBLE) / (du.deg + dv.deg - c.cn) AS jaccard,
       |  round(c.aa, 7) AS adamic_adar
       |FROM cand c JOIN deg du ON c.u = du.id JOIN deg dv ON c.v = dv.id""".stripMargin

  /** k-core membership: `rounds` unrolled peel rounds at threshold k (>= fixpoint depth).
    * Mirrors KCore.kCore. */
  def kcore(k: Int, rounds: Int): String = {
    val steps = (1 to rounds).map { i =>
      s"""a$i AS MATERIALIZED (SELECT bi.a AS id FROM bi
         |  JOIN a${i - 1} x ON bi.a = x.id JOIN a${i - 1} y ON bi.b = y.id
         |  GROUP BY bi.a HAVING count(*) >= $k)""".stripMargin
    }.mkString(",\n")
    s"""$base,
       |$biCte,
       |a0 AS MATERIALIZED (SELECT id FROM verts),
       |$steps
       |SELECT id FROM a$rounds""".stripMargin
  }

  /** BFS hop distances from `source` via `rounds` unrolled min-plus steps (-1 =
    * unreachable). Mirrors Distances.bfsHops at fixpoint. */
  def bfsHops(source: Long, rounds: Int): String = {
    val inf = 999999L
    val steps = (1 to rounds).map { i =>
      s"""d$i AS MATERIALIZED (SELECT d.id, least(d.dist, coalesce(m.md, d.dist)) AS dist
         |  FROM d${i - 1} d LEFT JOIN (
         |    SELECT bi.b AS id, min(x.dist) + 1 AS md FROM bi JOIN d${i - 1} x ON bi.a = x.id
         |    GROUP BY bi.b) m ON d.id = m.id)""".stripMargin
    }.mkString(",\n")
    s"""$base,
       |$biCte,
       |d0 AS MATERIALIZED (SELECT id, CASE WHEN id = $source THEN 0 ELSE $inf END AS dist FROM verts),
       |$steps
       |SELECT id, CAST(CASE WHEN dist >= $inf THEN -1 ELSE dist END AS BIGINT) AS dist FROM d$rounds""".stripMargin
  }

  /** GraphDistance (distance/GraphDistance.cpp:12-28): single-pair distance. */
  def graphDistance(u: Long, v: Long, rounds: Int): String =
    s"""SELECT CAST($u AS BIGINT) AS u, CAST(id AS BIGINT) AS v, dist
       |FROM (${bfsHops(u, rounds)}) WHERE id = $v""".stripMargin

  /** DynWeaklyConnectedComponents twin: COLD min-label weak components of the
    * MUTATED directed graph — all edges incident to node 0 removed, (3, max-id)
    * added — which the warm remove+insert repair must match exactly. */
  def dynWeakCC(rounds: Int): String =
    s"""$base,
       |adde AS MATERIALIZED (SELECT CAST(3 AS BIGINT) AS a, max(id) AS b FROM verts),
       |bi AS MATERIALIZED (
       |  SELECT src AS a, dst AS b FROM edges WHERE src <> 0 AND dst <> 0
       |  UNION SELECT dst, src FROM edges WHERE src <> 0 AND dst <> 0
       |  UNION SELECT a, b FROM adde UNION SELECT b, a FROM adde),
       |${ccSteps(rounds)}
       |SELECT id, label FROM l$rounds""".stripMargin

  /** Eccentricity + reached count of `source` (on the BFS fixpoint). */
  def eccentricity(source: Long, rounds: Int): String =
    s"""SELECT max(dist) AS ecc,
       |  CAST(sum(CASE WHEN dist >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS reached
       |FROM (${bfsHops(source, rounds)})""".stripMargin

  /** Triangle count + neighborhood Jaccard per undirected edge. Mirrors
    * EdgeScores.jaccardEdgeScore. */
  def edgeJaccard: String =
    s"""$base,
       |$triCte,
       |pe AS MATERIALIZED (SELECT x, y, count(*) AS tri FROM (
       |    SELECT a AS x, b AS y FROM tri
       |    UNION ALL SELECT b, c FROM tri
       |    UNION ALL SELECT a, c FROM tri) GROUP BY x, y),
       |ej AS MATERIALIZED (
       |  SELECT least(ra.id, rb.id) AS src, greatest(ra.id, rb.id) AS dst,
       |    CAST(coalesce(pe.tri, 0) AS BIGINT) AS tri
       |  FROM o LEFT JOIN pe ON o.a = pe.x AND o.b = pe.y
       |  JOIN rk ra ON o.a = ra.r JOIN rk rb ON o.b = rb.r)
       |SELECT ej.src, ej.dst, ej.tri,
       |  ej.tri::double / (ds.d + dd.d - ej.tri) AS jaccard
       |FROM ej JOIN dg ds ON ej.src = ds.id JOIN dg dd ON ej.dst = dd.id""".stripMargin

  /** Sparsifier: undirected edges in >= 1 triangle. */
  def sparsifyTri: String =
    s"""$base,
       |$triCte,
       |pe AS MATERIALIZED (SELECT x, y, count(*) AS tri FROM (
       |    SELECT a AS x, b AS y FROM tri
       |    UNION ALL SELECT b, c FROM tri
       |    UNION ALL SELECT a, c FROM tri) GROUP BY x, y)
       |SELECT least(ra.id, rb.id) AS src, greatest(ra.id, rb.id) AS dst
       |FROM pe JOIN rk ra ON pe.x = ra.r JOIN rk rb ON pe.y = rb.r""".stripMargin

  /** Shared per-edge triangle CTE stack: ej(src,dst,tri) per canonical undirected
    * edge + dg(id,d) degrees (from [[triCte]]). Lazy: triCte is declared further down
    * the file and object vals initialize in declaration order. */
  private lazy val ejCte =
    s"""$triCte,
       |pe AS MATERIALIZED (SELECT x, y, count(*) AS tri FROM (
       |    SELECT a AS x, b AS y FROM tri
       |    UNION ALL SELECT b, c FROM tri
       |    UNION ALL SELECT a, c FROM tri) GROUP BY x, y),
       |ej AS MATERIALIZED (
       |  SELECT least(ra.id, rb.id) AS src, greatest(ra.id, rb.id) AS dst,
       |    CAST(coalesce(pe.tri, 0) AS BIGINT) AS tri
       |  FROM o LEFT JOIN pe ON o.a = pe.x AND o.b = pe.y
       |  JOIN rk ra ON o.a = ra.r JOIN rk rb ON o.b = rb.r)""".stripMargin

  /** ChibaNishizekiQuadrangleEdgeScore (mirrors EdgeScores.quadrangleEdgeScore):
    * quad(u,v) = walks₃(u,v) − deg(u) − deg(v) + 1 per canonical undirected edge. */
  def quadrangleScore: String =
    s"""$base,
       |$biCte,
       |qdeg AS MATERIALIZED (SELECT a AS id, count(*) AS deg FROM bi GROUP BY a),
       |qw2 AS MATERIALIZED (SELECT w1.b AS a, w2.b AS b, count(*) AS w2
       |  FROM bi w1 JOIN bi w2 ON w1.a = w2.a GROUP BY 1, 2),
       |qund AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS s, greatest(src, dst) AS t FROM edges),
       |qw3 AS MATERIALIZED (SELECT q.a AS u, bi.b AS v, sum(q.w2) AS w3
       |  FROM qw2 q JOIN bi ON q.b = bi.a
       |  JOIN qund e ON e.s = q.a AND e.t = bi.b
       |  WHERE q.a < bi.b GROUP BY 1, 2)
       |SELECT e.s AS src, e.t AS dst,
       |  CAST(coalesce(w3.w3, 0) - du.deg - dv.deg + 1 AS BIGINT) AS quad
       |FROM qund e LEFT JOIN qw3 w3 ON e.s = w3.u AND e.t = w3.v
       |JOIN qdeg du ON e.s = du.id JOIN qdeg dv ON e.t = dv.id""".stripMargin

  /** EdgeScoreNormalizer over the per-edge triangle score (mirrors
    * EdgeScores.normalizeScore(triangleEdgeScore, "tri"), lower=0 upper=1): the
    * factor/offset doubles are recomputed with the same expression shapes so the
    * IEEE results agree bit-for-bit. */
  def scoreNormalize: String =
    s"""$base,
       |$ejCte,
       |mm AS MATERIALIZED (SELECT CAST(min(tri) AS DOUBLE) AS mn, CAST(max(tri) AS DOUBLE) AS mx FROM ej)
       |SELECT ej.src, ej.dst,
       |  round(((1.0 - 0.0) / (mm.mx - mm.mn)) * CAST(ej.tri AS DOUBLE)
       |    + (0.0 - mm.mn * ((1.0 - 0.0) / (mm.mx - mm.mn))), 7) AS normalized
       |FROM ej, mm""".stripMargin

  /** Mirrors EdgeScores.scanScore. */
  def scanScore: String =
    s"""$base,
       |$ejCte
       |SELECT ej.src, ej.dst, ej.tri,
       |  round((ej.tri + 1)::double / sqrt(((ds.d + 1) * (dd.d + 1))::double), 7) AS score
       |FROM ej JOIN dg ds ON ej.src = ds.id JOIN dg dd ON ej.dst = dd.id""".stripMargin

  /** Mirrors EdgeScores.chanceCorrectedTriangleScore. */
  def chanceCorrectedTri: String =
    s"""$base,
       |$ejCte
       |SELECT ej.src, ej.dst, ej.tri,
       |  CASE WHEN ej.tri > 0
       |       THEN round((ej.tri * ((SELECT n FROM nn) - 2))::double /
       |                  ((ds.d - 1) * (dd.d - 1))::double, 7)
       |       WHEN ds.d = 1 OR dd.d = 1 THEN 1.0
       |       ELSE 0.0 END AS score
       |FROM ej JOIN dg ds ON ej.src = ds.id JOIN dg dd ON ej.dst = dd.id""".stripMargin

  /** Mirrors EdgeScores.localSimilarityScore (AttributizedEdge total order:
    * sim DESC, neighbor ASC — LocalSimilarityScore.h:26-30). */
  def localSimilarity: String =
    s"""$base,
       |$ejCte,
       |sims AS MATERIALIZED (
       |  SELECT ej.src, ej.dst, ej.tri::double / (ds.d + dd.d - ej.tri) AS sim
       |  FROM ej JOIN dg ds ON ej.src = ds.id JOIN dg dd ON ej.dst = dd.id),
       |direct AS MATERIALIZED (
       |  SELECT src AS ego, dst AS alter, sim FROM sims
       |  UNION ALL SELECT dst, src, sim FROM sims),
       |rked AS MATERIALIZED (
       |  SELECT ego, alter,
       |    row_number() OVER (PARTITION BY ego ORDER BY sim DESC, alter ASC) AS rnk
       |  FROM direct),
       |es AS MATERIALIZED (
       |  SELECT r.ego, r.alter,
       |    CASE WHEN g.d <= 1 THEN 1.0 ELSE 1.0 - ln(r.rnk) / ln(g.d) END AS e
       |  FROM rked r JOIN dg g ON r.ego = g.id)
       |SELECT least(ego, alter) AS src, greatest(ego, alter) AS dst,
       |  round(max(e), 7) AS score
       |FROM es GROUP BY 1, 2""".stripMargin

  /** LocalFilterScore over the triangle attribute (mirrors
    * EdgeScores.localFilterScore): RANK() per endpoint (equal attributes share a
    * rank), logarithmic or linear exponent, max over both endpoints. */
  def localFilter(logarithmic: Boolean): String = {
    val eExpr =
      if (logarithmic) "1.0 - ln(r.rnk) / ln(g.d)"
      else "1.0 - (r.rnk - 1)::double / (g.d - 1)"
    s"""$base,
       |$ejCte,
       |direct AS MATERIALIZED (
       |  SELECT src AS ego, dst AS alter, tri FROM ej
       |  UNION ALL SELECT dst, src, tri FROM ej),
       |rked AS MATERIALIZED (
       |  SELECT ego, alter, rank() OVER (PARTITION BY ego ORDER BY tri DESC) AS rnk
       |  FROM direct),
       |es AS MATERIALIZED (
       |  SELECT r.ego, r.alter, CASE WHEN g.d <= 1 THEN 1.0 ELSE $eExpr END AS e
       |  FROM rked r JOIN dg g ON r.ego = g.id)
       |SELECT least(ego, alter) AS src, greatest(ego, alter) AS dst,
       |  round(max(e), 7) AS score
       |FROM es GROUP BY 1, 2""".stripMargin
  }

  /** Mirrors EdgeScores.sparsifiedGraphOfSize over SCAN scores: top ceil(ratio*m)
    * edges by (score DESC, src, dst). */
  def sparsifySizeScan(ratio: Double): String =
    s"""$base,
       |$ejCte,
       |scored AS MATERIALIZED (
       |  SELECT ej.src, ej.dst, ej.tri,
       |    round((ej.tri + 1)::double / sqrt(((ds.d + 1) * (dd.d + 1))::double), 7) AS score
       |  FROM ej JOIN dg ds ON ej.src = ds.id JOIN dg dd ON ej.dst = dd.id),
       |cnt AS MATERIALIZED (SELECT count(*) AS c FROM scored),
       |rked AS MATERIALIZED (
       |  SELECT *, row_number() OVER (ORDER BY score DESC, src ASC, dst ASC) AS rn FROM scored)
       |SELECT src, dst, tri, score FROM rked
       |WHERE rn <= (SELECT CAST(ceil($ratio * c) AS BIGINT) FROM cnt)""".stripMargin

  /** Coreness via a chained ascending-k peel (mirrors KCore.coreness — the one-pass
    * ParK semantics, CoreDecomposition.cpp:45-150): the k-core is peeled FROM the
    * (k−1)-core with `rounds` unrolled removal sweeps per k (measured worst case at
    * sf0.01 is 25 sweeps at k=13; `rounds` must exceed it), and coreness(v) = the
    * largest k whose k-core contains v (0 for isolated vertices). `maxK` must be
    * >= the graph's degeneracy (measured 14 at sf0.01) — an undersized maxK fails the
    * cross-check loudly rather than silently truncating. */
  def coreness(maxK: Int, rounds: Int): String = {
    val chains = (1 to maxK).map { k =>
      val steps = (1 to rounds).map { r =>
        val from = if (r == 1) s"s${k - 1}" else s"c${k}_${r - 1}"
        s"""c${k}_$r AS MATERIALIZED (SELECT bi.a AS id FROM bi
           |  JOIN $from x ON bi.a = x.id JOIN $from y ON bi.b = y.id
           |  GROUP BY bi.a HAVING count(*) >= $k)""".stripMargin
      }.mkString(",\n")
      s"""$steps,
         |s$k AS MATERIALIZED (SELECT id FROM c${k}_$rounds)""".stripMargin
    }.mkString(",\n")
    val unions = (1 to maxK).map(k => s"SELECT id, $k AS k FROM s$k").mkString(" UNION ALL ")
    s"""$base,
       |$biCte,
       |s0 AS MATERIALIZED (SELECT id FROM verts),
       |$chains,
       |allk AS MATERIALIZED ($unions)
       |SELECT v.id, CAST(coalesce(mx.c, 0) AS BIGINT) AS coreness
       |FROM verts v LEFT JOIN (SELECT id, max(k) AS c FROM allk GROUP BY id) mx
       |ON v.id = mx.id""".stripMargin
  }

  /** Degree assortativity sums + Pearson r. Mirrors Centralities.assortativity. */
  def assortativity: String =
    s"""$base,
       |$biCte,
       |deg AS MATERIALIZED (SELECT a AS id, count(*) AS deg FROM bi GROUP BY a),
       |s0 AS MATERIALIZED (
       |  SELECT count(*) AS ne, sum(dx.deg) AS sx, sum(dy.deg) AS sy,
       |    sum(dx.deg * dx.deg) AS sxx, sum(dy.deg * dy.deg) AS syy,
       |    sum(dx.deg * dy.deg) AS sxy
       |  FROM bi JOIN deg dx ON bi.a = dx.id JOIN deg dy ON bi.b = dy.id)
       |SELECT CAST(ne AS BIGINT) AS ne, CAST(sx AS BIGINT) AS sx,
       |  CAST(sxy AS BIGINT) AS sxy, CAST(sxx AS BIGINT) AS sxx,
       |  (ne * sxy - sx * sy)::double /
       |    (sqrt((ne * sxx - sx * sx)::double) * sqrt((ne * syy - sy * sy)::double)) AS assortativity
       |FROM s0""".stripMargin

  /** Weighted SSSP from `source`: `rounds` unrolled min-plus relaxations over the
    * bidirected graph with synthetic integer weights w = 1 + (src+dst)%5. Mirrors
    * Distances.weightedSssp at fixpoint. */
  def weightedSssp(source: Long, rounds: Int): String = {
    val inf = 999999999L
    val steps = (1 to rounds).map { i =>
      s"""w$i AS MATERIALIZED (SELECT d.id, least(d.dist, coalesce(m.md, d.dist)) AS dist
         |  FROM w${i - 1} d LEFT JOIN (
         |    SELECT bw.b AS id, min(x.dist + bw.w) AS md FROM bw JOIN w${i - 1} x ON bw.a = x.id
         |    WHERE x.dist < $inf GROUP BY bw.b) m ON d.id = m.id)""".stripMargin
    }.mkString(",\n")
    s"""$base,
       |$biCte,
       |bw AS MATERIALIZED (SELECT a, b, 1 + (a + b) % 5 AS w FROM bi),
       |w0 AS MATERIALIZED (SELECT id, CAST(CASE WHEN id = $source THEN 0 ELSE $inf END AS BIGINT) AS dist FROM verts),
       |$steps
       |SELECT id, CAST(CASE WHEN dist >= $inf THEN -1 ELSE dist END AS BIGINT) AS dist FROM w$rounds""".stripMargin
  }

  /** Bounded weighted SSSP (mirrors Distances.incompleteDijkstra: settled ball
    * dist <= bound only; the relax cap ds + w <= bound cannot change any settled
    * distance <= bound, so filtering the full fixpoint is the same table). */
  def incompleteDijkstra(source: Long, rounds: Int, bound: Long): String =
    s"""SELECT id, dist FROM (
       |${weightedSssp(source, rounds)}
       |) z WHERE dist >= 0 AND dist <= $bound""".stripMargin

  /** Cold weighted Bellman-Ford on the MUTATED graph (edges + the source→(id % addMod
    * == 0) star, w = 1 + (a+b) % 5 everywhere) — the oracle for the warm DynSSSP
    * repair (mirrors Distances.weightedSsspWarm ≡ cold recompute). */
  def dynSssp(source: Long, rounds: Int, addMod: Long): String = {
    val inf = 999999999L
    val steps = (1 to rounds).map { i =>
      s"""w$i AS MATERIALIZED (SELECT d.id, least(d.dist, coalesce(m.md, d.dist)) AS dist
         |  FROM w${i - 1} d LEFT JOIN (
         |    SELECT bw.b AS id, min(x.dist + bw.w) AS md FROM bw JOIN w${i - 1} x ON bw.a = x.id
         |    WHERE x.dist < $inf GROUP BY bw.b) m ON d.id = m.id)""".stripMargin
    }.mkString(",\n")
    s"""$base,
       |$biCte,
       |adde AS MATERIALIZED (SELECT $source AS a, id AS b FROM verts
       |  WHERE id % $addMod = 0 AND id != $source),
       |dbi AS MATERIALIZED (SELECT a, b FROM bi
       |  UNION SELECT a, b FROM adde UNION SELECT b, a FROM adde),
       |bw AS MATERIALIZED (SELECT a, b, 1 + (a + b) % 5 AS w FROM dbi),
       |w0 AS MATERIALIZED (SELECT id, CAST(CASE WHEN id = $source THEN 0 ELSE $inf END AS BIGINT) AS dist FROM verts),
       |$steps
       |SELECT id, CAST(CASE WHEN dist >= $inf THEN -1 ELSE dist END AS BIGINT) AS dist FROM w$rounds""".stripMargin
  }

  /** Induced subgraph on vertices with id % 7 == 0 (GraphTools subgraphFromNodes,
    * graph/Graph.h:558). */
  def subgraph7: String =
    s"""$base
       |SELECT src, dst FROM edges WHERE src % 7 = 0 AND dst % 7 = 0""".stripMargin

  /** Fixed-point Katz-style recurrence, `iters` unrolled rounds. Mirrors
    * Centralities.katzFixedPoint. */
  def katzFixed(iters: Int, scale: Long = 1000000L): String = {
    val steps = (1 to iters).map { i =>
      s"""k$i AS MATERIALIZED (SELECT v.id, CAST(coalesce(m.s, 0) // 4096 AS BIGINT) AS katz
         |  FROM verts v LEFT JOIN (
         |    SELECT e.dst AS id, sum(x.katz + $scale) AS s FROM edges e JOIN k${i - 1} x ON e.src = x.id
         |    GROUP BY e.dst) m ON v.id = m.id)""".stripMargin
    }.mkString(",\n")
    s"""$base,
       |k0 AS MATERIALIZED (SELECT id, CAST(0 AS BIGINT) AS katz FROM verts),
       |$steps
       |SELECT id, katz FROM k$iters""".stripMargin
  }

  /** Forward multi-source BFS CTEs (mirrors Betweenness.msBfs): sources = ids with
    * id % mod == 0; produces st{levels}(s, id, dist, sigma). */
  private def msBfsCtes(mod: Long, levels: Int): String =
    msBfsCtesFrom(
      s"SELECT id AS s, id, 0 AS dist, CAST(1 AS BIGINT) AS sigma\n  FROM verts WHERE id % $mod = 0",
      levels)

  /** Multi-source BFS CTE chain from an arbitrary source SELECT producing
    * (s, id, dist, sigma) seed rows; ends at st$levels. */
  private def msBfsCtesFrom(f0Sql: String, levels: Int): String = {
    val steps = (1 to levels).map { i =>
      s"""mg$i AS MATERIALIZED (SELECT f.s, bi.b AS id, sum(f.sigma) AS sigma
         |  FROM f${i - 1} f JOIN bi ON f.id = bi.a GROUP BY 1, 2),
         |f$i AS MATERIALIZED (SELECT m.s, m.id, $i AS dist, m.sigma FROM mg$i m
         |  LEFT JOIN st${i - 1} x ON m.s = x.s AND m.id = x.id WHERE x.s IS NULL),
         |st$i AS MATERIALIZED (SELECT * FROM st${i - 1} UNION ALL SELECT * FROM f$i)""".stripMargin
    }.mkString(",\n")
    s"""f0 AS MATERIALIZED ($f0Sql),
       |st0 AS MATERIALIZED (SELECT * FROM f0),
       |$steps""".stripMargin
  }

  /** Sampled-source Brandes betweenness, scaled-integer dependency recursion
    * (mirrors Betweenness.fixedPoint): delta = Σ_w (sigma_v*(scale+delta_w)) // sigma_w
    * swept level by level downward. */
  def betweennessFixed(mod: Long, levels: Int, scale: Long = 10000L): String =
    betweennessFixedCore(mod, levels, scale, biCte)

  /** Cold Brandes on the MUTATED graph (edges + the 0 → id % addMod == 0 star) —
    * the oracle for the engine's incremental warmInsertFixed path
    * (q_dyn_betweenness): the warm update must equal this cold recompute exactly. */
  def betweennessFixedDyn(mod: Long, levels: Int, addMod: Long,
                          scale: Long = 10000L): String = {
    val biDyn =
      s"""adde AS MATERIALIZED (SELECT CAST(0 AS BIGINT) AS a, id AS b FROM verts
         |  WHERE id % $addMod = 0 AND id != 0),
         |bi AS MATERIALIZED (SELECT src AS a, dst AS b FROM edges
         |  UNION SELECT dst, src FROM edges
         |  UNION SELECT a, b FROM adde UNION SELECT b, a FROM adde)""".stripMargin
    betweennessFixedCore(mod, levels, scale, biDyn)
  }

  private def betweennessFixedCore(mod: Long, levels: Int, scale: Long,
                                   biDef: String): String = {
    val down = (0 until levels).reverse.map { lev =>
      s"""nd$lev AS MATERIALIZED (SELECT p.s, p.id,
         |    sum(p.sigma * ($scale + coalesce(d.delta, 0)) // w.sigma) AS delta
         |  FROM st$levels p
         |  JOIN bi ON p.id = bi.a
         |  JOIN st$levels w ON w.s = p.s AND w.id = bi.b AND w.dist = p.dist + 1
         |  LEFT JOIN d${lev + 1} d ON d.s = w.s AND d.id = w.id
         |  WHERE p.dist = $lev
         |  GROUP BY p.s, p.id),
         |d$lev AS MATERIALIZED (SELECT * FROM d${lev + 1} UNION ALL SELECT * FROM nd$lev)""".stripMargin
    }.mkString(",\n")
    s"""$base,
       |$biDef,
       |${msBfsCtes(mod, levels)},
       |d$levels AS MATERIALIZED (SELECT s, id, CAST(0 AS BIGINT) AS delta FROM st$levels WHERE 1 = 0),
       |$down
       |SELECT v.id, CAST(coalesce(b.bc, 0) AS BIGINT) AS bc
       |FROM verts v LEFT JOIN (
       |  SELECT id, sum(delta) AS bc FROM d0 WHERE id != s GROUP BY id) b ON v.id = b.id""".stripMargin
  }

  /** Sampled-source APSP (mirrors Distances.apsp over sources id % mod == 0): the raw
    * multi-source BFS state (s, id, dist). */
  def apsp(mod: Long, levels: Int): String =
    s"""$base,
       |$biCte,
       |${msBfsCtes(mod, levels)}
       |SELECT s, id, CAST(dist AS BIGINT) AS dist FROM st$levels""".stripMargin

  /** Cold sampled-source APSP on the MUTATED graph (edges + the single undirected
    * insert {0, max(id)}) — the oracle for the engine's closed-form DynAPSP repair
    * (q_dyn_apsp): the warm update must equal this cold recompute exactly. */
  def apspDyn(mod: Long, levels: Int): String = {
    val biDyn =
      s"""adde AS MATERIALIZED (SELECT CAST(0 AS BIGINT) AS a, max(id) AS b FROM verts),
         |bi AS MATERIALIZED (SELECT src AS a, dst AS b FROM edges
         |  UNION SELECT dst, src FROM edges
         |  UNION SELECT a, b FROM adde UNION SELECT b, a FROM adde)""".stripMargin
    s"""$base,
       |$biDyn,
       |${msBfsCtes(mod, levels)}
       |SELECT s, id, CAST(dist AS BIGINT) AS dist FROM st$levels""".stripMargin
  }

  /** Greedy group-degree (mirrors GroupCentrality.groupDegree): k unrolled greedy
    * steps, gain = not-yet-reachable neighbors (+1 self), tie-break (gain DESC,
    * id ASC). */
  def groupDegree(k: Int): String = {
    val steps = (1 to k).map { i =>
      s"""nr$i AS MATERIALIZED (SELECT v.id FROM verts v
         |  LEFT JOIN r${i - 1} r ON v.id = r.id WHERE r.id IS NULL),
         |gn$i AS MATERIALIZED (SELECT v.id,
         |  coalesce(ng.ng, 0) + (CASE WHEN nr.id IS NULL THEN 0 ELSE 1 END) AS gain
         |  FROM verts v
         |  LEFT JOIN s${i - 1} s ON v.id = s.id
         |  LEFT JOIN (SELECT bi.a AS id, count(*) AS ng FROM bi
         |    JOIN nr$i x ON bi.b = x.id GROUP BY bi.a) ng ON v.id = ng.id
         |  LEFT JOIN nr$i nr ON v.id = nr.id
         |  WHERE s.id IS NULL),
         |b$i AS MATERIALIZED (SELECT id, ${i - 1} AS ord, gain FROM gn$i
         |  ORDER BY gain DESC, id ASC LIMIT 1),
         |s$i AS MATERIALIZED (SELECT id, ord, gain FROM s${i - 1} UNION ALL SELECT * FROM b$i),
         |r$i AS MATERIALIZED (SELECT id FROM r${i - 1}
         |  UNION SELECT id FROM b$i
         |  UNION SELECT bi.b FROM bi JOIN b$i ON bi.a = b$i.id)""".stripMargin
    }.mkString(",\n")
    s"""$base,
       |$biCte,
       |s0 AS MATERIALIZED (SELECT CAST(NULL AS BIGINT) AS id, CAST(NULL AS BIGINT) AS ord,
       |  CAST(NULL AS BIGINT) AS gain WHERE 1 = 0),
       |r0 AS MATERIALIZED (SELECT CAST(NULL AS BIGINT) AS id WHERE 1 = 0),
       |$steps
       |SELECT CAST(ord AS BIGINT) AS ord, id, CAST(gain AS BIGINT) AS gain FROM s$k""".stripMargin
  }

  /** Generator twins: the generators are pure (seed, index) integer arithmetic
    * (Generators.drawSql is dialect-aware), so DuckDB replays the exact formula over
    * generate_series — same draws, same filters, same edge set. */
  private def genDraw(x: String) = graft.synth.Generators.drawSql(x, duck = true)

  /** Erdős–Rényi G(n, m) (mirrors Generators.erdosRenyi). */
  /** Erdős–Gallai profile of the graph's own degree sequence (mirrors
    * Generators.erdosGallai — window rank/prefix + histogram fold). */
  def erdosGallai: String =
    s"""$base,
       |$biCte,
       |degv AS MATERIALIZED (SELECT v.id, coalesce(d.c, 0) AS deg FROM verts v
       |  LEFT JOIN (SELECT a AS id, count(*) AS c FROM bi GROUP BY 1) d ON v.id = d.id),
       |rk AS MATERIALIZED (SELECT deg,
       |  row_number() OVER (ORDER BY deg DESC, id ASC) AS k,
       |  sum(deg) OVER (ORDER BY deg DESC, id ASC ROWS UNBOUNDED PRECEDING) AS lhs
       |  FROM degv),
       |hist AS MATERIALIZED (SELECT deg AS d, count(*) AS c, sum(deg) AS sd
       |  FROM degv GROUP BY 1),
       |stot AS MATERIALIZED (SELECT sum(deg) AS s FROM degv),
       |ckt AS MATERIALIZED (SELECT rk.k, rk.lhs,
       |  coalesce(sum(h.c), 0) AS ck, coalesce(sum(h.sd), 0) AS sge
       |  FROM rk LEFT JOIN hist h ON h.d >= rk.k GROUP BY 1, 2),
       |eg AS MATERIALIZED (SELECT k, lhs,
       |  k * (k - 1) + CASE WHEN ck >= k THEN (ck - k) * k + (SELECT s FROM stot) - sge
       |                ELSE (SELECT s FROM stot) - lhs END AS rhs FROM ckt)
       |SELECT CAST(k AS BIGINT) AS k, CAST(lhs AS BIGINT) AS lhs,
       |  CAST(rhs AS BIGINT) AS rhs,
       |  CAST(CASE WHEN lhs <= rhs THEN 1 ELSE 0 END AS BIGINT) AS ok FROM eg""".stripMargin

  /** Degree histogram of the LCG degree sequence (mirrors
    * Generators.lcgDegreeSequence — the Havel–Hakimi realization must reproduce it
    * exactly). */
  def lcgDegreeHistogram(n: Long, minDeg: Long, maxDeg: Long, seed: Long): String = {
    val span = maxDeg - minDeg + 1
    s"""WITH t AS (SELECT g AS id FROM generate_series(0, ${n - 1}) s(g)),
       |d0 AS MATERIALIZED (SELECT id,
       |  $minDeg + ${genDraw(s"id + $seed * 31")} % $span AS deg FROM t),
       |d1 AS MATERIALIZED (SELECT id,
       |  CASE WHEN id = 0 AND (SELECT sum(deg) FROM d0) % 2 = 1 THEN deg + 1
       |       ELSE deg END AS deg FROM d0)
       |SELECT CAST(deg AS BIGINT) AS deg, count(*) AS cnt FROM d1 GROUP BY 1""".stripMargin
  }

  /** Planted membership of the clustered random graph generator (mirrors
    * Generators.clusteredRandomGraph: block = draw(id + seed*104729) % k). */
  def clusteredRandomMembership(n: Long, k: Int, seed: Long): String = {
    val base = seed * 104729L
    s"""WITH t AS (SELECT g AS id FROM generate_series(0, ${n - 1}) s(g))
       |SELECT id, ${genDraw(s"id + $base")} % $k AS block FROM t""".stripMargin
  }

  /** Exact-LFR node table (mirrors Generators.lfrExactNodes): τ₁=3 sqrt powerlaw
    * degrees through the hub-spreading affine permutation, τ₂=2 community sizes with
    * gap-fill, contiguous-block membership, integer llround μ-split capped at deg and
    * community size − 1. √ and round are the only float ops — both correctly rounded
    * / identically defined in the two engines. */
  def lfrNodes(n: Long, minDeg: Long, maxDeg: Long, minC: Long, maxC: Long,
               muNum: Long, muDen: Long): String = {
    def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)
    val aPerm = Iterator.iterate(1000003L)(_ + 2L).find(a => gcd(a, n) == 1L).get
    val maxComms = math.max(4L, 4L * n / math.max(1L, minC))
    s"""WITH ids AS (SELECT g AS id FROM generate_series(0, ${n - 1}) s(g)),
       |degs AS (SELECT id, greatest($minDeg, least($maxDeg,
       |    CAST(round(${maxDeg.toDouble} / sqrt(((id * $aPerm) % $n) + 1)) AS BIGINT))) AS deg
       |  FROM ids),
       |cs AS (SELECT g AS c, greatest($minC, least($maxC,
       |    CAST(round(${maxC.toDouble} / (g + 1)) AS BIGINT))) AS w
       |  FROM generate_series(0, ${maxComms - 1}) s(g)),
       |ps AS (SELECT c, w, CAST(coalesce(sum(w) OVER (ORDER BY c
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum FROM cs),
       |blocks AS (SELECT c AS block, cum, least(w, $n - cum) AS sz FROM ps WHERE cum < $n),
       |memb AS (SELECT i.id, b.block, b.sz FROM ids i
       |  JOIN blocks b ON i.id >= b.cum AND i.id < b.cum + b.sz)
       |SELECT m.id, d.deg,
       |  least(d.deg, m.sz - 1,
       |    greatest(1, (2 * ${muDen - muNum} * d.deg + $muDen) // ${2 * muDen})) AS intdeg,
       |  m.block
       |FROM memb m JOIN degs d ON m.id = d.id""".stripMargin
  }

  def generatorEr(n: Long, m: Long, seed: Long): String =
    s"""WITH t AS (SELECT g AS id FROM generate_series(0, ${m - 1}) s(g))
       |SELECT DISTINCT
       |  (${genDraw(s"id*2 + $seed*7")} // 128) % $n AS src,
       |  (${genDraw(s"id*2 + 1 + $seed*7")} // 128) % $n AS dst
       |FROM t WHERE (${genDraw(s"id*2 + $seed*7")} // 128) % $n
       |        != (${genDraw(s"id*2 + 1 + $seed*7")} // 128) % $n""".stripMargin

  /** Watts–Strogatz (mirrors Generators.wattsStrogatz: ring lattice + LCG rewires,
    * collisions dropped). */
  def generatorWs(n: Long, k: Int, beta: Double, seed: Long): String = {
    val half = k / 2
    val betaM = math.round(beta * graft.synth.GraphSpec.M.toDouble)
    val i = s"(id // $half)"
    val j = s"(id % $half + 1)"
    val rewire = genDraw(s"id*2 + $seed*60013")
    val target = s"((${genDraw(s"id*2 + 1 + $seed*60013")} // 128) % $n)"
    s"""WITH t AS (SELECT g AS id FROM generate_series(0, ${n * half - 1}) s(g)),
       |e AS (SELECT $i AS src,
       |  CASE WHEN $rewire < $betaM THEN $target ELSE ($i + $j) % $n END AS dst FROM t)
       |SELECT DISTINCT src, dst FROM e WHERE src != dst""".stripMargin
  }

  /** RMAT (mirrors Generators.rmat: per-bit quadrant descent, a/b/c/d = 57/19/19/5). */
  def generatorRmat(scale: Int, edgeFactor: Int, seed: Long): String = {
    val n = 1L << scale
    val m = edgeFactor.toLong * n
    val levels = (0 until scale).map { l =>
      val r = s"((${genDraw(s"id*64 + $l + $seed*999983")} // 1024) % 100)"
      (s"(CASE WHEN $r >= 76 THEN ${1L << l} ELSE 0 END)",
        s"(CASE WHEN ($r >= 57 AND $r < 76) OR $r >= 95 THEN ${1L << l} ELSE 0 END)")
    }
    s"""WITH t AS (SELECT g AS id FROM generate_series(0, ${m - 1}) s(g)),
       |e AS (SELECT ${levels.map(_._1).mkString(" + ")} AS src,
       |  ${levels.map(_._2).mkString(" + ")} AS dst FROM t)
       |SELECT DISTINCT src, dst FROM e WHERE src != dst""".stripMargin
  }

  /** Greedy group-closeness (mirrors GroupCentrality.groupCloseness): candidate pool
    * = top `pool` by (bidirected degree DESC, id ASC), one unrolled msBFS from the
    * pool (dist <= levels), seed = max-degree pool node, then k-1 greedy rounds of
    * gain = Σ_v max(0, d[v] − dist(s,v)) with unreachable sentinel n. */
  def groupCloseness(k: Int, pool: Int, levels: Int): String = {
    val bfsSteps = (1 to levels).map { i =>
      s"""pm$i AS MATERIALIZED (SELECT f.s, bi.b AS id FROM pf${i - 1} f
         |  JOIN bi ON f.id = bi.a GROUP BY 1, 2),
         |pf$i AS MATERIALIZED (SELECT m.s, m.id, $i AS dist FROM pm$i m
         |  LEFT JOIN pst${i - 1} x ON m.s = x.s AND m.id = x.id WHERE x.s IS NULL),
         |pst$i AS MATERIALIZED (SELECT * FROM pst${i - 1} UNION ALL SELECT * FROM pf$i)""".stripMargin
    }.mkString(",\n")
    val rounds = (1 to (k - 1)).map { i =>
      s"""gg$i AS MATERIALIZED (SELECT st.s,
         |  sum(CASE WHEN d.dist > st.dist THEN d.dist - st.dist ELSE 0 END) AS gain
         |  FROM pst$levels st JOIN gd${i - 1} d ON st.id = d.id
         |  LEFT JOIN sel${i - 1} x ON st.s = x.id WHERE x.id IS NULL GROUP BY st.s),
         |gb$i AS MATERIALIZED (SELECT s AS id, $i AS ord, gain FROM gg$i
         |  ORDER BY gain DESC, s ASC LIMIT 1),
         |gd$i AS MATERIALIZED (SELECT d.id,
         |  CASE WHEN nd.dist IS NOT NULL AND nd.dist < d.dist THEN nd.dist ELSE d.dist END AS dist
         |  FROM gd${i - 1} d LEFT JOIN (SELECT st.id, st.dist FROM pst$levels st
         |    JOIN gb$i ON st.s = gb$i.id) nd ON d.id = nd.id),
         |sel$i AS MATERIALIZED (SELECT id FROM sel${i - 1} UNION ALL SELECT id FROM gb$i)""".stripMargin
    }.mkString(",\n")
    val unionAll = (1 to (k - 1)).map(i => s"SELECT ord, id, gain FROM gb$i")
      .mkString(" UNION ALL ")
    s"""$base,
       |$biCte,
       |gdeg AS MATERIALIZED (SELECT a AS id, count(*) AS d FROM bi GROUP BY a),
       |gpool AS MATERIALIZED (SELECT v.id FROM verts v LEFT JOIN gdeg g ON v.id = g.id
       |  ORDER BY coalesce(g.d, 0) DESC, v.id ASC LIMIT $pool),
       |pf0 AS MATERIALIZED (SELECT id AS s, id, 0 AS dist FROM gpool),
       |pst0 AS MATERIALIZED (SELECT * FROM pf0),
       |$bfsSteps,
       |gseed AS MATERIALIZED (SELECT p.id FROM gpool p LEFT JOIN gdeg g ON p.id = g.id
       |  ORDER BY coalesce(g.d, 0) DESC, p.id ASC LIMIT 1),
       |gd0 AS MATERIALIZED (SELECT v.id,
       |  coalesce(sd.dist, (SELECT n FROM nn)) AS dist FROM verts v
       |  LEFT JOIN (SELECT st.id, st.dist FROM pst$levels st JOIN gseed ON st.s = gseed.id) sd
       |    ON v.id = sd.id),
       |sel0 AS MATERIALIZED (SELECT id FROM gseed),
       |gb0 AS MATERIALIZED (SELECT id, 0 AS ord,
       |  (SELECT sum((SELECT n FROM nn) - dist) FROM gd0) AS gain FROM gseed),
       |$rounds
       |SELECT CAST(ord AS BIGINT) AS ord, id, CAST(gain AS BIGINT) AS gain
       |FROM (SELECT ord, id, gain FROM gb0 UNION ALL $unionAll)""".stripMargin
  }

  /** Sfigality (mirrors Centralities.sfigality): fraction of neighbors with strictly
    * higher degree. */
  val sfigality: String =
    s"""$base,
       |$biCte,
       |deg AS MATERIALIZED (SELECT a AS id, count(*) AS deg FROM bi GROUP BY a),
       |sf AS MATERIALIZED (SELECT bi.a AS id,
       |  sum(CASE WHEN du.deg < dv.deg THEN 1 ELSE 0 END) AS higher, count(*) AS deg
       |  FROM bi JOIN deg du ON bi.a = du.id JOIN deg dv ON bi.b = dv.id GROUP BY bi.a)
       |SELECT v.id, CAST(coalesce(sf.higher, 0) AS BIGINT) AS higher,
       |  CAST(coalesce(sf.deg, 0) AS BIGINT) AS deg,
       |  CASE WHEN coalesce(sf.deg, 0) = 0 THEN 0.0
       |       ELSE coalesce(sf.higher, 0)::double / sf.deg END AS sfigality
       |FROM verts v LEFT JOIN sf ON v.id = sf.id""".stripMargin

  /** LocalDegreeScore (mirrors EdgeScores.localDegreeScore): competition rank of each
    * neighbor by degree DESC, e = 1 − ln(rank)/ln(deg), max over both directions,
    * rounded to 7 decimals on both engines. */
  val localDegree: String =
    s"""$base,
       |$biCte,
       |deg AS MATERIALIZED (SELECT a AS id, count(*) AS deg FROM bi GROUP BY a),
       |rkd AS MATERIALIZED (SELECT bi.a AS src, bi.b AS dst, du.deg AS du,
       |  rank() OVER (PARTITION BY bi.a ORDER BY dv.deg DESC) AS rnk
       |  FROM bi JOIN deg du ON bi.a = du.id JOIN deg dv ON bi.b = dv.id),
       |es AS MATERIALIZED (SELECT src, dst,
       |  CASE WHEN du <= 1 THEN 1.0 ELSE 1.0 - ln(rnk) / ln(du) END AS e FROM rkd)
       |SELECT least(src, dst) AS src, greatest(src, dst) AS dst,
       |  round(max(e), 7) AS score
       |FROM es GROUP BY 1, 2""".stripMargin

  /** Effective diameter from the ANF finish hops (mirrors the q_eff_diameter
    * aggregation): one row (n, sum_hops, eff_diameter). */
  def effectiveDiameter(hops: Int): String =
    s"""SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(hop) AS BIGINT) AS sum_hops,
       |  sum(hop)::double / count(*) AS eff_diameter
       |FROM (${anfHops(hops)})""".stripMargin

  /** Exact closeness + harmonic of the sampled sources (mirrors
    * Betweenness.closenessHarmonic; LCM(1..16)=720720 keeps 1/d exact). */
  def closenessHarmonic(mod: Long, levels: Int): String =
    closenessHarmonicCore(mod, levels, biCte)

  /** Cold closeness/harmonic on the MUTATED graph (edges + the 0 → id % addMod == 0
    * star) — the oracle for the engine's incremental closenessHarmonicWarm path
    * (q_dyn_harmonic): the affected-node repair must equal this cold recompute. */
  def closenessHarmonicDyn(mod: Long, levels: Int, addMod: Long): String = {
    val biDyn =
      s"""adde AS MATERIALIZED (SELECT CAST(0 AS BIGINT) AS a, id AS b FROM verts
         |  WHERE id % $addMod = 0 AND id != 0),
         |bi AS MATERIALIZED (SELECT src AS a, dst AS b FROM edges
         |  UNION SELECT dst, src FROM edges
         |  UNION SELECT a, b FROM adde UNION SELECT b, a FROM adde)""".stripMargin
    closenessHarmonicCore(mod, levels, biDyn)
  }

  private def closenessHarmonicCore(mod: Long, levels: Int, biDef: String): String = {
    val L = 720720L
    s"""$base,
       |$biDef,
       |${msBfsCtes(mod, levels)}
       |SELECT s AS id, CAST(count(*) - 1 AS BIGINT) AS reached,
       |  CAST(sum(dist) AS BIGINT) AS sumdist,
       |  CASE WHEN sum(dist) > 0 THEN 1.0 / CAST(sum(dist) AS DOUBLE) ELSE 0.0 END AS closeness,
       |  CAST(sum(CASE WHEN dist > 0 THEN $L // dist ELSE 0 END) AS DOUBLE) / $L.0 AS harmonic
       |FROM st$levels GROUP BY s""".stripMargin
  }

  /** ANF per-node finish hops (mirrors Anf.finishHops): k FM registers as BIGINT
    * columns, bit_or hop merges, integer lowest-unset-bit sums, integer threshold —
    * bit-exact replay of the sketch recursion. */
  /** Shared ANF mask-chain CTEs mk0..mk{hops} (cap + LCG register init + per-hop
    * bit_or merges) — used by anfHops and neighborhoodFunction. */
  private def anfMaskCtes(hops: Int, seed: Long, k: Int): String = {
    import graft.synth.GraphSpec.{idiv, lcg, M}
    val regs = 0 until k
    // Same nonlinear product draw as Anf.drawSql (plain chained LCG has degenerate
    // low bits for inputs striding by k — see Anf scaladoc).
    def draw(x: String) = s"(${idiv(s"${lcg(x)} * ${lcg(s"($x) + 1000003")}", "65536", duck = true)}) % $M"
    val initCols = regs.map { j =>
      val hv = draw(s"id*$k + $j + $seed*1000003")
      s"""CASE WHEN ($hv) = 0 THEN 0
         |  ELSE CASE WHEN bit_count((($hv) & (-($hv))) - 1) < cap.cap
         |    THEN (CAST(1 AS BIGINT) << CAST(bit_count((($hv) & (-($hv))) - 1) AS INT))
         |    ELSE 0 END END AS m$j""".stripMargin
    }.mkString(",\n  ")
    val hopSteps = (1 to hops).map { h =>
      val ors = regs.map(j => s"bit_or(x.m$j) AS m$j").mkString(", ")
      val merged = regs.map(j => s"coalesce(s.m$j, 0) | p.m$j AS m$j").mkString(", ")
      s"""ms$h AS MATERIALIZED (SELECT bi.b AS id, $ors
         |  FROM bi JOIN mk${h - 1} x ON bi.a = x.id GROUP BY bi.b),
         |mk$h AS MATERIALIZED (SELECT p.id, $merged
         |  FROM mk${h - 1} p LEFT JOIN ms$h s ON p.id = s.id)""".stripMargin
    }.mkString(",\n")
    s"""cap AS MATERIALIZED (SELECT least(62, CAST(ceil(log2(CAST(n AS DOUBLE))) AS BIGINT) + 7) AS cap FROM nn),
       |mk0 AS MATERIALIZED (SELECT id,
       |  $initCols
       |  FROM verts CROSS JOIN cap),
       |$hopSteps""".stripMargin
  }

  private def anfSumB(alias: String, k: Int): String =
    (0 until k).map(j =>
      s"bit_count(((~$alias.m$j) & ($alias.m$j + 1)) - 1)").mkString(" + ")

  /** Neighborhood function (mirrors Anf.neighborhoodFunction): per hop, the summed
    * integer-scaled FM estimates (1 << (b div k)) * EstC(b % k). */
  def neighborhoodFunction(hops: Int, seed: Long = 42L, k: Int = 8): String = {
    val estCase = graft.algo.Anf.EstC.zipWithIndex.map { case (c, r) =>
      s"WHEN $r THEN (CAST(1 AS BIGINT) << CAST(b // $k AS INT)) * $c"
    }.mkString(s"CASE b % $k ", " ", " END")
    val perHop = (1 to hops).map { h =>
      s"""SELECT $h AS hop, sum($estCase) AS nf_scaled FROM
         |  (SELECT (${anfSumB("mk" + h, k)}) AS b FROM mk$h)""".stripMargin
    }.mkString("\n  UNION ALL ")
    s"""$base,
       |$biCte,
       |${anfMaskCtes(hops, seed, k)}
       |SELECT CAST(hop AS BIGINT) AS hop, CAST(nf_scaled AS BIGINT) AS nf_scaled,
       |  nf_scaled::double / ${(1L << 20).toDouble} AS nf
       |FROM ($perHop)""".stripMargin
  }

  def anfHops(hops: Int, ratio: Double = 0.9, seed: Long = 42L, k: Int = 8): String = {
    val regs = 0 until k
    def sumB(alias: String) = anfSumB(alias, k)
    val qualifies = (1 to hops).map { h =>
      val same = regs.map(j => s"a.m$j = b.m$j").mkString(" AND ")
      s"""SELECT a.id, $h AS hop FROM mk$h a JOIN mk${h - 1} b ON a.id = b.id
         |  CROSS JOIN tb WHERE (${sumB("a")}) >= tb.t OR ($same)""".stripMargin
    }.mkString("\n  UNION ALL ")
    s"""$base,
       |$biCte,
       |tb AS MATERIALIZED (SELECT CAST(ceil($k * log2(${0.77351 * ratio} * CAST(n AS DOUBLE)) - 0.000000000001) AS BIGINT) AS t FROM nn),
       |${anfMaskCtes(hops, seed, k)},
       |fin AS MATERIALIZED (
       |  $qualifies)
       |SELECT v.id, CAST(coalesce(f.hop, $hops) AS BIGINT) AS hop
       |FROM verts v LEFT JOIN (SELECT id, min(hop) AS hop FROM fin GROUP BY id) f
       |ON v.id = f.id""".stripMargin
  }

  /** Algebraic distance (mirrors AlgebraicDistance.edgeScores): K LCG-seeded integer
    * load systems, `iters` unrolled ω=1/2 floor-division smoothing rounds, per-edge L1
    * gap — exact int64 throughout. */
  /** Jacobi-smoothed load CTEs shared by the per-edge algebraic distance and the
    * per-pair AlgebraicDistanceIndex (mirrors AlgebraicDistance.loads). Emits
    * deg/xs0..xs{iters} and returns (cteBlock, l1ExprFor("a","b")). */
  private def algebraicLoadCtes(iters: Int, seed: Long): (String, String) = {
    import graft.synth.GraphSpec.lcg
    val K = graft.algo.AlgebraicDistance.K
    val scale = graft.algo.AlgebraicDistance.InitScale
    val regs = 0 until K
    val initCols = regs.map(j =>
      s"(${lcg(s"id*$K + $j + $seed*1000003")}) % $scale AS x$j").mkString(",\n  ")
    val steps = (1 to iters).map { i =>
      val sums = regs.map(j => s"sum(x.x$j) AS x$j").mkString(", ")
      val mix = regs.map(j =>
        s"CASE WHEN d.deg IS NULL THEN p.x$j ELSE (p.x$j + (s.x$j // d.deg)) // 2 END AS x$j")
        .mkString(",\n  ")
      s"""s$i AS MATERIALIZED (SELECT bi.b AS id, $sums
         |  FROM bi JOIN xs${i - 1} x ON bi.a = x.id GROUP BY bi.b),
         |xs$i AS MATERIALIZED (SELECT p.id,
         |  $mix
         |  FROM xs${i - 1} p LEFT JOIN s$i s ON p.id = s.id LEFT JOIN deg d ON p.id = d.id)""".stripMargin
    }.mkString(",\n")
    val ctes =
      s"""deg AS MATERIALIZED (SELECT a AS id, count(*) AS deg FROM bi GROUP BY a),
         |xs0 AS MATERIALIZED (SELECT id,
         |  $initCols
         |  FROM verts),
         |$steps""".stripMargin
    (ctes, regs.map(j => s"abs(a.x$j - b.x$j)").mkString(" + "))
  }

  def algebraicDistance(iters: Int, seed: Long = 42L): String = {
    val (ctes, l1) = algebraicLoadCtes(iters, seed)
    s"""$base,
       |$biCte,
       |$ctes,
       |undp AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS s, greatest(src, dst) AS t FROM edges)
       |SELECT undp.s AS src, undp.t AS dst, CAST($l1 AS BIGINT) AS ad
       |FROM undp JOIN xs$iters a ON undp.s = a.id JOIN xs$iters b ON undp.t = b.id""".stripMargin
  }

  /** AlgebraicDistanceIndex over the distance-2 non-adjacent candidate pairs
    * (mirrors AlgebraicDistance.pairScores). */
  def algebraicIndex(iters: Int, uMod: Long, seed: Long = 42L): String = {
    val (ctes, l1) = algebraicLoadCtes(iters, seed)
    s"""$base,
       |$biCte,
       |$ctes,
       |und AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS s, greatest(src, dst) AS t FROM edges),
       |cand AS MATERIALIZED (
       |  SELECT DISTINCT wu.b AS u, wv.b AS v
       |  FROM bi wu JOIN bi wv ON wu.a = wv.a
       |  WHERE wu.b % $uMod = 0 AND wu.b < wv.b),
       |cand2 AS MATERIALIZED (
       |  SELECT c.u, c.v FROM cand c LEFT JOIN und e ON e.s = c.u AND e.t = c.v
       |  WHERE e.s IS NULL)
       |SELECT c.u, c.v, CAST($l1 AS BIGINT) AS ad
       |FROM cand2 c JOIN xs$iters a ON c.u = a.id JOIN xs$iters b ON c.v = b.id""".stripMargin
  }

  /** The LinkPredictor index tail over the distance-2 non-adjacent candidates
    * (mirrors LinkPredIndices.indices with a `plpRounds`-round PLP partition):
    * TotalNeighbors / UDegree / VDegree / NeighborhoodDistance / NeighborsMeasure
    * (= cn + length-3 walks) / SameCommunity / the reference's literal
    * AdjustedRandIndex formula with b = c = |union|. */
  def linkpredIndices(uMod: Long, plpRounds: Int): String =
    s"""$base,
       |$biCte,
       |${plpSteps(plpRounds)},
       |deg AS MATERIALIZED (SELECT a AS id, count(*) AS deg FROM bi GROUP BY a),
       |w1 AS MATERIALIZED (SELECT b AS u, a AS x FROM bi WHERE b % $uMod = 0),
       |w2 AS MATERIALIZED (SELECT w1.u, bi.b AS y, count(*) AS w2
       |  FROM w1 JOIN bi ON w1.x = bi.a GROUP BY 1, 2),
       |w3 AS MATERIALIZED (SELECT w2.u, bi.b AS v, sum(w2.w2) AS w3
       |  FROM w2 JOIN bi ON w2.y = bi.a GROUP BY 1, 2),
       |und AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS s, greatest(src, dst) AS t FROM edges),
       |cand AS MATERIALIZED (
       |  SELECT w2.u, w2.y AS v, w2.w2 AS cn FROM w2
       |  LEFT JOIN und e ON e.s = w2.u AND e.t = w2.y
       |  WHERE w2.u < w2.y AND e.s IS NULL),
       |nn2 AS MATERIALIZED (SELECT count(*) AS n FROM verts),
       |idx AS MATERIALIZED (
       |  SELECT c.u, c.v, c.cn,
       |    du.deg + dv.deg - c.cn AS un, du.deg AS u_deg, dv.deg AS v_deg,
       |    nn2.n - (du.deg + dv.deg - c.cn) AS d,
       |    coalesce(w3.w3, 0) AS w3,
       |    CASE WHEN pu.label = pv.label THEN 1 ELSE 0 END AS same_community
       |  FROM cand c
       |  JOIN deg du ON c.u = du.id JOIN deg dv ON c.v = dv.id
       |  LEFT JOIN w3 ON w3.u = c.u AND w3.v = c.v
       |  JOIN p$plpRounds pu ON c.u = pu.id JOIN p$plpRounds pv ON c.v = pv.id,
       |  nn2)
       |SELECT u, v, CAST(cn AS BIGINT) AS cn, CAST(un AS BIGINT) AS total_neighbors,
       |  CAST(u_deg AS BIGINT) AS u_deg, CAST(v_deg AS BIGINT) AS v_deg,
       |  round(CAST(cn AS DOUBLE) / sqrt(CAST(u_deg * v_deg AS DOUBLE)), 7)
       |    AS neighborhood_distance,
       |  CAST(cn + w3 AS BIGINT) AS neighbors_measure,
       |  CAST(same_community AS BIGINT) AS same_community,
       |  CASE WHEN cn*un + cn*un + 2*cn*d + un*un + un*d + un*un + un*d = 0 THEN 0.0
       |       ELSE round(2.0 * CAST(cn*d - un*un AS DOUBLE) /
       |            CAST(cn*un + cn*un + 2*cn*d + un*un + un*d + un*un + un*d AS DOUBLE), 7)
       |  END AS adjusted_rand
       |FROM idx""".stripMargin

  /** MissingLinksFinder.findAtDistance(k) with sampled u-side (mirrors
    * LinkPredIndices.missingLinks): pairs at exactly hop-distance k, u < v. */
  def missingLinks(mod: Long, k: Int): String =
    s"""$base,
       |$biCte,
       |${msBfsCtes(mod, k)}
       |SELECT s AS u, id AS v FROM st$k WHERE dist = $k AND s < id""".stripMargin

  /** LinkThresholder.byCount over the CN/PA/Jaccard/AA score table (mirrors
    * LinkPredIndices.byCount on LinkPrediction.scores): top `k` by
    * (score DESC, u, v). */
  def linkThreshold(uMod: Long, k: Long): String =
    s"""SELECT u, v FROM (${linkPrediction(uMod)}) t
       |ORDER BY jaccard DESC, u, v LIMIT $k""".stripMargin

  /** Fixed-point eigenvector (mirrors Centralities.eigenvectorFixedPoint): power
    * iteration with L-infinity normalization, `iters` unrolled rounds — exact integers,
    * order-independent. */
  def eigenvectorFixed(iters: Int, scale: Long = 1000000L): String = {
    val steps = (1 to iters).map { i =>
      s"""s$i AS MATERIALIZED (SELECT e.dst AS id, sum(x.ev) AS s
         |  FROM edges e JOIN ev${i - 1} x ON e.src = x.id GROUP BY e.dst),
         |m$i AS MATERIALIZED (SELECT max(s) AS mx FROM s$i),
         |ev$i AS MATERIALIZED (SELECT v.id, CAST(coalesce(s.s, 0) * $scale // m.mx AS BIGINT) AS ev
         |  FROM verts v LEFT JOIN s$i s ON v.id = s.id CROSS JOIN m$i m)""".stripMargin
    }.mkString(",\n")
    s"""$base,
       |ev0 AS MATERIALIZED (SELECT id, CAST($scale AS BIGINT) AS ev FROM verts),
       |$steps
       |SELECT id, ev FROM ev$iters""".stripMargin
  }

  /** Multilevel Louvain (mirrors PLM.runFixed): `rounds` move rounds at each of
    * `levels` levels, parity-batched, gains in cleared-denominator integer form
    * ΔQ·2ω² = 2ω(aff_D − aff_C) + ((vol(C∖u) − vol(D∖u))·vol(u)) at γ=1 — exact
    * integers on both engines, so the argmax (gain DESC, d ASC) is bit-identical.
    * Coarsening + prolongation unrolled as chained CTEs. */
  def plm(rounds: Int, levels: Int, batches: Int = 4): String = {
    val ctes = new scala.collection.mutable.ArrayBuffer[String]
    ctes += s"""e0 AS MATERIALIZED (SELECT least(src, dst) AS src, greatest(src, dst) AS dst, count(*) AS w FROM edges GROUP BY 1, 2)"""
    ctes += s"""verts0 AS MATERIALIZED (SELECT id FROM verts)"""
    for (l <- 0 until levels) {
      ctes += s"""b$l AS MATERIALIZED (SELECT src, dst, w FROM e$l WHERE src != dst
                 |  UNION ALL SELECT dst, src, w FROM e$l WHERE src != dst)""".stripMargin
      ctes += s"""vol$l AS MATERIALIZED (SELECT v.id,
                 |  coalesce(wd.wd, 0) + 2 * coalesce(lp.lw, 0) AS vol
                 |  FROM verts$l v
                 |  LEFT JOIN (SELECT src AS id, sum(w) AS wd FROM b$l GROUP BY src) wd ON v.id = wd.id
                 |  LEFT JOIN (SELECT src AS id, w AS lw FROM e$l WHERE src = dst) lp ON v.id = lp.id)""".stripMargin
      ctes += s"""om$l AS MATERIALIZED (SELECT sum(w) AS om FROM e$l)"""
      ctes += s"""lab${l}r0 AS MATERIALIZED (SELECT id, id AS label FROM verts$l)"""
      for (r <- 0 until rounds) {
        val p = s"${l}_$r"
        ctes += s"""vc_$p AS MATERIALIZED (SELECT lb.label, sum(v.vol) AS volC
                   |  FROM vol$l v JOIN lab${l}r$r lb ON v.id = lb.id GROUP BY lb.label)""".stripMargin
        ctes += s"""af_$p AS MATERIALIZED (SELECT b.src AS id, x.label AS d, sum(b.w) AS aff
                   |  FROM b$l b JOIN lab${l}r$r x ON b.dst = x.id
                   |  WHERE b.src % $batches = ${r % batches} GROUP BY 1, 2)""".stripMargin
        ctes += s"""ow_$p AS MATERIALIZED (SELECT a.id, a.aff AS affC
                   |  FROM af_$p a JOIN lab${l}r$r lb ON a.id = lb.id AND a.d = lb.label)""".stripMargin
        ctes += s"""gn_$p AS MATERIALIZED (SELECT a.id, a.d,
                   |  2 * om.om * (a.aff - coalesce(o.affC, 0)) +
                   |    ((vcc.volC - v.vol) - vcd.volC) * v.vol AS gain
                   |  FROM af_$p a
                   |  JOIN lab${l}r$r lb ON a.id = lb.id
                   |  JOIN vol$l v ON a.id = v.id
                   |  JOIN vc_$p vcd ON a.d = vcd.label
                   |  JOIN vc_$p vcc ON lb.label = vcc.label
                   |  LEFT JOIN ow_$p o ON a.id = o.id
                   |  CROSS JOIN om$l om
                   |  WHERE a.d != lb.label)""".stripMargin
        ctes += s"""bs_$p AS MATERIALIZED (SELECT id, d FROM (
                   |  SELECT id, d, gain, row_number() OVER (PARTITION BY id ORDER BY gain DESC, d ASC) AS rn
                   |  FROM gn_$p) WHERE rn = 1 AND gain > 0)""".stripMargin
        ctes += s"""lab${l}r${r + 1} AS MATERIALIZED (SELECT lb.id, coalesce(b.d, lb.label) AS label
                   |  FROM lab${l}r$r lb LEFT JOIN bs_$p b ON lb.id = b.id)""".stripMargin
      }
      if (l < levels - 1) {
        ctes += s"""e${l + 1} AS MATERIALIZED (SELECT least(ls.label, ld.label) AS src,
                   |  greatest(ls.label, ld.label) AS dst, sum(e.w) AS w
                   |  FROM e$l e JOIN lab${l}r$rounds ls ON e.src = ls.id
                   |  JOIN lab${l}r$rounds ld ON e.dst = ld.id GROUP BY 1, 2)""".stripMargin
        ctes += s"""verts${l + 1} AS MATERIALIZED (SELECT DISTINCT label AS id FROM lab${l}r$rounds)"""
      }
    }
    // Prolong coarse labels back through the levels: fine -> level1 -> ... -> levelL.
    val joins = (1 until levels)
      .map(l => s"JOIN lab${l}r$rounds p$l ON ${if (l == 1) "f.label" else s"p${l - 1}.label"} = p$l.id")
      .mkString("\n")
    val lastLabel = if (levels == 1) "f.label" else s"p${levels - 1}.label"
    s"""$base,
       |${ctes.mkString(",\n")}
       |SELECT f.id, CAST($lastLabel AS BIGINT) AS label
       |FROM lab0r$rounds f
       |$joins""".stripMargin
  }

  /** Permanence centrality over PLP labels at `rounds` (mirrors Permanence.run):
    * strength aggregation + intra-community wedge-closure triangle count. */
  def permanence(rounds: Int): String =
    s"""$base,
       |$biCte,
       |${plpSteps(rounds)},
       |stg AS MATERIALIZED (SELECT bi.a AS id, pb.label AS nl, pa.label AS ls, count(*) AS cnt
       |  FROM bi JOIN p$rounds pa ON bi.a = pa.id JOIN p$rounds pb ON bi.b = pb.id
       |  GROUP BY 1, 2, 3),
       |intr AS MATERIALIZED (SELECT id, cnt AS intra FROM stg WHERE nl = ls),
       |emx AS MATERIALIZED (SELECT id, max(cnt) AS emax FROM stg WHERE nl != ls GROUP BY id),
       |dg AS MATERIALIZED (SELECT a AS id, count(*) AS deg FROM bi GROUP BY a),
       |undi AS MATERIALIZED (SELECT least(e.src, e.dst) AS s, greatest(e.src, e.dst) AS t
       |  FROM (SELECT DISTINCT least(src, dst) AS src, greatest(src, dst) AS dst FROM edges) e
       |  JOIN p$rounds a ON e.src = a.id JOIN p$rounds b ON e.dst = b.id
       |  WHERE a.label = b.label),
       |bii AS MATERIALIZED (SELECT s AS a, t AS b FROM undi UNION ALL SELECT t, s FROM undi),
       |trin AS MATERIALIZED (SELECT w1.a AS id, count(*) AS tri FROM bii w1
       |  JOIN bii w2 ON w1.a = w2.a AND w1.b < w2.b
       |  JOIN undi e ON e.s = w1.b AND e.t = w2.b
       |  GROUP BY w1.a)
       |SELECT v.id,
       |  CAST(coalesce(i.intra, 0) AS BIGINT) AS intra,
       |  CAST(coalesce(m.emax, 1) AS BIGINT) AS emax,
       |  CAST(coalesce(d.deg, 0) AS BIGINT) AS deg,
       |  CAST(coalesce(t.tri, 0) AS BIGINT) AS tri_in,
       |  (CASE WHEN coalesce(d.deg, 0) = 0 THEN 0.0
       |        ELSE coalesce(i.intra, 0)::double / (coalesce(m.emax, 1) * d.deg) END)
       |  - (1.0 - CASE WHEN coalesce(i.intra, 0) < 2 THEN 0.0
       |           ELSE coalesce(t.tri, 0) * 2.0 / (i.intra * (i.intra - 1)) END)
       |  AS permanence
       |FROM verts v LEFT JOIN intr i ON v.id = i.id LEFT JOIN emx m ON v.id = m.id
       |LEFT JOIN dg d ON v.id = d.id LEFT JOIN trin t ON v.id = t.id""".stripMargin

  /** Degree-ordered oriented triangle enumeration (mirrors Triangles.oriented). */
  private val triCte =
    s"""und AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS s, greatest(src, dst) AS t FROM edges),
       |dg AS MATERIALIZED (SELECT id, count(*) AS d FROM
       |        (SELECT s AS id FROM und UNION ALL SELECT t FROM und) GROUP BY id),
       |rk AS MATERIALIZED (SELECT id, CAST(row_number() OVER (ORDER BY d, id) - 1 AS BIGINT) AS r FROM dg),
       |o AS MATERIALIZED (SELECT least(rs.r, rd.r) AS a, greatest(rs.r, rd.r) AS b
       |      FROM und JOIN rk rs ON und.s = rs.id JOIN rk rd ON und.t = rd.id),
       |tri AS MATERIALIZED (SELECT e1.a, e1.b, e2.b AS c FROM o e1
       |        JOIN o e2 ON e1.b = e2.a
       |        JOIN o e3 ON e3.a = e1.a AND e3.b = e2.b)""".stripMargin

  val trianglesGlobal: String =
    s"""$base,
       |$triCte
       |SELECT CAST(count(*) AS BIGINT) AS triangles FROM tri""".stripMargin

  val trianglesPerNode: String =
    s"""$base,
       |$triCte,
       |corners AS MATERIALIZED (SELECT unnest([a, b, c]) AS r FROM tri),
       |cnt AS MATERIALIZED (SELECT r, count(*) AS triangles FROM corners GROUP BY r)
       |SELECT rk.id, CAST(cnt.triangles AS BIGINT) AS triangles
       |FROM cnt JOIN rk ON cnt.r = rk.r""".stripMargin

  val lcc: String =
    s"""$base,
       |$triCte,
       |corners AS MATERIALIZED (SELECT unnest([a, b, c]) AS r FROM tri),
       |cnt AS MATERIALIZED (SELECT r, count(*) AS triangles FROM corners GROUP BY r),
       |nt AS MATERIALIZED (SELECT rk.id, cnt.triangles FROM cnt JOIN rk ON cnt.r = rk.r)
       |SELECT v.id,
       |  CASE WHEN coalesce(dg.d, 0) < 2 THEN CAST(0.0 AS DOUBLE)
       |       ELSE CAST(2.0 * coalesce(nt.triangles, 0) / (dg.d * (dg.d - 1)) AS DOUBLE)
       |  END AS lcc
       |FROM verts v LEFT JOIN dg ON v.id = dg.id LEFT JOIN nt ON v.id = nt.id""".stripMargin

  /** Mirrors EdgeScores.randomEdgeScore: nonlinear LCG draw per undirected edge,
    * exact int64 then one double division. */
  def randomEdge(seed: Long): String = {
    import GraphSpec.{lcg, M}
    val x = s"(src * 1000003 + dst + $seed)"
    val draw = s"(((${lcg(x)} * ${lcg(s"($x) + 1000003")}) // 65536) % $M)"
    s"""$base,
       |und AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS src,
       |  greatest(src, dst) AS dst FROM edges)
       |SELECT src, dst, CAST($draw AS DOUBLE) / $M.0 AS score FROM und""".stripMargin
  }

  /** Exact top-k closeness on the id % mod induced subgraph (mirrors TopCloseness.run
    * over subgraphFromNodes): all-source BFS unrolled `levels` deep, ranked
    * closeness desc with id tie-break; unreachable nodes (closeness 0) trail by id. */
  def topCloseness(mod: Long, k: Int, levels: Int): String = {
    val steps = (1 to levels).map { i =>
      s"""tg$i AS MATERIALIZED (SELECT DISTINCT f.s, sbi.b AS id
         |  FROM tf${i - 1} f JOIN sbi ON f.id = sbi.a),
         |tf$i AS MATERIALIZED (SELECT m.s, m.id, $i AS dist FROM tg$i m
         |  LEFT JOIN ts${i - 1} x ON m.s = x.s AND m.id = x.id WHERE x.s IS NULL),
         |ts$i AS MATERIALIZED (SELECT * FROM ts${i - 1} UNION ALL SELECT * FROM tf$i)""".stripMargin
    }.mkString(",\n")
    s"""$base,
       |sv AS MATERIALIZED (SELECT id FROM verts WHERE id % $mod = 0),
       |se AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
       |  FROM edges WHERE src % $mod = 0 AND dst % $mod = 0),
       |sbi AS MATERIALIZED (SELECT a, b FROM se UNION SELECT b, a FROM se),
       |tf0 AS MATERIALIZED (SELECT id AS s, id, 0 AS dist FROM sv),
       |ts0 AS MATERIALIZED (SELECT * FROM tf0),
       |$steps
       |SELECT id, reached, sumdist,
       |  CASE WHEN sumdist > 0 THEN 1.0 / CAST(sumdist AS DOUBLE) ELSE 0.0 END AS closeness
       |FROM (SELECT s AS id, CAST(count(*) - 1 AS BIGINT) AS reached,
       |        CAST(sum(dist) AS BIGINT) AS sumdist FROM ts$levels GROUP BY s)
       |ORDER BY (sumdist > 0) DESC, sumdist ASC, id ASC LIMIT $k""".stripMargin
  }

  /** Shared attribute CTEs for the tri-based score family: at(src,dst,att=tri+1) and
    * its directed view datt(ego,alter,att) + sums(ego,s,k). */
  private lazy val attCtes =
    s"""at AS MATERIALIZED (SELECT src, dst, tri + 1 AS att FROM ej),
       |datt AS MATERIALIZED (SELECT src AS ego, dst AS alter, att FROM at
       |  UNION ALL SELECT dst, src, att FROM at),
       |asum AS MATERIALIZED (SELECT ego, sum(att) AS s, count(*) AS k
       |  FROM datt GROUP BY ego)""".stripMargin

  /** Mirrors EdgeScores.simmelianOverlapScore (rank by per-edge triangles DESC,
    * competition ranks 0-based, overlap = common neighbors within rank <= maxRank on
    * BOTH sides). */
  def simmelianOverlap(maxRank: Int): String =
    s"""$base,
       |$ejCte,
       |dtri AS MATERIALIZED (SELECT src AS ego, dst AS alter, tri FROM ej
       |  UNION ALL SELECT dst, src, tri FROM ej),
       |rked AS MATERIALIZED (SELECT ego, alter,
       |    rank() OVER (PARTITION BY ego ORDER BY tri DESC) AS rnk FROM dtri),
       |top AS MATERIALIZED (SELECT ego, alter FROM rked WHERE rnk <= ${maxRank + 1}),
       |ov AS MATERIALIZED (
       |  SELECT e.src, e.dst, count(*) AS overlap
       |  FROM ej e
       |  JOIN top tu ON tu.ego = e.src AND tu.alter != e.dst
       |  JOIN top tv ON tv.ego = e.dst AND tv.alter = tu.alter
       |  GROUP BY 1, 2)
       |SELECT ej.src, ej.dst, CAST(coalesce(ov.overlap, 0) AS BIGINT) AS overlap
       |FROM ej LEFT JOIN ov ON ej.src = ov.src AND ej.dst = ov.dst""".stripMargin

  /** Mirrors EdgeScores.multiscaleScore over att = tri+1. */
  def multiscale: String =
    s"""$base,
       |$ejCte,
       |$attCtes,
       |es AS MATERIALIZED (
       |  SELECT d.ego, d.alter,
       |    CASE WHEN m.k <= 1 THEN 0.0
       |         ELSE 1.0 - pow(1.0 - d.att::double / m.s, (m.k - 1)::double) END AS e
       |  FROM datt d JOIN asum m ON d.ego = m.ego)
       |SELECT least(ego, alter) AS src, greatest(ego, alter) AS dst,
       |  round(max(e), 7) AS score
       |FROM es GROUP BY 1, 2""".stripMargin

  /** Mirrors EdgeScores.geometricMeanScore over att = tri+1. */
  def geometricMean: String =
    s"""$base,
       |$ejCte,
       |$attCtes
       |SELECT a.src, a.dst,
       |  CASE WHEN a.att > 0
       |       THEN round(a.att::double / sqrt(su.s::double * sv.s::double), 7)
       |       ELSE 0.0 END AS score
       |FROM at a JOIN asum su ON a.src = su.ego JOIN asum sv ON a.dst = sv.ego""".stripMargin

  /** Mirrors EdgeScores.linearizeScore over the SCAN score (position/(m-1), order
    * score ASC, src ASC, dst ASC). */
  def linearizeScan: String =
    s"""$base,
       |$ejCte,
       |scored AS MATERIALIZED (
       |  SELECT ej.src, ej.dst,
       |    round((ej.tri + 1)::double / sqrt(((ds.d + 1) * (dd.d + 1))::double), 7) AS score
       |  FROM ej JOIN dg ds ON ej.src = ds.id JOIN dg dd ON ej.dst = dd.id),
       |cnt AS MATERIALIZED (SELECT count(*) AS c FROM scored),
       |rked AS MATERIALIZED (SELECT src, dst,
       |    row_number() OVER (ORDER BY score ASC, src ASC, dst ASC) - 1 AS pos FROM scored)
       |SELECT src, dst, pos::double / (SELECT c - 1 FROM cnt) AS score FROM rked""".stripMargin

  /** Mirrors EdgeScores.prefixJaccardScore over att = tri (counts): per-edge best
    * prefix Jaccard via rank-delta events + one cumulative window per edge. */
  def prefixJaccard: String =
    s"""$base,
       |$ejCte,
       |dtri AS MATERIALIZED (SELECT src AS ego, dst AS alter, tri FROM ej
       |  UNION ALL SELECT dst, src, tri FROM ej),
       |rked AS MATERIALIZED (SELECT ego, alter,
       |    rank() OVER (PARTITION BY ego ORDER BY tri DESC) - 1 AS rnk FROM dtri),
       |us AS MATERIALIZED (SELECT e.src, e.dst, r.alter AS x, r.rnk AS ru
       |  FROM ej e JOIN rked r ON r.ego = e.src AND r.alter != e.dst),
       |vs AS MATERIALIZED (SELECT e.src, e.dst, r.alter AS x, r.rnk AS rv
       |  FROM ej e JOIN rked r ON r.ego = e.dst AND r.alter != e.src),
       |mt AS MATERIALIZED (SELECT src, dst, x, us.ru, vs.rv
       |  FROM us FULL JOIN vs USING (src, dst, x)),
       |ev AS MATERIALIZED (
       |  SELECT src, dst, r, sum(du) AS du, sum(dv) AS dv, sum(dc) AS dc FROM (
       |    SELECT src, dst, ru AS r, 1 AS du, 0 AS dv, 0 AS dc FROM mt WHERE ru IS NOT NULL
       |    UNION ALL SELECT src, dst, rv, 0, 1, 0 FROM mt WHERE rv IS NOT NULL
       |    UNION ALL SELECT src, dst, greatest(ru, rv), 0, 0, 1 FROM mt
       |      WHERE ru IS NOT NULL AND rv IS NOT NULL)
       |  GROUP BY 1, 2, 3),
       |cum AS MATERIALIZED (SELECT src, dst,
       |    sum(du) OVER w AS eu, sum(dv) OVER w AS ev2, sum(dc) OVER w AS c
       |  FROM ev WINDOW w AS (PARTITION BY src, dst ORDER BY r
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
       |bj AS MATERIALIZED (SELECT src, dst,
       |    max(c::double / (eu + ev2 - c)) AS score FROM cum GROUP BY 1, 2)
       |SELECT e.src, e.dst, coalesce(bj.score, 0.0) AS score
       |FROM ej e LEFT JOIN bj ON e.src = bj.src AND e.dst = bj.dst""".stripMargin

  /** Mirrors EdgeScores.randomNodeEdgeScore (integer mixture weight, linearized). */
  def randomNodeEdge(rneRatio: Double, seed: Long): String = {
    import GraphSpec.{lcg, M}
    val num = math.round(rneRatio * 100).toInt
    val x = s"(u.src * 1000003 + u.dst + $seed)"
    val draw = s"((${lcg(x)} * ${lcg(s"($x) + 1000003")}) // 65536) % $M"
    s"""$base,
       |$biCte,
       |dg AS MATERIALIZED (SELECT a AS id, count(*) AS d FROM bi GROUP BY a),
       |und AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS src,
       |  greatest(src, dst) AS dst FROM edges),
       |cnt AS MATERIALIZED (SELECT count(*) AS m FROM und),
       |keyed AS MATERIALIZED (
       |  SELECT u.src, u.dst,
       |    (($draw) * 1048576) // ((${100 - num}) * least(du.d, 32768) * least(dv.d, 32768)
       |      + $num * (least(du.d, 32768) + least(dv.d, 32768)) * 16384) AS key
       |  FROM und u JOIN dg du ON u.src = du.id JOIN dg dv ON u.dst = dv.id),
       |rked AS MATERIALIZED (SELECT src, dst,
       |    row_number() OVER (ORDER BY key ASC, src ASC, dst ASC) - 1 AS pos FROM keyed)
       |SELECT src, dst, pos::double / (SELECT m FROM cnt) AS score FROM rked""".stripMargin
  }

  /** Exact diameter of the component containing `start`, on the id % mod induced
    * undirected subgraph (mirrors Distances.diameterExact / iFub semantics): all-source
    * BFS unrolled `levels` deep, then max dist among pairs whose source is connected to
    * `start`. One row (diameter). */
  def diameterExact(mod: Long, start: Long, levels: Int): String = {
    val steps = (1 to levels).map { i =>
      s"""tg$i AS MATERIALIZED (SELECT DISTINCT f.s, sbi.b AS id
         |  FROM tf${i - 1} f JOIN sbi ON f.id = sbi.a),
         |tf$i AS MATERIALIZED (SELECT m.s, m.id, $i AS dist FROM tg$i m
         |  LEFT JOIN ts${i - 1} x ON m.s = x.s AND m.id = x.id WHERE x.s IS NULL),
         |ts$i AS MATERIALIZED (SELECT * FROM ts${i - 1} UNION ALL SELECT * FROM tf$i)""".stripMargin
    }.mkString(",\n")
    s"""$base,
       |sv AS MATERIALIZED (SELECT id FROM verts WHERE id % $mod = 0),
       |se AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
       |  FROM edges WHERE src % $mod = 0 AND dst % $mod = 0),
       |sbi AS MATERIALIZED (SELECT a, b FROM se UNION SELECT b, a FROM se),
       |tf0 AS MATERIALIZED (SELECT id AS s, id, 0 AS dist FROM sv),
       |ts0 AS MATERIALIZED (SELECT * FROM tf0),
       |$steps
       |SELECT CAST(max(t.dist) AS BIGINT) AS diameter
       |FROM ts$levels t JOIN ts$levels c ON c.s = $start AND c.id = t.s""".stripMargin
  }

  /** Exact effective diameter of the component containing `start` on the id % mod
    * induced undirected subgraph (mirrors Distances.effectiveDiameterExact): all-source
    * BFS unrolled `levels` deep, cumulative reach CDF per source, finish hop =
    * greatest(1, min d with cum ≥ ⌈ratio·n_comp⌉). One row (n, sum_hops,
    * eff_diameter). */
  def effectiveDiameterExact(mod: Long, start: Long, levels: Int,
                             ratio: Double): String = {
    val steps = (1 to levels).map { i =>
      s"""tg$i AS MATERIALIZED (SELECT DISTINCT f.s, sbi.b AS id
         |  FROM tf${i - 1} f JOIN sbi ON f.id = sbi.a),
         |tf$i AS MATERIALIZED (SELECT m.s, m.id, $i AS dist FROM tg$i m
         |  LEFT JOIN ts${i - 1} x ON m.s = x.s AND m.id = x.id WHERE x.s IS NULL),
         |ts$i AS MATERIALIZED (SELECT * FROM ts${i - 1} UNION ALL SELECT * FROM tf$i)""".stripMargin
    }.mkString(",\n")
    s"""$base,
       |sv AS MATERIALIZED (SELECT id FROM verts WHERE id % $mod = 0),
       |se AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
       |  FROM edges WHERE src % $mod = 0 AND dst % $mod = 0),
       |sbi AS MATERIALIZED (SELECT a, b FROM se UNION SELECT b, a FROM se),
       |tf0 AS MATERIALIZED (SELECT id AS s, id, 0 AS dist FROM sv),
       |ts0 AS MATERIALIZED (SELECT * FROM tf0),
       |$steps,
       |cmp AS MATERIALIZED (SELECT id FROM ts$levels WHERE s = $start),
       |thr AS MATERIALIZED (SELECT CAST(ceil($ratio * count(*)) AS BIGINT) AS t FROM cmp),
       |cdf AS MATERIALIZED (SELECT s, dist, sum(count(*))
       |    OVER (PARTITION BY s ORDER BY dist) AS cum
       |  FROM ts$levels WHERE s IN (SELECT id FROM cmp) GROUP BY s, dist),
       |hops AS MATERIALIZED (SELECT s, greatest(1, min(dist)) AS hop FROM cdf
       |  WHERE cum >= (SELECT t FROM thr) GROUP BY s)
       |SELECT count(*) AS n, CAST(sum(hop) AS BIGINT) AS sum_hops,
       |  CAST(sum(hop) AS DOUBLE) / count(*) AS eff_diameter FROM hops""".stripMargin
  }

  /** DynBetweennessOneNode twin: COLD (dist, sigma, sigmax) state for sources
    * {id % mod = 0} ∪ {x} on the MUTATED graph (edges + {0, max-id}) — the warm
    * closed-form repair must reproduce it exactly. sigmax(s,t) = σ(s,x)·σ(x,t)
    * iff d(s,x)+d(x,t) = d(s,t) (centrality/DynBetweennessOneNode.cpp:20-160). */
  def dynBetweennessOneNode(mod: Long, x: Long, levels: Int): String = {
    val biDyn =
      s"""adde AS MATERIALIZED (SELECT CAST(0 AS BIGINT) AS a, max(id) AS b FROM verts),
         |bi AS MATERIALIZED (SELECT src AS a, dst AS b FROM edges
         |  UNION SELECT dst, src FROM edges
         |  UNION SELECT a, b FROM adde UNION SELECT b, a FROM adde)""".stripMargin
    s"""$base,
       |$biDyn,
       |${msBfsCtesFrom(
        s"SELECT id AS s, id, 0 AS dist, CAST(1 AS BIGINT) AS sigma\n  FROM verts WHERE id % $mod = 0 OR id = $x",
        levels)},
       |sx AS MATERIALIZED (SELECT s, dist AS dsx, sigma AS ssx FROM st$levels WHERE id = $x),
       |xt AS MATERIALIZED (SELECT id, dist AS dxt, sigma AS sxt FROM st$levels WHERE s = $x)
       |SELECT t.s, t.id, CAST(t.dist AS BIGINT) AS dist, CAST(t.sigma AS BIGINT) AS sigma,
       |  CAST(CASE WHEN sx.dsx IS NOT NULL AND xt.dxt IS NOT NULL
       |            AND sx.dsx + xt.dxt = t.dist
       |       THEN sx.ssx * xt.sxt ELSE 0 END AS BIGINT) AS sigmax
       |FROM st$levels t
       |LEFT JOIN sx ON sx.s = t.s
       |LEFT JOIN xt ON xt.id = t.id""".stripMargin
  }

  /** PivotMDS centering stage on the id % mod subgraph (mirrors
    * GraphViz.pivotMdsCentered): LCG-shuffled pivot choice, per-pivot unrolled BFS,
    * then the double-centered matrix as integer numerators scaled by n·k. */
  def pivotMdsCenter(mod: Long, k: Int, seed: Long, levels: Int): String = {
    import GraphSpec.lcg
    val steps = (1 to levels).map { i =>
      s"""tg$i AS MATERIALIZED (SELECT DISTINCT f.s, sbi.b AS id
         |  FROM tf${i - 1} f JOIN sbi ON f.id = sbi.a),
         |tf$i AS MATERIALIZED (SELECT m.s, m.id, $i AS dist FROM tg$i m
         |  LEFT JOIN ts${i - 1} x ON m.s = x.s AND m.id = x.id WHERE x.s IS NULL),
         |ts$i AS MATERIALIZED (SELECT * FROM ts${i - 1} UNION ALL SELECT * FROM tf$i)""".stripMargin
    }.mkString(",\n")
    s"""$base,
       |sv AS MATERIALIZED (SELECT id FROM verts WHERE id % $mod = 0),
       |n2 AS MATERIALIZED (SELECT count(*) AS n FROM sv),
       |se AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
       |  FROM edges WHERE src % $mod = 0 AND dst % $mod = 0),
       |sbi AS MATERIALIZED (SELECT a, b FROM se UNION SELECT b, a FROM se),
       |piv AS MATERIALIZED (SELECT id FROM sv ORDER BY ${lcg(s"id * 5 + $seed")} ASC, id ASC LIMIT $k),
       |tf0 AS MATERIALIZED (SELECT id AS s, id, 0 AS dist FROM piv),
       |ts0 AS MATERIALIZED (SELECT * FROM tf0),
       |$steps,
       |d AS MATERIALIZED (SELECT s, id, dist FROM ts$levels),
       |rs AS MATERIALIZED (SELECT id, sum(dist) AS rsum FROM d GROUP BY id),
       |cs AS MATERIALIZED (SELECT s, sum(dist) AS csum FROM d GROUP BY s),
       |tot AS MATERIALIZED (SELECT sum(dist) AS t FROM d)
       |SELECT d.s, d.id,
       |  CAST(d.dist * n2.n * $k - rs.rsum * n2.n - cs.csum * $k + tot.t AS BIGINT) AS cnum
       |FROM d JOIN rs USING (id) JOIN cs USING (s) CROSS JOIN tot CROSS JOIN n2""".stripMargin
  }

  /** Shared flow-fixture CTEs: undirected simple subgraph on ids < f with integer
    * caps 1+(u+v)%5 (the SparkEntry.flowFixture twin). */
  private def flowFixtureCte(f: Long): String =
    s"""fx AS MATERIALIZED (SELECT DISTINCT least(src,dst) AS u, greatest(src,dst) AS v
       |  FROM edges WHERE src < $f AND dst < $f),
       |fxw AS MATERIALIZED (SELECT u, v, 1+(u+v)%5 AS w FROM fx)""".stripMargin

  /** Edmonds-Karp twin by min-cut duality: the flow value and the MINIMAL source side
    * are flow-decomposition-independent, so the oracle brute-forces all 2^f source-side
    * subsets (min cut value, then min popcount = the unique residual-reachable side —
    * the min-cut lattice's bottom element). Mirrors EdmondsKarp.cpp:55-115 semantics
    * without replaying augmenting paths. */
  def maxflow(f: Long, s: Long, t: Long): String =
    s"""$base,
       |${flowFixtureCte(f)},
       |masks AS MATERIALIZED (SELECT g AS mask FROM generate_series(0, ${(1L << f) - 1}) s(g)
       |  WHERE ((g>>$s)&1) = 1 AND ((g>>$t)&1) = 0),
       |cuts AS MATERIALIZED (SELECT m.mask,
       |    sum(CASE WHEN ((m.mask>>e.u)&1) <> ((m.mask>>e.v)&1) THEN e.w ELSE 0 END) AS cut
       |  FROM masks m CROSS JOIN fxw e GROUP BY m.mask),
       |best AS (SELECT mask, cut FROM cuts ORDER BY cut ASC, bit_count(mask) ASC, mask ASC LIMIT 1)
       |SELECT v.id, CAST(((b.mask>>v.id)&1) AS BIGINT) AS in_src, CAST(b.cut AS BIGINT) AS flow
       |FROM verts v CROSS JOIN best b WHERE v.id < $f""".stripMargin

  /** CutClustering twin (CutClustering.cpp:16-80): per-node minimal min-cut source
    * sides against the alpha-augmented sink by subset enumeration, then the laminar
    * family's maximal sets labeled by the reference's degree-desc/id-asc creator. */
  def cutClustering(f: Long, alpha: Long): String =
    s"""$base,
       |${flowFixtureCte(f)},
       |fdeg AS MATERIALIZED (SELECT id, count(*) AS d FROM (
       |  SELECT u AS id FROM fx UNION ALL SELECT v FROM fx) GROUP BY id),
       |masks AS MATERIALIZED (SELECT g AS mask FROM generate_series(0, ${(1L << f) - 1}) s(g)),
       |cuts AS MATERIALIZED (SELECT m.mask,
       |    sum(CASE WHEN ((m.mask>>e.u)&1) <> ((m.mask>>e.v)&1) THEN e.w ELSE 0 END)
       |      + $alpha*bit_count(m.mask) AS cut
       |  FROM masks m CROSS JOIN fxw e GROUP BY m.mask),
       |msc AS MATERIALIZED (SELECT u, mask FROM (
       |    SELECT n.id AS u, c.mask,
       |      row_number() OVER (PARTITION BY n.id ORDER BY c.cut ASC, bit_count(c.mask) ASC, c.mask ASC) AS rn
       |    FROM (SELECT id FROM verts WHERE id < $f) n JOIN cuts c ON ((c.mask>>n.id)&1) = 1
       |  ) WHERE rn = 1),
       |sets AS MATERIALIZED (SELECT DISTINCT mask FROM msc),
       |maximal AS MATERIALIZED (SELECT mask FROM sets s
       |  WHERE NOT EXISTS (SELECT 1 FROM sets o WHERE o.mask <> s.mask AND (s.mask | o.mask) = o.mask)),
       |creators AS MATERIALIZED (SELECT m.mask,
       |    (SELECT x.u FROM msc x JOIN fdeg d ON x.u = d.id WHERE x.mask = m.mask
       |     ORDER BY d.d DESC, x.u ASC LIMIT 1) AS label
       |  FROM maximal m)
       |SELECT v.id, CAST(c.label AS BIGINT) AS cluster
       |FROM (SELECT id FROM verts WHERE id < $f) v JOIN creators c ON ((c.mask>>v.id)&1) = 1""".stripMargin

  /** Strongly connected components with min-node-id labels on the id % mod induced
    * DIRECTED subgraph (mirrors Scc.run): scc(v) = least(v, min u mutually reachable
    * with v), via a recursive reachability closure (pure DISTINCT union — no
    * aggregation inside the recursion, which DuckDB allows). */
  def scc(mod: Long): String =
    s"""WITH RECURSIVE ${GraphSpec.duckEdgeCte()},
       |sv AS MATERIALIZED (SELECT id FROM verts WHERE id % $mod = 0),
       |se AS MATERIALIZED (SELECT src, dst FROM edges
       |  WHERE src % $mod = 0 AND dst % $mod = 0),
       |reach(s, d) AS (
       |  SELECT src AS s, dst AS d FROM se
       |  UNION
       |  SELECT r.s, e.dst AS d FROM reach r JOIN se e ON r.d = e.src),
       |mutual AS (SELECT r1.s AS u, r1.d AS v FROM reach r1
       |  JOIN reach r2 ON r1.s = r2.d AND r1.d = r2.s)
       |SELECT v.id, CAST(least(v.id, coalesce(m.mn, v.id)) AS BIGINT) AS scc
       |FROM sv v LEFT JOIN (SELECT v AS id, min(u) AS mn FROM mutual GROUP BY v) m
       |  ON v.id = m.id""".stripMargin

  /** Katz index on distance-2 non-adjacent candidates, u % uMod == 0 (mirrors
    * LinkPredEval.katzScores at maxPathLength = 3, beta = 1/betaDen): exact int64
    * walk counts per level, exact integer numerator in beta^3 units. */
  def katz(uMod: Long, betaDen: Long): String = {
    val (b1, b2, b3) = (betaDen * betaDen, betaDen, 1L)
    s"""$base,
       |$biCte,
       |c1 AS MATERIALIZED (SELECT a AS s, b AS id, CAST(1 AS BIGINT) AS c FROM bi WHERE a % $uMod = 0),
       |c2 AS MATERIALIZED (SELECT c1.s, bi.b AS id, CAST(sum(c1.c) AS BIGINT) AS c
       |  FROM c1 JOIN bi ON c1.id = bi.a GROUP BY 1, 2),
       |c3 AS MATERIALIZED (SELECT c2.s, bi.b AS id, CAST(sum(c2.c) AS BIGINT) AS c
       |  FROM c2 JOIN bi ON c2.id = bi.a GROUP BY 1, 2),
       |ev AS MATERIALIZED (
       |  SELECT s AS u, id AS v, c AS k1, CAST(0 AS BIGINT) AS k2, CAST(0 AS BIGINT) AS k3 FROM c1
       |  UNION ALL SELECT s, id, 0, c, 0 FROM c2
       |  UNION ALL SELECT s, id, 0, 0, c FROM c3),
       |agg AS MATERIALIZED (SELECT u, v, CAST(sum(k1) AS BIGINT) AS k1,
       |  CAST(sum(k2) AS BIGINT) AS k2, CAST(sum(k3) AS BIGINT) AS k3
       |  FROM ev GROUP BY u, v)
       |SELECT u, v, CAST(k1 * $b1 + k2 * $b2 + k3 * $b3 AS BIGINT) AS katz_num
       |FROM agg WHERE u < v AND k1 = 0 AND k2 > 0""".stripMargin
  }

  /** End-to-end link-prediction evaluation (mirrors LinkPredEval.run): LCG holdout
    * split -> ResourceAllocation on the training graph's distance-2 candidates ->
    * cumulative confusion counts at the percentile rank thresholds. */
  def linkpredEval(trainRatio: Double, uMod: Long, numThresholds: Int, seed: Long): String = {
    import GraphSpec.{lcg, M}
    val x = s"(u.src * 1000003 + u.dst + $seed)"
    val draw = s"(((${lcg(x)} * ${lcg(s"($x) + 1000003")}) // 65536) % $M)"
    s"""$base,
       |und AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS src, greatest(src, dst) AS dst FROM edges),
       |cm AS MATERIALIZED (SELECT count(*) AS m FROM und),
       |rked AS MATERIALIZED (SELECT u.src, u.dst,
       |  row_number() OVER (ORDER BY ($draw) ASC, u.src ASC, u.dst ASC) - 1 AS pos FROM und u),
       |ho AS MATERIALIZED (SELECT src, dst FROM rked
       |  WHERE pos < (SELECT CAST(m - floor($trainRatio * m) AS BIGINT) FROM cm)),
       |tr AS MATERIALIZED (SELECT src, dst FROM rked
       |  WHERE pos >= (SELECT CAST(m - floor($trainRatio * m) AS BIGINT) FROM cm)),
       |tbi AS MATERIALIZED (SELECT src AS a, dst AS b FROM tr UNION ALL SELECT dst, src FROM tr),
       |dg AS MATERIALIZED (SELECT a AS id, count(*) AS deg FROM tbi GROUP BY a),
       |wu AS MATERIALIZED (SELECT a AS z, b AS u FROM tbi WHERE b % $uMod = 0),
       |pairs AS MATERIALIZED (
       |  SELECT wu.u, wv.b AS v, round(sum(1.0 / dg.deg), 7) AS ra
       |  FROM wu JOIN tbi wv ON wu.z = wv.a JOIN dg ON wu.z = dg.id
       |  WHERE wu.u < wv.b GROUP BY 1, 2),
       |cand AS MATERIALIZED (
       |  SELECT p.* FROM pairs p LEFT JOIN tr e ON e.src = p.u AND e.dst = p.v
       |  WHERE e.src IS NULL),
       |flg AS MATERIALIZED (
       |  SELECT c.u, c.v, c.ra, (h.src IS NOT NULL) AS pos,
       |    row_number() OVER (ORDER BY c.ra DESC, c.u ASC, c.v ASC) - 1 AS rnk
       |  FROM cand c LEFT JOIN ho h ON h.src = c.u AND h.dst = c.v),
       |np AS MATERIALIZED (SELECT count(*) AS n,
       |  CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS npos FROM flg),
       |thr AS MATERIALIZED (SELECT DISTINCT
       |    CAST(ceil((np.n * t.i) / ${(numThresholds - 1).toDouble}) AS BIGINT) AS thr
       |  FROM generate_series(0, ${numThresholds - 1}) t(i) CROSS JOIN np),
       |cnts AS MATERIALIZED (SELECT t.thr,
       |    CAST(coalesce(sum(CASE WHEN f.pos THEN 1 ELSE 0 END), 0) AS BIGINT) AS tp,
       |    CAST(coalesce(sum(CASE WHEN NOT f.pos THEN 1 ELSE 0 END), 0) AS BIGINT) AS fp
       |  FROM thr t LEFT JOIN flg f ON f.rnk < t.thr GROUP BY t.thr)
       |SELECT c.thr, c.tp, c.fp,
       |  CAST(np.npos - c.tp AS BIGINT) AS fn,
       |  CAST((np.n - np.npos) - c.fp AS BIGINT) AS tn,
       |  CASE WHEN np.npos = 0 THEN 0.0 ELSE c.tp::double / np.npos END AS tpr,
       |  CASE WHEN np.n - np.npos = 0 THEN 0.0 ELSE c.fp::double / (np.n - np.npos) END AS fpr,
       |  CASE WHEN c.tp + c.fp = 0 THEN 1.0 ELSE c.tp::double / (c.tp + c.fp) END AS "precision",
       |  CASE WHEN c.tp + (np.npos - c.tp) = 0 THEN 1.0
       |       ELSE c.tp::double / (c.tp + (np.npos - c.tp)) END AS recall
       |FROM cnts c CROSS JOIN np""".stripMargin
  }

  /** PageRankNibble sweep table (mirrors Scd.approximatePageRank at `rounds` fixed
    * batched push rounds + Scd.sweep): exact scaled-integer APR state, then the
    * integer conductance-sweep columns (rank, id, p, vol, cum_vol, cut, denom). */
  def prNibbleSweep(seed: Long, rounds: Int, aNum: Long = 15L, aDen: Long = 100L,
                    eNum: Long = 1L, eDen: Long = 10000L,
                    scale: Long = 1000000000000L): String = {
    val steps = (1 to rounds).map { i =>
      s"""act$i AS MATERIALIZED (SELECT id, res, vol FROM s${i - 1}
         |  WHERE res * $eDen >= vol * $eNum * $scale),
         |msg$i AS MATERIALIZED (SELECT biw.b AS id,
         |    CAST(sum(((${aDen - aNum} * a.res) * biw.w) // (${2 * aDen} * a.vol)) AS BIGINT) AS m
         |  FROM biw JOIN act$i a ON biw.a = a.id GROUP BY biw.b),
         |s$i AS MATERIALIZED (
         |  SELECT s.id,
         |    CAST(s.p + CASE WHEN a.id IS NOT NULL THEN ($aNum * s.res) // $aDen ELSE 0 END AS BIGINT) AS p,
         |    CAST(CASE WHEN a.id IS NOT NULL THEN (${aDen - aNum} * s.res) // ${2 * aDen} ELSE s.res END
         |      + coalesce(m.m, 0) AS BIGINT) AS res,
         |    s.vol
         |  FROM s${i - 1} s LEFT JOIN act$i a ON s.id = a.id LEFT JOIN msg$i m ON s.id = m.id
         |  UNION ALL
         |  SELECT m.id, CAST(0 AS BIGINT), m.m, v.vol
         |  FROM msg$i m LEFT JOIN s${i - 1} s ON m.id = s.id JOIN vl v ON m.id = v.id
         |  WHERE s.id IS NULL)""".stripMargin
    }.mkString(",\n")
    s"""$base,
       |und AS MATERIALIZED (SELECT least(src, dst) AS s, greatest(src, dst) AS t, count(*) AS w
       |  FROM edges GROUP BY 1, 2),
       |biw AS MATERIALIZED (SELECT s AS a, t AS b, w FROM und UNION ALL SELECT t, s, w FROM und),
       |vl AS MATERIALIZED (SELECT a AS id, CAST(sum(w) AS BIGINT) AS vol FROM biw GROUP BY a),
       |tot AS MATERIALIZED (SELECT CAST(2 * sum(w) AS BIGINT) AS tv FROM und),
       |s0 AS MATERIALIZED (SELECT id, CAST(0 AS BIGINT) AS p, CAST($scale AS BIGINT) AS res, vol
       |  FROM vl WHERE id = $seed),
       |$steps,
       |sup AS MATERIALIZED (SELECT id, p, vol, (p * 1000000) // vol AS score
       |  FROM s$rounds WHERE p > 0 OR res > 0),
       |rkd AS MATERIALIZED (SELECT id, p, vol, score,
       |  row_number() OVER (ORDER BY score DESC, id ASC) - 1 AS srank FROM sup),
       |cum AS MATERIALIZED (SELECT *,
       |  CAST(sum(vol) OVER (ORDER BY srank ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_vol
       |  FROM rkd),
       |ev AS MATERIALIZED (SELECT greatest(ra.srank, rb.srank) AS erank, CAST(sum(und.w) AS BIGINT) AS wsum
       |  FROM und JOIN rkd ra ON und.s = ra.id JOIN rkd rb ON und.t = rb.id
       |  GROUP BY 1),
       |swp AS MATERIALIZED (SELECT c.srank, c.id, c.p, c.vol, c.cum_vol,
       |  CAST(sum(coalesce(ev.wsum, 0)) OVER (ORDER BY c.srank ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_intra
       |  FROM cum c LEFT JOIN ev ON c.srank = ev.erank)
       |SELECT srank AS "rank", id, p, vol, cum_vol,
       |  CAST(cum_vol - 2 * cum_intra AS BIGINT) AS cut,
       |  CAST(least(cum_vol, (SELECT tv FROM tot) - cum_vol) AS BIGINT) AS denom
       |FROM swp""".stripMargin
  }

  // --- partition-evaluation family (mirrors graft.algo.PartitionEval over PLP labels) ---

  /** Intra-cluster labeled edge view + per-cluster size, shared CTE block. */
  private def partitionEvalCtes(rounds: Int): String =
    s"""le AS MATERIALIZED (SELECT und.s, und.t, und.w, a.label AS lsrc, b.label AS ldst
       |  FROM und JOIN p$rounds a ON und.s = a.id JOIN p$rounds b ON und.t = b.id),
       |sz AS MATERIALIZED (SELECT label, count(*) AS size FROM p$rounds GROUP BY label)""".stripMargin

  /** Mirrors PartitionEval.hubDominance over PLP labels at `rounds`. */
  def hubDominance(rounds: Int): String =
    s"""$base,
       |$biCte,
       |${plpSteps(rounds)},
       |$undDegCte,
       |${partitionEvalCtes(rounds)},
       |intra AS MATERIALIZED (SELECT s, t, lsrc AS label FROM le WHERE lsrc = ldst),
       |internal AS MATERIALIZED (SELECT id, label, count(*) AS ideg FROM
       |  (SELECT s AS id, label FROM intra UNION ALL SELECT t, label FROM intra)
       |  GROUP BY id, label),
       |mx AS MATERIALIZED (SELECT label, max(ideg) AS m FROM internal GROUP BY label)
       |SELECT sz.label, CAST(sz.size AS BIGINT) AS size,
       |  CAST(coalesce(mx.m, 0) AS BIGINT) AS max_internal_deg,
       |  CASE WHEN sz.size <= 1 THEN 1.0
       |       ELSE coalesce(mx.m, 0)::double / (sz.size - 1) END AS dominance
       |FROM sz LEFT JOIN mx ON sz.label = mx.label""".stripMargin

  /** Mirrors PartitionEval.intrapartitionDensity over PLP labels at `rounds`. */
  def intrapartitionDensity(rounds: Int): String =
    s"""$base,
       |$biCte,
       |${plpSteps(rounds)},
       |$undDegCte,
       |${partitionEvalCtes(rounds)},
       |intra AS MATERIALIZED (SELECT lsrc AS label, count(*) AS ie FROM le
       |  WHERE lsrc = ldst GROUP BY lsrc)
       |SELECT sz.label, CAST(sz.size AS BIGINT) AS size,
       |  CAST(coalesce(intra.ie, 0) AS BIGINT) AS intra_edges,
       |  CASE WHEN sz.size * (sz.size - 1) / 2 = 0 THEN 1.0
       |       ELSE coalesce(intra.ie, 0)::double / (sz.size * (sz.size - 1) / 2) END AS density
       |FROM sz LEFT JOIN intra ON sz.label = intra.label""".stripMargin

  /** Mirrors PartitionEval.isolatedInterpartition over PLP labels at `rounds`. */
  def isolatedInterpartition(rounds: Int): String =
    s"""$base,
       |$biCte,
       |${plpSteps(rounds)},
       |$undDegCte,
       |${partitionEvalCtes(rounds)},
       |tot AS MATERIALIZED (SELECT sum(w) AS w_all FROM le),
       |nv AS MATERIALIZED (SELECT count(*) AS n_all FROM p$rounds),
       |cutp AS MATERIALIZED (SELECT label, CAST(sum(w) AS BIGINT) AS cut FROM
       |  (SELECT lsrc AS label, w FROM le WHERE lsrc != ldst
       |   UNION ALL SELECT ldst, w FROM le WHERE lsrc != ldst) GROUP BY label),
       |vol AS MATERIALIZED (SELECT label, CAST(sum(w) AS BIGINT) AS vol FROM
       |  (SELECT lsrc AS label, w FROM le UNION ALL SELECT ldst, w FROM le) GROUP BY label)
       |SELECT sz.label, CAST(sz.size AS BIGINT) AS size,
       |  coalesce(vol.vol, 0) AS vol, coalesce(cutp.cut, 0) AS cut,
       |  CASE WHEN least(coalesce(vol.vol, 0), 2 * tot.w_all - coalesce(vol.vol, 0)) <= 0 THEN 0.0
       |       ELSE coalesce(cutp.cut, 0)::double /
       |            least(coalesce(vol.vol, 0), 2 * tot.w_all - coalesce(vol.vol, 0)) END AS conductance,
       |  CASE WHEN least(sz.size, nv.n_all - sz.size) <= 0 THEN 0.0
       |       ELSE coalesce(cutp.cut, 0)::double /
       |            least(sz.size, nv.n_all - sz.size) END AS expansion
       |FROM sz LEFT JOIN vol ON sz.label = vol.label
       |LEFT JOIN cutp ON sz.label = cutp.label
       |CROSS JOIN tot CROSS JOIN nv""".stripMargin

  /** Mirrors PartitionEval.fragmentation over PLP labels at `rounds` with connected
    * components at `ccRounds` unrolled min-label rounds. */
  def fragmentation(rounds: Int, ccRounds: Int = 12): String =
    s"""$base,
       |$biCte,
       |${plpSteps(rounds)},
       |${ccSteps(ccRounds)},
       |sz AS MATERIALIZED (SELECT label, count(*) AS size FROM p$rounds GROUP BY label),
       |piece AS MATERIALIZED (SELECT p.label, c.label AS comp, count(*) AS piece
       |  FROM p$rounds p JOIN l$ccRounds c ON p.id = c.id GROUP BY 1, 2),
       |mx AS MATERIALIZED (SELECT label, max(piece) AS max_piece FROM piece GROUP BY label)
       |SELECT sz.label, CAST(sz.size AS BIGINT) AS size,
       |  CAST(coalesce(mx.max_piece, 0) AS BIGINT) AS max_piece,
       |  1.0 - coalesce(mx.max_piece, 0)::double / sz.size AS fragmentation
       |FROM sz LEFT JOIN mx ON sz.label = mx.label""".stripMargin

  /** Mirrors PartitionEval.stablePartitionNodes over PLP labels at `rounds`. */
  def stablePartitionNodes(rounds: Int): String =
    s"""$base,
       |$biCte,
       |${plpSteps(rounds)},
       |$undDegCte,
       |biw AS MATERIALIZED (SELECT s AS a, t AS b, w FROM und UNION ALL SELECT t, s, w FROM und),
       |lw AS MATERIALIZED (SELECT biw.a AS id, pa.label AS label, pb.label AS nl,
       |    CAST(sum(biw.w) AS BIGINT) AS w
       |  FROM biw JOIN p$rounds pa ON biw.a = pa.id JOIN p$rounds pb ON biw.b = pb.id
       |  GROUP BY 1, 2, 3),
       |own AS MATERIALIZED (SELECT id, w AS own FROM lw WHERE nl = label),
       |fm AS MATERIALIZED (SELECT id, max(w) AS fmax FROM lw WHERE nl != label GROUP BY id),
       |dgn AS MATERIALIZED (SELECT DISTINCT id FROM lw),
       |st AS MATERIALIZED (SELECT p.id, p.label,
       |  CASE WHEN dgn.id IS NULL THEN true
       |       WHEN coalesce(own.own, 0) > 0 AND coalesce(fm.fmax, 0) < coalesce(own.own, 0)
       |         THEN true ELSE false END AS stable
       |  FROM p$rounds p LEFT JOIN dgn ON p.id = dgn.id
       |  LEFT JOIN own ON p.id = own.id LEFT JOIN fm ON p.id = fm.id)
       |SELECT label, CAST(count(*) AS BIGINT) AS size,
       |  CAST(sum(CASE WHEN stable THEN 1 ELSE 0 END) AS BIGINT) AS stable,
       |  sum(CASE WHEN stable THEN 1 ELSE 0 END)::double / count(*) AS stable_frac
       |FROM st GROUP BY label""".stripMargin

  /** Mirrors Profile.run: one exact-integer network summary row (profiling battery). */
  def graphProfile(ccRounds: Int): String =
    s"""$base,
       |$biCte,
       |${ccSteps(ccRounds)},
       |od AS MATERIALIZED (SELECT src AS id, count(*) AS od FROM edges GROUP BY src),
       |idg AS MATERIALIZED (SELECT dst AS id, count(*) AS idg FROM edges GROUP BY dst),
       |dg AS MATERIALIZED (SELECT v.id, coalesce(od.od, 0) AS od, coalesce(idg.idg, 0) AS idg
       |  FROM verts v LEFT JOIN od ON v.id = od.id LEFT JOIN idg ON v.id = idg.id),
       |ds AS MATERIALIZED (SELECT CAST(max(od) AS BIGINT) AS max_out_deg,
       |    CAST(max(idg) AS BIGINT) AS max_in_deg,
       |    CAST(sum(CASE WHEN od = 0 THEN 1 ELSE 0 END) AS BIGINT) AS dangling,
       |    CAST(sum(CASE WHEN od = 0 AND idg = 0 THEN 1 ELSE 0 END) AS BIGINT) AS isolated
       |  FROM dg),
       |rp AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS reciprocal_pairs
       |  FROM edges e JOIN edges r ON e.src = r.dst AND e.dst = r.src
       |  WHERE e.src < e.dst),
       |cp AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n_components,
       |    CAST(max(sz) AS BIGINT) AS max_component
       |  FROM (SELECT label, count(*) AS sz FROM l$ccRounds GROUP BY label)),
       |mu AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS m_und
       |  FROM (SELECT DISTINCT least(src, dst), greatest(src, dst) FROM edges)),
       |nm AS MATERIALIZED (SELECT CAST((SELECT n FROM nn) AS BIGINT) AS n,
       |    CAST(count(*) AS BIGINT) AS m FROM edges)
       |SELECT nm.n, nm.m, mu.m_und,
       |  nm.m::double / (nm.n::double * (nm.n - 1)::double) AS density,
       |  ds.max_out_deg, ds.max_in_deg, ds.dangling, ds.isolated,
       |  rp.reciprocal_pairs, cp.n_components, cp.max_component
       |FROM nm, mu, ds, rp, cp""".stripMargin

  /** Local-max matching round CTEs over `${p}r0(src,dst,w)`: after `rounds` rounds,
    * `${p}a$rounds` holds the matched pairs. Shared by the matching oracle and the
    * agglomerative clusterer's per-level matchings. */
  private def matchSteps(p: String, rounds: Int): String = (1 to rounds).map { i =>
    s"""${p}b$i AS MATERIALIZED (SELECT x, src, dst FROM (
       |  SELECT x, src, dst, row_number() OVER (PARTITION BY x ORDER BY w DESC, src, dst) AS rn
       |  FROM (SELECT src AS x, src, dst, w FROM ${p}r${i - 1}
       |        UNION ALL SELECT dst, src, dst, w FROM ${p}r${i - 1})) WHERE rn = 1),
       |${p}t$i AS MATERIALIZED (SELECT r.src, r.dst, r.w FROM ${p}r${i - 1} r
       |  JOIN ${p}b$i a ON a.x = r.src AND a.src = r.src AND a.dst = r.dst
       |  JOIN ${p}b$i b ON b.x = r.dst AND b.src = r.src AND b.dst = r.dst),
       |${p}n$i AS MATERIALIZED (SELECT src AS id FROM ${p}t$i UNION SELECT dst FROM ${p}t$i),
       |${p}r$i AS MATERIALIZED (SELECT r.src, r.dst, r.w FROM ${p}r${i - 1} r
       |  LEFT JOIN ${p}n$i na ON r.src = na.id LEFT JOIN ${p}n$i nb ON r.dst = nb.id
       |  WHERE na.id IS NULL AND nb.id IS NULL),
       |${p}a$i AS MATERIALIZED (SELECT src, dst, w FROM ${p}a${i - 1} UNION ALL SELECT src, dst, w FROM ${p}t$i)""".stripMargin
  }.mkString(",\n")

  /** Mirrors Matching.localMaxMatching: `rounds` rounds of mutual-dominant-edge
    * matching under the strict total order (w DESC, src, dst),
    * w = 1 + (src+dst) % 5. */
  def localMaxMatching(rounds: Int): String =
    s"""$base,
       |mr0 AS MATERIALIZED (SELECT src, dst, 1 + (src + dst) % 5 AS w FROM (
       |  SELECT DISTINCT least(src, dst) AS src, greatest(src, dst) AS dst FROM edges)),
       |ma0 AS MATERIALIZED (SELECT src, dst, w FROM mr0 WHERE 1 = 0),
       |${matchSteps("m", rounds)}
       |SELECT src, dst, CAST(w AS BIGINT) AS w FROM ma$rounds""".stripMargin

  /** PathGrowingMatcher pointer-forest twin (mirrors Matching.pathGrowingMatching):
    * heaviest-pointer + best-incoming acceptance → max-degree-2 path forest, pointer
    * doubling (`doublingRounds` unrolled, covering paths up to 2^rounds long) for
    * (anchor, depth), depth-parity 2-coloring, heavier parity per component. */
  def pathGrowingMatching(doublingRounds: Int): String = {
    val steps = (1 to doublingRounds).map { i =>
      s"""ds$i AS MATERIALIZED (SELECT s.id,
         |  CASE WHEN s.fin THEN s.t ELSE h.t END AS t,
         |  CASE WHEN s.fin THEN s.d ELSE s.d + h.d END AS d,
         |  CASE WHEN s.fin THEN s.fin ELSE h.fin END AS fin
         |  FROM ds${i - 1} s LEFT JOIN ds${i - 1} h ON s.t = h.id)""".stripMargin
    }.mkString(",\n")
    s"""$base,
       |pge AS MATERIALIZED (SELECT src, dst, 1 + (src + dst) % 5 AS w FROM (
       |  SELECT DISTINCT least(src, dst) AS src, greatest(src, dst) AS dst FROM edges)),
       |pinc AS MATERIALIZED (SELECT src AS x, dst AS y, w FROM pge
       |  UNION ALL SELECT dst, src, w FROM pge),
       |pptr AS MATERIALIZED (SELECT x, y, w FROM (
       |  SELECT x, y, w, row_number() OVER (PARTITION BY x ORDER BY w DESC, y ASC) AS rn
       |  FROM pinc) WHERE rn = 1),
       |pacc AS MATERIALIZED (SELECT y, x AS accx FROM (
       |  SELECT y, x, row_number() OVER (PARTITION BY y ORDER BY w DESC, x ASC) AS rn
       |  FROM pptr) WHERE rn = 1),
       |psed AS MATERIALIZED (SELECT p.x, p.y, p.w FROM pptr p
       |  JOIN pacc a ON p.y = a.y AND p.x = a.accx),
       |pmut AS MATERIALIZED (SELECT p.x AS id FROM pptr p
       |  JOIN pptr q ON p.y = q.x AND q.y = p.x),
       |panch AS MATERIALIZED (SELECT x AS id FROM pptr
       |  WHERE x NOT IN (SELECT x FROM psed)
       |  UNION SELECT id FROM pmut),
       |pac AS MATERIALIZED (SELECT a.id,
       |  CASE WHEN a.id IN (SELECT id FROM pmut) THEN least(a.id, p.y)
       |       ELSE a.id END AS comp
       |  FROM panch a JOIN pptr p ON a.id = p.x),
       |ds0 AS MATERIALIZED (SELECT p.x AS id,
       |  CASE WHEN p.x IN (SELECT id FROM panch) THEN p.x ELSE p.y END AS t,
       |  CAST(CASE WHEN p.x IN (SELECT id FROM panch) THEN 0 ELSE 1 END AS BIGINT) AS d,
       |  (p.x IN (SELECT id FROM panch)) AS fin
       |  FROM pptr p),
       |$steps,
       |pedg AS MATERIALIZED (SELECT DISTINCT least(s.x, s.y) AS src,
       |  greatest(s.x, s.y) AS dst, s.w, c.comp, d.d % 2 AS parity
       |  FROM psed s
       |  JOIN ds$doublingRounds d ON s.x = d.id
       |  JOIN pac c ON d.t = c.id),
       |ppick AS MATERIALIZED (SELECT comp, parity FROM (
       |  SELECT comp, parity,
       |    row_number() OVER (PARTITION BY comp ORDER BY pw DESC, parity ASC) AS rn
       |  FROM (SELECT comp, parity, sum(w) AS pw FROM pedg GROUP BY 1, 2)) WHERE rn = 1)
       |SELECT e.src, e.dst, CAST(e.w AS BIGINT) AS w
       |FROM pedg e JOIN ppick k ON e.comp = k.comp AND e.parity = k.parity""".stripMargin
  }

  /** Matched-pair partition CTEs (mpart(id, label)) from `rounds` local-max rounds —
    * shared by the MatchingCoarsening and ClusteringProjector oracles. */
  private def matchingPartitionCtes(rounds: Int): String =
    s"""mr0 AS MATERIALIZED (SELECT src, dst, 1 + (src + dst) % 5 AS w FROM (
       |  SELECT DISTINCT least(src, dst) AS src, greatest(src, dst) AS dst FROM edges)),
       |ma0 AS MATERIALIZED (SELECT src, dst, w FROM mr0 WHERE 1 = 0),
       |${matchSteps("m", rounds)},
       |mpart AS MATERIALIZED (SELECT v.id, coalesce(m.nc, v.id) AS label FROM verts v
       |  LEFT JOIN (SELECT src AS c, src AS nc FROM ma$rounds
       |             UNION ALL SELECT dst, src FROM ma$rounds) m ON v.id = m.c)""".stripMargin

  /** MatchingCoarsening (mirrors Coarsening.matchingCoarsening over
    * localMaxMatching(rounds)): coarse weighted edges (a, b, w). */
  def matchingCoarsen(rounds: Int): String =
    s"""$base,
       |${matchingPartitionCtes(rounds)},
       |cund AS MATERIALIZED (SELECT least(src, dst) AS s, greatest(src, dst) AS t, count(*) AS w
       |  FROM edges GROUP BY 1, 2)
       |SELECT least(ls.label, ld.label) AS a, greatest(ls.label, ld.label) AS b,
       |  CAST(sum(cund.w) AS BIGINT) AS w
       |FROM cund JOIN mpart ls ON cund.s = ls.id JOIN mpart ld ON cund.t = ld.id
       |GROUP BY 1, 2""".stripMargin

  /** ClusteringProjector.projectBack through the matching map, coarse labels =
    * coarse id % 10 (mirrors the q_project_back composition). */
  def projectBack(rounds: Int): String =
    s"""$base,
       |${matchingPartitionCtes(rounds)}
       |SELECT id, CAST(label % 10 AS BIGINT) AS label FROM mpart""".stripMargin

  /** Mirrors Agglomerative.runFixed: `levels` agglomeration levels, each =
    * cleared-denominator modularity scoring (2·W·w − vol·vol, self-loops in vol
    * twice) + `matchRounds` local-max rounds + matched-pair contraction to the min
    * endpoint. Output (id, label) on the original vertex set. */
  def pac(levels: Int, matchRounds: Int): String = {
    val lvls = (1 to levels).map { l =>
      val p = s"g${l}"
      s"""${p}w AS MATERIALIZED (SELECT sum(w) AS tw FROM ge${l - 1}),
         |${p}v AS MATERIALIZED (SELECT id, sum(wc) AS vol FROM (
         |  SELECT s AS id, CASE WHEN s = t THEN 2*w ELSE w END AS wc FROM ge${l - 1}
         |  UNION ALL SELECT t, w FROM ge${l - 1} WHERE s != t) GROUP BY id),
         |${p}r0 AS MATERIALIZED (SELECT src, dst, w FROM (
         |  SELECT e.s AS src, e.t AS dst,
         |    2*(SELECT tw FROM ${p}w)*e.w - vs.vol*vt.vol AS w
         |  FROM ge${l - 1} e JOIN ${p}v vs ON e.s = vs.id JOIN ${p}v vt ON e.t = vt.id
         |  WHERE e.s != e.t) WHERE w > 0),
         |${p}a0 AS MATERIALIZED (SELECT src, dst, w FROM ${p}r0 WHERE 1 = 0),
         |${matchSteps(p, matchRounds)},
         |${p}m AS MATERIALIZED (
         |  SELECT src AS c, least(src, dst) AS nc FROM ${p}a$matchRounds
         |  UNION ALL SELECT dst, least(src, dst) FROM ${p}a$matchRounds),
         |gl$l AS MATERIALIZED (SELECT x.id, coalesce(m.nc, x.label) AS label
         |  FROM gl${l - 1} x LEFT JOIN ${p}m m ON x.label = m.c),
         |ge$l AS MATERIALIZED (SELECT least(cs, ct) AS s, greatest(cs, ct) AS t,
         |    CAST(sum(w) AS BIGINT) AS w
         |  FROM (SELECT coalesce(ms.nc, e.s) AS cs, coalesce(mt2.nc, e.t) AS ct, e.w
         |        FROM ge${l - 1} e LEFT JOIN ${p}m ms ON e.s = ms.c
         |        LEFT JOIN ${p}m mt2 ON e.t = mt2.c)
         |  GROUP BY 1, 2)""".stripMargin
    }.mkString(",\n")
    s"""$base,
       |ge0 AS MATERIALIZED (SELECT least(src, dst) AS s, greatest(src, dst) AS t,
       |  CAST(count(*) AS BIGINT) AS w FROM edges GROUP BY 1, 2),
       |gl0 AS MATERIALIZED (SELECT id, id AS label FROM verts),
       |$lvls
       |SELECT id, label FROM gl$levels""".stripMargin
  }

  /** Mirrors IndependentSet.lubyFixed: `rounds` Luby rounds with the deterministic
    * nonlinear-LCG draw on (id, round, seed) and exact-integer membership test
    * draw < M // (2·wdeg); ties in the conflict resolution drop the canonical-second
    * endpoint. */
  def luby(rounds: Int, seed: Long): String = {
    import graft.synth.GraphSpec.{lcg, M}
    val steps = (1 to rounds).map { i =>
      val x = s"(id * 1000003 + $i * 7919 + $seed)"
      val draw = s"(((${lcg(x)} * ${lcg(s"($x) + 1000003")}) // 65536) % $M)"
      s"""iw$i AS MATERIALIZED (SELECT a.id, coalesce(d.wd, 0) AS wd FROM ia${i - 1} a
         |  LEFT JOIN (SELECT id, sum(w) AS wd FROM (
         |    SELECT s AS id, w FROM ie${i - 1} UNION ALL SELECT t, w FROM ie${i - 1})
         |    GROUP BY id) d ON a.id = d.id),
         |is$i AS MATERIALIZED (SELECT id, wd FROM iw$i
         |  WHERE wd = 0 OR $draw < ($M // (2 * wd))),
         |il$i AS MATERIALIZED (SELECT DISTINCT CASE WHEN su.wd >= sv.wd THEN e.t ELSE e.s END AS id
         |  FROM ie${i - 1} e JOIN is$i su ON e.s = su.id JOIN is$i sv ON e.t = sv.id),
         |ip$i AS MATERIALIZED (SELECT s.id FROM is$i s LEFT JOIN il$i l ON s.id = l.id
         |  WHERE l.id IS NULL),
         |im$i AS MATERIALIZED (SELECT id FROM im${i - 1} UNION ALL SELECT id FROM ip$i),
         |ir$i AS MATERIALIZED (SELECT id FROM ip$i
         |  UNION SELECT e.t FROM ie${i - 1} e JOIN ip$i s ON e.s = s.id
         |  UNION SELECT e.s FROM ie${i - 1} e JOIN ip$i s ON e.t = s.id),
         |ia$i AS MATERIALIZED (SELECT a.id FROM ia${i - 1} a LEFT JOIN ir$i r ON a.id = r.id
         |  WHERE r.id IS NULL),
         |ie$i AS MATERIALIZED (SELECT e.s, e.t, e.w FROM ie${i - 1} e
         |  JOIN ia$i x ON e.s = x.id JOIN ia$i y ON e.t = y.id)""".stripMargin
    }.mkString(",\n")
    s"""$base,
       |ie0 AS MATERIALIZED (SELECT least(src, dst) AS s, greatest(src, dst) AS t, count(*) AS w
       |  FROM edges GROUP BY 1, 2),
       |ia0 AS MATERIALIZED (SELECT id FROM verts),
       |im0 AS MATERIALIZED (SELECT id FROM verts WHERE 1 = 0),
       |$steps
       |SELECT id FROM im$rounds""".stripMargin
  }

  /** Mirrors Forest.spanningForest: min-label CC (`ccRounds`, converged) for the
    * per-component min-id roots, multi-source BFS unrolled `levels` deep, then
    * parent(v) = min neighbor one level closer. */
  def spanningForest(ccRounds: Int, levels: Int): String = {
    val steps = (1 to levels).map { i =>
      s"""fg$i AS MATERIALIZED (SELECT DISTINCT bi.b AS id FROM ff${i - 1} f JOIN bi ON f.id = bi.a),
         |ff$i AS MATERIALIZED (SELECT g.id, $i AS dist FROM fg$i g
         |  LEFT JOIN fs${i - 1} s ON g.id = s.id WHERE s.id IS NULL),
         |fs$i AS MATERIALIZED (SELECT id, dist FROM fs${i - 1} UNION ALL SELECT id, dist FROM ff$i)""".stripMargin
    }.mkString(",\n")
    s"""$base,
       |$biCte,
       |${ccSteps(ccRounds)},
       |roots AS MATERIALIZED (SELECT id FROM l$ccRounds WHERE id = label),
       |ff0 AS MATERIALIZED (SELECT id, 0 AS dist FROM roots),
       |fs0 AS MATERIALIZED (SELECT id, dist FROM ff0),
       |$steps
       |SELECT min(bi.a) AS src, d.id AS dst, CAST(d.dist AS BIGINT) AS dist
       |FROM fs$levels d JOIN bi ON bi.b = d.id
       |JOIN fs$levels p ON p.id = bi.a AND p.dist = d.dist - 1
       |GROUP BY d.id, d.dist""".stripMargin
  }

  /** Mirrors Forest.umsfTriangle(levelCap, roundsPerLevel): descending attribute sweep
    * (att = min(tri, cap−1) + 1) with `rounds` fixed min-label rounds after each level
    * joins the active subgraph; an edge is in the UMSF iff its endpoints' labels differ
    * when its level is tested. */
  def umsfTriangle(levelCap: Int, rounds: Int): String = {
    // Each round = propagate (min over active neighbors) + pointer jump
    // (label := label(label)) — mirrors Forest.umsfTriangle's doubling schedule.
    def labelRounds(lvl: Int): String = (1 to rounds).map { j =>
      val prev = if (j == 1) s"u${lvl + 1}_$rounds" else s"u${lvl}_${j - 1}"
      s"""t${lvl}_$j AS MATERIALIZED (SELECT l.id,
         |  least(l.label, coalesce(m.ml, l.label)) AS label
         |  FROM $prev l LEFT JOIN (
         |    SELECT ab.b AS id, min(x.label) AS ml FROM ub$lvl ab
         |    JOIN $prev x ON ab.a = x.id GROUP BY ab.b) m ON l.id = m.id),
         |u${lvl}_$j AS MATERIALIZED (SELECT a.id, b.label
         |  FROM t${lvl}_$j a JOIN t${lvl}_$j b ON a.label = b.id)""".stripMargin
    }.mkString(",\n")
    val lvls = (levelCap to 1 by -1).map { lvl =>
      val cur = s"u${lvl + 1}_$rounds"
      val mk =
        s"""mk$lvl AS MATERIALIZED (SELECT e.src, e.dst, e.att,
           |  CASE WHEN la.label != lb.label THEN 1 ELSE 0 END AS in_umsf
           |  FROM ae e JOIN $cur la ON e.src = la.id JOIN $cur lb ON e.dst = lb.id
           |  WHERE e.att = $lvl)""".stripMargin
      // Level 1 is the last: its propagation feeds nothing (mirrors Forest.umsfTriangle).
      if (lvl == 1) mk
      else
        s"""$mk,
           |ub$lvl AS MATERIALIZED (SELECT src AS a, dst AS b FROM ae WHERE att >= $lvl
           |  UNION ALL SELECT dst, src FROM ae WHERE att >= $lvl),
           |${labelRounds(lvl)}""".stripMargin
    }.mkString(",\n")
    val unionAll = (levelCap to 1 by -1)
      .map(l => s"SELECT src, dst, att, in_umsf FROM mk$l").mkString("\n  UNION ALL ")
    s"""$base,
       |$ejCte,
       |ae AS MATERIALIZED (SELECT src, dst, least(tri, ${levelCap - 1}) + 1 AS att FROM ej),
       |u${levelCap + 1}_$rounds AS MATERIALIZED (SELECT id, id AS label FROM verts),
       |$lvls
       |SELECT src, dst, CAST(att AS BIGINT) AS att, CAST(in_umsf AS BIGINT) AS in_umsf
       |FROM ($unionAll)""".stripMargin
  }

  /** Laplacian centrality (mirrors Centralities.laplacianCentrality): exact-integer
    * lap(u) = wd(u)^2 + sum_{v in N(u)} w*(w + 2*wd(v)) over merged undirected weights. */
  def laplacian: String =
    s"""$base,
       |lund AS MATERIALIZED (SELECT least(src, dst) AS s, greatest(src, dst) AS t, count(*) AS w
       |  FROM edges GROUP BY 1, 2),
       |lbi AS MATERIALIZED (SELECT s AS a, t AS b, w FROM lund UNION ALL SELECT t, s, w FROM lund),
       |wd AS MATERIALIZED (SELECT a AS id, sum(w) AS wd FROM lbi GROUP BY a),
       |nsm AS MATERIALIZED (SELECT lbi.a AS id, sum(lbi.w * (lbi.w + 2 * nb.wd)) AS nsum
       |  FROM lbi JOIN wd nb ON lbi.b = nb.id GROUP BY lbi.a)
       |SELECT v.id,
       |  CAST(coalesce(wd.wd, 0) * coalesce(wd.wd, 0) + coalesce(nsm.nsum, 0) AS BIGINT) AS lap
       |FROM verts v LEFT JOIN wd ON v.id = wd.id LEFT JOIN nsm ON v.id = nsm.id""".stripMargin

  /** Local partition coverage over PLP labels at `rounds` (mirrors
    * Centralities.localPartitionCoverage): weighted same-label neighbor fraction. */
  def localPartitionCoverage(rounds: Int): String =
    s"""$base,
       |${plpSteps(rounds)},
       |cov AS MATERIALIZED (SELECT plpbi.a AS id,
       |  sum(CASE WHEN ls.label = ld.label THEN plpbi.w ELSE 0 END) AS same_w,
       |  sum(plpbi.w) AS deg_w
       |  FROM plpbi JOIN p$rounds ls ON plpbi.a = ls.id JOIN p$rounds ld ON plpbi.b = ld.id
       |  GROUP BY plpbi.a)
       |SELECT v.id, CAST(coalesce(c.same_w, 0) AS BIGINT) AS same_w,
       |  CAST(coalesce(c.deg_w, 0) AS BIGINT) AS deg_w,
       |  CASE WHEN coalesce(c.same_w, 0) = 0 THEN CAST(0.0 AS DOUBLE)
       |       ELSE c.same_w::double / c.deg_w END AS coverage
       |FROM verts v LEFT JOIN cov c ON v.id = c.id""".stripMargin

  /** Volume rows (r, within, volume) for r in 1..rmax over sources id % mod == 0
    * (mirrors Distances.volume's batched capped multi-source BFS). */
  def volume(rmax: Int, mod: Long): String =
    s"""$base,
       |$biCte,
       |${msBfsCtes(mod, rmax)},
       |nsrc AS MATERIALIZED (SELECT count(*) AS c FROM verts WHERE id % $mod = 0),
       |bd AS MATERIALIZED (SELECT dist, count(*) AS c FROM st$rmax GROUP BY dist),
       |rr AS MATERIALIZED (SELECT unnest(generate_series(1, $rmax)) AS r)
       |SELECT CAST(rr.r AS BIGINT) AS r,
       |  CAST(coalesce(sum(CASE WHEN bd.dist <= rr.r THEN bd.c ELSE 0 END), 0) AS BIGINT) AS within,
       |  coalesce(sum(CASE WHEN bd.dist <= rr.r THEN bd.c ELSE 0 END), 0)::double
       |    / (SELECT c FROM nsrc)::double AS volume
       |FROM rr CROSS JOIN bd GROUP BY rr.r""".stripMargin

  /** Directed BFS from `source` over out-edges (or in-edges when `reverse`), `rounds`
    * unrolled relaxations past the directed eccentricity (mirrors
    * Distances.bfsHopsDirected); unreachable nodes -1. */
  def bfsDirected(source: Long, rounds: Int, reverse: Boolean): String = {
    val inf = 999999L
    val adj = if (reverse) "SELECT DISTINCT dst AS a, src AS b FROM edges"
              else "SELECT DISTINCT src AS a, dst AS b FROM edges"
    val steps = (1 to rounds).map { i =>
      s"""d$i AS MATERIALIZED (SELECT d.id, least(d.dist, coalesce(m.md, d.dist)) AS dist
         |  FROM d${i - 1} d LEFT JOIN (
         |    SELECT db.b AS id, min(x.dist) + 1 AS md FROM db JOIN d${i - 1} x ON db.a = x.id
         |    GROUP BY db.b) m ON d.id = m.id)""".stripMargin
    }.mkString(",\n")
    s"""$base,
       |db AS MATERIALIZED ($adj),
       |d0 AS MATERIALIZED (SELECT id, CASE WHEN id = $source THEN 0 ELSE $inf END AS dist FROM verts),
       |$steps
       |SELECT id, CAST(CASE WHEN dist >= $inf THEN -1 ELSE dist END AS BIGINT) AS dist
       |FROM d$rounds""".stripMargin
  }

  /** Adamic-Adar edge distance (mirrors EdgeScores.adamicAdarDistance): per undirected
    * edge the scaled-integer sum of round(1e9/ln(deg(w))) over common neighbors w
    * (each triangle contributes its third corner's term to all three edges), and the
    * reciprocal distance; edges in no triangle get aad=0 / dist=-1. */
  def adamicAdarDistance: String =
    s"""$base,
       |$triCte,
       |ti AS MATERIALIZED (SELECT rk.r, rk.id, CAST(round(CAST(1000000000 AS DOUBLE) / ln(dg.d)) AS BIGINT) AS t
       |  FROM rk JOIN dg ON rk.id = dg.id WHERE dg.d >= 2),
       |tids AS MATERIALIZED (SELECT ta.id AS a, tb.id AS b, tc.id AS c,
       |    ta.t AS ta, tb.t AS tb, tc.t AS tc
       |  FROM tri JOIN ti ta ON tri.a = ta.r JOIN ti tb ON tri.b = tb.r JOIN ti tc ON tri.c = tc.r),
       |contrib AS MATERIALIZED (
       |  SELECT least(a, b) AS src, greatest(a, b) AS dst, tc AS t FROM tids
       |  UNION ALL SELECT least(a, c), greatest(a, c), tb FROM tids
       |  UNION ALL SELECT least(b, c), greatest(b, c), ta FROM tids),
       |cs AS MATERIALIZED (SELECT src, dst, sum(t) AS aad FROM contrib GROUP BY src, dst)
       |SELECT u.s AS src, u.t AS dst, CAST(coalesce(cs.aad, 0) AS BIGINT) AS aad_scaled,
       |  CASE WHEN coalesce(cs.aad, 0) = 0 THEN CAST(-1.0 AS DOUBLE)
       |       ELSE CAST(1000000000 AS DOUBLE) / cs.aad::double END AS dist
       |FROM und u LEFT JOIN cs ON u.s = cs.src AND u.t = cs.dst""".stripMargin

  /** Regular ring lattice formula replay (mirrors Generators.regularRingLattice). */
  def generatorRing(n: Long, k: Int): String = {
    val half = k / 2
    s"""WITH t AS (SELECT g AS id FROM generate_series(0, ${n * half - 1}) s(g))
       |SELECT DISTINCT (id // $half) AS src,
       |  ((id // $half) + id % $half + 1) % $n AS dst
       |FROM t WHERE (id // $half) != ((id // $half) + id % $half + 1) % $n""".stripMargin
  }

  /** Mocnik (dim=2) brute-force replay (mirrors Generators.mocnik — the engine's
    * grid-doubling NN + ring join must produce exactly the O(n²) definition). */
  def generatorMocnik(n: Long, k: Int, seed: Long): String = {
    val Q = 1L << 20
    val H = Q / 2
    val x = s"(${genDraw(s"c*2 + $seed*50021")} // 128) % $Q"
    val y = s"(${genDraw(s"c*2 + 1 + $seed*50021")} // 128) % $Q"
    s"""WITH cand AS (SELECT g AS c FROM generate_series(0, ${2 * n - 1}) s(g)),
       |p0 AS MATERIALIZED (SELECT c, $x AS x, $y AS y FROM cand),
       |acc AS MATERIALIZED (SELECT c, x, y, row_number() OVER (ORDER BY c) - 1 AS id
       |  FROM p0 WHERE (x - $H)*(x - $H) + (y - $H)*(y - $H) < ${H * H}),
       |pts AS MATERIALIZED (SELECT id, x, y FROM acc WHERE id < $n),
       |d2 AS MATERIALIZED (SELECT a.id AS i, b.id AS j,
       |  (a.x - b.x)*(a.x - b.x) + (a.y - b.y)*(a.y - b.y) AS d2
       |  FROM pts a JOIN pts b ON a.id != b.id),
       |dmin AS MATERIALIZED (SELECT i, min(d2) AS m FROM d2 GROUP BY i)
       |SELECT d2.i AS src, d2.j AS dst FROM d2 JOIN dmin ON d2.i = dmin.i
       |WHERE d2.d2 <= ${k.toLong * k} * dmin.m""".stripMargin
  }

  /** Multi-layer Mocnik brute-force replay (mirrors Generators.mocnikMultiLayer):
    * shared point set, per-layer k·dmin rule over the first ns(j) points, first
    * layer wins with its relativeWeight. */
  def generatorMocnikMulti(ns: Seq[Long], ks: Seq[Int], relW: Seq[Double],
                           seed: Long): String = {
    val Q = 1L << 20
    val H = Q / 2
    val nMax = ns.max
    val x = s"(${genDraw(s"c*2 + $seed*50021")} // 128) % $Q"
    val y = s"(${genDraw(s"c*2 + 1 + $seed*50021")} // 128) % $Q"
    val layers = ns.indices.map { j =>
      s"""pts$j AS MATERIALIZED (SELECT id, x, y FROM acc WHERE id < ${ns(j)}),
         |d2$j AS MATERIALIZED (SELECT a.id AS i, b.id AS jj,
         |  (a.x - b.x)*(a.x - b.x) + (a.y - b.y)*(a.y - b.y) AS d2
         |  FROM pts$j a JOIN pts$j b ON a.id != b.id),
         |dm$j AS MATERIALIZED (SELECT i, min(d2) AS m FROM d2$j GROUP BY i),
         |e$j AS MATERIALIZED (SELECT d.i AS src, d.jj AS dst,
         |  CAST(${relW(j)} AS DOUBLE) AS weight
         |  FROM d2$j d JOIN dm$j ON d.i = dm$j.i
         |  WHERE d.d2 <= ${ks(j).toLong * ks(j)} * dm$j.m),
         |f$j AS MATERIALIZED (${
           if (j == 0) s"SELECT * FROM e0"
           else s"""SELECT * FROM f${j - 1} UNION ALL
             |  SELECT e.* FROM e$j e LEFT JOIN f${j - 1} f
             |  ON e.src = f.src AND e.dst = f.dst WHERE f.src IS NULL""".stripMargin
         })""".stripMargin
    }.mkString(",\n")
    s"""WITH cand AS (SELECT g AS c FROM generate_series(0, ${2 * nMax - 1}) s(g)),
       |p0 AS MATERIALIZED (SELECT c, $x AS x, $y AS y FROM cand),
       |acc AS MATERIALIZED (SELECT c, x, y, row_number() OVER (ORDER BY c) - 1 AS id
       |  FROM p0 WHERE (x - $H)*(x - $H) + (y - $H)*(y - $H) < ${H * H}),
       |$layers
       |SELECT src, dst, weight FROM f${ns.length - 1}""".stripMargin
  }

  /** GlobalCurveball replay (mirrors Curveball.globalCurveball): per round, the
    * same LCG pairing rank, (key,id) edge ownership, partner-neighborhood freeze,
    * and pool re-deal by per-element draw — bit-exact unrolled trade rounds. */
  def globalCurveball(rounds: Int, seed: Long = 42L): String = {
    val roundCtes = (0 until rounds).map { r =>
      val kx = genDraw(s"id*13 + ${seed + r}*1000033")
      val dwx = genDraw(s"pl.w*31 + pl.p*97 + ${seed + r}*999979")
      s"""k$r AS MATERIALIZED (SELECT id, $kx AS k FROM verts),
         |rk$r AS MATERIALIZED (SELECT id, k, row_number() OVER (ORDER BY k, id) - 1 AS rnk FROM k$r),
         |pa$r AS MATERIALIZED (SELECT id, k,
         |    CASE WHEN (rnk // 2) % 2 = 0 THEN rnk // 2 END AS p,
         |    CASE WHEN (rnk // 2) % 2 = 0 THEN rnk % 2 END AS side FROM rk$r),
         |pt$r AS MATERIALIZED (SELECT a.id, b.id AS partner FROM pa$r a JOIN pa$r b ON a.p = b.p AND a.side != b.side),
         |cb$r AS MATERIALIZED (SELECT s AS a, t AS b FROM cu$r UNION ALL SELECT t, s FROM cu$r),
         |ow$r AS MATERIALIZED (SELECT
         |    CASE WHEN ks.k < kt.k OR (ks.k = kt.k AND e.s < e.t) THEN e.s ELSE e.t END AS o,
         |    CASE WHEN ks.k < kt.k OR (ks.k = kt.k AND e.s < e.t) THEN e.t ELSE e.s END AS w
         |  FROM cu$r e JOIN k$r ks ON e.s = ks.id JOIN k$r kt ON e.t = kt.id),
         |rw$r AS MATERIALIZED (SELECT ow.o, ow.w, pa.p, pa.side, pt.partner,
         |    (b.a IS NOT NULL) AS inp, wb.p AS wp
         |  FROM ow$r ow JOIN pa$r pa ON ow.o = pa.id
         |  LEFT JOIN pt$r pt ON ow.o = pt.id
         |  LEFT JOIN cb$r b ON b.a = pt.partner AND b.b = ow.w
         |  LEFT JOIN pa$r wb ON ow.w = wb.id),
         |fz$r AS MATERIALIZED (SELECT o, w FROM rw$r
         |  WHERE partner IS NULL OR w = partner OR inp OR wp IS NOT NULL),
         |pl$r AS MATERIALIZED (SELECT p, side, o, partner, w FROM rw$r
         |  WHERE partner IS NOT NULL AND w != partner AND NOT inp AND wp IS NULL),
         |c0$r AS MATERIALIZED (SELECT p, sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS c0 FROM pl$r GROUP BY p),
         |ag$r AS MATERIALIZED (SELECT CASE WHEN rn <= c0 THEN s0 ELSE s1 END AS o, w FROM (
         |    SELECT pl.w, c.c0,
         |      CASE WHEN pl.side = 0 THEN pl.o ELSE pl.partner END AS s0,
         |      CASE WHEN pl.side = 1 THEN pl.o ELSE pl.partner END AS s1,
         |      row_number() OVER (PARTITION BY pl.p ORDER BY $dwx, pl.w) AS rn
         |    FROM pl$r pl JOIN c0$r c ON pl.p = c.p)),
         |cu${r + 1} AS MATERIALIZED (SELECT least(o, w) AS s, greatest(o, w) AS t FROM
         |  (SELECT o, w FROM fz$r UNION ALL SELECT o, w FROM ag$r))""".stripMargin
    }.mkString(",\n")
    s"""$base,
       |cu0 AS MATERIALIZED (SELECT least(src, dst) AS s, greatest(src, dst) AS t
       |  FROM edges GROUP BY 1, 2),
       |$roundCtes
       |SELECT s AS src, t AS dst FROM cu$rounds""".stripMargin
  }

  /** Dorogovtsev–Mendes formula replay (mirrors Generators.dorogovtsevMendes):
    * the engine's iterated column-arithmetic pointer chase becomes a recursive CTE
    * over the identical draw formula. A row (j, src, want, q) is terminal when
    * q < 3 (base triangle lookup) or want = 1 (newer endpoint = creating node);
    * otherwise it re-enters at edge q's own pick. The chase index strictly
    * decreases, so the recursion terminates. */
  def generatorDm(n: Long, seed: Long): String = {
    def p(t: String) = s"(${genDraw(s"($t)*31 + $seed*1299709")} % (2*($t) - 3))"
    s"""WITH RECURSIVE chase(j, src, want, q) AS (
       |  SELECT g AS j, 3 + (g - 3) // 2 AS src, (g - 3) % 2 AS want,
       |    ${p("3 + (g - 3) // 2")} AS q
       |  FROM generate_series(3, ${2 * n - 4}) s(g)
       |  UNION ALL
       |  SELECT j, src, (q - 3) % 2 AS want, ${p("3 + (q - 3) // 2")} AS q
       |  FROM chase WHERE want = 0 AND q >= 3
       |),
       |resolved AS (
       |  SELECT j, src,
       |    CASE WHEN q < 3 THEN
       |      CASE WHEN want = 0
       |        THEN (CASE q WHEN 0 THEN 0 WHEN 1 THEN 1 ELSE 0 END)
       |        ELSE (CASE q WHEN 0 THEN 1 WHEN 1 THEN 2 ELSE 2 END) END
       |    ELSE 3 + (q - 3) // 2 END AS dst
       |  FROM chase WHERE want = 1 OR q < 3
       |)
       |SELECT CAST(src AS BIGINT) AS src, CAST(dst AS BIGINT) AS dst FROM (
       |  SELECT 0 AS src, 1 AS dst UNION ALL SELECT 1, 2 UNION ALL SELECT 2, 0
       |  UNION ALL SELECT src, dst FROM resolved)""".stripMargin
  }

  /** DynamicPathGenerator event stream (mirrors DynamicGenerators.dynamicPath). */
  def dynPath(steps: Long): String =
    s"""SELECT 'an' AS etype, CAST(g AS BIGINT) AS u, CAST(NULL AS BIGINT) AS v,
       |  1.0 AS w, CAST(g AS BIGINT) AS t FROM generate_series(0, $steps) s(g)
       |UNION ALL
       |SELECT 'ae', CAST(g - 1 AS BIGINT), CAST(g AS BIGINT), 1.0,
       |  CAST(g AS BIGINT) FROM generate_series(1, $steps) s2(g)""".stripMargin

  /** DynamicDorogovtsevMendes event stream (mirrors
    * DynamicGenerators.dynamicDorogovtsevMendes — the DM chase replay plus the
    * arrival-step mapping t = max(src − 2, 0)). */
  def dynDm(n: Long, seed: Long): String = {
    def p(t: String) = s"(${genDraw(s"($t)*31 + $seed*1299709")} % (2*($t) - 3))"
    s"""WITH RECURSIVE chase(j, src, want, q) AS (
       |  SELECT g AS j, 3 + (g - 3) // 2 AS src, (g - 3) % 2 AS want,
       |    ${p("3 + (g - 3) // 2")} AS q
       |  FROM generate_series(3, ${2 * n - 4}) s(g)
       |  UNION ALL
       |  SELECT j, src, (q - 3) % 2 AS want, ${p("3 + (q - 3) // 2")} AS q
       |  FROM chase WHERE want = 0 AND q >= 3
       |),
       |resolved AS (
       |  SELECT j, src,
       |    CASE WHEN q < 3 THEN
       |      CASE WHEN want = 0
       |        THEN (CASE q WHEN 0 THEN 0 WHEN 1 THEN 1 ELSE 0 END)
       |        ELSE (CASE q WHEN 0 THEN 1 WHEN 1 THEN 2 ELSE 2 END) END
       |    ELSE 3 + (q - 3) // 2 END AS dst
       |  FROM chase WHERE want = 1 OR q < 3
       |),
       |dme AS (SELECT 0 AS src, 1 AS dst UNION ALL SELECT 1, 2 UNION ALL SELECT 2, 0
       |  UNION ALL SELECT src, dst FROM resolved)
       |SELECT 'an' AS etype, CAST(g AS BIGINT) AS u, CAST(NULL AS BIGINT) AS v,
       |  1.0 AS w, CAST(greatest(g - 2, 0) AS BIGINT) AS t
       |FROM generate_series(0, ${n - 1}) ns(g)
       |UNION ALL
       |SELECT 'ae', CAST(src AS BIGINT), CAST(dst AS BIGINT), 1.0,
       |  CAST(greatest(src - 2, 0) AS BIGINT) FROM dme""".stripMargin
  }

  /** DynamicPubWeb event stream (mirrors DynamicGenerators.dynamicPubWeb): per-step
    * brute-force mutual-kNN graphs on integer-drifted torus points, edit scripts
    * between consecutive steps. All-integer coordinates — hash-exact. */
  def dynPubWeb(n: Long, steps: Int, areas: Int, maxNeigh: Int, rDiv: Int,
                seed: Long = 42L): String = {
    val Q = 1L << 20
    val R = Q / rDiv
    val V = R / 8
    val cx = graft.synth.Generators.pubWebCoordSql(0, areas, Q, R, seed, duck = true)
    val cy = graft.synth.Generators.pubWebCoordSql(1, areas, Q, R, seed, duck = true)
    def vel(off: Int) = s"(((${graft.synth.Generators.drawSql(
      s"id*5 + $off + $seed*130003", duck = true)} // 128) % ${2 * V + 1}) - $V)"
    val stepCtes = (0 to steps).map { t =>
      s"""pts$t AS MATERIALIZED (SELECT id,
         |  ((($cx) + $t * ${vel(0)}) % $Q + $Q) % $Q AS x,
         |  ((($cy) + $t * ${vel(1)}) % $Q + $Q) % $Q AS y FROM ids),
         |cand$t AS MATERIALIZED (SELECT a.id AS u, b.id AS v,
         |    least(abs(a.x - b.x), $Q - abs(a.x - b.x)) * least(abs(a.x - b.x), $Q - abs(a.x - b.x))
         |    + least(abs(a.y - b.y), $Q - abs(a.y - b.y)) * least(abs(a.y - b.y), $Q - abs(a.y - b.y)) AS d2
         |  FROM pts$t a JOIN pts$t b ON a.id != b.id),
         |rk$t AS MATERIALIZED (SELECT u, v FROM (
         |    SELECT u, v, row_number() OVER (PARTITION BY u ORDER BY d2, v) AS rn
         |    FROM cand$t WHERE d2 <= ${R * R}) z WHERE rn <= $maxNeigh),
         |es$t AS MATERIALIZED (SELECT a.u AS src, a.v AS dst FROM rk$t a
         |  JOIN rk$t b ON a.u = b.v AND a.v = b.u WHERE a.u < a.v)""".stripMargin
    }.mkString(",\n")
    val diffs = (1 to steps).map { t =>
      s"""SELECT 're' AS etype, CAST(p.src AS BIGINT) AS u, CAST(p.dst AS BIGINT) AS v,
         |  0.0 AS w, CAST($t AS BIGINT) AS t FROM es${t - 1} p
         |  WHERE NOT EXISTS (SELECT 1 FROM es$t c WHERE c.src = p.src AND c.dst = p.dst)
         |UNION ALL
         |SELECT 'ae', CAST(c.src AS BIGINT), CAST(c.dst AS BIGINT), 1.0,
         |  CAST($t AS BIGINT) FROM es$t c
         |  WHERE NOT EXISTS (SELECT 1 FROM es${t - 1} p WHERE p.src = c.src AND p.dst = c.dst)""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH ids AS MATERIALIZED (SELECT g AS id FROM generate_series(0, ${n - 1}) s(g)),
       |$stepCtes
       |SELECT 'an' AS etype, CAST(id AS BIGINT) AS u, CAST(NULL AS BIGINT) AS v,
       |  1.0 AS w, CAST(0 AS BIGINT) AS t FROM ids
       |UNION ALL
       |SELECT 'ae', CAST(src AS BIGINT), CAST(dst AS BIGINT), 1.0, CAST(0 AS BIGINT)
       |FROM es0
       |UNION ALL
       |$diffs""".stripMargin
  }

  /** PubWeb brute-force replay (mirrors Generators.pubWeb — the engine's cell-ring
    * torus join + mutual-kNN must produce exactly the O(n²) definition; the shared
    * pubWebCoordSql fragment guarantees identical positions). */
  def generatorPubWeb(n: Long, areas: Int, maxNeigh: Int, rDiv: Int,
                      seed: Long = 42L): String = {
    val Q = 1L << 20
    val R = Q / rDiv
    val cx = graft.synth.Generators.pubWebCoordSql(0, areas, Q, R, seed, duck = true)
    val cy = graft.synth.Generators.pubWebCoordSql(1, areas, Q, R, seed, duck = true)
    s"""WITH ids AS (SELECT g AS id FROM generate_series(0, ${n - 1}) s(g)),
       |pts AS MATERIALIZED (SELECT id, ($cx) AS x, ($cy) AS y FROM ids),
       |cand AS MATERIALIZED (SELECT a.id AS u, b.id AS v,
       |    least(abs(a.x - b.x), $Q - abs(a.x - b.x)) * least(abs(a.x - b.x), $Q - abs(a.x - b.x))
       |    + least(abs(a.y - b.y), $Q - abs(a.y - b.y)) * least(abs(a.y - b.y), $Q - abs(a.y - b.y)) AS d2
       |  FROM pts a JOIN pts b ON a.id != b.id),
       |rk AS MATERIALIZED (SELECT u, v FROM (
       |    SELECT u, v, row_number() OVER (PARTITION BY u ORDER BY d2, v) AS rn
       |    FROM cand WHERE d2 <= ${R * R}) WHERE rn <= $maxNeigh)
       |SELECT a.u AS src, a.v AS dst FROM rk a JOIN rk b ON a.u = b.v AND a.v = b.u
       |WHERE a.u < a.v""".stripMargin
  }

  /** Sampled-BFS neighborhood-function estimate (mirrors
    * Distances.neighborhoodFunctionHeuristic): pairs(<=h) * n // s over sources
    * id % mod == 0, one batched multi-source BFS. */
  def nfHeuristic(hops: Int, mod: Long): String =
    s"""$base,
       |$biCte,
       |${msBfsCtes(mod, hops)},
       |bd AS MATERIALIZED (SELECT dist, count(*) AS c FROM st$hops WHERE dist > 0 GROUP BY dist),
       |nsrc AS MATERIALIZED (SELECT count(*) AS s FROM verts WHERE id % $mod = 0),
       |rr AS MATERIALIZED (SELECT unnest(generate_series(1, $hops)) AS h),
       |agg AS MATERIALIZED (SELECT rr.h,
       |  coalesce(sum(CASE WHEN bd.dist <= rr.h THEN bd.c ELSE 0 END), 0) AS pairs
       |  FROM rr CROSS JOIN bd GROUP BY rr.h)
       |SELECT CAST(h AS BIGINT) AS hop, CAST(pairs AS BIGINT) AS pairs,
       |  CAST(pairs * (SELECT n FROM nn) // (SELECT s FROM nsrc) AS BIGINT) AS nf_est
       |FROM agg""".stripMargin

  /** Top-k harmonic closeness on the id % mod subgraph (mirrors
    * TopCloseness.harmonic): exact all-source BFS, h_scaled = Σ S // dist,
    * rank (h desc, id asc). */
  def topHarmonic(mod: Long, k: Int, levels: Int, scale: Long = 1000000000000L): String = {
    val steps = (1 to levels).map { i =>
      s"""tg$i AS MATERIALIZED (SELECT DISTINCT f.s, sbi.b AS id
         |  FROM tf${i - 1} f JOIN sbi ON f.id = sbi.a),
         |tf$i AS MATERIALIZED (SELECT m.s, m.id, $i AS dist FROM tg$i m
         |  LEFT JOIN ts${i - 1} x ON m.s = x.s AND m.id = x.id WHERE x.s IS NULL),
         |ts$i AS MATERIALIZED (SELECT * FROM ts${i - 1} UNION ALL SELECT * FROM tf$i)""".stripMargin
    }.mkString(",\n")
    s"""$base,
       |sv AS MATERIALIZED (SELECT id FROM verts WHERE id % $mod = 0),
       |se AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
       |  FROM edges WHERE src % $mod = 0 AND dst % $mod = 0),
       |sbi AS MATERIALIZED (SELECT a, b FROM se UNION SELECT b, a FROM se),
       |tf0 AS MATERIALIZED (SELECT id AS s, id, 0 AS dist FROM sv),
       |ts0 AS MATERIALIZED (SELECT * FROM tf0),
       |$steps
       |SELECT id, reached, h_scaled, h_scaled::double / ${scale.toDouble} AS harmonic
       |FROM (SELECT s AS id, CAST(count(*) - 1 AS BIGINT) AS reached,
       |        CAST(sum(CASE WHEN dist > 0 THEN $scale // dist ELSE 0 END) AS BIGINT) AS h_scaled
       |      FROM ts$levels GROUP BY s)
       |ORDER BY h_scaled DESC, id ASC LIMIT $k""".stripMargin
  }

  /** Cold BFS over the graph PLUS the deterministic insert batch
    * (star edges source -> id % addMod == 0) — the oracle for the warm-repair path
    * (mirrors Distances.bfsHopsWarm seeded from Distances.bfsHops(source)). */
  def dynBfs(source: Long, rounds: Int, addMod: Long): String = {
    val inf = 999999L
    val steps = (1 to rounds).map { i =>
      s"""d$i AS MATERIALIZED (SELECT d.id, least(d.dist, coalesce(m.md, d.dist)) AS dist
         |  FROM d${i - 1} d LEFT JOIN (
         |    SELECT dbi.b AS id, min(x.dist) + 1 AS md FROM dbi JOIN d${i - 1} x ON dbi.a = x.id
         |    GROUP BY dbi.b) m ON d.id = m.id)""".stripMargin
    }.mkString(",\n")
    s"""$base,
       |adde AS MATERIALIZED (SELECT $source AS a, id AS b FROM verts
       |  WHERE id % $addMod = 0 AND id != $source),
       |dbi AS MATERIALIZED (SELECT src AS a, dst AS b FROM edges
       |  UNION SELECT dst, src FROM edges
       |  UNION SELECT a, b FROM adde UNION SELECT b, a FROM adde),
       |d0 AS MATERIALIZED (SELECT id, CASE WHEN id = $source THEN 0 ELSE $inf END AS dist FROM verts),
       |$steps
       |SELECT id, CAST(CASE WHEN dist >= $inf THEN -1 ELSE dist END AS BIGINT) AS dist
       |FROM d$rounds""".stripMargin
  }

  /** All simple directed paths source -> target with <= cutoff edges (mirrors
    * Distances.allSimplePaths; the engine's reverse-BFS pruning only trims dead
    * branches, so plain enumeration yields the identical path set). */
  def allSimplePaths(source: Long, target: Long, cutoff: Int): String = {
    val steps = (1 to cutoff).map { i =>
      s"""sp$i AS MATERIALIZED (SELECT list_append(p.path, e.dst) AS path, e.dst AS head
         |  FROM sp${i - 1} p JOIN de e ON p.head = e.src
         |  WHERE p.head != $target AND NOT list_contains(p.path, e.dst))""".stripMargin
    }.mkString(",\n")
    val unions = (1 to cutoff).map(i =>
      s"SELECT array_to_string(path, '->') AS path_str, CAST($i AS BIGINT) AS len " +
        s"FROM sp$i WHERE head = $target").mkString("\n  UNION ALL ")
    s"""$base,
       |de AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges),
       |sp0 AS MATERIALIZED (SELECT [CAST($source AS BIGINT)] AS path,
       |  CAST($source AS BIGINT) AS head),
       |$steps
       |$unions""".stripMargin
  }

  /** Hop plot (mirrors Anf.hopPlot): the neighborhood function rows plus the fraction
    * nf(h)/nf(maxHops) — exact-integer FM sketches, one IEEE division. */
  def hopPlot(hops: Int, seed: Long = 42L, k: Int = 8): String = {
    val estCase = graft.algo.Anf.EstC.zipWithIndex.map { case (c, r) =>
      s"WHEN $r THEN (CAST(1 AS BIGINT) << CAST(b // $k AS INT)) * $c"
    }.mkString(s"CASE b % $k ", " ", " END")
    val perHop = (1 to hops).map { h =>
      s"""SELECT $h AS hop, sum($estCase) AS nf_scaled FROM
         |  (SELECT (${anfSumB("mk" + h, k)}) AS b FROM mk$h)""".stripMargin
    }.mkString("\n  UNION ALL ")
    s"""$base,
       |$biCte,
       |${anfMaskCtes(hops, seed, k)},
       |nfq AS MATERIALIZED ($perHop),
       |dnq AS MATERIALIZED (SELECT nf_scaled AS den FROM nfq WHERE hop = $hops)
       |SELECT CAST(hop AS BIGINT) AS hop, CAST(nf_scaled AS BIGINT) AS nf_scaled,
       |  nf_scaled::double / dnq.den::double AS fraction
       |FROM nfq CROSS JOIN dnq""".stripMargin
  }

  /** Shared pair-count CTEs between PLP at `ra` and `rb` rounds (randIndex family). */
  private def pairCountCtes(ra: Int, rb: Int): String =
    s"""cont AS MATERIALIZED (SELECT x.label AS la, y.label AS lb, count(*) AS nij
       |  FROM p$ra x JOIN p$rb y ON x.id = y.id GROUP BY 1, 2),
       |sb AS MATERIALIZED (SELECT sum(nij*(nij-1)//2) AS s_both FROM cont),
       |sa AS MATERIALIZED (SELECT sum(ai*(ai-1)//2) AS s_a FROM (SELECT sum(nij) AS ai FROM cont GROUP BY la)),
       |sc AS MATERIALIZED (SELECT sum(bj*(bj-1)//2) AS s_b FROM (SELECT sum(nij) AS bj FROM cont GROUP BY lb)),
       |nn2 AS MATERIALIZED (SELECT count(*) AS n FROM verts)""".stripMargin

  /** Mirrors Measures.jaccardMeasure between PLP at `ra` and `rb` rounds. */
  def jaccardMeasure(ra: Int, rb: Int): String =
    s"""$base,
       |$biCte,
       |${plpSteps(rb)},
       |${pairCountCtes(ra, rb)}
       |SELECT CAST(n AS BIGINT) AS n, CAST(s_both AS BIGINT) AS s_both,
       |  CAST(s_a AS BIGINT) AS s_a, CAST(s_b AS BIGINT) AS s_b,
       |  CASE WHEN n*(n-1) - 2*(n*(n-1)//2 + s_both - s_a - s_b) <= 0 THEN 0.0
       |    ELSE 1.0 - CAST(2*s_both AS DOUBLE) /
       |      (n*(n-1) - 2*(n*(n-1)//2 + s_both - s_a - s_b)) END AS jaccard
       |FROM nn2 CROSS JOIN sb CROSS JOIN sa CROSS JOIN sc""".stripMargin

  /** Mirrors Measures.graphStructuralRand between PLP at `ra` and `rb` rounds: e11/e00
    * over the canonical undirected edge set. */
  def graphStructuralRand(ra: Int, rb: Int): String =
    s"""$base,
       |$biCte,
       |${plpSteps(rb)}
       |SELECT CAST(count(*) AS BIGINT) AS m,
       |  CAST(sum(CASE WHEN a1.label = a2.label AND b1.label = b2.label THEN 1 ELSE 0 END) AS BIGINT) AS e11,
       |  CAST(sum(CASE WHEN a1.label <> a2.label AND b1.label <> b2.label THEN 1 ELSE 0 END) AS BIGINT) AS e00,
       |  1.0 - CAST(sum(CASE WHEN a1.label = a2.label AND b1.label = b2.label THEN 1 ELSE 0 END) +
       |             sum(CASE WHEN a1.label <> a2.label AND b1.label <> b2.label THEN 1 ELSE 0 END) AS DOUBLE)
       |        / count(*) AS rand_g
       |FROM plpund e
       |JOIN p$ra a1 ON e.s = a1.id JOIN p$ra a2 ON e.t = a2.id
       |JOIN p$rb b1 ON e.s = b1.id JOIN p$rb b2 ON e.t = b2.id""".stripMargin

  /** Mirrors Measures.partitionIntersection between PLP at `ra` and `rb` rounds:
    * dense rank of the (la, lb) pair in (la, lb) order. */
  def partitionIntersection(ra: Int, rb: Int): String =
    s"""$base,
       |$biCte,
       |${plpSteps(rb)}
       |SELECT x.id, CAST(dense_rank() OVER (ORDER BY x.label, y.label) - 1 AS BIGINT) AS label
       |FROM p$ra x JOIN p$rb y ON x.id = y.id""".stripMargin

  /** Mirrors Measures.coverHubDominance over the cover PLP(rounds) ∪ (id % modK +
    * offset): per cluster (label, size, max_int_deg, dominance). */
  def coverHubDominance(rounds: Int, modK: Long, offset: Long): String =
    s"""$base,
       |$biCte,
       |${plpSteps(rounds)},
       |cov AS MATERIALIZED (SELECT id, label FROM p$rounds
       |  UNION ALL SELECT id, $offset + id % $modK AS label FROM verts),
       |sizes AS MATERIALIZED (SELECT label, count(*) AS size FROM cov GROUP BY label),
       |mi AS MATERIALIZED (SELECT label, max(di) AS max_int_deg FROM (
       |  SELECT bi.a, cu.label, count(*) AS di
       |  FROM bi JOIN cov cu ON bi.a = cu.id JOIN cov cv ON bi.b = cv.id AND cu.label = cv.label
       |  GROUP BY bi.a, cu.label) GROUP BY label)
       |SELECT s.label, CAST(s.size AS BIGINT) AS size,
       |  CAST(coalesce(mi.max_int_deg, 0) AS BIGINT) AS max_int_deg,
       |  CASE WHEN s.size <= 1 THEN 1.0
       |    ELSE CAST(coalesce(mi.max_int_deg, 0) AS DOUBLE) / (s.size - 1) END AS dominance
       |FROM sizes s LEFT JOIN mi ON s.label = mi.label""".stripMargin

  /** Mirrors GraphEvents.graphDifference between the canonical undirected graph and
    * its deterministic mutation (drop (src+dst)%13==0, bump weight where %17==0, add
    * the 0→(id%997==0) star). */
  def graphDifference(dropMod: Long, bumpMod: Long, starMod: Long): String =
    s"""$base,
       |plpund AS MATERIALIZED (SELECT least(src, dst) AS s, greatest(src, dst) AS t, count(*) AS w
       |  FROM edges GROUP BY 1, 2),
       |e1 AS MATERIALIZED (SELECT s AS src, t AS dst, CAST(w AS DOUBLE) AS weight FROM plpund),
       |e2 AS MATERIALIZED (SELECT src, dst, max(weight) AS weight FROM (
       |  SELECT src, dst,
       |    CASE WHEN (src + dst) % $bumpMod = 0 THEN weight + 1 ELSE weight END AS weight
       |  FROM e1 WHERE (src + dst) % $dropMod <> 0
       |  UNION ALL
       |  SELECT CAST(0 AS BIGINT) AS src, id AS dst, 1.0 AS weight FROM verts
       |  WHERE id % $starMod = 0 AND id <> 0) GROUP BY src, dst)
       |SELECT 're' AS etype, a.src AS u, a.dst AS v, 0.0 AS w
       |  FROM e1 a LEFT JOIN e2 b ON a.src = b.src AND a.dst = b.dst WHERE b.src IS NULL
       |UNION ALL
       |SELECT 'ae', b.src, b.dst, b.weight
       |  FROM e2 b LEFT JOIN e1 a ON a.src = b.src AND a.dst = b.dst WHERE a.src IS NULL
       |UNION ALL
       |SELECT 'ce', a.src, a.dst, b.weight
       |  FROM e1 a JOIN e2 b ON a.src = b.src AND a.dst = b.dst WHERE a.weight <> b.weight""".stripMargin

  /** Mirrors Epidemic.seir: `tMax` unrolled synchronous steps of the deterministic
    * SEIR process, census rows (t, n_s, n_e, n_i, n_r) for t = 0..tMax. */
  def seir(tMax: Int, transP: Double, eTime: Int, iTime: Int, zero: Long,
           seed: Long = 42L): String = {
    val thr = graft.algo.Epidemic.threshold(transP)
    val steps = (1 to tMax).map { t =>
      s"""ct$t AS MATERIALIZED (SELECT DISTINCT bi.b AS id FROM bi
         |  JOIN s${t - 1} us ON bi.a = us.id AND us.state = 2
         |  JOIN s${t - 1} vs ON bi.b = vs.id AND vs.state = 0
         |  WHERE ${graft.algo.Epidemic.drawSql("bi.b", "bi.a", t.toString, seed, duck = true)} < $thr),
         |s$t AS MATERIALIZED (SELECT p.id,
         |  CASE WHEN p.state = 0 AND c.id IS NOT NULL THEN 1
         |       WHEN p.state = 1 AND $t - p.ts >= $eTime THEN 2
         |       WHEN p.state = 2 AND $t - p.ts >= $iTime THEN 3
         |       ELSE p.state END AS state,
         |  CASE WHEN (p.state = 0 AND c.id IS NOT NULL)
         |         OR (p.state = 1 AND $t - p.ts >= $eTime)
         |         OR (p.state = 2 AND $t - p.ts >= $iTime)
         |       THEN CAST($t AS BIGINT) ELSE p.ts END AS ts
         |  FROM s${t - 1} p LEFT JOIN ct$t c ON p.id = c.id)""".stripMargin
    }.mkString(",\n")
    val census = (0 to tMax).map { t =>
      s"""SELECT CAST($t AS BIGINT) AS t,
         |  CAST(sum(CASE WHEN state = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_s,
         |  CAST(sum(CASE WHEN state = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_e,
         |  CAST(sum(CASE WHEN state = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_i,
         |  CAST(sum(CASE WHEN state = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_r FROM s$t""".stripMargin
    }.mkString("\n  UNION ALL ")
    s"""$base,
       |$biCte,
       |s0 AS MATERIALIZED (SELECT id,
       |  CASE WHEN id = $zero THEN 2 ELSE 0 END AS state, CAST(0 AS BIGINT) AS ts FROM verts),
       |$steps
       |$census""".stripMargin
  }

  /** Mirrors Distances.approxCloseness: Eppstein–Wang estimate from the id%mod==0
    * sample, `levels` unrolled msBFS levels. */
  def approxCloseness(mod: Long, levels: Int): String =
    s"""$base,
       |$biCte,
       |${msBfsCtes(mod, levels)},
       |aggt AS MATERIALIZED (SELECT id, sum(dist) AS sum_dist, count(*) AS cnt_src
       |  FROM st$levels GROUP BY id),
       |kk AS MATERIALIZED (SELECT count(*) AS k FROM verts WHERE id % $mod = 0)
       |SELECT v.id, CAST(coalesce(a.sum_dist, 0) AS BIGINT) AS sum_dist,
       |  CAST(coalesce(a.cnt_src, 0) AS BIGINT) AS cnt_src,
       |  CASE WHEN coalesce(a.sum_dist, 0) > 0
       |    THEN CAST((SELECT k FROM kk) * ((SELECT n FROM nn) - 1) AS DOUBLE) /
       |         CAST((SELECT n FROM nn) * a.sum_dist AS DOUBLE)
       |    ELSE 0.0 END AS closeness_est
       |FROM verts v LEFT JOIN aggt a ON v.id = a.id""".stripMargin

  /** Mirrors Scd.gce: `steps` unrolled greedy expansion steps from `seed`, objective
    * M via exact cross-multiplied comparison, selection by floor-scaled M'·10^12
    * descending then id. */
  def gce(seed: Long, steps: Int): String = {
    val stepCtes = (1 to steps).map { i =>
      s"""sh$i AS MATERIALIZED (SELECT bi.a AS id, count(*) AS di FROM bi
         |  JOIN m${i - 1} mm ON bi.b = mm.id
         |  LEFT JOIN m${i - 1} ex ON bi.a = ex.id WHERE ex.id IS NULL GROUP BY bi.a),
         |cand$i AS MATERIALIZED (SELECT s.id, s.di,
         |    (SELECT extw FROM q${i - 1}) - s.di + (d.deg - s.di) AS ext2
         |  FROM sh$i s JOIN degt d ON s.id = d.id
         |  WHERE ((SELECT extw FROM q${i - 1}) - s.di + (d.deg - s.di)) = 0
         |     OR ((SELECT intw FROM q${i - 1}) + s.di) * (SELECT extw FROM q${i - 1}) >
         |        (SELECT intw FROM q${i - 1}) * ((SELECT extw FROM q${i - 1}) - s.di + (d.deg - s.di))),
         |b$i AS MATERIALIZED (SELECT id, di, ext2 FROM cand$i
         |  ORDER BY (CASE WHEN ext2 = 0 THEN 1 ELSE 0 END) DESC,
         |    (CASE WHEN ext2 = 0 THEN 0
         |          ELSE (((SELECT intw FROM q${i - 1}) + di) * 1000000000000 // ext2) END) DESC,
         |    id ASC LIMIT 1),
         |m$i AS MATERIALIZED (SELECT id, ord, deg_int FROM m${i - 1}
         |  UNION ALL SELECT id, CAST($i AS BIGINT), di FROM b$i),
         |q$i AS MATERIALIZED (SELECT
         |  q.intw + coalesce((SELECT di FROM b$i), 0) AS intw,
         |  coalesce((SELECT ext2 FROM b$i), q.extw) AS extw FROM q${i - 1} q)""".stripMargin
    }.mkString(",\n")
    s"""$base,
       |$biCte,
       |degt AS MATERIALIZED (SELECT a AS id, count(*) AS deg FROM bi GROUP BY a),
       |m0 AS MATERIALIZED (SELECT CAST($seed AS BIGINT) AS id, CAST(0 AS BIGINT) AS ord,
       |  CAST(0 AS BIGINT) AS deg_int),
       |q0 AS MATERIALIZED (SELECT CAST(0 AS BIGINT) AS intw,
       |  (SELECT deg FROM degt WHERE id = $seed) AS extw),
       |$stepCtes
       |SELECT id, ord, deg_int FROM m$steps""".stripMargin
  }

  // --- Path-sampling family (mirrors algo/PathSampling): deterministic LCG pairs,
  // msBFS from the distinct sources, min-id predecessor backward walk → hyperedge
  // rows (j, id) over path interiors. ---
  private def pathHyperedgeCtes(samples: Int, seed: Long, levels: Int,
                                preCtes: String = "",
                                sampleFilter: String = ""): String = {
    val b = seed * 92821L
    val walk = (1 to levels).map { r =>
      s"""wk$r AS MATERIALIZED (SELECT p.j, p.s, min(bi.a) AS cur, p.rem - 1 AS rem
         |  FROM wk${r - 1} p
         |  JOIN bi ON bi.b = p.cur
         |  JOIN st$levels x ON x.s = p.s AND x.id = bi.a AND x.dist = p.rem - 1
         |  WHERE p.rem > 1
         |  GROUP BY p.j, p.s, p.rem)""".stripMargin
    }.mkString(",\n")
    val hypUnion = (1 to levels)
      .map(r => s"SELECT j, cur AS id FROM wk$r").mkString("\n  UNION ALL ")
    s"""$base,
       |$biCte,
       |${if (preCtes.isEmpty) "" else preCtes + ",\n"}prs AS MATERIALIZED (SELECT j, s, t FROM (
       |  SELECT g AS j,
       |    ${genDraw(s"g * 2 + $b")} % (SELECT count(*) FROM verts) AS s,
       |    ${genDraw(s"g * 2 + 1 + $b")} % (SELECT count(*) FROM verts) AS t
       |  FROM generate_series(0, ${samples - 1}) q(g)) z
       |  WHERE s != t AND s IN (SELECT id FROM verts)
       |    AND t IN (SELECT id FROM verts)$sampleFilter),
       |${msBfsCtesFrom(
            "SELECT DISTINCT s, s AS id, 0 AS dist, CAST(1 AS BIGINT) AS sigma FROM prs",
            levels)},
       |wk0 AS MATERIALIZED (SELECT p.j, p.s, p.t AS cur, x.dist AS rem
       |  FROM prs p JOIN st$levels x ON x.s = p.s AND x.id = p.t),
       |$walk,
       |hyp AS MATERIALIZED ($hypUnion)""".stripMargin
  }

  /** Fixed-budget KADABRA-estimator twin (mirrors PathSampling.betweennessEstimate). */
  def kadabraEstimate(samples: Int, seed: Long, levels: Int): String =
    s"""${pathHyperedgeCtes(samples, seed, levels)}
       |SELECT v.id, coalesce(c.cnt, 0) AS cnt,
       |  CAST(coalesce(c.cnt, 0) AS DOUBLE) / $samples AS bc_est
       |FROM verts v
       |LEFT JOIN (SELECT id, count(*) AS cnt FROM hyp GROUP BY 1) c ON v.id = c.id""".stripMargin

  /** Adaptive ApproxBetweenness twin (mirrors PathSampling.approxBetweennessAdaptive):
    * vd = two-sweep lower bound + 1, integer ⌊log₂(vd−2)⌋ via a generate_series max
    * (no library log), r = least(maxSamples, ⌈cEps·(k + 1 + lnInvDelta)⌉), then the
    * capped sample universe filtered to j < r. */
  def approxBetweennessAdaptive(cEps: Long, lnInvDelta: Double, maxSamples: Int,
                                seed: Long, sweepRounds: Int, levels: Int): String = {
    val inf = 999999L
    def sweep(prefix: String, sourceExpr: String): String = {
      val steps = (1 to sweepRounds).map { i =>
        s"""$prefix$i AS MATERIALIZED (SELECT d.id, least(d.dist, coalesce(m.md, d.dist)) AS dist
           |  FROM $prefix${i - 1} d LEFT JOIN (
           |    SELECT bi.b AS id, min(x.dist) + 1 AS md FROM bi JOIN $prefix${i - 1} x ON bi.a = x.id
           |    GROUP BY bi.b) m ON d.id = m.id)""".stripMargin
      }.mkString(",\n")
      s"""${prefix}0 AS MATERIALIZED (SELECT id, CASE WHEN id = ($sourceExpr) THEN 0 ELSE $inf END AS dist FROM verts),
         |$steps""".stripMargin
    }
    val pre =
      s"""${sweep("da", "0")},
         |uu AS MATERIALIZED (SELECT min(id) AS u FROM da$sweepRounds
         |  WHERE dist < $inf AND dist = (SELECT max(dist) FROM da$sweepRounds WHERE dist < $inf)),
         |${sweep("db", "SELECT u FROM uu")},
         |vdd AS MATERIALIZED (SELECT CAST(max(dist) AS BIGINT) + 1 AS vd
         |  FROM db$sweepRounds WHERE dist < $inf),
         |kk AS MATERIALIZED (SELECT (SELECT max(p) FROM generate_series(0, 62) t(p)
         |  WHERE (CAST(1 AS BIGINT) << p) <= (SELECT vd FROM vdd) - 2) AS k),
         |rr AS MATERIALIZED (SELECT CASE WHEN (SELECT vd FROM vdd) <= 2 THEN 0
         |  ELSE CAST(least($maxSamples, ceil($cEps * ((SELECT k FROM kk) + 1 + $lnInvDelta))) AS BIGINT)
         |  END AS r)""".stripMargin
    s"""${pathHyperedgeCtes(maxSamples, seed, levels, preCtes = pre,
          sampleFilter = "\n    AND j < (SELECT r FROM rr)")}
       |SELECT v.id, coalesce(c.cnt, 0) AS cnt,
       |  CASE WHEN (SELECT r FROM rr) = 0 THEN 0.0
       |       ELSE CAST(coalesce(c.cnt, 0) AS DOUBLE) / (SELECT r FROM rr) END AS bc_est
       |FROM verts v
       |LEFT JOIN (SELECT id, count(*) AS cnt FROM hyp GROUP BY 1) c ON v.id = c.id""".stripMargin
  }

  /** Adaptive-KADABRA twin (mirrors PathSampling.kadabraAdaptive): two-sweep vd,
    * ω = min(maxSamples, ⌈(0.5/ε²)·(⌊log₂(vd−1)⌋ + 1 + ln(0.5/δ))⌉), τ = ω/startFactor,
    * power-of-two δ-guess from the τ-phase counts, round-doubling schedule
    * t ∈ {τ·2^r < ω}, per-(c1,ct)-class Borassi–Natale f/g Chernoff bounds with the
    * EXACT same IEEE expression shapes as the engine (sqrt and +,−,×,÷ only —
    * correctly rounded in both engines), t* = first finishing t else ω. */
  def kadabraAdaptive(err: Double, lnHalfInvDelta: Double, lnTwoInvDelta: Double,
                      startFactor: Long, maxSamples: Int, seed: Long,
                      sweepRounds: Int, levels: Int): String = {
    val LN2 = 0.6931471805599453
    val inf = 999999L
    def sweep(prefix: String, sourceExpr: String): String = {
      val steps = (1 to sweepRounds).map { i =>
        s"""$prefix$i AS MATERIALIZED (SELECT d.id, least(d.dist, coalesce(m.md, d.dist)) AS dist
           |  FROM $prefix${i - 1} d LEFT JOIN (
           |    SELECT bi.b AS id, min(x.dist) + 1 AS md FROM bi JOIN $prefix${i - 1} x ON bi.a = x.id
           |    GROUP BY bi.b) m ON d.id = m.id)""".stripMargin
      }.mkString(",\n")
      s"""${prefix}0 AS MATERIALIZED (SELECT id, CASE WHEN id = ($sourceExpr) THEN 0 ELSE $inf END AS dist FROM verts),
         |$steps""".stripMargin
    }
    val pre =
      s"""${sweep("da", "0")},
         |uu AS MATERIALIZED (SELECT min(id) AS u FROM da$sweepRounds
         |  WHERE dist < $inf AND dist = (SELECT max(dist) FROM da$sweepRounds WHERE dist < $inf)),
         |${sweep("db", "SELECT u FROM uu")},
         |vdd AS MATERIALIZED (SELECT CAST(max(dist) AS BIGINT) + 1 AS vd
         |  FROM db$sweepRounds WHERE dist < $inf),
         |pw AS MATERIALIZED (SELECT p, (CAST(1 AS BIGINT) << p) AS v FROM generate_series(0, 62) s(p)),
         |kk AS MATERIALIZED (SELECT (SELECT max(p) FROM pw
         |  WHERE v <= (SELECT vd FROM vdd) - 1) AS k),
         |om AS MATERIALIZED (SELECT CASE WHEN (SELECT vd FROM vdd) <= 1 THEN CAST(0 AS BIGINT)
         |  ELSE CAST(least($maxSamples, ceil((CAST(0.5 AS DOUBLE) / (CAST($err AS DOUBLE) * CAST($err AS DOUBLE))) *
         |    ((SELECT k FROM kk) + 1 + CAST($lnHalfInvDelta AS DOUBLE)))) AS BIGINT) END AS omega),
         |tu AS MATERIALIZED (SELECT greatest(1, (SELECT omega FROM om) // $startFactor) AS tau)""".stripMargin
    s"""${pathHyperedgeCtes(maxSamples, seed, levels, preCtes = pre,
          sampleFilter = "\n    AND j < (SELECT omega FROM om)")},
       |ts AS MATERIALIZED (SELECT DISTINCT
       |  (SELECT tau FROM tu) * (CAST(1 AS BIGINT) << r) AS t
       |  FROM generate_series(0, 30) s(r)
       |  WHERE (SELECT tau FROM tu) * (CAST(1 AS BIGINT) << r) < (SELECT omega FROM om)),
       |c1n AS MATERIALIZED (SELECT id, count(*) AS c1 FROM hyp
       |  WHERE j < (SELECT tau FROM tu) GROUP BY 1),
       |ww AS MATERIALIZED (SELECT CAST(coalesce((SELECT sum(c1) FROM c1n), 0)
       |  + (SELECT count(*) FROM verts) AS BIGINT) AS w),
       |iww AS MATERIALIZED (SELECT (SELECT max(p) FROM pw WHERE v <= (SELECT w FROM ww)) AS iw),
       |ctn AS MATERIALIZED (SELECT ts.t, h.id, count(*) AS ct FROM ts, hyp h
       |  WHERE h.j < ts.t GROUP BY 1, 2),
       |cls AS MATERIALIZED (SELECT DISTINCT ts.t, coalesce(c1n.c1, 0) AS c1,
       |    coalesce(ctn.ct, 0) AS ct
       |  FROM ts CROSS JOIN verts v
       |  LEFT JOIN c1n ON c1n.id = v.id
       |  LEFT JOIN ctn ON ctn.t = ts.t AND ctn.id = v.id),
       |ers AS MATERIALIZED (SELECT t, c1, ct,
       |    (CAST($lnTwoInvDelta AS DOUBLE) + ((SELECT iw FROM iww) + 1
       |      - (SELECT max(p) FROM pw WHERE v <= c1 + 1)) * CAST($LN2 AS DOUBLE)) AS lv,
       |    (CAST(ct AS DOUBLE) / t) AS bt,
       |    ((CAST((SELECT omega FROM om) AS DOUBLE) / t) - (CAST(1.0 AS DOUBLE) / 3)) AS tmpl,
       |    ((CAST((SELECT omega FROM om) AS DOUBLE) / t) + (CAST(1.0 AS DOUBLE) / 3)) AS tmpu,
       |    CAST((SELECT omega FROM om) AS DOUBLE) AS omd
       |  FROM cls),
       |fin AS MATERIALIZED (SELECT t, bool_and(
       |    (least((lv / t) * ((-tmpl) + sqrt((tmpl * tmpl) + (((CAST(2.0 AS DOUBLE) * bt) * omd) / lv))), bt) < CAST($err AS DOUBLE))
       |    AND
       |    (least((lv / t) * (tmpu + sqrt((tmpu * tmpu) + (((CAST(2.0 AS DOUBLE) * bt) * omd) / lv))), CAST(1.0 AS DOUBLE) - bt) < CAST($err AS DOUBLE))
       |  ) AS ok FROM ers GROUP BY t),
       |tstar AS MATERIALIZED (SELECT coalesce((SELECT min(t) FROM fin WHERE ok),
       |  (SELECT omega FROM om)) AS t)
       |SELECT v.id, coalesce(c.cnt, 0) AS cnt, (SELECT t FROM tstar) AS t_star,
       |  CASE WHEN (SELECT t FROM tstar) = 0 THEN 0.0
       |       ELSE CAST(coalesce(c.cnt, 0) AS DOUBLE) / (SELECT t FROM tstar) END AS bc_est
       |FROM verts v
       |LEFT JOIN (SELECT id, count(*) AS cnt FROM hyp
       |  WHERE j < (SELECT t FROM tstar) GROUP BY 1) c ON v.id = c.id""".stripMargin
  }

  /** Greedy max-coverage group betweenness (mirrors
    * PathSampling.approxGroupBetweenness): k unrolled greedy steps over the alive
    * hyperedges, tie-break (gain DESC, id ASC). */
  def approxGroupBetweenness(k: Int, samples: Int, seed: Long, levels: Int): String = {
    val steps = (1 to k).map { i =>
      s"""gn$i AS MATERIALIZED (SELECT v.id, coalesce(c.cnt, 0) AS gain FROM verts v
         |  LEFT JOIN (SELECT h.id, count(*) AS cnt FROM hyp h
         |    JOIN ha${i - 1} a ON h.j = a.j GROUP BY 1) c ON v.id = c.id
         |  WHERE v.id NOT IN (SELECT id FROM hp${i - 1} WHERE id IS NOT NULL)),
         |hb$i AS MATERIALIZED (SELECT CAST(${i - 1} AS BIGINT) AS ord, id,
         |  CAST(gain AS BIGINT) AS gain FROM gn$i ORDER BY gain DESC, id ASC LIMIT 1),
         |hp$i AS MATERIALIZED (SELECT * FROM hp${i - 1} UNION ALL SELECT * FROM hb$i),
         |ha$i AS MATERIALIZED (SELECT a.j FROM ha${i - 1} a WHERE a.j NOT IN
         |  (SELECT h.j FROM hyp h JOIN hb$i bb ON h.id = bb.id))""".stripMargin
    }.mkString(",\n")
    s"""${pathHyperedgeCtes(samples, seed, levels)},
       |hp0 AS MATERIALIZED (SELECT CAST(NULL AS BIGINT) AS ord, CAST(NULL AS BIGINT) AS id,
       |  CAST(NULL AS BIGINT) AS gain WHERE 1 = 0),
       |ha0 AS MATERIALIZED (SELECT DISTINCT j FROM hyp),
       |$steps
       |SELECT ord, id, gain FROM hp$k""".stripMargin
  }

  // --- Electrical family (mirrors algo/Electrical.solveBatch): damped truncating
  // integer Jacobi on the grounded Laplacian, batched over probes. `probeDef` must
  // define qs (q) and pb (id, q, b); the CTE chain ends at x$iters (id, q, x). ---
  private def jacobiCtes(scale: Long, iters: Int, probeDef: String): String = {
    val steps = (1 to iters).map { i =>
      s"""jm$i AS MATERIALIZED (SELECT bi.b AS id, x.q, sum(x.x) AS m
         |  FROM x${i - 1} x JOIN bi ON x.id = bi.a GROUP BY 1, 2),
         |x$i AS MATERIALIZED (SELECT b.id, b.q,
         |  CAST(CASE WHEN b.id = 0 OR b.deg = 0 THEN 0
         |       ELSE (x.x + (b.b * $scale + coalesce(m.m, 0)) // b.deg) // 2
         |  END AS BIGINT) AS x
         |  FROM bb b
         |  JOIN x${i - 1} x ON b.id = x.id AND b.q = x.q
         |  LEFT JOIN jm$i m ON b.id = m.id AND b.q = m.q)""".stripMargin
    }.mkString(",\n")
    s"""$base,
       |$biCte,
       |jdeg AS MATERIALIZED (SELECT a AS id, count(*) AS deg FROM bi GROUP BY 1),
       |$probeDef,
       |bb AS MATERIALIZED (SELECT v.id, q.q,
       |  coalesce(d.deg, 0) AS deg, coalesce(p.b, 0) AS b
       |  FROM verts v CROSS JOIN qs q
       |  LEFT JOIN jdeg d ON v.id = d.id
       |  LEFT JOIN pb p ON v.id = p.id AND q.q = p.q),
       |x0 AS MATERIALIZED (SELECT id, q, CAST(0 AS BIGINT) AS x FROM bb),
       |$steps""".stripMargin
  }

  private def jltProbeDef(k: Int, seed: Long): String =
    s"""qs AS MATERIALIZED (SELECT g AS q FROM generate_series(0, ${k - 1}) t(g)),
       |cu AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
       |  FROM edges),
       |sg AS MATERIALIZED (SELECT u, v, q,
       |  ${graft.algo.Electrical.signSql("u", "v", "q", seed, duck = true)} AS s
       |  FROM cu CROSS JOIN qs),
       |pb AS MATERIALIZED (SELECT id, q, sum(b) AS b FROM (
       |  SELECT u AS id, q, s AS b FROM sg
       |  UNION ALL SELECT v AS id, q, -s AS b FROM sg) GROUP BY 1, 2)""".stripMargin

  /** Exact-pair effective resistance + commute time for pairs (0, v), v % mod = 0,
    * v != 0 (mirrors Electrical.effectiveResistance). */
  def effectiveResistance(mod: Long, iters: Int, scale: Long): String = {
    val probeDef =
      s"""pr AS MATERIALIZED (SELECT id AS q, CAST(0 AS BIGINT) AS u, id AS v
         |  FROM verts WHERE id % $mod = 0 AND id != 0),
         |qs AS MATERIALIZED (SELECT q FROM pr),
         |pb AS MATERIALIZED (SELECT id, q, sum(b) AS b FROM (
         |  SELECT u AS id, q, 1 AS b FROM pr
         |  UNION ALL SELECT v AS id, q, -1 AS b FROM pr) GROUP BY 1, 2)""".stripMargin
    s"""${jacobiCtes(scale, iters, probeDef)},
       |cu2 AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
       |  FROM edges)
       |SELECT p.q, CAST(xu.x - xv.x AS BIGINT) AS r_scaled,
       |  CAST(xu.x - xv.x AS DOUBLE) / $scale AS r,
       |  2.0 * (SELECT count(*) FROM cu2) * CAST(xu.x - xv.x AS DOUBLE) / $scale AS commute
       |FROM pr p
       |JOIN x$iters xu ON xu.id = p.u AND xu.q = p.q
       |JOIN x$iters xv ON xv.id = p.v AND xv.q = p.q""".stripMargin
  }

  /** ERD2 effective-resistance-distance matrix (mirrors Electrical.erdMatrix):
    * degree-1 peel (support degree > 1), batched Jacobi probes per distinct core
    * pair grounded at the core's min id, then R(leaf, ·) = R(support, ·) + 1. */
  def erdMatrix(mod: Long, iters: Int, scale: Long): String = {
    val Q = 1L << 31
    val steps = (1 to iters).map { i =>
      s"""jm$i AS MATERIALIZED (SELECT cbi.b AS id, x.q, sum(x.x) AS m
         |  FROM x${i - 1} x JOIN cbi ON x.id = cbi.a GROUP BY 1, 2),
         |x$i AS MATERIALIZED (SELECT b.id, b.q,
         |  CAST(CASE WHEN b.id = (SELECT g FROM gnd) OR b.deg = 0 THEN 0
         |       ELSE (x.x + (b.b * $scale + coalesce(m.m, 0)) // b.deg) // 2
         |  END AS BIGINT) AS x
         |  FROM bb b
         |  JOIN x${i - 1} x ON b.id = x.id AND b.q = x.q
         |  LEFT JOIN jm$i m ON b.id = m.id AND b.q = m.q)""".stripMargin
    }.mkString(",\n")
    s"""$base,
       |$biCte,
       |jdeg AS MATERIALIZED (SELECT a AS id, count(*) AS deg FROM bi GROUP BY 1),
       |lv AS MATERIALIZED (SELECT d.id, min(bi.b) AS nb FROM jdeg d
       |  JOIN bi ON d.id = bi.a WHERE d.deg = 1 GROUP BY d.id),
       |sup AS MATERIALIZED (SELECT lv.id, lv.nb FROM lv
       |  JOIN jdeg nd ON lv.nb = nd.id WHERE nd.deg > 1),
       |cbi AS MATERIALIZED (SELECT bi.a, bi.b FROM bi
       |  LEFT JOIN sup s1 ON bi.a = s1.id LEFT JOIN sup s2 ON bi.b = s2.id
       |  WHERE s1.id IS NULL AND s2.id IS NULL),
       |cdeg AS MATERIALIZED (SELECT a AS id, count(*) AS deg FROM cbi GROUP BY 1),
       |cverts AS MATERIALIZED (SELECT v.id FROM verts v
       |  LEFT JOIN sup s ON v.id = s.id WHERE s.id IS NULL),
       |gnd AS MATERIALIZED (SELECT min(id) AS g FROM cverts),
       |ss AS MATERIALIZED (SELECT v.id, coalesce(s.nb, v.id) AS m,
       |  CASE WHEN s.id IS NULL THEN 0 ELSE 1 END AS peeled
       |  FROM verts v LEFT JOIN sup s ON v.id = s.id WHERE v.id % $mod = 0),
       |prs AS MATERIALIZED (SELECT a.id AS u, b.id AS v,
       |  least(a.m, b.m) AS cu, greatest(a.m, b.m) AS cv,
       |  a.peeled + b.peeled AS peels FROM ss a JOIN ss b ON a.id < b.id),
       |cp AS MATERIALIZED (SELECT DISTINCT cu, cv FROM prs WHERE cu <> cv),
       |qs AS MATERIALIZED (SELECT cu * $Q + cv AS q FROM cp),
       |pb AS MATERIALIZED (SELECT id, q, sum(b) AS b FROM (
       |  SELECT cu AS id, cu * $Q + cv AS q, 1 AS b FROM cp
       |  UNION ALL SELECT cv, cu * $Q + cv, -1 FROM cp) GROUP BY 1, 2),
       |bb AS MATERIALIZED (SELECT v.id, q.q,
       |  coalesce(d.deg, 0) AS deg, coalesce(p.b, 0) AS b
       |  FROM cverts v CROSS JOIN qs q
       |  LEFT JOIN cdeg d ON v.id = d.id
       |  LEFT JOIN pb p ON v.id = p.id AND q.q = p.q),
       |x0 AS MATERIALIZED (SELECT id, q, CAST(0 AS BIGINT) AS x FROM bb),
       |$steps,
       |xr AS MATERIALIZED (SELECT cp.cu, cp.cv, xu.x - xv.x AS r FROM cp
       |  JOIN x$iters xu ON xu.id = cp.cu AND xu.q = cp.cu * $Q + cp.cv
       |  JOIN x$iters xv ON xv.id = cp.cv AND xv.q = cp.cu * $Q + cp.cv)
       |SELECT p.u, p.v,
       |  CAST(coalesce(xr.r, 0) + p.peels * $scale AS BIGINT) AS r_scaled,
       |  (coalesce(xr.r, 0) + p.peels * $scale)::double / $scale AS r
       |FROM prs p LEFT JOIN xr ON p.cu = xr.cu AND p.cv = xr.cv""".stripMargin
  }

  /** JLT spanning-edge centrality (mirrors Electrical.spanningEdgeCentrality). */
  def spanningEdge(k: Int, iters: Int, seed: Long, scale: Long): String = {
    val denom = k.toDouble * scale * scale
    s"""${jacobiCtes(scale, iters, jltProbeDef(k, seed))}
       |SELECT cu.u AS src, cu.v AS dst,
       |  CAST(sum((xu.x - xv.x) * (xu.x - xv.x)) AS BIGINT) AS sec_scaled,
       |  CAST(sum((xu.x - xv.x) * (xu.x - xv.x)) AS DOUBLE) / $denom AS sec
       |FROM cu
       |JOIN x$iters xu ON xu.id = cu.u
       |JOIN x$iters xv ON xv.id = cu.v AND xv.q = xu.q
       |GROUP BY 1, 2""".stripMargin
  }

  /** Current-flow group closeness (mirrors Electrical.currentFlowGroupCloseness):
    * rsq(c,v) from the shared JLT probe solutions, k unrolled greedy
    * farness-reduction steps, inf = 2^45 (the engine's overflow-safe sentinel). */
  def cfGroupCloseness(k: Int, poolMod: Long, targetMod: Long, probes: Int,
                       iters: Int, seed: Long, scale: Long): String = {
    val inf = 1L << 45
    val steps = (1 to k).map { i =>
      s"""cg$i AS MATERIALIZED (SELECT r.c, sum(b.best - least(b.best, r.rsq)) AS gain
         |  FROM rr r JOIN bst${i - 1} b ON r.v = b.v
         |  WHERE r.c NOT IN (SELECT id FROM cp${i - 1} WHERE id IS NOT NULL)
         |  GROUP BY r.c),
         |cb$i AS MATERIALIZED (SELECT CAST(${i - 1} AS BIGINT) AS ord, c AS id,
         |  CAST(gain AS BIGINT) AS gain_scaled FROM cg$i
         |  ORDER BY gain DESC, c ASC LIMIT 1),
         |cp$i AS MATERIALIZED (SELECT * FROM cp${i - 1} UNION ALL SELECT * FROM cb$i),
         |bst$i AS MATERIALIZED (SELECT b.v,
         |  CAST(least(b.best, coalesce(r.rsq, b.best)) AS BIGINT) AS best
         |  FROM bst${i - 1} b LEFT JOIN (SELECT rr.v, rr.rsq FROM rr
         |    JOIN cb$i ON rr.c = cb$i.id) r ON b.v = r.v)""".stripMargin
    }.mkString(",\n")
    s"""${jacobiCtes(scale, iters, jltProbeDef(probes, seed))},
       |ys AS MATERIALIZED (SELECT id, q, x // 64 AS y FROM x$iters),
       |rr AS MATERIALIZED (SELECT ca.id AS c, ta.id AS v,
       |  CAST(sum((ca.y - ta.y) * (ca.y - ta.y)) AS BIGINT) AS rsq
       |  FROM (SELECT * FROM ys WHERE id % $poolMod = 0) ca
       |  JOIN (SELECT * FROM ys WHERE id % $targetMod = 0) ta ON ca.q = ta.q
       |  GROUP BY 1, 2),
       |bst0 AS MATERIALIZED (SELECT DISTINCT v, CAST($inf AS BIGINT) AS best FROM rr),
       |cp0 AS MATERIALIZED (SELECT CAST(NULL AS BIGINT) AS ord, CAST(NULL AS BIGINT) AS id,
       |  CAST(NULL AS BIGINT) AS gain_scaled WHERE 1 = 0),
       |$steps
       |SELECT ord, id, gain_scaled FROM cp$k""".stripMargin
  }

  /** JLT electrical closeness (mirrors Electrical.electricalCloseness): farness =
    * Σ_q (n·y² − 2·y·S_q + T_q), y = x div 64. n comes from the data (count of
    * verts), matching the engine's g.n; every factor of the closeness constant is an
    * exact-in-double integer, so the product order is associativity-safe. */
  def electricalCloseness(k: Int, iters: Int, seed: Long, scale: Long): String = {
    val sEff = scale / 64L
    s"""${jacobiCtes(scale, iters, jltProbeDef(k, seed))},
       |ncv AS MATERIALIZED (SELECT count(*) AS n FROM verts),
       |ys AS MATERIALIZED (SELECT id, q, x // 64 AS y FROM x$iters),
       |st AS MATERIALIZED (SELECT q, sum(y) AS sq, sum(y * y) AS tq FROM ys GROUP BY 1)
       |SELECT ys.id,
       |  CAST(sum((SELECT n FROM ncv) * y * y - 2 * y * st.sq + st.tq) AS BIGINT)
       |    AS farness_scaled,
       |  CASE WHEN sum((SELECT n FROM ncv) * y * y - 2 * y * st.sq + st.tq) > 0
       |       THEN CAST((SELECT n FROM ncv) - 1 AS DOUBLE) * ${k.toDouble * sEff * sEff}
       |            / sum((SELECT n FROM ncv) * y * y - 2 * y * st.sq + st.tq)
       |       ELSE 0.0 END AS closeness
       |FROM ys JOIN st ON ys.q = st.q
       |GROUP BY 1""".stripMargin
  }

  /** LAMG-style two-level multigrid solve (mirrors Multigrid.solve with levels = 2):
    * heavy-edge-matching aggregation (ground pinned out), Galerkin coarse operator =
    * contracted weight-summed graph, damped truncating-integer weighted Jacobi
    * smoothing, `cycles` unrolled V(ν₁,ν₂)-cycles with a `coarseIters`-sweep coarsest
    * solve. Everything is int64 with `//` truncation, replaying the engine
    * bit-exactly. Output per probe q (= node id, pair (0, q)): r_scaled = −x(q),
    * plus whole-vector checksums. */
  def lamg(mod: Long, matchRounds: Int, nu1: Int, nu2: Int, coarseIters: Int,
           cycles: Int, scale: Long, overNum: Long = 3L, overDen: Long = 2L): String = {
    // One damped-Jacobi sweep `to` from state `from` over (baseT, biT); rhs comes
    // from baseT.rhs (fine) or an rhs CTE (coarse correction systems).
    def sweep(to: String, from: String, baseT: String, biT: String,
              rhsExpr: String, rhsJoin: String): String =
      s"""${to}_m AS MATERIALIZED (SELECT bw.b AS id, x.q, sum(bw.w * x.x) AS m
         |  FROM $from x JOIN $biT bw ON x.id = bw.a GROUP BY 1, 2),
         |$to AS MATERIALIZED (SELECT b.id, b.q,
         |  CAST(CASE WHEN b.id = 0 OR b.wdeg = 0 THEN 0
         |       ELSE (x.x + ($rhsExpr + coalesce(m.m, 0)) // b.wdeg) // 2
         |  END AS BIGINT) AS x
         |  FROM $baseT b
         |  JOIN $from x ON b.id = x.id AND b.q = x.q$rhsJoin
         |  LEFT JOIN ${to}_m m ON b.id = m.id AND b.q = m.q)""".stripMargin
    val cycleCtes = (1 to cycles).map { c =>
      val preIn = if (c == 1) "y0" else s"y${c - 1}"
      val pre = (1 to nu1).map { j =>
        sweep(s"f${c}s$j", if (j == 1) preIn else s"f${c}s${j - 1}",
          "bb", "bi0", "b.rhs", "")
      }.mkString(",\n")
      val top = s"f${c}s$nu1"
      val coarse = (1 to coarseIters).map { k =>
        sweep(s"e$c$k", if (k == 1) s"e${c}0" else s"e$c${k - 1}",
          "cb", "cbi", "coalesce(rc.rhs, 0)",
          s"\n  LEFT JOIN rc$c rc ON b.id = rc.id AND b.q = rc.q")
      }.mkString(",\n")
      val post = (1 to nu2).map { j =>
        sweep(s"g${c}s$j", if (j == 1) s"pc$c" else s"g${c}s${j - 1}",
          "bb", "bi0", "b.rhs", "")
      }.mkString(",\n")
      s"""$pre,
         |rm$c AS MATERIALIZED (SELECT bw.b AS id, x.q, sum(bw.w * x.x) AS m
         |  FROM $top x JOIN bi0 bw ON x.id = bw.a GROUP BY 1, 2),
         |rr$c AS MATERIALIZED (SELECT b.id, b.q,
         |  CAST(CASE WHEN b.id = 0 OR b.wdeg = 0 THEN 0
         |       ELSE b.rhs - b.wdeg * x.x + coalesce(m.m, 0) END AS BIGINT) AS r
         |  FROM bb b JOIN $top x ON b.id = x.id AND b.q = x.q
         |  LEFT JOIN rm$c m ON b.id = m.id AND b.q = m.q),
         |rc$c AS MATERIALIZED (SELECT p.label AS id, r.q, CAST(sum(r.r) AS BIGINT) AS rhs
         |  FROM rr$c r JOIN mpart p ON r.id = p.id GROUP BY 1, 2),
         |e${c}0 AS MATERIALIZED (SELECT id, q, CAST(0 AS BIGINT) AS x FROM cb),
         |$coarse,
         |pc$c AS MATERIALIZED (SELECT x.id, x.q,
         |  CAST(x.x + (coalesce(e.x, 0) * $overNum) // $overDen AS BIGINT) AS x
         |  FROM $top x JOIN mpart p ON x.id = p.id
         |  LEFT JOIN e$c$coarseIters e ON p.label = e.id AND x.q = e.q),
         |$post,
         |y$c AS MATERIALIZED (SELECT id, q, x FROM g${c}s$nu2)""".stripMargin
    }.mkString(",\n")
    s"""$base,
       |und0 AS MATERIALIZED (SELECT least(src, dst) AS src, greatest(src, dst) AS dst,
       |  CAST(1 AS BIGINT) AS w FROM (SELECT DISTINCT least(src, dst) AS src,
       |  greatest(src, dst) AS dst FROM edges)),
       |bi0 AS MATERIALIZED (SELECT src AS a, dst AS b, w FROM und0
       |  UNION ALL SELECT dst, src, w FROM und0),
       |wd0 AS MATERIALIZED (SELECT a AS id, sum(w) AS wdeg FROM bi0 GROUP BY 1),
       |pr AS MATERIALIZED (SELECT id AS q, CAST(0 AS BIGINT) AS u, id AS v
       |  FROM verts WHERE id % $mod = 0 AND id != 0),
       |qs AS MATERIALIZED (SELECT q FROM pr),
       |pb AS MATERIALIZED (SELECT id, q, sum(b) AS b FROM (
       |  SELECT u AS id, q, 1 AS b FROM pr
       |  UNION ALL SELECT v AS id, q, -1 AS b FROM pr) GROUP BY 1, 2),
       |bb AS MATERIALIZED (SELECT v.id, q.q,
       |  coalesce(d.wdeg, 0) AS wdeg, coalesce(p.b, 0) * $scale AS rhs
       |  FROM verts v CROSS JOIN qs q
       |  LEFT JOIN wd0 d ON v.id = d.id
       |  LEFT JOIN pb p ON v.id = p.id AND q.q = p.q),
       |mr0 AS MATERIALIZED (SELECT src, dst,
       |  least(w, ${graft.synth.GraphSpec.M - 1L}) * ${graft.synth.GraphSpec.M} +
       |  ${graft.synth.Generators.drawSql("src * 1000003 + dst * 31 + 7", duck = true)} AS w
       |  FROM und0 WHERE src != 0 AND dst != 0),
       |ma0 AS MATERIALIZED (SELECT src, dst, w FROM mr0 WHERE 1 = 0),
       |${matchSteps("m", matchRounds)},
       |mpart AS MATERIALIZED (SELECT v.id, coalesce(m.nc, v.id) AS label FROM verts v
       |  LEFT JOIN (SELECT src AS c, src AS nc FROM ma$matchRounds
       |             UNION ALL SELECT dst, src FROM ma$matchRounds) m ON v.id = m.c),
       |ce AS MATERIALIZED (SELECT least(ls.label, ld.label) AS src,
       |  greatest(ls.label, ld.label) AS dst, CAST(sum(u.w) AS BIGINT) AS w
       |  FROM und0 u JOIN mpart ls ON u.src = ls.id JOIN mpart ld ON u.dst = ld.id
       |  WHERE ls.label != ld.label GROUP BY 1, 2),
       |cbi AS MATERIALIZED (SELECT src AS a, dst AS b, w FROM ce
       |  UNION ALL SELECT dst, src, w FROM ce),
       |cwd AS MATERIALIZED (SELECT a AS id, sum(w) AS wdeg FROM cbi GROUP BY 1),
       |cb AS MATERIALIZED (SELECT cv.id, q.q, coalesce(d.wdeg, 0) AS wdeg
       |  FROM (SELECT DISTINCT label AS id FROM mpart) cv CROSS JOIN qs q
       |  LEFT JOIN cwd d ON cv.id = d.id),
       |y0 AS MATERIALIZED (SELECT id, q, CAST(0 AS BIGINT) AS x FROM bb),
       |$cycleCtes,
       |chks AS MATERIALIZED (SELECT q, CAST(sum(x) AS BIGINT) AS chk,
       |  CAST(sum(abs(x)) AS BIGINT) AS chk_abs FROM y$cycles GROUP BY 1)
       |SELECT p.q, CAST(-x.x AS BIGINT) AS r_scaled,
       |  CAST(-x.x AS DOUBLE) / $scale AS r, c.chk, c.chk_abs
       |FROM pr p
       |JOIN y$cycles x ON x.id = p.v AND x.q = p.q
       |JOIN chks c ON c.q = p.q""".stripMargin
  }
}
