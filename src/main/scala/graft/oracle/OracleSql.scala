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

  val degrees: String =
    s"""$base,
       |od AS MATERIALIZED (SELECT src AS id, count(*) AS c FROM edges GROUP BY src),
       |idg AS MATERIALIZED (SELECT dst AS id, count(*) AS c FROM edges GROUP BY dst)
       |SELECT v.id, CAST(coalesce(od.c, 0) AS BIGINT) AS out_deg,
       |       CAST(coalesce(idg.c, 0) AS BIGINT) AS in_deg
       |FROM verts v LEFT JOIN od ON v.id = od.id LEFT JOIN idg ON v.id = idg.id
       |""".stripMargin

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

  private val biCte =
    "bi AS MATERIALIZED (SELECT src AS a, dst AS b FROM edges UNION SELECT dst, src FROM edges)"

  /** Min-label propagation to fixpoint — `rounds` must exceed the graph's label-diameter
    * (measured 5 at sf0.01; 12 gives margin). Mirrors ConnectedComponents.run. */
  def components(rounds: Int = 12): String = {
    val steps = (1 to rounds).map { i =>
      s"""l$i AS MATERIALIZED (SELECT l.id, least(l.label, coalesce(m.ml, l.label)) AS label
         |  FROM l${i - 1} l LEFT JOIN (
         |    SELECT bi.b AS id, min(x.label) AS ml FROM bi JOIN l${i - 1} x ON bi.a = x.id
         |    GROUP BY bi.b) m ON l.id = m.id)""".stripMargin
    }.mkString(",\n")
    s"""$base,
       |$biCte,
       |l0 AS MATERIALIZED (SELECT id, id AS label FROM verts),
       |$steps
       |SELECT id, label FROM l$rounds""".stripMargin
  }

  /** PLP, `rounds` fixed synchronous rounds, heaviest-label / smallest-id tie-break.
    * Mirrors LabelPropagation.fixedRounds. */
  def plp(rounds: Int): String = {
    val steps = (1 to rounds).map { i =>
      s"""p$i AS MATERIALIZED (SELECT v.id, coalesce(b.cand, v.label) AS label
         |  FROM p${i - 1} v LEFT JOIN (
         |    SELECT id, cand FROM (
         |      SELECT bi.b AS id, x.label AS cand,
         |             row_number() OVER (PARTITION BY bi.b ORDER BY count(*) DESC, x.label ASC) AS rn
         |      FROM bi JOIN p${i - 1} x ON bi.a = x.id GROUP BY bi.b, x.label) t
         |    WHERE rn = 1) b ON v.id = b.id)""".stripMargin
    }.mkString(",\n")
    s"""$base,
       |$biCte,
       |p0 AS MATERIALIZED (SELECT id, id AS label FROM verts),
       |$steps
       |SELECT id, label FROM p$rounds""".stripMargin
  }

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
}
