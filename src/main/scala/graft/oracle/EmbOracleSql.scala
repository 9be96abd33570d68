package graft.oracle

import graft.emb.Embeddings

/** DuckDB oracle twins of [[graft.emb.Embeddings]]. Vectors are scaled to exact
  * integers, so dot products / norms are exact integer values even through DuckDB's
  * double-based list_dot_product (all partial sums < 2^53); cosine is the identical
  * double expression on both engines.
  */
object EmbOracleSql {
  import Embeddings.{Dim, MaxBucketFreq, NumPlanes, NumTables, Scale, coef}

  /** (vec_id, v int-list-as-double, nrm) — exact values in doubles. */
  private val vecCte =
    s"""v AS MATERIALIZED (
       |  SELECT vec_id,
       |    list_transform(embedding, x -> floor(x::double * $Scale)) AS v
       |  FROM embeddings),
       |vn AS MATERIALIZED (
       |  SELECT vec_id, v, list_dot_product(v, v) AS nrm FROM v)""".stripMargin

  def bruteTopK(numQueries: Int = 20, k: Int = 5): String =
    s"""WITH $vecCte,
       |q AS MATERIALIZED (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM vn WHERE vec_id < $numQueries),
       |scored AS MATERIALIZED (
       |  SELECT query_id, vec_id AS neighbor_id,
       |    list_dot_product(qv, v)/sqrt(qn)/sqrt(nrm) AS cos
       |  FROM vn CROSS JOIN q WHERE vec_id != query_id),
       |ranked AS (SELECT query_id, neighbor_id, cos,
       |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS BIGINT) AS rnk
       |  FROM scored)
       |SELECT query_id, rnk, neighbor_id, cos FROM ranked WHERE rnk <= $k""".stripMargin

  private def bucketCte(planes: Int) = {
    val tables = (0 until NumTables).map { t =>
      val bucket = (0 until planes).map { p =>
        val cs = (0 until Dim).map(d => s"${coef(t, p, d)}::double").mkString("[", ", ", "]")
        s"CASE WHEN list_dot_product(v, $cs) >= 0 THEN ${1L << p} ELSE 0 END"
      }.mkString(" + ")
      s"SELECT vec_id, v, nrm, $t AS t, CAST($bucket AS BIGINT) AS bucket FROM vn"
    }.mkString("\n  UNION ALL ")
    s"b AS MATERIALIZED (\n  $tables)"
  }

  /** Candidates = code distance <= 1 within a table (home bucket or one sign-flip away)
    * — the set the Spark side's radius-1 multiprobe join produces. */
  def lshNearDups(tau: Double, planes: Int = NumPlanes, multiprobe: Boolean = true): String = {
    val cond = if (multiprobe) "bit_count(xor(x.bucket, y.bucket)) <= 1"
               else "x.bucket = y.bucket"
    s"""WITH $vecCte,
       |${bucketCte(planes)},
       |hot AS MATERIALIZED (SELECT t, bucket FROM b
       |  GROUP BY t, bucket HAVING count(*) > $MaxBucketFreq),
       |bk AS MATERIALIZED (SELECT b.* FROM b LEFT JOIN hot
       |  ON b.t = hot.t AND b.bucket = hot.bucket WHERE hot.t IS NULL)
       |SELECT DISTINCT x.vec_id AS a, y.vec_id AS b,
       |  list_dot_product(x.v, y.v)/sqrt(x.nrm)/sqrt(y.nrm) AS cos
       |FROM b x JOIN bk y ON x.t = y.t AND $cond AND x.vec_id < y.vec_id
       |WHERE list_dot_product(x.v, y.v)/sqrt(x.nrm)/sqrt(y.nrm) >= $tau""".stripMargin
  }
}
