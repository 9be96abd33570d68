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

  /** Mirrors Corpus.semanticDedup: the LSH near-dup pair graph's connected clusters
    * collapsed to min-id representatives (recursive reachability closure — the pair
    * graph is near-dup-sized, so the closure is tiny). */
  def semanticDedup(tau: Double, planes: Int = NumPlanes): String =
    s"""WITH RECURSIVE $vecCte,
       |${bucketCte(planes)},
       |hot AS MATERIALIZED (SELECT t, bucket FROM b
       |  GROUP BY t, bucket HAVING count(*) > $MaxBucketFreq),
       |bk AS MATERIALIZED (SELECT b.* FROM b LEFT JOIN hot
       |  ON b.t = hot.t AND b.bucket = hot.bucket WHERE hot.t IS NULL),
       |p AS MATERIALIZED (
       |  SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
       |  FROM b x JOIN bk y ON x.t = y.t
       |    AND bit_count(xor(x.bucket, y.bucket)) <= 1 AND x.vec_id < y.vec_id
       |  WHERE list_dot_product(x.v, y.v)/sqrt(x.nrm)/sqrt(y.nrm) >= $tau),
       |und AS MATERIALIZED (SELECT a, b FROM p UNION SELECT b, a FROM p),
       |reach(s, d) AS (
       |  SELECT a AS s, b AS d FROM und
       |  UNION
       |  SELECT r.s, u.b AS d FROM reach r JOIN und u ON r.d = u.a),
       |mn AS MATERIALIZED (SELECT s AS id, min(d) AS m FROM reach GROUP BY s)
       |SELECT e.vec_id, CAST(least(e.vec_id, coalesce(mn.m, e.vec_id)) AS BIGINT) AS rep,
       |  CAST(CASE WHEN least(e.vec_id, coalesce(mn.m, e.vec_id)) = e.vec_id
       |       THEN 1 ELSE 0 END AS BIGINT) AS keep
       |FROM embeddings e LEFT JOIN mn ON e.vec_id = mn.id""".stripMargin

  /** Mirrors Embeddings.ivfTopK: `iters` unrolled Lloyd rounds of the deterministic
    * integer k-means (init = first `nlist` vec_ids, floor-mean centroid update,
    * (d2, cid) tie order, empty clusters keep their centroid), then nprobe closest
    * lists per query and an exact cosine re-rank of their members. */
  def ivfTopK(numQueries: Int = 20, k: Int = 5,
              nlist: Int = 16, iters: Int = 3, nprobe: Int = 4): String = {
    val meanList = (0 until Dim)
      .map(d => s"floor(sum(v[${d + 1}])/count(*))").mkString("[", ", ", "]")
    val rounds = (1 to iters).map { i =>
      val upd = if (i == iters) "" else
        s""",
           |mu$i AS MATERIALIZED (SELECT cid, $meanList AS mv
           |  FROM vn JOIN a$i USING (vec_id) GROUP BY cid),
           |c$i AS MATERIALIZED (SELECT c.cid, coalesce(mu$i.mv, c.cv) AS cv,
           |    list_dot_product(coalesce(mu$i.mv, c.cv), coalesce(mu$i.mv, c.cv)) AS cn
           |  FROM c${i - 1} c LEFT JOIN mu$i ON c.cid = mu$i.cid)""".stripMargin
      s"""a$i AS MATERIALIZED (SELECT vec_id, cid FROM (
         |  SELECT vn.vec_id, c.cid,
         |    row_number() OVER (PARTITION BY vn.vec_id
         |      ORDER BY vn.nrm - 2*list_dot_product(vn.v, c.cv) + c.cn, c.cid) AS rn
         |  FROM vn CROSS JOIN c${i - 1} c) WHERE rn = 1)$upd""".stripMargin
    }.mkString(",\n")
    s"""WITH $vecCte,
       |c0 AS MATERIALIZED (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM vn
       |  WHERE vec_id < $nlist),
       |$rounds,
       |q AS MATERIALIZED (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM vn
       |  WHERE vec_id < $numQueries),
       |pr AS MATERIALIZED (SELECT query_id, cid FROM (
       |  SELECT q.query_id, c.cid,
       |    row_number() OVER (PARTITION BY q.query_id
       |      ORDER BY q.qn - 2*list_dot_product(q.qv, c.cv) + c.cn, c.cid) AS rn
       |  FROM q CROSS JOIN c${iters - 1} c) WHERE rn <= $nprobe),
       |cand AS MATERIALIZED (
       |  SELECT q.query_id, vn.vec_id AS neighbor_id,
       |    list_dot_product(q.qv, vn.v)/sqrt(q.qn)/sqrt(vn.nrm) AS cos
       |  FROM pr JOIN a$iters a ON pr.cid = a.cid
       |  JOIN vn ON a.vec_id = vn.vec_id
       |  JOIN q ON pr.query_id = q.query_id
       |  WHERE vn.vec_id != q.query_id)
       |SELECT query_id, CAST(rnk AS BIGINT) AS rnk, neighbor_id, cos FROM (
       |  SELECT query_id, neighbor_id, cos,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
       |  FROM cand) WHERE rnk <= $k""".stripMargin
  }
}
