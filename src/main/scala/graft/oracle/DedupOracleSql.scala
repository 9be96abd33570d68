package graft.oracle

import graft.text.Dedup

/** DuckDB oracle twins of [[graft.text.Dedup]] — same shingling, same md5-derived
  * hashes, same MinHash permutation constants (inlined from the shared Scala
  * functions), same banding. Exact integer arithmetic throughout.
  */
object DedupOracleSql {
  import Dedup.{BandRows, NumBands, NumPerms, P, ShingleSize, maxShingleFreq,
    maxBandFreq, maxChunkFreq}

  private val n = ShingleSize
  /** Shared prologue: distinct (doc_id, h) shingle hashes w/ stop-shingle filter + sizes. */
  private val shCtes =
    s"""sh0 AS MATERIALIZED (
       |  SELECT DISTINCT doc_id, ('0x'||substr(md5(s),1,15))::bigint AS h FROM (
       |    SELECT doc_id, unnest(list_transform(generate_series(1, len(ts)-${n - 1}),
       |      i -> concat_ws(' ', ${(0 until n).map(o => s"ts[i+$o]").mkString(", ")}))) AS s
       |    FROM (SELECT doc_id, string_split(text, ' ') AS ts FROM documents)
       |    WHERE len(ts) >= $n)),
       |keep AS MATERIALIZED (SELECT h FROM sh0 GROUP BY h HAVING count(*) <= $maxShingleFreq),
       |sh AS MATERIALIZED (SELECT sh0.doc_id, sh0.h FROM sh0 JOIN keep USING (h)),
       |sz AS MATERIALIZED (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id)""".stripMargin

  private def jacCtes(tau: Double) =
    s"""inter AS MATERIALIZED (
       |  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS c
       |  FROM sh x JOIN sh y ON x.h = y.h AND x.doc_id < y.doc_id GROUP BY 1, 2),
       |jac AS MATERIALIZED (
       |  SELECT a, b, c::double/(sa.n + sb.n - c) AS jaccard
       |  FROM inter JOIN sz sa ON a = sa.doc_id JOIN sz sb ON b = sb.doc_id
       |  WHERE c::double/(sa.n + sb.n - c) >= $tau)""".stripMargin

  def ngramJaccard(tau: Double): String =
    s"""WITH $shCtes,
       |${jacCtes(tau)}
       |SELECT a, b, jaccard FROM jac""".stripMargin

  private val sigCte = {
    val cols = (0 until NumPerms).map(i =>
      s"min((${Dedup.permA(i)}*(h%$P) + ${Dedup.permB(i)}) % $P) AS m$i").mkString(",\n    ")
    s"sig AS MATERIALIZED (SELECT doc_id,\n    $cols\n  FROM sh GROUP BY doc_id)"
  }

  private def bandKeyExpr(b: Int): String =
    (1 until BandRows).foldLeft(s"m${b * BandRows}") {
      (acc, r) => s"((($acc) * 31 + m${b * BandRows + r}) % $P)"
    }

  def minhashNearDups(tau: Double): String = {
    val bandSelects = (0 until NumBands).map(b =>
      s"SELECT doc_id, $b AS band, ${bandKeyExpr(b)} AS key FROM sig").mkString("\n  UNION ALL ")
    s"""WITH $shCtes,
       |$sigCte,
       |bands0 AS MATERIALIZED (
       |  $bandSelects),
       |bkeep AS MATERIALIZED (SELECT band, key FROM bands0
       |  GROUP BY band, key HAVING count(*) <= $maxBandFreq),
       |bands AS MATERIALIZED (SELECT bands0.* FROM bands0 JOIN bkeep USING (band, key)),
       |cand AS MATERIALIZED (
       |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
       |  FROM bands x JOIN bands y
       |    ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id),
       |${jacCtes(tau)}
       |SELECT jac.a, jac.b, jac.jaccard FROM jac JOIN cand USING (a, b)""".stripMargin
  }

  /** Near-dup clusters (mirrors Dedup.nearDupClusters): the minhash pair pipeline,
    * then `rounds` min-label propagation steps over the pair graph (plain propagation:
    * rounds bounds the label-distance covered — near-dup chains are far shorter). */
  def nearDupClusters(tau: Double, rounds: Int = 8): String = {
    val bandSelects = (0 until NumBands).map(b =>
      s"SELECT doc_id, $b AS band, ${bandKeyExpr(b)} AS key FROM sig").mkString("\n  UNION ALL ")
    val steps = (1 to rounds).map { i =>
      s"""dl$i AS MATERIALIZED (SELECT l.id,
         |  least(l.label, coalesce(m.ml, l.label)) AS label
         |  FROM dl${i - 1} l LEFT JOIN (
         |    SELECT d.b AS id, min(x.label) AS ml FROM dbi d JOIN dl${i - 1} x ON d.a = x.id
         |    GROUP BY d.b) m ON l.id = m.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH $shCtes,
       |$sigCte,
       |bands0 AS MATERIALIZED (
       |  $bandSelects),
       |bkeep AS MATERIALIZED (SELECT band, key FROM bands0
       |  GROUP BY band, key HAVING count(*) <= $maxBandFreq),
       |bands AS MATERIALIZED (SELECT bands0.* FROM bands0 JOIN bkeep USING (band, key)),
       |cand AS MATERIALIZED (
       |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
       |  FROM bands x JOIN bands y
       |    ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id),
       |${jacCtes(tau)},
       |pairs AS MATERIALIZED (SELECT jac.a, jac.b FROM jac JOIN cand USING (a, b)),
       |dbi AS MATERIALIZED (SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
       |dl0 AS MATERIALIZED (SELECT doc_id AS id, doc_id AS label FROM documents),
       |$steps
       |SELECT id AS doc_id, label AS rep FROM dl$rounds""".stripMargin
  }

  /** Mirrors Dedup.spanDedup: fixed `span`-token chunks, md5-hash each, keep only
    * the min-(doc_id, ci) occurrence corpus-wide, reassemble in order. */
  def spanDedup(span: Int): String = {
    val terms = (1 to span).map(k => s"ts[i*$span+$k]").mkString(", ")
    s"""WITH td AS MATERIALIZED (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
       |sp AS MATERIALIZED (SELECT doc_id, ci, s,
       |    ('0x' || substr(md5(s), 1, 15))::bigint AS h,
       |    doc_id * 1048576 + ci AS fkey
       |  FROM (SELECT doc_id, i AS ci, concat_ws(' ', $terms) AS s
       |    FROM (SELECT doc_id, ts,
       |      unnest(generate_series(0, (len(ts) + ${span - 1}) // $span - 1)) AS i
       |      FROM td))),
       |fi AS MATERIALIZED (SELECT h, min(fkey) AS mk FROM sp GROUP BY h),
       |kp AS MATERIALIZED (SELECT sp.doc_id, sp.ci, sp.s FROM sp
       |  JOIN fi ON sp.h = fi.h AND sp.fkey = fi.mk),
       |rb AS MATERIALIZED (SELECT doc_id, count(*) AS n_kept,
       |  string_agg(s, ' ' ORDER BY ci) AS text_clean FROM kp GROUP BY doc_id)
       |SELECT d.doc_id,
       |  CAST((len(string_split(d.text, ' ')) + ${span - 1}) // $span AS BIGINT) AS n_spans,
       |  CAST(coalesce(rb.n_kept, 0) AS BIGINT) AS n_kept,
       |  coalesce(rb.text_clean, '') AS text_clean
       |FROM documents d LEFT JOIN rb ON d.doc_id = rb.doc_id""".stripMargin
  }

  /** Mirrors the q_bloom_filter composition: blocklist = text fingerprints of docs
    * with doc_id % blockMod = 0, k md5 probes into an mBits bloom of 60-bit words,
    * candidate = all probe bits set, in_blocklist = exact membership. */
  def bloomPrefilter(blockMod: Long, mBits: Long, k: Int): String = {
    val is = (0 until k).map(_.toString).mkString(", ")
    def posOf(keyExpr: String) =
      s"('0x' || substr(md5($keyExpr::varchar || '#' || i), 1, 15))::bigint % $mBits"
    s"""WITH dk AS MATERIALIZED (SELECT doc_id,
       |    ('0x' || substr(md5(text), 1, 15))::bigint AS key FROM documents),
       |bl AS MATERIALIZED (SELECT key FROM dk WHERE doc_id % $blockMod = 0),
       |bpos AS MATERIALIZED (SELECT ${posOf("key")} AS pos
       |  FROM bl CROSS JOIN (SELECT unnest([$is]) AS i)),
       |words AS MATERIALIZED (SELECT pos // 60 AS word,
       |  bit_or(1::BIGINT << CAST(pos % 60 AS INT)) AS bits FROM bpos GROUP BY 1),
       |pr AS MATERIALIZED (SELECT doc_id, ${posOf("key")} AS pos
       |  FROM dk CROSS JOIN (SELECT unnest([$is]) AS i)),
       |hits AS MATERIALIZED (SELECT p.doc_id,
       |  min(CASE WHEN (coalesce(w.bits, 0) & (1::BIGINT << CAST(p.pos % 60 AS INT))) != 0
       |      THEN 1 ELSE 0 END) AS candidate
       |  FROM pr p LEFT JOIN words w ON p.pos // 60 = w.word GROUP BY 1)
       |SELECT dk.doc_id, CAST(h.candidate AS BIGINT) AS candidate,
       |  CAST(CASE WHEN dk.key IN (SELECT key FROM bl) THEN 1 ELSE 0 END AS BIGINT)
       |    AS in_blocklist
       |FROM dk JOIN hits h ON dk.doc_id = h.doc_id""".stripMargin
  }

  private val simCte = {
    val bitSums = (0 until Dedup.SimBits).map(j =>
      s"sum(CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS b$j").mkString(",\n    ")
    val combine = (0 until Dedup.SimBits).map(j =>
      s"CASE WHEN b$j > 0 THEN ${1L << j} ELSE 0 END").mkString(" + ")
    s"""bits AS MATERIALIZED (SELECT doc_id,
       |    $bitSums
       |  FROM sh GROUP BY doc_id),
       |sim AS MATERIALIZED (SELECT doc_id, CAST($combine AS BIGINT) AS simhash FROM bits)""".stripMargin
  }

  def simhashNearDups(maxHamming: Int): String = {
    val mask = (1L << Dedup.SimChunkBits) - 1L
    val chunkSelects = (0 until Dedup.SimChunks).map(c =>
      s"SELECT doc_id, simhash, $c AS chunk, (simhash >> ${Dedup.SimChunkBits * c}) & $mask AS v FROM sim")
      .mkString("\n  UNION ALL ")
    s"""WITH $shCtes,
       |$simCte,
       |chunks0 AS MATERIALIZED (
       |  $chunkSelects),
       |ckeep AS MATERIALIZED (SELECT chunk, v FROM chunks0
       |  GROUP BY chunk, v HAVING count(*) <= $maxChunkFreq),
       |chunks AS MATERIALIZED (SELECT chunks0.* FROM chunks0 JOIN ckeep USING (chunk, v))
       |SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
       |  CAST(bit_count(xor(x.simhash, y.simhash)) AS BIGINT) AS hamming
       |FROM chunks x JOIN chunks y
       |  ON x.chunk = y.chunk AND x.v = y.v AND x.doc_id < y.doc_id
       |WHERE bit_count(xor(x.simhash, y.simhash)) <= $maxHamming""".stripMargin
  }
}
