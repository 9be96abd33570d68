package graft.oracle

/** DuckDB-dialect oracle twins for the document/text operators ([[graft.text.TextOps]]).
  *
  * Shared determinism contract: integer-exact values (md5-derived hashes, token counts,
  * rolling-hash recurrences) and ratio columns computed as one double expression over
  * those exact integers — identical operands ⇒ bit-identical doubles in both engines.
  */
object DocOracleSql {

  /** DuckDB twin of TextOps.mdint: 60-bit integer from the first 15 md5 hex chars. */
  def mdint(x: String): String = s"('0x' || substr(md5($x), 1, 15))::bigint"

  private val ts = "string_split(text, ' ')"

  private def inList(v: String, words: Seq[String]): String =
    words.mkString(s"$v IN ('", "','", "')")

  private def stopCount(words: Seq[String]): String =
    s"len(list_filter($ts, t -> ${inList("t", words)}))"

  val stats: String =
    s"""SELECT doc_id,
       |  CAST(len($ts) AS BIGINT) AS n_tokens,
       |  CAST(len(list_distinct($ts)) AS BIGINT) AS n_uniq,
       |  CAST(${stopCount(graft.text.TextOps.StopEn)} AS BIGINT) AS n_stop,
       |  CAST(list_sum(list_transform($ts, t -> length(t))) AS BIGINT) AS sum_tok_len,
       |  len(list_distinct($ts))::double / len($ts) AS ttr,
       |  ${stopCount(graft.text.TextOps.StopEn)}::double / len($ts) AS stop_ratio
       |FROM documents""".stripMargin

  val langId: String = {
    import graft.text.TextOps.{StopDe, StopEn, StopFr}
    s"""WITH s AS (SELECT doc_id,
       |  ${stopCount(StopEn)} AS s_en, ${stopCount(StopDe)} AS s_de,
       |  ${stopCount(StopFr)} AS s_fr FROM documents)
       |SELECT doc_id,
       |  CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en > 0 THEN 'en'
       |       WHEN s_de >= s_fr AND s_de > 0 THEN 'de'
       |       WHEN s_fr > 0 THEN 'fr' ELSE 'und' END AS lang_pred
       |FROM s""".stripMargin
  }

  val fingerprint: String =
    s"""SELECT doc_id,
       |  list_reduce(
       |    list_prepend(0::bigint,
       |      list_transform($ts, t -> ${mdint("t")} % 2147483648)),
       |    (a, b) -> (a * 31 + b) % 2147483648) AS fp
       |FROM documents""".stripMargin

  val tokenFreq: String =
    s"""SELECT token, CAST(count(*) AS BIGINT) AS cnt
       |FROM (SELECT unnest($ts) AS token FROM documents)
       |GROUP BY token""".stripMargin

  /** Mirrors TextOps.bpeTokenFreq over the synthetic page-table urls (rebuilt
    * arithmetically, like MediaOracleSql). */
  def bpeUrlTokenFreq: String = {
    import graft.synth.GraphSpec.{urlSql, PagesPerDoc}
    s"""WITH pg AS MATERIALIZED (
       |  SELECT d.doc_id*$PagesPerDoc + s.g AS p
       |  FROM documents d CROSS JOIN generate_series(0, ${PagesPerDoc - 1}) s(g)),
       |u AS MATERIALIZED (SELECT ${urlSql("p")} AS url FROM pg)
       |SELECT token, CAST(count(*) AS BIGINT) AS cnt
       |FROM (SELECT unnest(regexp_extract_all(url, '${graft.text.TextOps.BpePattern}')) AS token FROM u)
       |GROUP BY token""".stripMargin
  }

  val dedupExact: String =
    s"""SELECT md5(text) AS text_md5, min(doc_id) AS rep_id,
       |  CAST(count(*) AS BIGINT) AS n_dups
       |FROM documents GROUP BY md5(text)""".stripMargin
}
