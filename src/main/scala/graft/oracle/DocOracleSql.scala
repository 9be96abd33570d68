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

  /** Word n-grams of `documents` (mirrors the TextOps/Dedup shingling kernel). */
  private def gramCte(alias: String, n: Int, from: String = "documents",
                      idCol: String = "doc_id"): String =
    s"""$alias AS MATERIALIZED (
       |  SELECT $idCol AS doc_id, unnest(list_transform(generate_series(1, len(ts)-${n - 1}),
       |    i -> concat_ws(' ', ${(0 until n).map(o => s"ts[i+$o]").mkString(", ")}))) AS g
       |  FROM (SELECT $idCol, string_split(text, ' ') AS ts FROM $from)
       |  WHERE len(ts) >= $n)""".stripMargin

  /** Mirrors TextOps.repetitionStats. */
  val repetitionStats: String = {
    def share(n: Int): String =
      s"""t$n AS MATERIALIZED (SELECT doc_id, sum(c) AS n$n, max(c) AS top$n FROM (
         |  SELECT doc_id, g, count(*) AS c FROM g$n GROUP BY doc_id, g) GROUP BY doc_id)""".stripMargin
    s"""WITH ${gramCte("g2", 2)},
       |${gramCte("g3", 3)},
       |${gramCte("g5", 5)},
       |${share(2)},
       |${share(3)},
       |d5 AS MATERIALIZED (SELECT doc_id, count(*) AS n5, count(DISTINCT g) AS d5
       |  FROM g5 GROUP BY doc_id)
       |SELECT d.doc_id,
       |  CAST(coalesce(t2.n2, 0) AS BIGINT) AS n2,
       |  coalesce(t2.top2::double / t2.n2, 0.0) AS top2_share,
       |  CAST(coalesce(t3.n3, 0) AS BIGINT) AS n3,
       |  coalesce(t3.top3::double / t3.n3, 0.0) AS top3_share,
       |  CAST(coalesce(d5.n5, 0) AS BIGINT) AS n5,
       |  coalesce((d5.n5 - d5.d5)::double / d5.n5, 0.0) AS dup5_frac
       |FROM documents d LEFT JOIN t2 USING (doc_id) LEFT JOIN t3 USING (doc_id)
       |LEFT JOIN d5 USING (doc_id)""".stripMargin
  }

  /** Mirrors TextOps.redactPii over text with deterministically injected PII
    * (the q_redact_pii composition: docs with doc_id % 10 == 0 get a synthetic
    * contact suffix). */
  val redactPii: String = {
    import graft.text.TextOps.{EmailRe, Ipv4Re, PhoneRe}
    val aug = "CASE WHEN doc_id % 10 = 0 THEN text || " +
      "' contact bob@example.com or 555-123-4567 at 10.0.0.1' ELSE text END"
    val afterEmail = s"regexp_replace($aug, '$EmailRe', '<EMAIL>', 'g')"
    val afterPhone = s"regexp_replace($afterEmail, '$PhoneRe', '<PHONE>', 'g')"
    s"""SELECT doc_id,
       |  CAST(len(regexp_extract_all($aug, '$EmailRe')) AS BIGINT) AS n_emails,
       |  CAST(len(regexp_extract_all($afterEmail, '$PhoneRe')) AS BIGINT) AS n_phones,
       |  CAST(len(regexp_extract_all($afterPhone, '$Ipv4Re')) AS BIGINT) AS n_ips,
       |  regexp_replace($afterPhone, '$Ipv4Re', '<IP>', 'g') AS redacted
       |FROM documents""".stripMargin
  }

  /** Mirrors Dedup.contamination with bench = docs having doc_id % benchMod == 0. */
  def contamination(n: Int, benchMod: Long, minOverlap: Long,
                    maxGramFreq: Long): String =
    s"""WITH ${gramCte("cg", n)},
       |csh AS MATERIALIZED (SELECT DISTINCT doc_id, ${mdint("g")} AS h FROM cg),
       |keep AS MATERIALIZED (SELECT h FROM csh GROUP BY h HAVING count(*) <= $maxGramFreq),
       |bsh AS MATERIALIZED (SELECT doc_id AS bench_id, h FROM csh
       |  WHERE doc_id % $benchMod = 0)
       |SELECT c.doc_id, b.bench_id, CAST(count(*) AS BIGINT) AS overlap
       |FROM csh c JOIN keep USING (h) JOIN bsh b USING (h)
       |GROUP BY 1, 2 HAVING count(*) >= $minOverlap""".stripMargin

  // --- URL hygiene (graft.text.UrlOps) — the dialect-shared generators emit the
  // identical string pipeline in DuckDB syntax. ---

  import graft.text.UrlOps

  /** Mirrors the q_url_normalize query: messy variant -> norm/host/domain. */
  val urlNormalize: String = {
    val norm = UrlOps.normalizeSql("raw_url", duck = true)
    s"""WITH r AS MATERIALIZED (SELECT doc_id,
       |    ${UrlOps.messySql("doc_id", 5, duck = true)} AS raw_url FROM documents),
       |n AS MATERIALIZED (SELECT doc_id, raw_url, $norm AS norm_url FROM r)
       |SELECT doc_id, raw_url, norm_url,
       |  ${UrlOps.hostSql("norm_url", duck = true)} AS host,
       |  ${UrlOps.domainSql("norm_url", duck = true)} AS domain
       |FROM n""".stripMargin
  }

  /** Mirrors q_url_dedup: canonical + messy capture per page, latest ts wins. */
  val urlDedup: String = {
    val base = graft.synth.GraphSpec.urlSql("doc_id")
    s"""WITH c AS MATERIALIZED (
       |  SELECT $base AS url, CAST(doc_id*2 AS BIGINT) AS ts FROM documents
       |  UNION ALL
       |  SELECT ${UrlOps.messySql("doc_id", 4, duck = true)},
       |    CAST(doc_id*2 + 1 AS BIGINT) FROM documents),
       |n AS MATERIALIZED (SELECT url, ts,
       |  ${UrlOps.normalizeSql("url", duck = true)} AS norm_url FROM c)
       |SELECT norm_url, arg_max(url, ts) AS url_kept,
       |  CAST(max(ts) AS BIGINT) AS ts_kept
       |FROM n GROUP BY norm_url""".stripMargin
  }

  /** Mirrors Corpus.sourceCap: top-k docs per source by (n_chars DESC, doc_id ASC). */
  def sourceCap(k: Int): String =
    s"""SELECT doc_id, source, CAST(rnk AS BIGINT) AS rnk FROM (
       |  SELECT doc_id, source,
       |    row_number() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id ASC) AS rnk
       |  FROM documents) WHERE rnk <= $k""".stripMargin

  /** Mirrors Corpus.stratifiedSample: exact ceil(frac·n) per lang stratum under the
    * shared LCG shuffle. */
  def stratifiedSample(frac: Double, seed: Long): String = {
    val h = graft.synth.GraphSpec.lcg(s"doc_id * 11 + $seed")
    s"""WITH cnt AS MATERIALIZED (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
       |rked AS MATERIALIZED (
       |  SELECT doc_id, lang,
       |    row_number() OVER (PARTITION BY lang ORDER BY $h ASC, doc_id ASC) AS rnk
       |  FROM documents)
       |SELECT r.doc_id, r.lang, CAST(r.rnk AS BIGINT) AS rnk
       |FROM rked r JOIN cnt USING (lang)
       |WHERE r.rnk <= ceil($frac * cnt.n)""".stripMargin
  }

  /** Mirrors TextOps.gopherFilter: integer cross-multiplied Gopher rule bitmask. */
  val gopherFilter: String = {
    def share(n: Int): String =
      s"""t$n AS MATERIALIZED (SELECT doc_id, sum(c) AS n$n, max(c) AS top$n FROM (
         |  SELECT doc_id, g, count(*) AS c FROM g$n GROUP BY doc_id, g) GROUP BY doc_id)""".stripMargin
    s"""WITH ${gramCte("g2", 2)},
       |${gramCte("g3", 3)},
       |${gramCte("g5", 5)},
       |${share(2)},
       |${share(3)},
       |d5 AS MATERIALIZED (SELECT doc_id, count(*) AS n5, count(DISTINCT g) AS d5
       |  FROM g5 GROUP BY doc_id),
       |bs AS MATERIALIZED (SELECT doc_id,
       |  CAST(len($ts) AS BIGINT) AS nt,
       |  CAST(list_sum(list_transform($ts, t -> length(t))) AS BIGINT) AS stl,
       |  CAST(${stopCount(graft.text.TextOps.StopEn)} AS BIGINT) AS nstop
       |  FROM documents),
       |mk AS MATERIALIZED (SELECT b.doc_id, b.nt AS n_tokens,
       |  CAST((CASE WHEN b.nt < 50 THEN 1 ELSE 0 END)
       |     + (CASE WHEN b.nt > 100000 THEN 2 ELSE 0 END)
       |     + (CASE WHEN b.stl < 3 * b.nt THEN 4 ELSE 0 END)
       |     + (CASE WHEN b.stl > 10 * b.nt THEN 8 ELSE 0 END)
       |     + (CASE WHEN b.nstop < 2 THEN 16 ELSE 0 END)
       |     + (CASE WHEN coalesce(t2.top2, 0) * 5 > coalesce(t2.n2, 0) THEN 32 ELSE 0 END)
       |     + (CASE WHEN coalesce(t3.top3, 0) * 50 > coalesce(t3.n3, 0) * 9 THEN 64 ELSE 0 END)
       |     + (CASE WHEN (coalesce(d5.n5, 0) - coalesce(d5.d5, 0)) * 10
       |             > coalesce(d5.n5, 0) * 3 THEN 128 ELSE 0 END) AS BIGINT) AS fail_mask
       |  FROM bs b LEFT JOIN t2 USING (doc_id) LEFT JOIN t3 USING (doc_id)
       |  LEFT JOIN d5 USING (doc_id))
       |SELECT doc_id, n_tokens, fail_mask,
       |  CAST(CASE WHEN fail_mask = 0 THEN 1 ELSE 0 END AS BIGINT) AS keep
       |FROM mk""".stripMargin
  }

  /** Mirrors Corpus.packSequences: exclusive prefix sum of token counts in doc_id
    * order, then fixed-budget sequence arithmetic. */
  def packSequences(budget: Long): String =
    s"""WITH tn AS MATERIALIZED (SELECT doc_id,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents),
       |ps AS MATERIALIZED (SELECT doc_id, n_tokens,
       |  CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_tok
       |  FROM tn)
       |SELECT doc_id, n_tokens, start_tok,
       |  CAST(start_tok // $budget AS BIGINT) AS seq_id,
       |  CAST(start_tok % $budget AS BIGINT) AS seq_offset,
       |  CAST((start_tok + n_tokens - 1) // $budget - start_tok // $budget + 1 AS BIGINT)
       |    AS n_seqs
       |FROM ps""".stripMargin

  /** Mirrors q_domain_filter: 3-domain spread, 2 blocklisted. */
  val domainFilter: String = {
    s"""WITH c AS MATERIALIZED (SELECT doc_id,
       |    ${UrlOps.multiDomainSql("doc_id", duck = true)} AS url FROM documents),
       |n AS MATERIALIZED (SELECT doc_id,
       |  ${UrlOps.normalizeSql("url", duck = true)} AS norm_url FROM c)
       |SELECT doc_id, ${UrlOps.domainSql("norm_url", duck = true)} AS domain
       |FROM n
       |WHERE ${UrlOps.domainSql("norm_url", duck = true)}
       |  NOT IN ('blocked.test', 'ads-site.com')""".stripMargin
  }
}
