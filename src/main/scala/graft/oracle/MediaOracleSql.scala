package graft.oracle

import graft.synth.GraphSpec

/** DuckDB oracle twin of the multimodal metadata query: re-builds every page's html
  * payload byte-for-byte from the shared arithmetic spec (the same LCG link function
  * the Spark generator uses) and cross-checks byte length, sha256, magic bytes and
  * frame counts — verifying the engine's binary-column plumbing end to end.
  */
object MediaOracleSql {
  import GraphSpec._

  def mediaMeta(frameBytes: Int = 256): String = {
    val deg = degSql("p", duck = true)
    val dst = dstSql("p", "j.g", "nn.n", duck = true)
    val url = urlSql("p")
    val html =
      s"""'<html><head><title>' || $url || '</title></head><body>' ||
         |coalesce(array_to_string(list_transform(hrefs, u -> '<a href="' || u || '">link</a>'), ''), '') ||
         |'<p>' || text || '</p></body></html>'""".stripMargin
    s"""WITH nn AS MATERIALIZED (SELECT count(*)*$PagesPerDoc AS n FROM documents),
       |pg AS MATERIALIZED (
       |  SELECT d.doc_id*$PagesPerDoc + s.g AS p, d.text
       |  FROM documents d CROSS JOIN generate_series(0, ${PagesPerDoc - 1}) s(g)),
       |lk AS MATERIALIZED (
       |  SELECT p, text,
       |    CASE WHEN $deg = 0 THEN []::varchar[]
       |         ELSE list_transform(generate_series(0, $deg - 1),
       |                jj -> ${urlSql(dstSql("p", "jj", "nn.n", duck = true))}) END AS hrefs
       |  FROM pg CROSS JOIN nn),
       |h AS MATERIALIZED (SELECT p, $html AS html FROM lk)
       |SELECT $url AS url,
       |  CAST(octet_length(html::blob) AS BIGINT) AS n_bytes,
       |  sha256(html) AS sha256,
       |  substr(html, 1, 6) AS magic,
       |  CAST((octet_length(html::blob) + ${frameBytes - 1}) // $frameBytes AS BIGINT) AS n_frames
       |FROM h""".stripMargin
  }
}
