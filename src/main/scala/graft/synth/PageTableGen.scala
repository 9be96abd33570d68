package graft.synth

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Synthesizes the Common-Crawl-style page table
  * `(url string, warc_ts timestamp, html binary, text string, lang string)` — the engine's
  * contract input per BASELINE.json — deterministically from a documents table.
  *
  * The html body embeds real `<a href="...">` anchors whose targets are the GraphSpec
  * link function, plus the document text wrapped in `<p>...</p>`; the downstream ingest
  * pipeline must recover both losslessly (text byte-identity is a tested invariant).
  * Everything is a pure function of `doc_id`, so any engine can re-derive the edge set.
  */
object PageTableGen {

  /** Page table for a test-data scale-factor directory. */
  def pages(spark: SparkSession, sfDir: String): DataFrame =
    fromDocuments(spark, spark.read.parquet(s"$sfDir/documents.parquet"))

  /** Page table from an arbitrary documents relation (doc_id, text, lang).
    * `replicate` multiplies the page count (bench-scale graphs from small doc tables). */
  def fromDocuments(spark: SparkSession, docs: DataFrame, replicate: Long = 1L): DataFrame = {
    import GraphSpec._
    val view = s"graft_docs_${System.identityHashCode(docs).toHexString}"
    docs.createOrReplaceTempView(view)
    val ppd = PagesPerDoc * replicate
    val deg = degSql("p", duck = false)
    val dst = dstSql("p", "j", "n", duck = false)
    // Dangling pages (deg = 0) must yield array(): Spark's sequence(0,-1) would descend.
    spark.sql(
      s"""WITH nn AS (SELECT count(*)*$ppd AS n FROM $view),
         |pg AS (
         |  SELECT doc_id*$ppd + s AS p, text, lang, n
         |  FROM $view CROSS JOIN nn
         |  LATERAL VIEW explode(sequence(0, ${ppd - 1})) t AS s
         |),
         |lk AS (
         |  SELECT p, text, lang, n,
         |    CASE WHEN $deg = 0 THEN array()
         |         ELSE transform(sequence(0, $deg - 1), j -> ${urlSql(dst)}) END AS hrefs
         |  FROM pg
         |)
         |SELECT
         |  ${urlSql("p")} AS url,
         |  timestampadd(SECOND, cast(p % 86400 AS int), timestamp'2025-01-01 00:00:00') AS warc_ts,
         |  cast(concat(
         |    '<html><head><title>', ${urlSql("p")}, '</title></head><body>',
         |    concat_ws('', transform(hrefs, u -> concat('<a href="', u, '">link</a>'))),
         |    '<p>', text, '</p></body></html>') AS binary) AS html,
         |  text,
         |  lang
         |FROM lk
         |""".stripMargin)
  }
}
