package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.layout.Layout

/** Page-table ingestion: html -> hyperlinks -> vertex dictionary -> edge table.
  *
  * The reference's analog is the string-id edge-list readers that build a node map
  * (/root/reference/networkit/cpp/io/EdgeListReader.h:57-65); here the "reader" is a
  * Catalyst pipeline over the page table. Everything is built-in expressions
  * (regexp_extract_all / explode / joins) — no UDFs, fully codegen'd and pushdown-friendly.
  */
object Ingest {

  /** All `<a href="...">` targets in an html payload, as an array column. */
  def extractLinks(html: Column): Column =
    regexp_extract_all(html.cast("string"), lit("<a href=\"([^\"]+)\""), lit(1))

  /** The extracted text of a page: contents of the single `<p>...</p>` block.
    * Row-level invariant (north rule): byte-identical to the page table's `text` column. */
  def extractText(html: Column): Column =
    regexp_extract(html.cast("string"), "(?s)<p>(.*)</p>", 1)

  /** Dense vertex dictionary `(url, id)`: id = rank of url in lexicographic order.
    * Mirrors GraphTools::getContinuousNodeIds (graph/GraphTools.h:18-48).
    *
    * Fully distributed (Layout.zipWithRank: range partition + per-partition offsets) —
    * no global window, no single-task funnel; the result is persisted/materialized by
    * the helper. At 10^12 documents [[hashedDictionary]] (no global sort at all) remains
    * the cheaper alternative; every algorithm downstream is id-agnostic. */
  def denseDictionary(pages: DataFrame): DataFrame =
    Layout.zipWithRank(pages.select(col("url")).distinct(), "url", "id")

  /** Scale-path dictionary: id = xxhash64(url). Collision audit is the caller's job
    * (count distinct id == count distinct url) — see SURVEY.md §7.4 item 6. */
  def hashedDictionary(pages: DataFrame): DataFrame =
    pages.select(col("url")).distinct().withColumn("id", xxhash64(col("url")))

  /** Directed edge table (src, dst, weight=1.0) from pages + dictionary.
    *
    * Two dictionary joins (src url, dst url); self-loops dropped; parallel links
    * deduplicated — one logical edge per (src,dst), the reference's multigraph-free
    * invariant (Graph.cpp:600-651 stores one adjacency slot per addEdge call; our web
    * semantics collapse duplicate hrefs). Links to urls outside the crawl (dictionary
    * misses) are dropped by the inner join, exactly like EdgeListReader's node-map path. */
  def deriveEdges(pages: DataFrame, dict: DataFrame): DataFrame = {
    val links = pages
      .select(col("url").as("src_url"), explode(extractLinks(col("html"))).as("dst_url"))
    links
      .join(dict.select(col("url").as("src_url"), col("id").as("src")), "src_url")
      .join(dict.select(col("url").as("dst_url"), col("id").as("dst")), "dst_url")
      .select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .withColumn("weight", lit(1.0))
  }
}
