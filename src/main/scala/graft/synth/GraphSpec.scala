package graft.synth

/** Deterministic synthetic Common-Crawl-shaped link-graph specification.
  *
  * The engine's contract input (per BASELINE.json `input_hint`) is a page table
  * `(url string, warc_ts timestamp, html binary, text string, lang string)`. No such table
  * ships with the test data, so we synthesize one *deterministically* from the `documents`
  * table's dense `doc_id` range using pure 64-bit integer arithmetic (a double-round LCG).
  * Because the arithmetic is exact and order-independent, an independent SQL engine (the
  * driver's DuckDB oracle) can re-derive the *edge set* of the graph without ever touching
  * the html path — which is exactly how we verify that the full Spark pipeline
  * (html generation -> link extraction -> url dictionary -> edge table) is correct.
  *
  * Graph shape (web-like, mirrors the generators the reference uses for benchmarks, e.g.
  * /root/reference/networkit/cpp/generators/RmatGenerator.cpp:15-90 — power-law hubs —
  * and the planted-partition graphs of
  * /root/reference/networkit/cpp/community/test/CommunityGTest.cpp:46-142):
  *
  *   - n = 20 pages per document row (dense page ids 0..n-1).
  *   - pages are grouped into 100-page "domains" (planted communities for PLP).
  *   - 5% of pages are dangling (no out-links) — exercises NetworKit PageRank's
  *     no-dangling-redistribution semantics (PageRank.cpp:62-68).
  *   - out-degree 5..15 otherwise; 80% of links stay intra-domain (uniform),
  *     20% go cross-domain with a quadratic skew toward low page ids (hubs).
  *   - every 7th domain (d % 7 == 3) is isolated: it emits no cross-links and
  *     cross-links from elsewhere are deflected off it — giving CC multiple
  *     exactly-known components (giant + isolated domains).
  */
object GraphSpec {
  val PagesPerDoc = 20L
  val DomainSize  = 100L
  /** LCG modulus 2^31; A/C are the classic glibc constants. All intermediates < 2^63. */
  val M  = 2147483648L
  val A  = 1103515245L
  val C  = 12345L
  /** M*M = 2^62, used for the quadratic skew map r^2 / (M^2 / n). */
  val M2 = 4611686018427387904L

  val UrlPrefix = "https://example.org/p"

  /** Two-round LCG as a SQL fragment (dialect-neutral: only * + %). */
  def lcg(x: String): String =
    s"(($A*(($A*(($x)%$M)+$C)%$M)+$C)%$M)"

  /** Integer division fragment per dialect. */
  def idiv(a: String, b: String, duck: Boolean): String =
    if (duck) s"(($a) // ($b))" else s"(($a) div ($b))"

  /** Out-degree of page p: 0 for ~5% of pages, else 5..15. */
  def degSql(p: String, duck: Boolean): String =
    s"(CASE WHEN ${lcg(s"($p)*13+5")}%20 = 0 THEN 0 ELSE 5 + ${lcg(s"($p)*7+1")}%11 END)"

  /** Link target of (page p, link slot j) given graph size n, as a SQL fragment.
    * r uniform in [0, M); cross-link iff r%10 >= 8 and p's domain is not isolated;
    * cross target is quadratically skewed toward 0 (hubs) and deflected off isolated
    * domains; intra target is uniform within p's domain.
    */
  def dstSql(p: String, j: String, n: String, duck: Boolean): String = {
    val r    = lcg(s"($p)*1000+($j)")
    val big  = s"(${idiv(s"$r*$r", idiv(M2.toString, n, duck), duck)} % ($n))"
    val bigA = s"(CASE WHEN (${idiv(big, "100", duck)})%7 = 3 THEN $big - 100 ELSE $big END)"
    val intra = s"(${idiv(p, "100", duck)}*100 + (${idiv(r, "32", duck)})%100)"
    s"(CASE WHEN $r%10 >= 8 AND (${idiv(p, "100", duck)})%7 != 3 THEN $bigA ELSE $intra END)"
  }

  /** Zero-padded page url: lexicographic order == numeric order, so the engine's
    * dense url dictionary (sort + row_number) reproduces page ids exactly. */
  def urlSql(p: String): String =
    s"concat('$UrlPrefix', lpad(cast($p AS string), 8, '0'))"

  /** DuckDB-dialect derivation of the *directed edge set* (src, dst) of the synthetic
    * graph straight from integer arithmetic — the oracle-side twin of the engine's
    * html -> parse -> dictionary pipeline. `docsRel` is a relation with column doc_id. */
  def duckEdgeCte(docsRel: String = "documents"): String = {
    val dst = dstSql("p", "j.g", "nn.n", duck = true)
    s"""nn AS MATERIALIZED (SELECT count(*)*$PagesPerDoc AS n FROM $docsRel),
       |pg AS MATERIALIZED (SELECT d.doc_id*$PagesPerDoc + s.g AS p FROM $docsRel d CROSS JOIN generate_series(0,${PagesPerDoc - 1}) s(g)),
       |lk AS MATERIALIZED (SELECT p AS src, $dst AS dst FROM pg CROSS JOIN nn CROSS JOIN generate_series(0,14) j(g)
       |        WHERE j.g < ${degSql("p", duck = true)}),
       |edges AS MATERIALIZED (SELECT DISTINCT src, dst FROM lk WHERE src != dst),
       |verts AS MATERIALIZED (SELECT p AS id FROM pg)""".stripMargin
  }
}
