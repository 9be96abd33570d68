package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL hygiene for web-scale training pipelines (beyond the reference — the
  * input contract's `url` column makes these first-class): normalization
  * (fragment/tracking-param/default-port/www/trailing-slash stripping with a
  * lower-cased authority), host + registrable-domain extraction, domain
  * blocklist filtering, and latest-snapshot URL dedup.
  *
  * Every transformation is generated from ONE dialect-parameterized SQL fragment
  * (`duck = false` → Spark, `true` → DuckDB) so the DuckDB oracle replays the
  * byte-identical string pipeline: patterns stay in the shared Java-regex ∩ RE2
  * subset (no lookarounds, no backslash classes — `[.]` instead of `\.`),
  * backreferences are `$1` vs `\1`, and DuckDB's regexp_replace gets the 'g'
  * flag where multiple matches can occur (Spark is global by default).
  */
object UrlOps {

  private def br(i: Int, duck: Boolean): String = if (duck) s"\\$i" else s"$$$i"

  private def rr(s: String, pat: String, rep: String, duck: Boolean): String =
    if (duck) s"regexp_replace($s, '$pat', '$rep', 'g')"
    else s"regexp_replace($s, '$pat', '$rep')"

  /** Normalized form of the URL in column/expression `c` (dialect-shared). */
  def normalizeSql(c: String, duck: Boolean): String = {
    val dollar = "$"
    // 1. Strip the fragment.
    val s1 = rr(c, "#.*", "", duck)
    // 2. Lower-case scheme://authority (the part before the first / or ? past
    //    the scheme) and keep the rest untouched.
    val head = s"regexp_extract($s1, '^[A-Za-z]+://[^/?]*', 0)"
    val s2 = s"concat(lower($head), substr($s1, length($head) + 1))"
    // 3. Strip a www. label (plain string replace — authority is lower-case now).
    val s3 = s"replace($s2, '://www.', '://')"
    // 4. Strip default ports.
    val s4 = rr(s3, s"^(https://[^/:?]+):443([/?].*)?$dollar",
      br(1, duck) + br(2, duck), duck)
    val s5 = rr(s4, s"^(http://[^/:?]+):80([/?].*)?$dollar",
      br(1, duck) + br(2, duck), duck)
    // 5. Strip tracking parameters, then tidy dangling separators.
    val s6 = rr(s5, "(utm_[a-z]+|fbclid|gclid)=[^&#]*&?", "", duck)
    val s7 = s"replace($s6, '?&', '?')"
    val s8 = rr(s7, s"[?&]$dollar", "", duck)
    // 6. Strip one trailing slash (never the scheme's).
    rr(s8, s"([^/])/$dollar", br(1, duck), duck)
  }

  /** Authority host of a normalized URL (port already stripped). */
  def hostSql(c: String, duck: Boolean): String =
    s"regexp_extract($c, '^[a-z]+://([^/:?]+)', 1)"

  /** Registrable-domain approximation: the last two host labels. */
  def domainSql(c: String, duck: Boolean): String = {
    val dollar = "$"
    s"regexp_extract(${hostSql(c, duck)}, '[^.]+[.][^.]+$dollar', 0)"
  }

  /** Adds norm_url / host / domain columns derived from `urlCol`. */
  def withUrlMeta(pages: DataFrame, urlCol: String = "url"): DataFrame = {
    val norm = normalizeSql(urlCol, duck = false)
    pages
      .withColumn("norm_url", expr(norm))
      .withColumn("host", expr(hostSql("norm_url", duck = false)))
      .withColumn("domain", expr(domainSql("norm_url", duck = false)))
  }

  /** Drop rows whose registrable domain appears in `blocked` (one `domain`
    * column). The blocklist is dimension-sized — Spark broadcasts the anti join. */
  def domainFilter(pages: DataFrame, blocked: DataFrame,
                   urlCol: String = "url"): DataFrame =
    withUrlMeta(pages, urlCol)
      .join(broadcast(blocked.select(col("domain"))), Seq("domain"), "left_anti")

  /** Latest-snapshot dedup: one row per normalized URL, the max-`tsCol` capture
    * wins (CC-style recrawl collapse). One hash-partitioned aggregation; ties
    * must not exist (synthetic timestamps are distinct per capture). */
  def urlDedupLatest(pages: DataFrame, urlCol: String = "url",
                     tsCol: String = "ts"): DataFrame =
    withUrlMeta(pages, urlCol)
      .groupBy("norm_url")
      .agg(max_by(col(urlCol), col(tsCol)).as("url_kept"),
        max(col(tsCol)).as("ts_kept"))

  /** Deterministic MESSY variant of the canonical synthetic URL for page id `p`
    * (dialect-shared — the test corpus for the normalizer): `p % mod` picks
    * shouted authority + www + default port / tracking params / fragment /
    * trailing slash / mixed real+tracking query. Variants 0-3 normalize back to
    * the canonical URL; variant 4 keeps `?a=1`. */
  def messySql(p: String, mod: Int, duck: Boolean): String = {
    val base = graft.synth.GraphSpec.urlSql(p)
    val pad = s"lpad(cast($p AS string), 8, '0')"
    s"""CASE CAST($p % $mod AS INT)
       | WHEN 0 THEN concat('HTTPS://WWW.EXAMPLE.ORG:443/p', $pad)
       | WHEN 1 THEN concat($base, '?utm_source=x&utm_campaign=y')
       | WHEN 2 THEN concat($base, '#frag')
       | WHEN 3 THEN concat($base, '/')
       | ELSE concat($base, '?a=1&utm_medium=m')
       |END""".stripMargin
  }

  /** Multi-domain variant for blocklist tests: `p % 3` spreads pages over one
    * clean and two blocklisted domains (dialect-shared). */
  def multiDomainSql(p: String, duck: Boolean): String = {
    val pad = s"lpad(cast($p AS string), 8, '0')"
    s"""CASE CAST($p % 3 AS INT)
       | WHEN 0 THEN concat('https://example.org/p', $pad)
       | WHEN 1 THEN concat('https://sub.blocked.test/p', $pad)
       | ELSE concat('https://www.ads-site.com/p', $pad)
       |END""".stripMargin
  }
}
