package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a web-scale training-data pipeline, over the
  * `documents(doc_id, text, lang, source, n_chars)` table.
  *
  * Cross-engine determinism strategy (same as the graph oracles): every computed value
  * is either an exact integer or a single arithmetic expression over exact integers, and
  * every hash is derived from `md5` — the one hash both Spark and DuckDB implement
  * bit-identically — so the driver's exact-value DuckDB compare passes regardless of
  * partitioning or evaluation order.
  *
  * All operators are pure Catalyst expressions (no UDFs): split/filter/transform/
  * aggregate lambdas are codegen'd, scale linearly, and shuffle only on the final
  * aggregation keys.
  */
object TextOps {

  /** 60-bit integer hash of a string: first 15 hex chars of md5.
    * DuckDB twin: `('0x' || substr(md5(x), 1, 15))::bigint`. */
  def mdint(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Whitespace tokens of a document. */
  def tokens(text: Column): Column = split(text, " ")

  val StopEn: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is", "it")
  val StopDe: Seq[String] = Seq("der", "die", "das", "und", "ist")
  val StopFr: Seq[String] = Seq("le", "la", "les", "et", "est")

  private def stopCount(toks: Column, stop: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(stop)))

  /** Per-document statistics: token counts, lexical diversity, stopword ratio — the
    * "quality scoring" signals (length / stopword-ratio heuristics) used to filter
    * web text before training. */
  def stats(docs: DataFrame): DataFrame = {
    val t = tokens(col("text"))
    docs.select(
      col("doc_id"),
      size(t).as("n_tokens"),
      size(array_distinct(t)).as("n_uniq"),
      stopCount(t, StopEn).as("n_stop"),
      aggregate(t, lit(0L), (acc, x) => acc + length(x)).as("sum_tok_len"),
      (size(array_distinct(t)).cast("double") / size(t)).as("ttr"),
      (stopCount(t, StopEn).cast("double") / size(t)).as("stop_ratio"))
  }

  /** Gopher-style repetition quality signals per document (Rae et al. 2021 §A1.1,
    * the "repetition" filters adapted to the space-tokenized corpus): share of the
    * most frequent 2-gram / 3-gram among all 2-/3-grams, and the fraction of 5-grams
    * that are duplicates. High values flag boilerplate/looping text that a training
    * pipeline drops. One explode + groupBy per n (shuffle keyed by doc — linear),
    * exact integers + single divisions. */
  def repetitionStats(docs: DataFrame): DataFrame = {
    def grams(n: Int): DataFrame = {
      val t = tokens(col("text"))
      docs
        .filter(size(t) >= n)
        .select(col("doc_id"),
          explode(transform(sequence(lit(1), size(t) - (n - 1)),
            i => concat_ws(" ", slice(t, i, lit(n))))).as("g"))
    }
    def topShare(n: Int): DataFrame =
      grams(n).groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
        .groupBy("doc_id")
        .agg(sum("c").as(s"n$n"), max("c").as(s"top$n"))
        .select(col("doc_id"), col(s"n$n"), col(s"top$n"),
          (col(s"top$n").cast("double") / col(s"n$n")).as(s"top${n}_share"))
    val dup5 = grams(5).groupBy("doc_id")
      .agg(count(lit(1)).as("n5"), countDistinct("g").as("d5"))
      .select(col("doc_id"), col("n5"),
        ((col("n5") - col("d5")).cast("double") / col("n5")).as("dup5_frac"))
    docs.select("doc_id")
      .join(topShare(2), Seq("doc_id"), "left")
      .join(topShare(3), Seq("doc_id"), "left")
      .join(dup5, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n2"), lit(0L)).as("n2"),
        coalesce(col("top2_share"), lit(0.0)).as("top2_share"),
        coalesce(col("n3"), lit(0L)).as("n3"),
        coalesce(col("top3_share"), lit(0.0)).as("top3_share"),
        coalesce(col("n5"), lit(0L)).as("n5"),
        coalesce(col("dup5_frac"), lit(0.0)).as("dup5_frac"))
  }

  /** Gopher-style document quality FILTER (Rae et al. 2021 Table A1's repetition +
    * length rules adapted to the whitespace-token corpus): a hard keep/drop verdict
    * with a per-rule failure BITMASK, so a pipeline can both filter and report why.
    * Every threshold compares exact integers by cross-multiplication (no float
    * compares), making the verdict bit-exact cross-engine. Bits: 1 = under 50
    * tokens, 2 = over 100 000 tokens, 4 = mean token length < 3, 8 = mean token
    * length > 10, 16 = fewer than 2 stopwords, 32 = top 2-gram share > 20%,
    * 64 = top 3-gram share > 18%, 128 = duplicate 5-gram fraction > 30%.
    * Output (doc_id, n_tokens, fail_mask, keep). */
  def gopherFilter(docs: DataFrame): DataFrame = {
    val t = tokens(col("text"))
    val bs = docs.select(col("doc_id"),
      size(t).cast("long").as("nt"),
      aggregate(t, lit(0L), (a, x) => a + length(x)).as("stl"),
      stopCount(t, StopEn).cast("long").as("nstop"))
    def gramTbl(n: Int) = docs.filter(size(t) >= n).select(col("doc_id"),
      explode(transform(sequence(lit(1), size(t) - (n - 1)),
        i => concat_ws(" ", slice(t, i, lit(n))))).as("g"))
    def topStats(n: Int) = gramTbl(n)
      .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(sum("c").as(s"n$n"), max("c").as(s"top$n"))
    val d5 = gramTbl(5).groupBy("doc_id")
      .agg(count(lit(1)).as("n5"), countDistinct("g").as("d5"))
    bs.join(topStats(2), Seq("doc_id"), "left")
      .join(topStats(3), Seq("doc_id"), "left")
      .join(d5, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n2", "top2", "n3", "top3", "n5", "d5"))
      .select(col("doc_id"), col("nt").as("n_tokens"),
        (when(col("nt") < 50L, 1L).otherwise(0L)
          + when(col("nt") > 100000L, 2L).otherwise(0L)
          + when(col("stl") < lit(3L) * col("nt"), 4L).otherwise(0L)
          + when(col("stl") > lit(10L) * col("nt"), 8L).otherwise(0L)
          + when(col("nstop") < 2L, 16L).otherwise(0L)
          + when(col("top2") * lit(5L) > col("n2"), 32L).otherwise(0L)
          + when(col("top3") * lit(50L) > col("n3") * lit(9L), 64L).otherwise(0L)
          + when((col("n5") - col("d5")) * lit(10L) > col("n5") * lit(3L), 128L)
            .otherwise(0L)).as("fail_mask"))
      .withColumn("keep", when(col("fail_mask") === 0L, 1L).otherwise(0L))
  }

  /** Email / phone / IPv4 patterns shared by the Spark and DuckDB sides — kept to
    * the regex subset where Java regex and RE2 agree (no backrefs, no lookaround). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}"
  val Ipv4Re = "([0-9]{1,3}\\.){3}[0-9]{1,3}"

  /** PII redaction for a training corpus: emails → <EMAIL>, phone-shaped numbers →
    * <PHONE>, IPv4 literals → <IP>, applied in that order, plus per-doc match
    * counts. Pure regexp column expressions (codegen'd, linear scan). `textCol`
    * lets callers redact an augmented column; output (doc_id, n_emails, n_phones,
    * n_ips, redacted). */
  def redactPii(docs: DataFrame, textCol: Column = col("text")): DataFrame = {
    val afterEmail = regexp_replace(textCol, EmailRe, "<EMAIL>")
    val afterPhone = regexp_replace(afterEmail, PhoneRe, "<PHONE>")
    docs.select(
      col("doc_id"),
      size(regexp_extract_all(textCol, lit(EmailRe), lit(0))).cast("long").as("n_emails"),
      size(regexp_extract_all(afterEmail, lit(PhoneRe), lit(0))).cast("long").as("n_phones"),
      size(regexp_extract_all(afterPhone, lit(Ipv4Re), lit(0))).cast("long").as("n_ips"),
      regexp_replace(afterPhone, Ipv4Re, "<IP>").as("redacted"))
  }

  /** Language identification by stopword-list voting (n-gram-free heuristic; the
    * deterministic tie-break is the fixed CASE order en > de > fr > und). */
  def langId(docs: DataFrame): DataFrame = {
    val t = tokens(col("text"))
    docs
      .select(col("doc_id"),
        stopCount(t, StopEn).as("s_en"),
        stopCount(t, StopDe).as("s_de"),
        stopCount(t, StopFr).as("s_fr"))
      .select(col("doc_id"),
        when(col("s_en") >= col("s_de") && col("s_en") >= col("s_fr") && col("s_en") > 0, "en")
          .when(col("s_de") >= col("s_fr") && col("s_de") > 0, "de")
          .when(col("s_fr") > 0, "fr")
          .otherwise("und").as("lang_pred"))
  }

  /** Order-sensitive document fingerprint: rolling polynomial hash over token hashes,
    * h_i = (31*h_{i-1} + mdint(tok) mod 2^31) mod 2^31. Exact integer recurrence —
    * byte-level content identity that survives whitespace-preserving reformatting. */
  def fingerprint(docs: DataFrame): DataFrame = {
    val m = 2147483648L
    val t = tokens(col("text"))
    docs.select(col("doc_id"),
      aggregate(t, lit(0L), (acc, x) => (acc * 31L + pmod(mdint(x), lit(m))) % m)
        .as("fp"))
  }

  /** Corpus token frequency (the TF side of quality filtering / vocab building). */
  def tokenFreq(docs: DataFrame): DataFrame =
    docs.select(explode(tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))

  /** BPE-style pre-tokenization: maximal letter runs, digit runs, and single
    * other-characters — the GPT-2-family pre-tokenizer shape, which is what a BPE
    * vocab trainer consumes. Same RE2-compatible pattern in the DuckDB twin. */
  val BpePattern = "[a-z]+|[0-9]+|[^a-z0-9]"
  def bpeTokens(c: Column): Column = regexp_extract_all(c, lit(BpePattern), lit(0))

  /** Corpus frequency of BPE pre-tokens over any string column (urls, text):
    * one explode + one hash aggregation — partial agg absorbs hub tokens. */
  def bpeTokenFreq(rows: DataFrame, column: String): DataFrame =
    rows.select(explode(bpeTokens(col(column))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))

  /** Exact deduplication: cluster by content hash, keep the smallest doc_id as the
    * representative. One hash-partitioned aggregation — at 100 TB this is the classic
    * single-shuffle dedup (hash keys distribute uniformly; no skew handling needed
    * because md5 keys are uniform). */
  def dedupExact(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text")).as("text_md5"))
      .agg(min(col("doc_id")).as("rep_id"), count(lit(1)).as("n_dups"))

  /** The surviving rows after exact dedup (smallest doc_id per distinct text). */
  def dedupedDocs(docs: DataFrame): DataFrame =
    docs.join(dedupExact(docs).select(col("rep_id").as("doc_id")), "doc_id")
}
