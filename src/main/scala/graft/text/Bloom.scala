package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Bloom filter over a key column — the reference's aux Bloom filter
  * (/root/reference/networkit/cpp/auxiliary/BloomFilter.h:20-76: k hash functions
  * over a fixed bit array, set/isMember) re-expressed as Spark column arithmetic.
  *
  * Scale story: the filter itself is a tiny (mBits/60)-row (word, bits) table built
  * with one groupBy-bit_or over the key set — at 100 TB the corpus-side membership
  * test is a BROADCAST join against that table, replacing the full shuffle of an
  * m-row anti-join against a large blocklist/seen-set with a map-side prefilter;
  * only the (tiny, FP-rate-bounded) candidate set pays the exact verification join.
  * That is the classic "bloom-prefiltered anti join" pattern for incremental corpus
  * dedup (drop documents whose fingerprint was already seen in a previous crawl).
  *
  * Determinism: the k probe positions are md5-derived ([[TextOps.mdint]] of
  * key || '#' || i), 60-bit words (bit index < 60 keeps every shift in positive
  * int64 territory in both engines), so build and probe replay bit-identically in
  * DuckDB.
  */
object Bloom {

  val WordBits = 60

  /** Probe position i for a key: mdint(key || '#' || i) mod mBits. */
  def position(key: Column, i: Int, mBits: Long): Column =
    TextOps.mdint(concat(key.cast("string"), lit("#" + i))) % mBits

  /** Build the (word, bits) filter table from `keys(keyCol)`: k probe bits per key,
    * OR-folded per 60-bit word. Output rows ≤ mBits/60 — broadcastable. */
  def build(keys: DataFrame, keyCol: String, mBits: Long, k: Int): DataFrame = {
    val pos = (0 until k).map(i =>
      keys.select(position(col(keyCol), i, mBits).as("pos")))
      .reduce(_.union(_))
    pos
      .select(expr(s"pos div $WordBits").as("word"),
        expr(s"shiftleft(CAST(1 AS BIGINT), CAST(pos % $WordBits AS INT))").as("bit"))
      .groupBy("word").agg(expr("bit_or(bit)").as("bits"))
  }

  /** Membership prefilter: adds `candidate` (1 iff ALL k probe bits are set — the
    * bloom "maybe" verdict, superset of true members) to `rows`. The k probes
    * explode to k rows per input row, join the broadcast filter table, and fold
    * back with an all-bits-set aggregate keyed by the input's id column. */
  def candidates(rows: DataFrame, keyCol: String, idCol: String, filterWords: DataFrame,
                 mBits: Long, k: Int): DataFrame = {
    val probes = (0 until k).map(i =>
      rows.select(col(idCol), position(col(keyCol), i, mBits).as("pos"))
        .select(col(idCol), expr(s"pos div $WordBits").as("word"),
          expr(s"shiftleft(CAST(1 AS BIGINT), CAST(pos % $WordBits AS INT))").as("bit")))
      .reduce(_.union(_))
    val hits = probes
      .join(broadcast(filterWords), Seq("word"), "left")
      .groupBy(idCol)
      .agg(min(when(coalesce(col("bits"), lit(0L)).bitwiseAND(col("bit")) =!= 0L, 1L)
        .otherwise(0L)).as("candidate"))
    rows.join(hits, Seq(idCol))
  }
}
