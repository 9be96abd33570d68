package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.text.{Bloom, Dedup, TextOps}

/** Bloom prefilter (aux/BloomFilter.h semantics, broadcast-word re-expression) and
  * CCNet-style span-level dedup. */
class BloomSpanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("bloom: no false negatives, candidates are a superset, FPs exist when tiny") {
    val s = spark; import s.implicits._
    val rows = (0L until 200L).map(i => (i, s"key-$i")).toDF("doc_id", "key")
    val block = rows.filter(col("doc_id") % 10 === 0).select("key")
    // 64-bit filter with 20 keys x 3 probes: saturated enough to force FPs
    val words = Bloom.build(block, "key", mBits = 64L, k = 3)
    val cand = Bloom.candidates(rows, "key", "doc_id", words, mBits = 64L, k = 3)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("candidate")).toMap
    (0L until 200L by 10L).foreach(i => assert(cand(i) == 1L, s"false negative at $i"))
    val fps = (0L until 200L).filterNot(_ % 10 == 0).count(cand(_) == 1L)
    assert(fps > 0, "64-bit filter should produce some false positives")
    assert(fps < 180, "filter should still reject most non-members")
  }

  test("bloom: large filter has few candidates beyond true members") {
    val s = spark; import s.implicits._
    val rows = (0L until 500L).map(i => (i, s"k$i")).toDF("doc_id", "key")
    val block = rows.filter(col("doc_id") % 50 === 0).select("key")
    val words = Bloom.build(block, "key", mBits = 4096L, k = 3)
    val cand = Bloom.candidates(rows, "key", "doc_id", words, mBits = 4096L, k = 3)
    val nCand = cand.filter(col("candidate") === 1L).count()
    assert(nCand >= 10L && nCand <= 20L, s"expected ~10 candidates, got $nCand")
  }

  test("spanDedup: keep-first semantics and ordered reassembly") {
    val s = spark; import s.implicits._
    val w = (1 to 16).map(i => s"w$i").mkString(" ") // 2 full spans of 8
    val docs = Seq(
      (0L, w, "en", "s", 0L),                                   // both spans first
      (1L, w, "en", "s", 0L),                                   // full duplicate
      (2L, (1 to 8).map(i => s"w$i").mkString(" ") + " " +
        (1 to 8).map(i => s"u$i").mkString(" "), "en", "s", 0L), // span1 dup, span2 new
      (3L, "solo text", "en", "s", 0L))                          // short partial span
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Dedup.spanDedup(docs, span = 8).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(0L) == ((2L, 2L, w)))
    assert(out(1L) == ((2L, 0L, "")))
    assert(out(2L)._1 == 2L && out(2L)._2 == 1L
      && out(2L)._3 == (1 to 8).map(i => s"u$i").mkString(" "))
    assert(out(3L) == ((1L, 1L, "solo text")))
  }

  test("spanDedup: reassembly preserves chunk order within a doc") {
    val s = spark; import s.implicits._
    val text = (1 to 40).map(i => s"t$i").mkString(" ") // 5 spans
    val docs = Seq((7L, text, "en", "s", 0L)).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Dedup.spanDedup(docs, span = 8).head()
    assert(out.getLong(1) == 5L && out.getLong(2) == 5L && out.getString(3) == text)
  }

  test("mdint probe positions are stable across runs (determinism)") {
    val s = spark; import s.implicits._
    val keys = Seq(("a"), ("b"), ("c")).toDF("key")
    val w1 = Bloom.build(keys, "key", 128L, 3).collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val w2 = Bloom.build(keys, "key", 128L, 3).collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(w1 == w2)
  }
}
