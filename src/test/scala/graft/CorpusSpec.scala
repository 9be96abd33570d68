package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.text.Corpus

/** Corpus curation composites: semantic dedup, source caps, stratified sampling. */
class CorpusSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("semanticDedup: identical vectors cluster to the min id; singletons keep themselves") {
    val s = spark; import s.implicits._
    // vectors 0,1,2 identical; 3 orthogonal-ish; dim matches Embeddings.Dim via padding
    val dim = graft.emb.Embeddings.Dim
    def vec(seed: Int): Seq[Float] =
      (0 until dim).map(d => (((seed * 31 + d * 7) % 13) - 6).toFloat / 6f)
    val emb = Seq(
      (0L, vec(1)), (1L, vec(1)), (2L, vec(1)), (3L, vec(9)))
      .toDF("vec_id", "embedding").withColumn("label", lit(0L))
    val out = Corpus.semanticDedup(spark, emb, tau = 0.95)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(0L) == (0L, 1L))
    assert(out(1L) == (0L, 0L))
    assert(out(2L) == (0L, 0L))
    assert(out(3L) == (3L, 1L))
  }

  test("sourceCap: at most k rows per source, top by n_chars") {
    val s = spark; import s.implicits._
    val docs = (0L until 30L).map(i => (i, s"t$i", "en", s"src${i % 3}", 100L + i))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Corpus.sourceCap(docs, k = 4).collect()
    val bySrc = out.groupBy(_.getString(1))
    assert(bySrc.forall(_._2.length == 4))
    // kept rows are the largest n_chars of each source (largest doc_ids here)
    assert(out.map(_.getLong(0)).toSet.forall(_ >= 18L))
  }

  test("stratifiedSample: exact ceil(frac*n) per stratum, deterministic") {
    val s = spark; import s.implicits._
    val docs = (0L until 40L).map(i => (i, s"t$i", if (i % 4 == 0) "de" else "en",
      "s", 10L)).toDF("doc_id", "text", "lang", "source", "n_chars")
    val a = Corpus.stratifiedSample(docs, frac = 0.3).collect()
    val b = Corpus.stratifiedSample(docs, frac = 0.3).collect()
    assert(a.map(_.toSeq).toSet == b.map(_.toSeq).toSet)
    val byLang = a.groupBy(_.getString(1)).map { case (l, rs) => l -> rs.length }
    assert(byLang("en") == 9) // ceil(0.3*30)
    assert(byLang("de") == 3) // ceil(0.3*10)
  }

  test("packSequences: contiguous layout, straddling docs span the right count") {
    val s = spark; import s.implicits._
    // token counts: 6, 4, 3, 10, 2  → starts 0, 6, 10, 13, 23 (budget 8)
    val docs = Seq(
      (0L, (1 to 6).map(i => s"a$i").mkString(" ")),
      (1L, (1 to 4).map(i => s"b$i").mkString(" ")),
      (2L, (1 to 3).map(i => s"c$i").mkString(" ")),
      (3L, (1 to 10).map(i => s"d$i").mkString(" ")),
      (4L, (1 to 2).map(i => s"e$i").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Corpus.packSequences(docs, budget = 8L).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(out(0L) == ((6L, 0L, 0L, 0L, 1L)))   // [0,6) in seq 0
    assert(out(1L) == ((4L, 6L, 0L, 6L, 2L)))   // [6,10) straddles seqs 0-1
    assert(out(2L) == ((3L, 10L, 1L, 2L, 1L)))  // [10,13) in seq 1
    assert(out(3L) == ((10L, 13L, 1L, 5L, 2L))) // [13,23) straddles seqs 1-2
    assert(out(4L) == ((2L, 23L, 2L, 7L, 2L)))  // [23,25) straddles seqs 2-3
    // global layout is gap-free: sum of tokens == last start + last count
    assert(out.values.map(_._1).sum == out(4L)._2 + out(4L)._1)
  }
}
