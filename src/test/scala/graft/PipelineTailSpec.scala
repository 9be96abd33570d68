package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.text.{Dedup, TextOps}

/** Gopher-style repetition signals, PII redaction, contamination check. */
class PipelineTailSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("repetitionStats: looping text scores high, varied text low") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a b a b a b a b"),          // "a b" dominates the 2-grams
      (1L, "u v w x y z q r"),          // all 2-grams unique
      (2L, "s"))                        // too short for any n-gram
      .toDF("doc_id", "text")
    val r = TextOps.repetitionStats(docs).collect()
      .map(x => x.getLong(0) -> x).toMap
    // doc 0: 7 2-grams, "a b" occurs 4x.
    assert(r(0L).getAs[Long]("n2") == 7L)
    assert(r(0L).getAs[Double]("top2_share") == 4.0 / 7.0)
    // doc 0: 4 5-grams, 2 distinct ("a b a b a", "b a b a b") => dup frac 1/2.
    assert(r(0L).getAs[Double]("dup5_frac") == 0.5)
    assert(r(1L).getAs[Double]("top2_share") == 1.0 / 7.0)
    assert(r(1L).getAs[Double]("dup5_frac") == 0.0)
    assert(r(2L).getAs[Long]("n2") == 0L && r(2L).getAs[Double]("top2_share") == 0.0)
  }

  test("redactPii: emails, phones, IPs replaced and counted") {
    import spark.implicits._
    val docs = Seq(
      (0L, "write to alice.smith+x@mail.example.org today"),
      (1L, "call 555-123-4567 or 555 987 6543"),
      (2L, "server at 192.168.0.1 and 10.0.0.255"),
      (3L, "nothing here"))
      .toDF("doc_id", "text")
    val r = TextOps.redactPii(docs).collect().map(x => x.getLong(0) -> x).toMap
    assert(r(0L).getAs[Long]("n_emails") == 1L)
    assert(r(0L).getAs[String]("redacted") == "write to <EMAIL> today")
    assert(r(1L).getAs[Long]("n_phones") == 2L)
    assert(r(1L).getAs[String]("redacted") == "call <PHONE> or <PHONE>")
    assert(r(2L).getAs[Long]("n_ips") == 2L)
    assert(r(2L).getAs[String]("redacted") == "server at <IP> and <IP>")
    assert(r(3L).getAs[String]("redacted") == "nothing here")
    // Phone-shaped dotted numbers are NOT double-counted as IPs (phones first).
    val p = TextOps.redactPii(Seq((9L, "dial 555.123.4567 now")).toDF("doc_id", "text"))
      .head()
    assert(p.getAs[Long]("n_phones") == 1L && p.getAs[Long]("n_ips") == 0L)
  }

  test("contamination: overlap counts exact, stop-gram guard drops boilerplate") {
    import spark.implicits._
    val eight = "q1 q2 q3 q4 q5 q6 q7 q8"
    val docs = Seq(
      (0L, s"intro words then $eight and more trailing text here"),
      (1L, "totally different content with no benchmark overlap at all ok"),
      (2L, s"$eight copied verbatim plus extra"))
      .toDF("doc_id", "text")
    val bench = Seq((100L, eight)).toDF("bench_id", "text")
    val hits = Dedup.contamination(docs, bench, n = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(hits.keySet == Set((0L, 100L), (2L, 100L)))
    assert(hits.values.forall(_ == 1L))
    // Guard: an n-gram in > maxGramFreq docs is dropped entirely.
    val spam = (0L until 10L).map(i => (i, s"$eight filler$i")).toDF("doc_id", "text")
    assert(Dedup.contamination(spam, bench, n = 8, maxGramFreq = 5L).count() == 0)
  }
}
