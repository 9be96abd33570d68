package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.synth.Generators

/** Havel–Hakimi realization + the distributed Erdős–Gallai profile. */
class HavelHakimiSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def degSeq(ds: Seq[Long]) = {
    val s = spark
    import s.implicits._
    ds.zipWithIndex.map { case (d, i) => (i.toLong, d) }.toDF("id", "deg")
  }

  test("erdosGallai: graphical sequence passes every k; non-graphical flagged") {
    val ok = Generators.erdosGallai(spark, degSeq(Seq(2L, 2L, 2L, 1L, 1L)))
    assert(ok.filter(col("ok") === 0L).count() == 0)
    // (3,3,1,1): k=2 demands 6 <= 2 + min(1,2)+min(1,2) = 4 — not graphical.
    val bad = Generators.erdosGallai(spark, degSeq(Seq(3L, 3L, 1L, 1L)))
    assert(bad.filter(col("ok") === 0L).count() > 0)
  }

  test("havelHakimi realizes the sequence exactly and the graph is simple") {
    val seq = Generators.lcgDegreeSequence(spark, 300L, 2L, 6L, 42L)
    assert(seq.agg(sum("deg")).head().getLong(0) % 2 == 0)
    val g = Generators.havelHakimi(spark, seq)
    val got = g.bidirected.groupBy(col("src").as("id"))
      .agg(count(lit(1)).as("gdeg"))
    val cmp = seq.join(got, Seq("id"), "left")
      .filter(coalesce(col("gdeg"), lit(0L)) =!= col("deg"))
    assert(cmp.count() == 0)
    // Simple: canonical edges unique, no self-loops.
    val cu = g.canonicalUndirected
    assert(cu.filter(col("src") === col("dst")).count() == 0)
    assert(cu.count() == cu.select("src", "dst").distinct().count())
  }

  test("havelHakimi rejects a non-graphical sequence") {
    intercept[IllegalArgumentException] {
      Generators.havelHakimi(spark, degSeq(Seq(3L, 3L, 1L, 1L)))
    }
  }
}
