package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.streaming.DynamicGenerators
import graft.synth.Generators

/** Dynamic generator event streams: each prefix fold must reproduce the static
  * graph at that step exactly (the DynamicGraphSource contract). */
class DynamicGeneratorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def canonSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select(least(col("src"), col("dst")).as("s"),
        greatest(col("src"), col("dst")).as("t"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("dynamicPath folds to the path prefix") {
    val ev = DynamicGenerators.dynamicPath(spark, 10L)
    val e5 = canonSet(DynamicGenerators.foldSteps(spark, ev, 5L))
    assert(e5 == (1L to 5L).map(i => (i - 1, i)).toSet)
  }

  test("dynamicDorogovtsevMendes prefixes fold to the smaller static DM graphs") {
    val ev = DynamicGenerators.dynamicDorogovtsevMendes(spark, 40L, 42L)
    // Full fold == static DM(40); mid-prefix fold == static DM(20) (DM draws are a
    // pure function of the arriving node, so prefixes are stable across n).
    assert(canonSet(DynamicGenerators.foldSteps(spark, ev, 40L)) ==
      canonSet(Generators.dorogovtsevMendes(spark, 40L, 42L).canonicalUndirected))
    // DM(20)'s last node is 19, arriving at t = 19 - 2 = 17.
    assert(canonSet(DynamicGenerators.foldSteps(spark, ev, 17L)) ==
      canonSet(Generators.dorogovtsevMendes(spark, 20L, 42L).canonicalUndirected))
  }

  test("dynamicPubWeb edit stream folds to each step's mutual-kNN graph") {
    val ev = DynamicGenerators.dynamicPubWeb(spark, 150L, steps = 2, areas = 4,
      maxNeigh = 6, rDiv = 16)
    val Q = 1L << 20
    val R = Q / 16
    val V = R / 8
    def vel(off: Int) = s"(((${Generators.drawSql(s"id*5 + $off + ${42L} * 130003",
      duck = false)} div 128) % ${2 * V + 1}) - $V)"
    def staticAt(t: Int) = {
      val pts = spark.range(150L).select(col("id"),
        pmod(expr(Generators.pubWebCoordSql(0, 4, Q, R, 42L, duck = false)) +
          lit(t.toLong) * expr(vel(0)), lit(Q)).as("x"),
        pmod(expr(Generators.pubWebCoordSql(1, 4, Q, R, 42L, duck = false)) +
          lit(t.toLong) * expr(vel(1)), lit(Q)).as("y"))
      Generators.pubWebFromPoints(spark, pts, 6, 16)
    }
    (0 to 2).foreach { t =>
      assert(canonSet(DynamicGenerators.foldSteps(spark, ev, t.toLong)) ==
        canonSet(staticAt(t).canonicalUndirected), s"step $t")
    }
    // Movement actually happens: at least one re/ae event after t=0.
    assert(ev.filter(col("t") > 0L).count() > 0)
  }

  test("dynamicHyperbolic edit stream folds back and is deterministic") {
    val ev = DynamicGenerators.dynamicHyperbolic(spark, 120L, R = 3.0, steps = 2,
      driftFrac = 0.05)
    val ev2 = DynamicGenerators.dynamicHyperbolic(spark, 120L, R = 3.0, steps = 2,
      driftFrac = 0.05)
    val key = (df: org.apache.spark.sql.DataFrame) =>
      df.select("etype", "u", "v", "t").collect()
        .map(r => (r.getString(0), r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2),
          r.getLong(3))).toSet
    assert(key(ev) == key(ev2))
    // Fold at the last step is a valid threshold graph: nonempty and symmetricless.
    val folded = DynamicGenerators.foldSteps(spark, ev, 2L)
    assert(folded.count() > 0)
    assert(ev.filter(col("t") > 0L).count() > 0)
  }
}
