package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.algo.{Measures, Overlap}
import graft.model.LinkGraph

/** HashingOverlapper + the Rand-measure tail. */
class OverlapSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Direct transcription of the reference's djb2 loop (u64 bytes, stop at 0). */
  private def djb2Ref(key: Long): Long = {
    var h = 5381L
    var k = key
    var i = 0
    while (i < 8 && (k & 0xFF) != 0) {
      h = h * 33 + (k & 0xFF)
      k >>>= 8
      i += 1
    }
    h
  }

  test("djb2Sql closed form equals the byte loop") {
    import spark.implicits._
    val keys = Seq(0L, 1L, 255L, 256L, 257L, 65535L, 65536L, 123456789L,
      0x00FF00FFL, 0xABCDEFL, (1L << 40) + 7L)
    val got = keys.toDF("k")
      .select(col("k"), expr(Overlap.djb2Sql("k", duck = false)).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    keys.foreach { k => assert(got(k) == djb2Ref(k), s"key $k") }
  }

  test("hashingOverlapper: intersections get one core id; 3-partition sum path") {
    import spark.implicits._
    val pa = Seq((0L, 1L), (1L, 1L), (2L, 2L), (3L, 2L)).toDF("id", "label")
    val pb = Seq((0L, 7L), (1L, 8L), (2L, 8L), (3L, 8L)).toDF("id", "label")
    val core = Overlap.hashingOverlapper(spark, Seq(pa, pb))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // Intersection classes: {0}, {1}, {2,3} — three dense ids, 2 and 3 together.
    assert(core(2L) == core(3L))
    assert(Set(core(0L), core(1L), core(2L)).size == 3)
    assert(core.values.toSet == Set(0L, 1L, 2L))
    val pc = Seq((0L, 5L), (1L, 5L), (2L, 5L), (3L, 6L)).toDF("id", "label")
    val core3 = Overlap.hashingOverlapper(spark, Seq(pa, pb, pc))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // Adding pc splits {2,3}: now all four nodes are singleton intersections except
    // none coincide — 4 classes at most, and 2 vs 3 must differ.
    assert(core3(2L) != core3(3L))
  }

  test("nodeStructuralRand is 1 - rand index; 0 for identical partitions") {
    import spark.implicits._
    val pa = Seq((0L, 1L), (1L, 1L), (2L, 2L), (3L, 2L)).toDF("id", "label")
    val pb = Seq((0L, 9L), (1L, 9L), (2L, 4L), (3L, 4L)).toDF("id", "label")
    val d = Measures.nodeStructuralRand(spark, pa, pb).head().getAs[Double]("rand_dissim")
    assert(d == 0.0)
    val pc = Seq((0L, 1L), (1L, 2L), (2L, 2L), (3L, 2L)).toDF("id", "label")
    val rand = Measures.randIndex(spark, pa, pc).head().getAs[Double]("rand")
    val dis = Measures.nodeStructuralRand(spark, pa, pc).head().getAs[Double]("rand_dissim")
    assert(math.abs(dis - (1.0 - rand)) < 1e-12)
  }

  test("sampled Rand measures: 0 on identical partitions, deterministic") {
    val g = LinkGraph.forSf(spark, "/root/testdata/sf0.001")
    val p = graft.algo.LabelPropagation.fixedRounds(spark, g, 5)
    val dNode = Measures.sampledNodeStructuralRand(spark, g, p, p, 500)
    assert(dNode.head().getAs[Double]("rand_node_sampled") == 0.0)
    val dG1 = Measures.sampledGraphStructuralRand(spark, g, p, p, 500).head()
    assert(dG1.getAs[Double]("rand_graph_sampled") == 0.0)
    assert(dG1.getAs[Long]("samples") > 400) // few draws lost to invalid nodes
    val q = graft.algo.LabelPropagation.fixedRounds(spark, g, 1)
    val a = Measures.sampledNodeStructuralRand(spark, g, p, q, 500).head()
    val b = Measures.sampledNodeStructuralRand(spark, g, p, q, 500).head()
    assert(a.getAs[Double]("rand_node_sampled") == b.getAs[Double]("rand_node_sampled"))
  }

  test("dynamicNmiDistance: 0 for identical clusterings, in [0,1]") {
    val g = LinkGraph.forSf(spark, "/root/testdata/sf0.001")
    val p5 = graft.algo.LabelPropagation.fixedRounds(spark, g, 5)
    val same = Measures.dynamicNmiDistance(spark, p5, p5).head().getAs[Double]("nmid")
    assert(math.abs(same) < 1e-6)
    val p1 = graft.algo.LabelPropagation.fixedRounds(spark, g, 1)
    val d = Measures.dynamicNmiDistance(spark, p5, p1).head().getAs[Double]("nmid")
    assert(d >= 0.0 && d <= 1.0)
  }
}
