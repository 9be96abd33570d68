package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.emb.Embeddings
import graft.text.{Dedup, TextOps}

class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import scala.jdk.CollectionConverters._

  private def docsDf(texts: Seq[String]) = {
    val s = spark
    import s.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  test("exact dedup groups identical texts and keeps the min doc_id") {
    val d = docsDf(Seq("a b c d", "x y z w", "a b c d", "a b c d"))
    val rows = TextOps.dedupExact(d).collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(rows == Set((0L, 3L), (1L, 1L)))
    assert(TextOps.dedupedDocs(d).select("doc_id").collect().map(_.getLong(0)).toSet == Set(0L, 1L))
  }

  test("identical docs have jaccard 1.0; disjoint docs produce no pair") {
    val d = docsDf(Seq(
      "the cat sat on the mat today fine",
      "the cat sat on the mat today fine",
      "completely different words here entirely unrelated stuff ok"))
    val pairs = Dedup.ngramJaccardPairs(d, 0.5).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs == Map((0L, 1L) -> 1.0))
  }

  test("minhash signatures are equal for identical texts and bounded by P") {
    val d = docsDf(Seq("one two three four five six", "one two three four five six",
      "other stuff entirely different from before now"))
    val sig = Dedup.minhashSignature(d).collect().map(r =>
      r.getLong(0) -> (1 to Dedup.NumPerms).map(r.getLong)).toMap
    assert(sig(0L) == sig(1L))
    assert(sig.values.flatten.forall(m => m >= 0 && m < Dedup.P))
    val nd = Dedup.minhashNearDups(d, 0.9).collect()
    assert(nd.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((0L, 1L)))
  }

  test("simhash: identical texts get hamming 0; near-dup banding finds the pair") {
    val d = docsDf(Seq("alpha beta gamma delta epsilon zeta eta theta",
      "alpha beta gamma delta epsilon zeta eta theta"))
    val nd = Dedup.simhashNearDups(d, 0).collect()
    assert(nd.length == 1 && nd.head.getLong(2) == 0L)
  }

  test("embedding brute top-k: an exact duplicate vector is rank-1 with cos 1.0") {
    val s = spark
    import s.implicits._
    val base = (0 until 64).map(i => math.sin(i * 0.7).toFloat)
    val other = (0 until 64).map(i => math.cos(i * 1.3).toFloat)
    val emb = Seq((0L, base, 0), (1L, other, 0), (2L, base, 0))
      .toDF("vec_id", "embedding", "label")
    val top = Embeddings.bruteTopK(emb, numQueries = 1, k = 2).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(top.head._1 == 1L && top.head._2 == 2L && math.abs(top.head._3 - 1.0) < 1e-12)
  }

  test("lsh near-dups is a subset of brute-force pairs at the same threshold") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(200)
    val lsh = Embeddings.lshNearDups(emb, 0.35).select("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val vs = Embeddings.lshBuckets(emb).select("vec_id", "v", "nrm").distinct()
    val brute = vs.as("x").join(vs.as("y"), col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id"), col("y.vec_id"),
        (aggregate(zip_with(col("x.v"), col("y.v"), (p, q) => p * q), lit(0L), (a, x) => a + x)
          .cast("double") / sqrt(col("x.nrm").cast("double")) / sqrt(col("y.nrm").cast("double"))).as("cos"))
      .filter(col("cos") >= 0.35)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(brute))
    assert(lsh.nonEmpty)
  }

  test("lsh multiprobe recall vs brute force >= 0.8 at oracle parameters; buckets grow with n") {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val lsh = Embeddings.lshNearDups(emb, 0.35).select("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val vs = Embeddings.vectors(emb)
    val brute = vs.as("x").join(vs.as("y"), col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id"), col("y.vec_id"),
        (aggregate(zip_with(col("x.v"), col("y.v"), (p, q) => p * q), lit(0L), (a, x) => a + x)
          .cast("double") / sqrt(col("x.nrm").cast("double")) / sqrt(col("y.nrm").cast("double"))).as("cos"))
      .filter(col("cos") >= 0.35)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(brute))
    val recall = lsh.size.toDouble / brute.size
    info(s"multiprobe lsh recall = $recall (${lsh.size}/${brute.size})")
    assert(recall >= 0.8)
    // The scale rule: bucket count grows with n (planes ~ log2(n/16)).
    assert(Embeddings.planesFor(500) == 5)
    assert(Embeddings.planesFor(1000000) == 16)
    assert(Embeddings.planesFor(10000000000L) > 25)
  }

  // --- hot-bucket guards: a planted boilerplate cluster must not go quadratic ---

  /** 80 identical docs (below the 100-doc stop-shingle threshold, so their shingles
    * survive and ALL land in the same band/chunk buckets) + 2 unrelated docs. */
  private def boilerplate(k: Int = 80) = docsDf(
    Seq.fill(k)("lorem ipsum dolor sit amet consectetur adipiscing elit sed do") ++
      Seq("totally different text one here now ok fine yes",
          "another unrelated document with its own words entirely"))

  test("minhash hot-band cap drops mega-buckets; default cap keeps real dup clusters") {
    val d = boilerplate()
    // Capped below the cluster size: every band bucket (80 members) is dropped, the
    // candidate self-join sees nothing — this is the stage that would otherwise
    // produce 80*79/2 in-bucket pairs (quadratic in cluster size).
    assert(Dedup.minhashNearDups(d, 0.5, maxBucket = 16L).count() == 0L)
    // Default cap (256) is above the cluster: all 3160 exact-dup pairs verified.
    assert(Dedup.minhashNearDups(d, 0.5).count() == 80L * 79 / 2)
  }

  test("simhash hot-chunk cap drops mega-buckets; default cap keeps the cluster") {
    val d = boilerplate()
    assert(Dedup.simhashNearDups(d, 3, maxBucket = 16L).count() == 0L)
    assert(Dedup.simhashNearDups(d, 3).count() == 80L * 79 / 2)
  }

  test("embedding lsh hot-bucket cap bounds build-side fan-out") {
    val s = spark
    import s.implicits._
    val base = (0 until 64).map(i => math.sin(i * 0.7).toFloat)
    val far = (0 until 64).map(i => (if (i % 2 == 0) -1f else 1f) * math.cos(i * 1.3).toFloat)
    val emb = ((0 until 60).map(i => (i.toLong, base, 0)) :+ (60L, far, 0))
      .toDF("vec_id", "embedding", "label")
    // 60 identical vectors share every home bucket; cap 8 drops those buckets from the
    // build side, so no intra-cluster pair survives.
    assert(Embeddings.lshNearDups(emb, 0.9, maxBucket = 8L).count() == 0L)
    // Default cap (256) keeps the cluster: all 60*59/2 cos=1 pairs.
    assert(Embeddings.lshNearDups(emb, 0.9).count() == 60L * 59 / 2)
  }
}
