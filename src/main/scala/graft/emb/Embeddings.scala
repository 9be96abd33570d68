package graft.emb

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.synth.GraphSpec

/** Similarity search over an embedding column (`embeddings(vec_id, embedding
  * array<float>, label)`): brute-force cosine top-k as the correctness baseline and
  * random-hyperplane LSH bucketing as the 100 TB scale path.
  *
  * Determinism: embeddings are scaled to exact integers (floor(x*10^6)), so dot
  * products and norms are exact 64-bit integer sums — order-independent and identical
  * in the DuckDB oracle; cosine is one fixed double expression over those integers.
  * Hyperplane coefficients are pure LCG functions of (table, plane, dim), inlined as
  * literals on both engines.
  */
object Embeddings {

  val Scale = 1000000L
  val Dim = 64
  val NumTables = 6 // LSH tables (OR-amplification)
  /** Build-side buckets larger than this are dropped from the candidate join —
    * [[planesFor]] keeps EXPECTED occupancy ~16, but an adversarial corpus (mass
    * duplicate vectors, zero vectors) can still concentrate one bucket; the cap bounds
    * per-probe fan-out regardless of the data. Mirrored exactly in the oracle. */
  val MaxBucketFreq = 256L
  /** Planes per table at the correctness-gate scale (n=500 -> planesFor = 5). */
  val NumPlanes = 5
  private val MaxPlanes = 64 // coef stride, so coefficients don't shift with planes

  /** THE scale parameterization rule: planes = log2(n / targetBucket), so the bucket
    * count (2^planes per table) GROWS with the corpus and expected bucket occupancy
    * stays ~targetBucket — in-bucket candidate pairs per table are then
    * O(n * targetBucket), LINEAR in n, not n^2/constant. The recall narrower buckets
    * cost is recovered by radius-1 multiprobe (each vector also probes the `planes`
    * buckets one sign-flip away) OR-ed over [[NumTables]] tables; recall vs brute
    * force is measured in DedupSpec. */
  def planesFor(n: Long, targetBucket: Int = 16): Int =
    math.max(4, math.ceil(
      math.log((n.toDouble / targetBucket).max(2.0)) / math.log(2.0)).toInt)

  private def lcg(x: Long): Long = {
    import GraphSpec.{A, C, M}
    (A * ((A * (x % M) + C) % M) + C) % M
  }
  /** Hyperplane coefficient in [-1000, 1000], pure function of (table, plane, dim). */
  def coef(t: Int, p: Int, d: Int): Long =
    lcg((((t.toLong * MaxPlanes + p) * Dim + d) * 31L) + 7L) % 2001L - 1000L

  /** (vec_id, v: exact int vector, nrm: exact squared norm). */
  def vectors(emb: DataFrame): DataFrame = {
    val v = transform(col("embedding"), x => floor(x.cast("double") * Scale).cast("long"))
    emb.select(col("vec_id"), v.as("v"))
      .withColumn("nrm", aggregate(col("v"), lit(0L), (a, x) => a + x * x))
  }

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  /** cos = dot / sqrt(na) / sqrt(nb) — single fixed expression over exact integers. */
  private def cosine(d: Column, na: Column, nb: Column): Column =
    d.cast("double") / sqrt(na.cast("double")) / sqrt(nb.cast("double"))

  /** Brute-force cosine top-k: for each query vector (vec_id < numQueries), the k
    * nearest other vectors. The query side is broadcast — at scale this is the
    * canonical broadcast-NN join (small probe set vs huge corpus), scanning the corpus
    * once with no shuffle of the big side. */
  def bruteTopK(emb: DataFrame, numQueries: Int = 20, k: Int = 5): DataFrame = {
    val vs = vectors(emb)
    val q = vs.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val scored = vs.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosine(dot(col("qv"), col("v")), col("qn"), col("nrm")).as("cos"))
    scored
      .withColumn("rnk", row_number().over(
        Window.partitionBy("query_id").orderBy(desc("cos"), asc("neighbor_id"))).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("neighbor_id"), col("cos"))
  }

  /** LSH bucket ids per vector: (vec_id, t, bucket) for each of the [[NumTables]]
    * sign-random-projection tables with `planes` hyperplanes each. */
  def lshBuckets(emb: DataFrame, planes: Int = NumPlanes): DataFrame = {
    val vs = vectors(emb)
    val buckets = (0 until NumTables).map { t =>
      val bucket = (0 until planes).map { p =>
        val coefs = array((0 until Dim).map(d => lit(coef(t, p, d))): _*)
        when(dot(col("v"), coefs) >= 0, lit(1L << p)).otherwise(0L)
      }.reduce(_ + _)
      struct(lit(t).as("t"), bucket.as("bucket"))
    }
    vs.select(col("vec_id"), col("v"), col("nrm"),
        explode(array(buckets: _*)).as("tb"))
      .select(col("vec_id"), col("v"), col("nrm"),
        col("tb.t").as("t"), col("tb.bucket").as("bucket"))
  }

  /** Near-duplicate pairs by cosine >= tau, candidates restricted to vectors whose LSH
    * codes agree (multiprobe: differ in at most one sign bit) in some table. Output
    * (a, b, cos), a < b. Candidate generation touches only same/adjacent-bucket pairs
    * — O(n * bucketSize * (planes+1)) per table with [[planesFor]] sizing, vs the
    * O(n^2) brute force. Multiprobe is what keeps recall up when `planes` grows with
    * the corpus (each extra plane halves single-bucket collision probability). */
  def lshNearDups(emb: DataFrame, tau: Double, planes: Int = NumPlanes,
                  multiprobe: Boolean = true,
                  maxBucket: Long = MaxBucketFreq): DataFrame = {
    val b = lshBuckets(emb, planes).persist(StorageLevel.MEMORY_AND_DISK)
    // Hot-bucket guard on the BUILD side: every probe's fan-out is then <= maxBucket.
    // A pair (a,b) survives iff b's home bucket is kept in some table where their codes
    // differ by <= 1 bit — deterministic, mirrored in the oracle.
    val hot = b.groupBy("t", "bucket").agg(count(lit(1)).as("c"))
      .filter(col("c") > maxBucket).select("t", "bucket")
    val bKept = b.join(hot, Seq("t", "bucket"), "left_anti")
    // Probe rows: own bucket + (if multiprobe) each single-bit flip of it. If codes of
    // x and y differ in exactly bit p, x's p-flip probe lands on y's home bucket (and
    // vice versa), so restricting probes to the smaller id still finds every pair.
    val probeBuckets =
      if (multiprobe) col("bucket") +: (0 until planes).map(p => col("bucket").bitwiseXOR(lit(1L << p)))
      else Seq(col("bucket"))
    val probes = b.select(col("vec_id"), col("v"), col("nrm"), col("t"),
      explode(array(probeBuckets: _*)).as("probe"))
    val pairs = probes.as("x").join(bKept.as("y"),
        col("x.t") === col("y.t") && col("x.probe") === col("y.bucket") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"),
        cosine(dot(col("x.v"), col("y.v")), col("x.nrm"), col("y.nrm")).as("cos"))
      .distinct()
    pairs.filter(col("cos") >= tau)
  }

  // --- IVF (inverted-file) ANN: k-means coarse quantizer + probed-list re-rank -----

  /** Deterministic Lloyd k-means over the exact integer vectors: `nlist` centroids
    * initialized from the first `nlist` vec_ids, `iters` assignment/update rounds.
    * Centroid elements stay exact integers (floor of the cluster mean, computed as the
    * SAME double expression in the DuckDB twin), assignment ties break on centroid id,
    * and empty clusters keep their previous centroid — every step is reproducible
    * bit-for-bit across engines and partitionings.
    *
    * Returns (assign(vec_id, cid), centroids(cid, cv, cn)). The corpus is scanned once
    * per round against the BROADCAST centroid table (nlist rows) — the canonical
    * distributed k-means shape: no shuffle of the corpus, one partial-aggregable
    * argmin + one per-dimension partial aggregation per round. */
  def kmeans(emb: DataFrame, nlist: Int, iters: Int): (DataFrame, DataFrame) = {
    val vs = vectors(emb).persist(StorageLevel.MEMORY_AND_DISK)
    vs.count()
    var cents = vs.filter(col("vec_id") < nlist)
      .select(col("vec_id").as("cid"), col("v").as("cv"), col("nrm").as("cn"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var assign: DataFrame = null
    for (i <- 1 to iters) {
      // Assignment: argmin over (squared L2 distance, cid); d2 = |v|^2 - 2 v·c + |c|^2.
      val a = vs.crossJoin(broadcast(cents))
        .select(col("vec_id"), col("nrm"),
          (col("nrm") - lit(2L) * dot(col("v"), col("cv")) + col("cn")).as("d2"), col("cid"))
        .groupBy("vec_id").agg(min(struct(col("d2"), col("cid"))).as("b"))
        .select(col("vec_id"), col("b.cid").as("cid"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      a.count()
      if (assign != null) assign.unpersist()
      assign = a
      if (i < iters) {
        // Update: element-wise floor(mean) per cluster — Dim static agg expressions,
        // identical to the unrolled DuckDB twin.
        val sums = (0 until Dim).map(d =>
          sum(element_at(col("v"), d + 1)).as(s"s$d")) :+ count(lit(1)).as("c")
        val means = vs.join(a, "vec_id").groupBy("cid")
          .agg(sums.head, sums.tail: _*)
          .select(col("cid"), array((0 until Dim).map(d =>
            floor(col(s"s$d").cast("double") / col("c")).cast("long")): _*).as("mv"))
        val prev = cents
        cents = cents.join(means, Seq("cid"), "left")
          .select(col("cid"), coalesce(col("mv"), col("cv")).as("cv"))
          .withColumn("cn", aggregate(col("cv"), lit(0L), (acc, x) => acc + x * x))
          .persist(StorageLevel.MEMORY_AND_DISK)
        cents.count()
        prev.unpersist()
      }
    }
    (assign, cents)
  }

  /** IVF cosine top-k — the indexed scale path next to [[bruteTopK]]'s exhaustive
    * baseline: each query probes its `nprobe` closest coarse centroids and re-ranks
    * only the vectors assigned to those lists (expected corpus fraction nprobe/nlist
    * instead of 1). Same output shape as bruteTopK; recall vs brute force is measured
    * in DedupSpec-style specs, and the DuckDB twin replays the quantizer exactly so
    * the correctness gate is bit-exact on whatever the index returns. */
  def ivfTopK(emb: DataFrame, numQueries: Int = 20, k: Int = 5,
              nlist: Int = 16, iters: Int = 3, nprobe: Int = 4): DataFrame = {
    val (assign, cents) = kmeans(emb, nlist, iters)
    val vs = vectors(emb)
    val q = vs.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val probes = q.crossJoin(broadcast(cents))
      .select(col("query_id"),
        (col("qn") - lit(2L) * dot(col("qv"), col("cv")) + col("cn")).as("d2"), col("cid"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("query_id").orderBy(asc("d2"), asc("cid"))))
      .filter(col("rn") <= nprobe)
      .select("query_id", "cid")
    val lists = vs.join(assign, "vec_id")
    val scored = lists.join(broadcast(probes.join(q, "query_id")), "cid")
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosine(dot(col("qv"), col("v")), col("qn"), col("nrm")).as("cos"))
    scored
      .withColumn("rnk", row_number().over(
        Window.partitionBy("query_id").orderBy(desc("cos"), asc("neighbor_id"))).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("neighbor_id"), col("cos"))
  }
}
