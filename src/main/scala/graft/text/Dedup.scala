package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.synth.GraphSpec

/** Near-duplicate detection for web-scale training data: word-shingle Jaccard,
  * MinHash + banded LSH, and SimHash — the standard trio for fuzzy dedup of a
  * 10^12-document crawl.
  *
  * Scale shape: everything funnels through `(doc_id, shingle_hash)` — one explode +
  * one distinct (hash-partitioned by shingle), then joins keyed on shingle/band/chunk
  * whose fan-out is bounded by [[maxShingleFreq]] (stop-shingles are dropped, the classic
  * hub-key guard: a boilerplate shingle shared by 10^6 pages must not produce 10^12
  * candidate pairs). All arithmetic is exact-integer so the DuckDB oracle matches
  * bit-for-bit (see [[graft.oracle.DedupOracleSql]]).
  */
object Dedup {

  /** Prime modulus 2^31-1 for MinHash permutations h_i(x) = (a_i*x + b_i) mod P. */
  val P = 2147483647L
  val NumPerms = 32
  val BandRows = 4 // 8 bands x 4 rows
  val NumBands: Int = NumPerms / BandRows
  val ShingleSize = 3
  /** Shingles occurring in more than this many docs are dropped (skew guard). */
  val maxShingleFreq = 100L
  /** MinHash band buckets larger than this are dropped — the hub-key guard applied to
    * the band join itself. Mass boilerplate that survives the shingle filter (e.g.
    * near-identical template families) would otherwise put 10^k docs in ONE (band,key)
    * bucket and the candidate self-join goes quadratic on a single reducer. A bucket
    * this full is template noise, not near-dup signal; dropping it bounds in-bucket
    * pairs at cap^2/2 per bucket. Mirrored exactly in the DuckDB oracle. */
  val maxBandFreq = 256L
  /** Same guard for SimHash 16-bit chunk buckets. */
  val maxChunkFreq = 256L

  private def lcg(x: Long): Long = {
    import GraphSpec.{A, C, M}
    (A * ((A * (x % M) + C) % M) + C) % M
  }
  /** Permutation parameters — pure functions of the index, identical in the oracle. */
  def permA(i: Int): Long = lcg(2L * i + 1) % (P - 1) + 1
  def permB(i: Int): Long = lcg(2L * i + 2) % P

  /** Distinct (doc_id, h) word-3-gram shingle hashes; docs shorter than the shingle
    * size contribute nothing. h is the 60-bit md5 int of the joined shingle text. */
  def shingleHashes(docs: DataFrame, n: Int = ShingleSize): DataFrame = {
    val t = TextOps.tokens(col("text"))
    docs
      .filter(size(t) >= n)
      .select(col("doc_id"),
        explode(transform(sequence(lit(1), size(t) - (n - 1)),
          i => concat_ws(" ", slice(t, i, lit(n))))).as("s"))
      .select(col("doc_id"), TextOps.mdint(col("s")).as("h"))
      .distinct()
  }

  /** Shingle table with stop-shingles removed + per-doc set sizes, both persisted —
    * the shared input of the three near-dup operators. */
  private def prepared(docs: DataFrame): (DataFrame, DataFrame) = {
    val sh = shingleHashes(docs).persist(StorageLevel.MEMORY_AND_DISK)
    val keep = sh.groupBy("h").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxShingleFreq).select("h")
    val kept = sh.join(keep, "h").persist(StorageLevel.MEMORY_AND_DISK)
    val sizes = kept.groupBy("doc_id").agg(count(lit(1)).as("n"))
    (kept, sizes)
  }

  /** Exact pairwise Jaccard over docs sharing >= 1 (non-stop) shingle, kept if >= tau.
    * Output (a, b, jaccard) with a < b. */
  def ngramJaccardPairs(docs: DataFrame, tau: Double): DataFrame = {
    val (sh, sizes) = prepared(docs)
    val inter = sh.as("x").join(sh.as("y"),
        col("x.h") === col("y.h") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .agg(count(lit(1)).as("c"))
    inter
      .join(sizes.select(col("doc_id").as("a"), col("n").as("na")), "a")
      .join(sizes.select(col("doc_id").as("b"), col("n").as("nb")), "b")
      .select(col("a"), col("b"),
        (col("c").cast("double") / (col("na") + col("nb") - col("c"))).as("jaccard"))
      .filter(col("jaccard") >= tau)
  }

  /** MinHash signature per doc: m_i = min over shingles of (a_i*(h mod P)+b_i) mod P. */
  def minhashSignature(docs: DataFrame): DataFrame = signatureFrom(prepared(docs)._1)

  private def signatureFrom(sh: DataFrame): DataFrame = {
    val hm = pmod(col("h"), lit(P))
    val aggs = (0 until NumPerms).map(i =>
      min(pmod(lit(permA(i)) * hm + lit(permB(i)), lit(P))).as(s"m$i"))
    sh.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  /** Band key of band b from 4 consecutive signature values (rolling-31 mod P). */
  private def bandKey(b: Int): Column =
    (0 until BandRows).map(r => col(s"m${b * BandRows + r}"))
      .reduce((acc, m) => pmod(acc * 31L + m, lit(P)))

  /** MinHash-LSH near-dup pairs: docs sharing any of the 8 band keys are candidates;
    * candidates are verified with exact Jaccard >= tau. Output (a, b, jaccard), a < b.
    * This is the 100 TB-scale path — candidate generation never compares non-colliding
    * docs, and band keys distribute uniformly. */
  def minhashNearDups(docs: DataFrame, tau: Double,
                      maxBucket: Long = maxBandFreq): DataFrame = {
    val (sh, sizes) = prepared(docs)
    val sig = signatureFrom(sh)
    val allBands = sig.select(col("doc_id"),
      explode(array((0 until NumBands).map(b => struct(lit(b).as("band"), bandKey(b).as("key"))): _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Hot-bucket guard: drop (band,key) buckets with more than maxBucket members
    // BEFORE the self-join, so no single bucket can go quadratic.
    val hot = allBands.groupBy("band", "key").agg(count(lit(1)).as("c"))
      .filter(col("c") > maxBucket).select("band", "key")
    val bands = allBands.join(hot, Seq("band", "key"), "left_anti")
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()
    // Exact Jaccard computed for CANDIDATE pairs only — join the candidate list to the
    // two shingle sets and count shared hashes. No all-pairs shingle self-join anywhere:
    // the scale cost is |candidates| x shingles-per-doc, which is what banded LSH buys.
    val inter = cand
      .join(sh.select(col("doc_id").as("a"), col("h")), "a")
      .join(sh.select(col("doc_id").as("b"), col("h")), Seq("b", "h"))
      .groupBy("a", "b").agg(count(lit(1)).as("c"))
    inter
      .join(sizes.select(col("doc_id").as("a"), col("n").as("na")), "a")
      .join(sizes.select(col("doc_id").as("b"), col("n").as("nb")), "b")
      .select(col("a"), col("b"),
        (col("c").cast("double") / (col("na") + col("nb") - col("c"))).as("jaccard"))
      .filter(col("jaccard") >= tau)
  }

  /** Near-dup CLUSTERS: connected components over the MinHash near-dup pair graph —
    * the step a real dedup pipeline runs after pair generation, so transitive
    * near-dups (A~B, B~C) collapse to one representative. Every document gets
    * rep = min doc_id of its cluster (itself when it has no near-dup). Reuses the
    * engine's min-label CC (frontier + coarsening — cluster diameters are tiny, so
    * rounds ~ log of the longest near-dup chain). Output (doc_id, rep). */
  def nearDupClusters(spark: org.apache.spark.sql.SparkSession, docs: DataFrame,
                      tau: Double, maxBucket: Long = maxBandFreq): DataFrame = {
    val pairs = minhashNearDups(docs, tau, maxBucket)
      .select(col("a").as("src"), col("b").as("dst"), lit(1.0).as("weight"))
    val g = graft.model.LinkGraph.fromEdges(spark, pairs,
      Some(docs.select(col("doc_id").as("id"))))
    graft.algo.ConnectedComponents.run(spark, g).labels
      .select(col("id").as("doc_id"), col("label").as("rep"))
  }

  /** SimHash width: the shingle hashes are 60-bit md5-derived ints, so 60 informative
    * fingerprint bits; banded as 4 chunks of 16 (chunk 3 carries 12 live bits). */
  val SimBits = 60
  val SimChunks = 4
  val SimChunkBits = 16

  /** 60-bit SimHash per doc over its shingle-hash set: bit j is set iff more shingles
    * have bit j set than clear. */
  def simhash(docs: DataFrame): DataFrame = {
    val (sh, _) = prepared(docs)
    val aggs = (0 until SimBits).map { j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L)).as(s"b$j")
    }
    sh.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"),
        (0 until SimBits).map(j => when(col(s"b$j") > 0, lit(1L << j)).otherwise(0L))
          .reduce(_ + _).as("simhash"))
  }

  /** SimHash near-dup pairs with Hamming distance <= maxHamming, candidates generated by
    * 16-bit chunk banding. Pigeonhole guarantee: any pair within Hamming distance
    * <= SimChunks-1 = 3 shares at least one identical chunk, so recall is exact for
    * maxHamming <= 3 and approximate beyond. Bucket space is ~2^16 per chunk (vs 2^8
    * before), so in-bucket candidate pairs stay sub-quadratic as the corpus grows.
    * Output (a, b, hamming). */
  def simhashNearDups(docs: DataFrame, maxHamming: Int,
                      maxBucket: Long = maxChunkFreq): DataFrame = {
    val sig = simhash(docs).persist(StorageLevel.MEMORY_AND_DISK)
    val allChunks = sig.select(col("doc_id"), col("simhash"),
      explode(array((0 until SimChunks).map(c =>
        struct(lit(c).as("chunk"),
          shiftright(col("simhash"), SimChunkBits * c)
            .bitwiseAND(lit((1L << SimChunkBits) - 1L)).as("v"))): _*)).as("cv"))
      .select(col("doc_id"), col("simhash"), col("cv.chunk").as("chunk"), col("cv.v").as("v"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Hot-bucket guard, same rationale as minhashNearDups.
    val hot = allChunks.groupBy("chunk", "v").agg(count(lit(1)).as("c"))
      .filter(col("c") > maxBucket).select("chunk", "v")
    val chunks = allChunks.join(hot, Seq("chunk", "v"), "left_anti")
    chunks.as("x").join(chunks.as("y"),
        col("x.chunk") === col("y.chunk") && col("x.v") === col("y.v") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Benchmark-contamination check for a training corpus: documents sharing >=
    * `minOverlap` word n-grams with any benchmark text (the decontamination pass
    * every LLM data pipeline runs before training — n-gram overlap against eval
    * sets, e.g. GPT-3 appendix C / PaLM's 8-gram rule). `bench` = (bench_id, text).
    *
    * Spark shape: both sides shingle to 60-bit md5 n-gram hashes (the shared
    * [[shingleHashes]] kernel — distinct per doc), the join is hash-keyed on the
    * n-gram, and the per-(doc, bench) overlap is one aggregation. Stop-gram guard:
    * n-grams hitting more than `maxGramFreq` corpus docs are dropped (boilerplate
    * headers would otherwise fan out quadratically — same rationale as
    * maxShingleFreq). Output (doc_id, bench_id, overlap). */
  /** CCNet-style span-level exact dedup (Wenzek et al. 2020 §3.1's paragraph
    * dedup, with deterministic fixed-size chunking because the synthetic corpus has
    * no newline structure): split each document into consecutive `span`-token
    * chunks, hash each chunk (md5-derived, cross-engine exact), and keep only the
    * FIRST occurrence of every chunk corpus-wide — first = min (doc_id, chunk_idx),
    * encoded as one integer key so both engines agree without struct comparisons.
    * Repeated boilerplate vanishes from every later document; the kept chunks are
    * reassembled in order.
    *
    * Scale shape: one explode (m·spans rows), one groupBy-min keyed by chunk hash
    * (uniform md5 keys — no skew guard needed: the argmin fold is a partial
    * aggregation, so a boilerplate chunk in 10^9 docs still reduces map-side), one
    * join back, one per-doc ordered reassembly. All linear, all hash-partitioned.
    *
    * Output: (doc_id, n_spans, n_kept, text_clean). */
  def spanDedup(docs: DataFrame, span: Int = 8): DataFrame = {
    val nSpansExpr = s"(size(split(text, ' ')) + ${span - 1}) div $span"
    val spans = docs.select(col("doc_id"),
      posexplode(expr(
        s"""transform(sequence(0, CAST($nSpansExpr AS INT) - 1),
           |  i -> array_join(slice(split(text, ' '), i * $span + 1, $span), ' '))"""
          .stripMargin)).as(Seq("ci", "s")))
      .withColumn("h", TextOps.mdint(col("s")))
      // fkey packs (doc_id, ci) into one int64 so keep-first is a single min();
      // valid only while ci < 2^20 (≈8.4M tokens/doc at span=8) and doc_id < 2^43.
      // Outside those bounds the packed keys would overlap silently and — because
      // the DuckDB oracle mirrors the same formula — the gate could not catch it
      // (ADVICE r3), so the engine fails loudly instead.
      .withColumn("fkey",
        when(col("ci") >= 1048576L || col("doc_id") >= (1L << 43),
          raise_error(lit("spanDedup: span index >= 2^20 or doc_id >= 2^43 " +
            "overflows the keep-first packing")).cast("long"))
        .otherwise(col("doc_id") * lit(1048576L) + col("ci")))
    val firsts = spans.groupBy("h").agg(min("fkey").as("minKey"))
    val kept = spans.join(firsts, Seq("h")).filter(col("fkey") === col("minKey"))
    val rebuilt = kept.groupBy("doc_id").agg(
      count(lit(1)).as("n_kept"),
      expr("array_join(transform(array_sort(collect_list(struct(ci, s))), x -> x.s), ' ')")
        .as("text_clean"))
    docs.select(col("doc_id"), expr(nSpansExpr).cast("long").as("n_spans"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_spans"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("text_clean"), lit("")).as("text_clean"))
  }

  def contamination(docs: DataFrame, bench: DataFrame, n: Int = 8,
                    minOverlap: Long = 1L,
                    maxGramFreq: Long = 100L): DataFrame = {
    val corpus = shingleHashes(docs, n)
    val keep = corpus.groupBy("h").agg(count(lit(1)).as("c"))
      .filter(col("c") <= maxGramFreq).select("h")
    val benchSh = shingleHashes(
      bench.select(col("bench_id").as("doc_id"), col("text")), n)
      .select(col("doc_id").as("bench_id"), col("h"))
    corpus.join(keep, "h")
      .join(benchSh, "h")
      .groupBy("doc_id", "bench_id")
      .agg(count(lit(1)).as("overlap"))
      .filter(col("overlap") >= minOverlap)
  }
}
