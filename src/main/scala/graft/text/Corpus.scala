package graft.text

import graft.DataFrameLineageOps

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.emb.Embeddings
import graft.synth.GraphSpec

/** Corpus-level curation composites — the operations a 100 TB training-data pipeline
  * runs AFTER the per-document scores exist: semantic dedup clusters, per-domain
  * quotas, stratified sampling. Built entirely from the engine's existing primitives
  * (LSH near-dup pairs, min-label components, deterministic LCG ranks), so every
  * output is exactly reproducible and oracle-checkable.
  */
object Corpus {

  /** SemDeDup-style semantic deduplication: embedding near-dup pairs (sign-LSH +
    * multiprobe, [[Embeddings.lshNearDups]]) induce a similarity graph; connected
    * clusters collapse to their min-id representative. Output one row per vector:
    * (vec_id, rep, keep) — keep = 1 iff the vector IS its cluster's representative.
    *
    * Scale shape: the pair graph is tiny relative to the corpus (near-dup edges
    * only), so the min-label fold converges in O(cluster diameter) rounds over
    * pair-sized shuffles; the corpus itself is touched once for the id universe. */
  def semanticDedup(spark: SparkSession, emb: DataFrame, tau: Double): DataFrame = {
    val pairs = Embeddings.lshNearDups(emb, tau).select(col("a"), col("b"))
    val bi = pairs.union(pairs.select(col("b").as("a"), col("a").as("b")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    bi.count()
    var lbl = emb.select(col("vec_id").as("id"), col("vec_id").as("rep")).cutLineage
    var changed = 1L
    while (changed > 0) {
      val msgs = bi.join(lbl.select(col("id").as("a"), col("rep")), "a")
        .groupBy(col("b").as("id")).agg(min("rep").as("cand"))
      val next = lbl.join(msgs, Seq("id"), "left")
        .select(col("id"),
          least(col("rep"), coalesce(col("cand"), col("rep"))).as("rep"),
          (col("cand") < col("rep")).as("ch"))
        .cutLineageLazy
      changed = next.filter(col("ch")).count()
      val prev = lbl
      lbl = next.select("id", "rep").cutLineage
      prev.releaseState(); next.releaseState()
    }
    bi.unpersist()
    lbl.select(col("id").as("vec_id"), col("rep"),
      (col("id") === col("rep")).cast("long").as("keep"))
  }

  /** Per-domain quota (the "no domain dominates the corpus" cap every web-scale
    * pipeline applies): keep the top `k` documents of each `source` by
    * (n_chars DESC, doc_id ASC). Output kept rows (doc_id, source, rnk). The window
    * partitions by domain — bounded fan-in per reducer; a pathological mega-domain
    * would be pre-capped by the same two-level top-k the hub-salting layout provides. */
  def sourceCap(docs: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    docs.select(col("doc_id"), col("source"), col("n_chars"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("source").orderBy(col("n_chars").desc, col("doc_id").asc)))
      .filter(col("rnk") <= k)
      .select(col("doc_id"), col("source"), col("rnk").cast("long").as("rnk"))
  }

  /** Stratified sampling with exact per-stratum quotas: within each `lang` stratum,
    * rank by the deterministic LCG shuffle (hash ASC, doc_id ASC) and keep
    * ceil(frac · |stratum|) rows — unbiased, reproducible, and exactly sized (a
    * bernoulli sample would only hit the quota in expectation). */
  def stratifiedSample(docs: DataFrame, frac: Double, seed: Long = 42L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = expr(GraphSpec.lcg(s"doc_id * 11 + $seed"))
    val counts = docs.groupBy("lang").agg(count(lit(1)).as("n"))
    docs.select(col("doc_id"), col("lang"), h.as("h"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("lang").orderBy(col("h").asc, col("doc_id").asc)))
      .join(counts, Seq("lang"))
      .filter(col("rnk") <= ceil(lit(frac) * col("n")))
      .select(col("doc_id"), col("lang"), col("rnk").cast("long").as("rnk"))
  }

  /** GPT-style training-sample packing (concat-then-chunk): tokens of all documents
    * are laid out consecutively in doc_id order and cut into fixed `budget`-token
    * sequences; documents may straddle sequence boundaries. Per doc:
    * its global start offset, owning sequence, in-sequence offset, and how many
    * sequences it spans — everything a loader needs to materialize sample tensors.
    *
    * Scale shape: the global token layout is [[graft.layout.Layout.prefixSum]] —
    * the engine's distributed two-job prefix sum (range-partition + per-partition
    * cumsum + broadcast partition offsets), NO single-partition window. The returned
    * frame keeps prefixSum's persisted layout; the caller owns the blocks (same
    * ownership contract as zipWithRank). */
  def packSequences(docs: DataFrame, budget: Long): DataFrame = {
    require(budget > 0)
    val withN = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val ps = graft.layout.Layout.prefixSum(withN, Seq(col("doc_id")), "n_tokens",
      "start_tok")
    ps.select(col("doc_id"), col("n_tokens"), col("start_tok"),
      expr(s"start_tok div $budget").as("seq_id"),
      expr(s"start_tok % $budget").as("seq_offset"),
      expr(s"(start_tok + n_tokens - 1) div $budget - start_tok div $budget + 1")
        .as("n_seqs"))
  }
}
