package graft.algo

import graft.DataFrameLineageOps

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.model.LinkGraph

/** ANF / effective diameter approximation with Flajolet–Martin sketches
  * (/root/reference/networkit/cpp/distance/EffectiveDiameterApproximation.cpp:13-120):
  * every node carries k bitmask registers; one bit per register is set at geometric
  * position i with P(i) = 2^-(i+1); per hop every node ORs its neighbors' previous
  * masks into its own; a node "finishes" at hop h when its estimated reachable count
  * 2^b / 0.77351 (b = average lowest-unset-bit over registers) reaches ratio*n — or
  * when its masks saturate (cannot change again); effective diameter = average finish
  * hop.
  *
  * Spark shape: the k registers are k plain LongType columns, the per-hop merge is ONE
  * `groupBy(dst).agg(bit_or(m_j)...)` — all built-in, codegen'd, one shuffle per hop
  * (the same plan as a PageRank iteration, so it scales identically). Differences from
  * the reference: 64-bit registers (vs 32) and a seeded LCG hash instead of ambient
  * RNG, so results are deterministic at any parallelism.
  *
  * EVERYTHING is integer arithmetic: the lowest-unset-bit index is
  * bit_count(((~m) & (m+1)) - 1) and the finish test compares the integer SUM of
  * indices against a precomputed integer threshold (ceil(k*log2(0.77351*ratio*n))),
  * so the per-node finish hops are bit-identical in the DuckDB twin
  * (OracleSql-side: DedupOracleSql-style exact replay, see OracleSql.anfHops).
  */
object Anf {

  val K = 8
  /** est = 2^(sumB/k)/0.77351 >= ratio*n  <=>  sumB >= k*log2(0.77351*ratio*n);
    * sumB is an exact integer, so the RHS collapses to one integer literal. */
  def thresholdBits(n: Long, ratio: Double): Long =
    math.ceil(K * math.log(0.77351 * ratio * n) / math.log(2.0) - 1e-12).toLong

  def maskBitsFor(n: Long): Int =
    math.min(62, (math.ceil(math.log(n.toDouble) / math.log(2.0)) + 7).toInt)

  /** Nonlinear 31-bit register draw (SQL string, shared with the DuckDB twin via
    * GraphSpec.idiv): the chained LCG alone is affine, so register inputs striding by
    * K share low-bit structure (every node's register-j draw has the same parity —
    * which collapses the trailing-zero geometric distribution the FM sketch needs).
    * Multiplying two independent affine draws and taking the mid bits fixes it, same
    * trick as Generators.draw. */
  private def drawSql(x: String, duck: Boolean): String = {
    import graft.synth.GraphSpec.{idiv, lcg, M}
    s"(${idiv(s"${lcg(x)} * ${lcg(s"($x) + 1000003")}", "65536", duck)}) % $M"
  }

  /** Register init masks m0..m{K-1} for node expression `id` (Spark dialect). */
  private def initMasks(idCol: String, seed: Long, maskBits: Int): Seq[Column] =
    (0 until K).map { j =>
      val h = s"(${drawSql(s"$idCol*$K + $j + ${seed}*1000003", duck = false)})"
      val p = s"bit_count((($h) & (-($h))) - 1)"
      expr(s"""CASE WHEN $h = 0 THEN 0
              |  ELSE CASE WHEN $p < $maskBits
              |    THEN shiftleft(cast(1 as bigint), int($p))
              |    ELSE 0 END END""".stripMargin).as(s"m$j")
    }

  final case class Result(effectiveDiameter: Double, perHopFinished: Seq[(Long, Long)])

  /** Per-node finish hop (id, hop): first hop at which the node's neighborhood
    * estimate passes `ratio*n` or its registers saturate; nodes still active after
    * maxHops get hop = maxHops. Deterministic integer state throughout. */
  def finishHops(spark: SparkSession, g: LinkGraph, ratio: Double = 0.9,
                 seed: Long = 42L, maxHops: Int = 64): DataFrame = {
    val n = g.n
    val maskBits = maskBitsFor(n)
    val threshBits = thresholdBits(n, ratio)
    val bi = g.bidirected.select("src", "dst").persist(StorageLevel.MEMORY_AND_DISK)
    bi.count()

    val maskCols = (0 until K).map(j => s"m$j")
    var masks = g.vertices
      .select(col("id") +: initMasks("id", seed, maskBits): _*)
      .cutLineage

    // Exact-integer estimate: sum over registers of the lowest-unset-bit index.
    def sumBits(prefix: String): Column =
      (0 until K).map(j =>
        bit_count((bitwise_not(col(s"$prefix$j")).bitwiseAND(col(s"$prefix$j") + 1L)) - 1L)
          .cast("long"))
        .reduce(_ + _)

    var finished = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      new org.apache.spark.sql.types.StructType()
        .add("id", "long").add("hop", "long"))
    var h = 1
    var activeCount = n
    while (activeCount > 0 && h <= maxHops) {
      val msgs = bi.join(masks.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id"))
        .agg(expr(s"bit_or(${maskCols.head})").as(maskCols.head),
          maskCols.tail.map(c => expr(s"bit_or($c)").as(c)): _*)
      val curr = masks.as("x").join(msgs.as("y"), Seq("id"), "left")
        .select(col("id") +: maskCols.map(c =>
          coalesce(col(s"y.$c"), lit(0L)).bitwiseOR(col(s"x.$c")).as(c)): _*)
        .cutLineage
      val unchanged = curr.as("a").join(masks.as("b"), "id")
        .filter(maskCols.map(c => col(s"a.$c") === col(s"b.$c")).reduce(_ && _))
        .select("id")
      val nowDone = curr
        .join(finished.select("id"), Seq("id"), "left_anti")
        .filter(sumBits("m") >= threshBits)
        .select(col("id"), lit(h.toLong).as("hop"))
      // Saturated-but-not-done nodes also stop (their masks can't change again).
      val saturated = unchanged
        .join(finished.select("id"), Seq("id"), "left_anti")
        .join(nowDone.select("id"), Seq("id"), "left_anti")
        .select(col("id"), lit(h.toLong).as("hop"))
      val newlyFinished = nowDone.union(saturated).cutLineage
      val cnt = newlyFinished.count()
      val prevFinished = finished
      finished = finished.union(newlyFinished).cutLineage
      prevFinished.releaseState()
      newlyFinished.releaseState()
      activeCount -= cnt
      masks.releaseState()
      masks = curr
      h += 1
    }
    bi.unpersist()
    g.vertices.join(finished, Seq("id"), "left")
      .select(col("id"), coalesce(col("hop"), lit(maxHops.toLong)).as("hop"))
  }

  /** 2^20-scaled register-estimate multipliers: Est(sumB) = 2^(sumB/K)/0.77351 is
    * computed as (1 << (sumB div K)) * EstC(sumB % K) with
    * EstC(r) = floor(2^20 * 2^(r/K) / 0.77351) — pure int64, so the per-node estimates
    * (and their sums) are bit-identical across engines. Shared with OracleSql. */
  val EstC: IndexedSeq[Long] = (0 until K).map(r =>
    math.floor(math.pow(2.0, 20.0 + r.toDouble / K) / 0.77351).toLong)

  /** Neighborhood function (/root/reference/networkit/cpp/distance/
    * NeighborhoodFunction.cpp + NeighborhoodFunctionApproximation.h (the ANF
    * approximation class) — same FM machinery as
    * [[finishHops]]): for each hop h, the estimated total number of (node, reachable
    * node) pairs within distance <= h, summed over all nodes. Per-node estimates use
    * the integer-scaled table [[EstC]] (documented divergence from the reference's
    * float 2^(b/k)/0.77351 — a <2^-20 relative quantization), so the whole output is
    * exact int64 + one final double division. Output (hop, nf_scaled, nf). */
  def neighborhoodFunction(spark: SparkSession, g: LinkGraph, maxHops: Int,
                           seed: Long = 42L): DataFrame = {
    val n = g.n
    val maskBits = maskBitsFor(n)
    val bi = g.bidirected.select("src", "dst").persist(StorageLevel.MEMORY_AND_DISK)
    bi.count()
    val maskCols = (0 until K).map(j => s"m$j")
    var masks = g.vertices
      .select(col("id") +: initMasks("id", seed, maskBits): _*)
      .cutLineage
    val sumB: Column = (0 until K).map(j =>
      bit_count((bitwise_not(col(s"m$j")).bitwiseAND(col(s"m$j") + 1L)) - 1L)
        .cast("long")).reduce(_ + _)
    val estCase = EstC.zipWithIndex.map { case (c, r) =>
      s"WHEN $r THEN shiftleft(cast(1 as bigint), int(b div $K)) * ${c}L"
    }.mkString("CASE b % $K ".replace("$K", K.toString), " ", " END")
    var rows = Seq.empty[(Long, Long)]
    var h = 1
    while (h <= maxHops) {
      val msgs = bi.join(masks.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id"))
        .agg(expr(s"bit_or(${maskCols.head})").as(maskCols.head),
          maskCols.tail.map(c => expr(s"bit_or($c)").as(c)): _*)
      val curr = masks.as("x").join(msgs.as("y"), Seq("id"), "left")
        .select(col("id") +: maskCols.map(c =>
          coalesce(col(s"y.$c"), lit(0L)).bitwiseOR(col(s"x.$c")).as(c)): _*)
        .cutLineage
      val nf = curr.select(sumB.as("b")).select(expr(estCase).as("est"))
        .agg(sum("est")).head().getLong(0)
      rows :+= (h.toLong, nf)
      masks.releaseState()
      masks = curr
      h += 1
    }
    bi.unpersist()
    import spark.implicits._
    rows.toDF("hop", "nf_scaled")
      .select(col("hop"), col("nf_scaled"),
        (col("nf_scaled").cast("double") / (1L << 20).toDouble).as("nf"))
  }

  /** Hop plot (/root/reference/networkit/cpp/distance/HopPlotApproximation.h:20-35,
    * after Palmer/Gibbons/Faloutsos' ANF): pairs (d, g(d)) where g(d) is the fraction
    * of connected node pairs whose shortest path is <= d, approximated as
    * nf(d)/nf(maxHops) over the same exact-integer FM sketches as
    * [[neighborhoodFunction]] (maxHops must exceed the effective diameter so the
    * denominator is the connected-pair total). Output (hop, nf_scaled, fraction). */
  def hopPlot(spark: SparkSession, g: LinkGraph, maxHops: Int,
              seed: Long = 42L): DataFrame = {
    val nf = neighborhoodFunction(spark, g, maxHops, seed).select("hop", "nf_scaled")
    val den = nf.filter(col("hop") === maxHops.toLong)
      .select(col("nf_scaled").as("den"))
    nf.crossJoin(den)
      .select(col("hop"), col("nf_scaled"),
        (col("nf_scaled").cast("double") / col("den").cast("double")).as("fraction"))
  }

  /** Effective diameter at `ratio` (default .9, the reference default). */
  def effectiveDiameter(spark: SparkSession, g: LinkGraph, ratio: Double = 0.9,
                        seed: Long = 42L, maxHops: Int = 64): Result = {
    val hops = finishHops(spark, g, ratio, seed, maxHops)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val sumHops = hops.agg(sum("hop")).head().getLong(0)
    val perHop = hops.groupBy("hop").count().orderBy("hop")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val out = Result(sumHops.toDouble / g.n, perHop)
    hops.unpersist()
    out
  }
}
