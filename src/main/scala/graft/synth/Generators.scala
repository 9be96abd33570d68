package graft.synth

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.DataFrameLineageOps
import graft.model.LinkGraph

/** Deterministic distributed graph generators (the StaticGraphGenerator.h surface;
  * hyperbolic uses the geometric/HyperbolicSpace.h native-coordinate formulas and the
  * planar ones geometric/Point2D.h-style integer points) — every edge is a pure function of
  * (seed, index), generated via `spark.range(m)` + column arithmetic: reproducible at
  * any parallelism, no RNG state, no shuffle until the final layout.
  *
  *   - RMAT (/root/reference/networkit/cpp/generators/RmatGenerator.cpp:15-90):
  *     recursive quadrant descent with probabilities (a,b,c,d)=(.57,.19,.19,.05) —
  *     the web-graph-shaped generator (power-law, hubs) used for scale benches.
  *   - Erdős–Rényi G(n,m) (generators/ErdosRenyiGenerator.cpp): m uniform pairs.
  */
object Generators {

  import GraphSpec.{lcg => lcgSql}

  /** Nonlinear 31-bit draw. The chained LCG alone is AFFINE in x (lcg(x) = A²x+c mod M),
    * so constant input strides (edge index, level) would produce tiny output cycles;
    * multiplying two independent affine draws makes the result quadratic in x —
    * breaking the stride structure while staying pure 64-bit-safe integer arithmetic.
    * Dialect-aware (`duck`) so the DuckDB oracle replays the identical formula. */
  def drawSql(x: String, duck: Boolean): String =
    s"(((${lcgSql(x)} * ${lcgSql(s"($x) + 1000003")}) ${if (duck) "//" else "div"} 65536) % ${GraphSpec.M})"

  private def draw(x: String): String = drawSql(x, duck = false)

  /** RMAT edge list: 2^scale nodes, edgeFactor * 2^scale edges. Quadrant descent per
    * bit level; draws come from the shared LCG on (seed, edge index, level). */
  def rmat(spark: SparkSession, scale: Int, edgeFactor: Int, seed: Long = 42L): LinkGraph = {
    require(scale >= 1 && scale <= 40)
    val n = 1L << scale
    val m = edgeFactor.toLong * n
    // Per level: r in [0,100); quadrants a=57 b=19 c=19 d=5 cumulative 57/76/95/100.
    // src bit set for quadrants c,d (r>=76); dst bit set for b,d (57<=r<76 or r>=95).
    val levels = (0 until scale).map { l =>
      val r = s"((${draw(s"id*64 + $l + $seed*999983")} div 1024) % 100)"
      (s"(CASE WHEN $r >= 76 THEN ${1L << l} ELSE 0 END)",
        s"(CASE WHEN ($r >= 57 AND $r < 76) OR $r >= 95 THEN ${1L << l} ELSE 0 END)")
    }
    val srcExpr = levels.map(_._1).mkString(" + ")
    val dstExpr = levels.map(_._2).mkString(" + ")
    val edges = spark.range(m)
      .select(expr(srcExpr).as("src"), expr(dstExpr).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .withColumn("weight", lit(1.0))
    LinkGraph.fromEdges(spark, edges, Some(spark.range(n).select(col("id"))))
  }

  /** Watts–Strogatz small-world graph
    * (/root/reference/networkit/cpp/generators/WattsStrogatzGenerator.cpp:15-90 +
    * RegularRingLatticeGenerator.cpp): ring lattice where node i links its k/2
    * successors, then each lattice edge is rewired with probability beta to a uniform
    * random target. Fully index-parallel: one `spark.range(n·k/2)` with per-edge LCG
    * draws — no sequential rewire loop. Divergence from the reference (documented):
    * rewires that land on a self-loop or a duplicate are DROPPED rather than redrawn
    * (the reference retries; a deterministic distributed retry would need a driver
    * loop), so m can be slightly below n·k/2. */
  def wattsStrogatz(spark: SparkSession, n: Long, k: Int, beta: Double,
                    seed: Long = 42L): LinkGraph = {
    require(k >= 2 && k % 2 == 0, "k must be even and >= 2")
    val half = k / 2
    val betaM = math.round(beta * GraphSpec.M.toDouble)
    // Edge index e = i*half + (j-1): lattice edge (i, (i+j) mod n), j = 1..half.
    val iExpr = s"(id div $half)"
    val jExpr = s"(id % $half + 1)"
    val rewireDraw = s"${draw(s"id*2 + $seed*60013")}"
    val targetDraw = s"((${draw(s"id*2 + 1 + $seed*60013")} div 128) % $n)"
    val edges = spark.range(n.toLong * half)
      .select(expr(iExpr).as("src"),
        expr(s"CASE WHEN $rewireDraw < $betaM THEN $targetDraw" +
          s" ELSE ($iExpr + $jExpr) % $n END").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .withColumn("weight", lit(1.0))
    LinkGraph.fromEdges(spark, edges, Some(spark.range(n).select(col("id"))))
  }

  /** G(n, m): m distinct uniform edges (self-loops and duplicates dropped). */
  def erdosRenyi(spark: SparkSession, n: Long, m: Long, seed: Long = 42L): LinkGraph = {
    val edges = spark.range(m)
      .select((expr(s"(${draw(s"id*2 + $seed*7")} div 128)") % n).as("src"),
        (expr(s"(${draw(s"id*2 + 1 + $seed*7")} div 128)") % n).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .withColumn("weight", lit(1.0))
    LinkGraph.fromEdges(spark, edges, Some(spark.range(n).select(col("id"))))
  }

  /** Barabási–Albert preferential attachment
    * (/root/reference/networkit/cpp/generators/BarabasiAlbertGenerator.cpp:1-158,
    * Batagelj–Brandes formulation): the classic sequential "pick an endpoint of a
    * uniform earlier edge slot" recurrence, re-expressed as POINTER-JUMPING joins —
    * every edge i draws a uniform slot; even slots resolve to a closed-form node id,
    * odd slots chase the referenced edge's own draw. Chains shrink geometrically
    * (every hop lands on a strictly earlier edge), so a handful of join rounds
    * resolves the whole batch — no sequential driver loop over nodes.
    * Self-loops filtered, multi-edges deduped (documented deviation: the reference
    * keeps the raw multigraph; degree distribution is unaffected asymptotically). */
  def barabasiAlbert(spark: SparkSession, k: Int, n: Long, seed: Long = 42L): LinkGraph = {
    require(k >= 1 && n > k)
    val init = k.toLong // initial isolated nodes 0..k-1
    val m = k * (n - init)
    // Edge i: src = init + i/k; draw a uniform slot in [0, init + 2i):
    //   slot < init             -> initial node `slot`
    //   s = slot-init, s even   -> src node of edge s/2  (init + (s/2)/k)
    //   s odd                   -> the endpoint edge (s-1)/2 drew  (chase)
    val e0 = spark.range(m).select(
        col("id").as("i"),
        (lit(init) + expr(s"id div $k")).as("src"),
        (expr(draw(s"id*31 + $seed*1299709")) % (lit(init) + col("id") * 2L)).as("ptr"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    e0.count()
    var unresolved = e0
    var resolved: DataFrame = e0.filter(lit(false))
      .select(col("i"), col("src"), col("ptr").as("dst"))
    var left = 1L
    while (left > 0) {
      val marked = unresolved.withColumn("dst",
        when(col("ptr") < init, col("ptr"))
          .when(pmod(col("ptr") - init, lit(2L)) === 0L,
            lit(init) + expr(s"((ptr - $init) div 2) div $k")))
      resolved = resolved.union(
        marked.filter(col("dst").isNotNull).select("i", "src", "dst"))
      unresolved = marked.filter(col("dst").isNull)
        .select(col("i"), col("src"),
          expr(s"(ptr - $init - 1) div 2").as("j"))
        .join(e0.select(col("i").as("j"), col("ptr").as("nptr")), "j")
        .select(col("i"), col("src"), col("nptr").as("ptr"))
      left = unresolved.count()
    }
    val edges = resolved
      .filter(col("src") =!= col("dst"))
      .select("src", "dst").distinct()
      .withColumn("weight", lit(1.0))
    val out = LinkGraph.fromEdges(spark, edges, Some(spark.range(n).select(col("id"))))
    e0.unpersist()
    out
  }

  /** Random hyperbolic graph (threshold model,
    * /root/reference/networkit/cpp/generators/HyperbolicGenerator.cpp:1-267 — the
    * reference's published-benchmark graph family): n points on the hyperbolic disk of
    * radius R, angle uniform, radius with density ~ sinh(alpha r) (inverse-CDF of the
    * shared LCG draws); edge iff hyperbolic distance <= R.
    *
    * Distributed shape (no O(n^2) pair scan):
    *   - CORE points (r < 0.75R, ~sqrt(n) of them) connect far — broadcast against all;
    *   - PERIPHERY pairs can only connect within angular reach
    *     dTheta(0.75R, 0.75R) (maximal at the minimum radii — verified numerically),
    *     so they meet via angle buckets of width >= that reach, joining each bucket
    *     with its successor (the same probe pattern as the LSH multiprobe join).
    * The exact distance predicate applies to every candidate pair, so bucketing only
    * prunes, never changes results (brute-force-equality tested). */
  /** The hyperbolic generator's deterministic point set (id, theta, r) — public so
    * tests can brute-force the same points. */
  def hyperbolicPoints(spark: SparkSession, n: Long, R: Double, alpha: Double = 1.0,
                       seed: Long = 42L): DataFrame = {
    val M = GraphSpec.M.toDouble
    // theta uniform [0, 2pi); u uniform (0,1]; r = acosh(1 + u*(cosh(alpha R)-1))/alpha
    val thetaSql = s"CAST(${draw(s"id*2 + $seed*15485863")} AS DOUBLE) / $M * ${2.0 * math.Pi}"
    val uSql = s"(CAST(${draw(s"id*2 + 1 + $seed*15485863")} AS DOUBLE) + 1.0) / $M"
    val rSql = s"acosh(1.0 + ($uSql) * ${math.cosh(alpha * R) - 1.0}) / $alpha"
    spark.range(n).select(col("id"), expr(thetaSql).as("theta"), expr(rSql).as("r"))
  }

  /** The exact hyperbolic-distance threshold predicate (shared with tests). */
  def hyperbolicConnects(R: Double)(ra: Column, rb: Column, ta: Column, tb: Column): Column =
    cosh(ra) * cosh(rb) - sinh(ra) * sinh(rb) * cos(ta - tb) <= math.cosh(R)

  def hyperbolic(spark: SparkSession, n: Long, R: Double, alpha: Double = 1.0,
                 seed: Long = 42L): LinkGraph =
    hyperbolicFromPoints(spark, hyperbolicPoints(spark, n, R, alpha, seed), n, R)

  /** Threshold graph of an explicit point table (id, theta, r) — the static
    * generator's spatial-join core, shared with the movement-driven dynamic twin. */
  def hyperbolicFromPoints(spark: SparkSession, points: DataFrame, n: Long,
                           R: Double): LinkGraph = {
    val pts = points
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    pts.count()
    val connects = hyperbolicConnects(R) _
    val r0 = 0.75 * R
    val core = pts.filter(col("r") < r0)
      .select(col("id").as("cid"), col("theta").as("ct"), col("r").as("cr"))
    val corePairs = pts.join(broadcast(core), col("id") =!= col("cid"))
      .filter(connects(col("r"), col("cr"), col("theta"), col("ct")))
      .select(least(col("id"), col("cid")).as("src"),
        greatest(col("id"), col("cid")).as("dst"))
    val reach = math.acos(math.max(-1.0, math.min(1.0,
      (math.cosh(r0) * math.cosh(r0) - math.cosh(R)) / (math.sinh(r0) * math.sinh(r0)))))
    val buckets = math.max(1L, math.floor(2.0 * math.Pi / math.max(reach, 1e-9)).toLong)
    val periph = pts.filter(col("r") >= r0)
      .withColumn("b", floor(col("theta") / (2.0 * math.Pi / buckets)).cast("long"))
    val probes = periph.select(col("id"), col("theta"), col("r"), col("b"),
      explode(array(col("b"), pmod(col("b") + 1L, lit(buckets)))).as("pb"))
    // Same-bucket pairs meet via x's own-bucket probe (id-ordered so each appears
    // once); cross-bucket pairs meet exactly once via the +1 probe — in the probe
    // direction, whichever id order, so the pair (i, i-1) is not lost to id ordering.
    val periphPairs = probes.as("x")
      .join(periph.as("y"), col("x.pb") === col("y.b") &&
        (col("x.b") =!= col("y.b") || col("x.id") < col("y.id")))
      .filter(connects(col("x.r"), col("y.r"), col("x.theta"), col("y.theta")))
      .select(least(col("x.id"), col("y.id")).as("src"),
        greatest(col("x.id"), col("y.id")).as("dst"))
    val edges = corePairs.union(periphPairs).distinct().withColumn("weight", lit(1.0))
    val out = LinkGraph.fromEdges(spark, edges, Some(spark.range(n).select(col("id"))))
    pts.unpersist()
    out
  }

  /** Power-law weight sequence (generators/PowerlawDegreeSequence.cpp:7-100, the
    * input the reference feeds ChungLu): w_i = maxDeg·(i+1)^(−1/(γ−1)) clamped to
    * [minDeg, maxDeg] — node 0 is the biggest expected hub. Pure column expression,
    * one `spark.range(n)`. */
  def powerlawDegreeSequence(spark: SparkSession, n: Long, minDeg: Long, maxDeg: Long,
                             gamma: Double): DataFrame =
    spark.range(n).select(col("id"),
      greatest(lit(minDeg), least(lit(maxDeg),
        round(lit(maxDeg.toDouble) *
          pow((col("id") + 1L).cast("double"), lit(-1.0 / (gamma - 1.0)))).cast("long")))
        .as("w"))

  /** Chung–Lu expected-degree random graph
    * (generators/ChungLuGenerator.cpp:24-58). The reference walks each node's
    * candidate neighbors with geometric skips — an inherently sequential per-node
    * loop. This engine uses the published "fast Chung–Lu" formulation instead: draw
    * W/2 edges whose BOTH endpoints are sampled with probability w_i / W — same
    * expected degrees, fully index-parallel. Endpoint sampling is inverse-CDF over
    * the weight prefix sums ([[graft.layout.Layout.prefixSum]] — no global window,
    * no driver-side CDF), realized as a BUCKETED interval join: node i's interval
    * [cum_i, cum_i + w_i) is exploded onto ~w_i/S bucket keys and each 62-bit draw
    * equi-joins its bucket — expected O(1) intervals per bucket, so a hub's interval
    * costs w_hub/S rows instead of a skewed range-join fan-in. Self-loops and
    * duplicate pairs are dropped (documented thinning vs the reference's
    * per-pair-Bernoulli model; expected-degree semantics are preserved). */
  def chungLu(spark: SparkSession, degSeq: DataFrame, seed: Long = 42L): LinkGraph = {
    import graft.layout.Layout
    val cum = Layout.prefixSum(degSeq.select(col("id"), col("w")),
      Seq(col("id")), "w", "cum")
    val agg = cum.agg(sum("w").as("tw"), count(lit(1)).as("n")).head()
    val totalW = agg.getLong(0)
    val n = agg.getLong(1)
    require(totalW > 0, "degree sequence sums to 0")
    val mTarget = math.max(1L, totalW / 2L)
    val buckets = math.max(32L, math.min(n, totalW))
    val bucketSize = math.max(1L, totalW / buckets)
    val intervals = cum.filter(col("w") > 0L)
      .select(col("id"), col("cum"), col("w"),
        explode(expr(s"sequence(cum div $bucketSize, (cum + w - 1) div $bucketSize)"))
          .as("b"))
    // 62-bit uniform draw in [0, W): two independent 31-bit product draws combined.
    val u = expr(s"(${draw(s"id*2 + $seed*60013")} * ${GraphSpec.M} + " +
      s"${draw(s"id*2 + 1 + $seed*60013")}) % $totalW")
    val endpoints = spark.range(2L * mTarget)
      .select(expr("id div 2").as("pair"), (col("id") % 2).as("side"), u.as("u"))
      .withColumn("b", expr(s"u div $bucketSize"))
      .join(intervals, "b")
      .filter(col("u") >= col("cum") && col("u") < col("cum") + col("w"))
      .select(col("pair"), col("side"), col("id"))
    val edges = endpoints.filter(col("side") === 0).select(col("pair"), col("id").as("src"))
      .join(endpoints.filter(col("side") === 1).select(col("pair"), col("id").as("dst")), "pair")
      .filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("src"),
        greatest(col("src"), col("dst")).as("dst"))
      .distinct()
      .withColumn("weight", lit(1.0))
    val nIds = degSeq.select(col("id"))
    val out = LinkGraph.fromEdges(spark, edges, Some(nIds))
    cum.unpersist()
    out
  }

  /** StochasticBlockmodel (generators/StochasticBlockmodel.cpp:24-40): undirected
    * Bernoulli(affinity(block u, block v)) per node pair. The reference loops all n²
    * pairs — infeasible at scale — so each BLOCK PAIR is index-sampled like
    * [[erdosRenyi]]: draw round(p·|pairs|) uniform pairs from the a×b index space and
    * map indices to members (documented deviation: expected-count sampling instead of
    * per-pair Bernoulli — same expectation, Poisson-ish count variance).
    *
    * `membership`: (id, block). `affinity(a)(b)` symmetric. Returns the graph; the
    * planted partition is the membership input itself. */
  def stochasticBlockmodel(spark: SparkSession, membership: DataFrame,
                           affinity: Seq[Seq[Double]], seed: Long = 42L): LinkGraph = {
    import graft.layout.Layout
    val nBlocks = affinity.size
    // Contiguous per-block member index: global rank by (block, id) minus block offset.
    val ranked = Layout.zipWithRankBy(membership.select(col("id"), col("block")),
      Seq(col("block").asc, col("id").asc), "grk")
    val sizes = ranked.groupBy("block").agg(count(lit(1)).as("sz"), min("grk").as("off"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val members = ranked
      .join(ranked.groupBy("block").agg(min("grk").as("off")), "block")
      .select(col("block"), (col("grk") - col("off")).as("idx"), col("id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    members.count()
    // One draw batch per block pair (a <= b), concatenated into a single range.
    val pairSpecs = for {
      a <- 0 until nBlocks; b <- a until nBlocks
      (sa, _) = sizes.getOrElse(a.toLong, (0L, 0L))
      (sb, _) = sizes.getOrElse(b.toLong, (0L, 0L))
      pairs = if (a == b) sa * (sa - 1) / 2 else sa * sb
      m = math.round(affinity(a)(b) * pairs) if m > 0
    } yield (a.toLong, b.toLong, sa, sb, m)
    val drawn = pairSpecs.zipWithIndex.map { case ((a, b, sa, sb, m), pi) =>
      val base = seed * 7919L + pi * 15485863L
      spark.range(m).select(
        lit(a).as("ba"), lit(b).as("bb"),
        (expr(s"(${draw(s"id*2 + $base")} div 64)") % sa).as("ia"),
        (expr(s"(${draw(s"id*2 + 1 + $base")} div 64)") % sb).as("ib"))
    }.reduceOption(_ union _)
    val edges = drawn match {
      case None => membership.select(col("id").as("src"), col("id").as("dst"),
        lit(1.0).as("weight")).filter(lit(false))
      case Some(d) =>
        d.join(members.select(col("block").as("ba"), col("idx").as("ia"),
            col("id").as("src")), Seq("ba", "ia"))
          .join(members.select(col("block").as("bb"), col("idx").as("ib"),
            col("id").as("dst")), Seq("bb", "ib"))
          .filter(col("src") =!= col("dst"))
          .select(least(col("src"), col("dst")).as("src"),
            greatest(col("src"), col("dst")).as("dst"))
          .distinct()
          .withColumn("weight", lit(1.0))
    }
    val out = LinkGraph.fromEdges(spark, edges, Some(membership.select("id")))
    members.unpersist(); ranked.unpersist()
    out
  }

  /** LFR-style community benchmark (generators/LFRGenerator.cpp:1-558): power-law
    * node degrees, power-law community sizes, mixing parameter mu = fraction of each
    * node's degree leaving its community. The reference realizes exact degree
    * sequences with sequential edge-switching Markov chains; this engine composes its
    * deterministic Chung-Lu machinery instead — intra-community expected-degree
    * sampling on (1-mu)·deg per community (ONE batched pipeline keyed by community,
    * no per-community loop) plus one global pass on mu·deg — same expected degrees
    * and mixing, fully index-parallel (the standard scalable LFR approximation; the
    * planted recovery tests in PlmSpec consume it). Degrees are assigned through an
    * affine index permutation so hubs spread across communities.
    *
    * Returns (graph, planted (id, block) partition). */
  def lfrLike(spark: SparkSession, n: Long, minDeg: Long, maxDeg: Long,
              gamma: Double, mu: Double, minCommunity: Long, maxCommunity: Long,
              communityExp: Double = 2.0, seed: Long = 42L): (LinkGraph, DataFrame) = {
    import graft.layout.Layout
    require(mu >= 0.0 && mu <= 1.0)
    // Community sizes: power-law-spaced, accumulated to cover n (last one absorbs the
    // remainder like the reference's gap-fill, LFRGenerator.cpp:47-60).
    val maxComms = math.max(4L, 4L * n / math.max(1L, minCommunity))
    val sizesRaw = powerlawDegreeSequence(spark, maxComms, minCommunity, maxCommunity,
      communityExp).withColumnRenamed("id", "c")
    val ps = Layout.prefixSum(sizesRaw, Seq(col("c")), "w", "cum")
    val cumSizes = ps
      .filter(col("cum") < n)
      .select(col("c").as("block"), col("cum"),
        least(col("w"), lit(n) - col("cum")).as("sz"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    cumSizes.count()
    ps.unpersist()
    // Membership: contiguous id blocks [cum, cum+sz) — bucketed interval join.
    val bSize = math.max(1L, minCommunity)
    val ivals = cumSizes.select(col("block"), col("cum"), col("sz"),
      explode(expr(s"sequence(cum div $bSize, (cum + sz - 1) div $bSize)")).as("bk"))
    val membership = spark.range(n)
      .withColumn("bk", expr(s"id div $bSize")).join(ivals, "bk")
      .filter(col("id") >= col("cum") && col("id") < col("cum") + col("sz"))
      .select(col("id"), col("block"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    membership.count()
    // Degrees via an affine permutation of the power-law sequence (spread hubs).
    val aPerm = Iterator.iterate(1000003L)(_ + 2L).find(a => gcd(a, n) == 1L).get
    val w = powerlawDegreeSequence(spark, n, minDeg, maxDeg, gamma)
      .select(col("id"), col("w"))
    val deg = spark.range(n).select(col("id"), pmod(col("id") * aPerm, lit(n)).as("pid"))
      .join(w.withColumnRenamed("id", "pid"), "pid").select(col("id"), col("w"))
    val wInt = deg.select(col("id"),
      floor(col("w") * (1.0 - mu)).cast("long").as("w")).filter(col("w") > 0L)
    val wExt = deg.select(col("id"),
      ceil(col("w") * mu).cast("long").as("w")).filter(col("w") > 0L)
    // Intra-community Chung-Lu, batched by community.
    val intra = chungLuGrouped(spark, wInt.join(membership, "id"), seed * 31L + 7L)
    val inter = chungLu(spark, wExt, seed * 31L + 11L).edges
      .select("src", "dst", "weight")
    // Lineage cut: the generator pipeline above is ~10 plan levels deep (prefix sums,
    // interval joins, two Chung-Lu passes); without truncation every downstream
    // driver-loop round (PLM/PLP on the planted graph) re-renders the whole generator
    // plan per job and the driver spends its time in plan stringification, not work.
    val edges = intra.select("src", "dst")
      .union(inter.select("src", "dst"))
      .distinct().withColumn("weight", lit(1.0))
      .cutLineage
    val g = LinkGraph.fromEdges(spark, edges, Some(spark.range(n).select(col("id"))))
    cumSizes.unpersist()
    (g, membership)
  }

  /** EXACT-LFR twin (generators/LFRGenerator.cpp:30-260): the reference realizes an
    * exact powerlaw degree sequence with a per-node μ-split — internal degree
    * llround((1−μ)·deg) (setMu(vector), :95-105) — then builds DEGREE-EXACT
    * intra-community graphs and one inter-community graph with edge-switching Markov
    * chains, rewiring stray intra edges out of the inter graph. Sequential Markov
    * chains don't distribute; this twin keeps the degree-exact contract with
    * deterministic distributed STUB MATCHING (configuration model):
    *   - degrees: τ₁ = 3 rank powerlaw deg(i) = clamp(round(maxDeg/√(π(i)+1))) through
    *     the hub-spreading affine permutation π — √ is correctly rounded IEEE, so the
    *     DuckDB twin replays it bit-exact (a library pow() would not be);
    *   - community sizes: τ₂ = 2 rank powerlaw clamp(round(maxC/(j+1))) accumulated to
    *     n with the reference's gap-fill (LFRGenerator.cpp:47-60), membership =
    *     contiguous blocks;
    *   - μ as the exact rational muNum/muDen: intdeg = llround((1−μ)·deg) in pure
    *     integer arithmetic, floored at 1 (reference :98) and capped at deg and
    *     community size − 1 (the reference re-draws assignments that violate the cap;
    *     the twin clamps — same feasibility contract, deterministic);
    *   - intra edges per community: each node explodes into intdeg stubs, stubs
    *     ranked by an LCG key WITHIN the community (bounded-size window), consecutive
    *     ranks pair — degree-exact up to the dropped self/duplicate pairs, the same
    *     slack the reference accepts by disabling the realizability check
    *     (LFRGenerator.cpp:158-161);
    *   - inter edges: extdeg = deg − intdeg stubs ranked GLOBALLY (Layout.zipWithRankBy
    *     — no global window), paired, same-community pairs dropped and their stubs
    *     re-ranked once with a fresh key (the distributed analog of the reference's
    *     rewiring loop, :170-230), then dropped for good.
    * Everything is draws + ranks + integer arithmetic: `q_gen_lfr` replays the node
    * table (id, deg, intdeg, block) bit-exact in DuckDB; the edge-side contracts
    * (degree exactness within slack, μ-mixing, planted NMI recovery) are spec-gated.
    * Returns (graph, planted (id, block)). */
  def lfrExact(spark: SparkSession, n: Long, minDeg: Long, maxDeg: Long,
               minCommunity: Long, maxCommunity: Long, muNum: Long, muDen: Long,
               seed: Long = 42L): (LinkGraph, DataFrame) = {
    val nodes = lfrExactNodes(spark, n, minDeg, maxDeg, minCommunity, maxCommunity,
      muNum, muDen)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    nodes.count()
    // Intra-community stub matching: rank within block (bounded by maxCommunity).
    val stubsI = nodes.select(col("id"), col("block"),
        explode(expr("sequence(0, intdeg - 1)")).as("k"))
      .withColumn("key", expr(draw(s"id * 1000003 + k * 7919 + $seed * 13")))
    val wI = org.apache.spark.sql.expressions.Window
      .partitionBy("block").orderBy(col("key"), col("id"), col("k"))
    val intra = stubsI
      .withColumn("t", ((row_number().over(wI) - 1L) / 2L).cast("long"))
      .groupBy("block", "t")
      .agg(min("id").as("a"), max("id").as("b"), count(lit(1)).as("c"))
      .filter(col("c") === 2L && col("a") =!= col("b"))
      .select(col("a").as("src"), col("b").as("dst"))
    // Inter-community stub matching, one rewire-style retry for dropped pairs.
    val stubsE = nodes.filter(col("deg") > col("intdeg"))
      .select(col("id"), col("block"),
        explode(expr("sequence(0, deg - intdeg - 1)")).as("k"))
    def pairGlobal(stubs: org.apache.spark.sql.DataFrame, s2: Long)
        : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
      val keyed = stubs.withColumn("key", expr(draw(s"id * 1000003 + k * 7919 + $s2")))
      val ranked = graft.layout.Layout.zipWithRankBy(keyed,
        Seq(col("key").asc, col("id").asc, col("k").asc), "rn")
      val paired = ranked.withColumn("t", expr("rn div 2"))
        .groupBy("t")
        .agg(min(struct(col("id"), col("block"), col("k"))).as("x"),
          max(struct(col("id"), col("block"), col("k"))).as("y"),
          count(lit(1)).as("c"))
        .filter(col("c") === 2L)
      val good = paired
        .filter(col("x.id") =!= col("y.id") && col("x.block") =!= col("y.block"))
        .select(col("x.id").as("src"), col("y.id").as("dst"))
      val leftover = paired
        .filter(col("x.id") === col("y.id") || col("x.block") === col("y.block"))
        .select(explode(array(col("x"), col("y"))).as("s"))
        .select(col("s.id").as("id"), col("s.block").as("block"), col("s.k").as("k"))
      val out = (good.cutLineage, leftover.cutLineage)
      ranked.unpersist()
      out
    }
    val (inter1, left1) = pairGlobal(stubsE, seed * 17 + 1)
    val (inter2, _) = pairGlobal(left1, seed * 17 + 2)
    val edges = intra.union(inter1).union(inter2)
      .select(least(col("src"), col("dst")).as("src"),
        greatest(col("src"), col("dst")).as("dst"))
      .distinct().withColumn("weight", lit(1.0))
      .cutLineage
    val g = LinkGraph.fromEdges(spark, edges, Some(spark.range(n).select(col("id"))))
    val membership = nodes.select(col("id"), col("block"))
    (g, membership)
  }

  /** The deterministic LFR node table (id, deg, intdeg, block) — the oracle-checked
    * half of [[lfrExact]] (see there for the arithmetic contract). */
  def lfrExactNodes(spark: SparkSession, n: Long, minDeg: Long, maxDeg: Long,
                    minCommunity: Long, maxCommunity: Long,
                    muNum: Long, muDen: Long): DataFrame = {
    import graft.layout.Layout
    require(muNum >= 0 && muNum < muDen && minDeg >= 1 && minCommunity >= 2)
    val aPerm = Iterator.iterate(1000003L)(_ + 2L).find(a => gcd(a, n) == 1L).get
    val deg = spark.range(n).select(col("id"),
      greatest(lit(minDeg), least(lit(maxDeg),
        round(lit(maxDeg.toDouble) /
          sqrt((pmod(col("id") * aPerm, lit(n)) + 1L).cast("double"))).cast("long")))
        .as("deg"))
    val maxComms = math.max(4L, 4L * n / math.max(1L, minCommunity))
    val sizesRaw = spark.range(maxComms).select(col("id").as("c"),
      greatest(lit(minCommunity), least(lit(maxCommunity),
        round(lit(maxCommunity.toDouble) / (col("c") + 1L).cast("double")).cast("long")))
        .as("w"))
    val ps = Layout.prefixSum(sizesRaw, Seq(col("c")), "w", "cum")
    val cumSizes = ps.filter(col("cum") < n)
      .select(col("c").as("block"), col("cum"),
        least(col("w"), lit(n) - col("cum")).as("sz"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    cumSizes.count()
    ps.unpersist()
    val bSize = math.max(1L, minCommunity)
    val ivals = cumSizes.select(col("block"), col("cum"), col("sz"),
      explode(expr(s"sequence(cum div $bSize, (cum + sz - 1) div $bSize)")).as("bk"))
    val membership = spark.range(n)
      .withColumn("bk", expr(s"id div $bSize")).join(ivals, "bk")
      .filter(col("id") >= col("cum") && col("id") < col("cum") + col("sz"))
      .select(col("id"), col("block"), col("sz"))
    val out = deg.join(membership, "id")
      .select(col("id"), col("deg"),
        least(col("deg"), col("sz") - 1L,
          greatest(lit(1L),
            expr(s"(2 * ${muDen - muNum} * deg + $muDen) div ${2 * muDen}")))
          .as("intdeg"),
        col("block"))
      .cutLineage // eager: safe to release the size table below
    cumSizes.unpersist()
    out
  }

  /** Uniform-LCG degree sequence for the Havel–Hakimi gate:
    * d(i) = minDeg + draw(i + seed·31) % (maxDeg − minDeg + 1), with d(0) bumped by
    * one when the total is odd (a graphical sequence needs an even sum). Pure
    * (seed, id) arithmetic plus one parity aggregate — the oracle replays both.
    * Output (id, deg). */
  def lcgDegreeSequence(spark: SparkSession, n: Long, minDeg: Long, maxDeg: Long,
                        seed: Long = 42L): DataFrame = {
    val span = maxDeg - minDeg + 1
    val base = spark.range(n).select(col("id"),
      (lit(minDeg) + expr(draw(s"id + $seed * 31")) % span).as("deg"))
    val odd = base.agg(sum("deg")).head().getLong(0) % 2 == 1L
    if (odd) base.select(col("id"),
      when(col("id") === 0L, col("deg") + 1L).otherwise(col("deg")).as("deg"))
    else base
  }

  /** Erdős–Gallai realizability profile of a degree sequence (the distributed check
    * behind HavelHakimiGenerator / StaticDegreeSequenceGenerator.isRealizable,
    * generators/StaticDegreeSequenceGenerator.cpp): with degrees sorted descending,
    * for every k:  Σ_{i≤k} d_i  ≤  k(k−1) + Σ_{i>k} min(d_i, k).
    * The right side folds through the degree HISTOGRAM (broadcast-sized): with
    * c_k = #{d ≥ k} and S≥(k) = Σ_{d≥k} d,
    *   Σ_{i>k} min(d_i,k) = (c_k − k)·k + S − S≥(k)   when c_k ≥ k,
    *                      = S − Σ_{i≤k} d_i           otherwise —
    * so the whole profile is one rank/prefix layout pass + one n×|hist| theta-join
    * against the broadcast histogram, no pairwise table. Output (k, lhs, rhs, ok). */
  def erdosGallai(spark: SparkSession, degSeq: DataFrame): DataFrame = {
    import graft.layout.Layout
    val pre = Layout.prefixSum(degSeq.select(col("id"), col("deg")),
      Seq(col("deg").desc, col("id").asc), "deg", "pf")
    val ranked = Layout.zipWithRankBy(pre,
      Seq(col("deg").desc, col("id").asc), "r0")
    val ks = ranked.select((col("r0") + 1L).as("k"),
      (col("pf") + col("deg")).as("lhs"))
    val hist = degSeq.groupBy("deg").agg(count(lit(1)).as("c"), sum("deg").as("sd"))
    val stot = degSeq.agg(sum("deg")).head().getLong(0)
    val cum = ks.join(broadcast(hist), hist("deg") >= ks("k"), "left")
      .groupBy("k", "lhs")
      .agg(coalesce(sum("c"), lit(0L)).as("ck"),
        coalesce(sum("sd"), lit(0L)).as("sge"))
    val out = cum.select(col("k"), col("lhs"),
      (col("k") * (col("k") - 1L) +
        when(col("ck") >= col("k"),
          (col("ck") - col("k")) * col("k") + lit(stot) - col("sge"))
          .otherwise(lit(stot) - col("lhs"))).as("rhs"))
      .withColumn("ok", when(col("lhs") <= col("rhs"), 1L).otherwise(0L))
      // Materialize BEFORE releasing the layout frames: zipWithRankBy/prefixSum
      // pin their partition bounds via persistence — recomputing them after
      // unpersist re-samples range bounds and corrupts ranks (Layout ownership
      // contract).
      .cutLineage
    ranked.unpersist(); pre.unpersist()
    out
  }

  /** Havel–Hakimi realization of a degree sequence
    * (generators/HavelHakimiGenerator.cpp — the reference's bucketed priority
    * queue): repeatedly connect the highest-residual node to the next-d highest
    * (ties broken by smaller id). Inherently sequential — like the reference — so
    * this runs driver-side and is meant for fixture/benchmark synthesis, not the
    * 100 TB path; the REALIZABILITY check ([[erdosGallai]]) is the distributed
    * half. Throws on non-graphical input (mirrors the reference's erroredOnRealization). */
  def havelHakimi(spark: SparkSession, degSeq: DataFrame): LinkGraph = {
    import spark.implicits._
    val seq = degSeq.select("id", "deg").collect()
      .map(r => (r.getLong(0), r.getLong(1).toInt))
    val res = scala.collection.mutable.Map(seq: _*)
    val edges = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    var active = seq.map(_._1).toArray
    var done = false
    while (!done) {
      active = active.filter(res(_) > 0)
      if (active.isEmpty) done = true
      else {
        val sortedIds = active.sortBy(id => (-res(id), id))
        val u = sortedIds.head
        val d = res(u)
        require(sortedIds.length - 1 >= d,
          s"sequence not realizable: node $u needs $d partners, ${sortedIds.length - 1} left")
        res(u) = 0
        sortedIds.slice(1, d + 1).foreach { v =>
          require(res(v) > 0, s"sequence not realizable at node $v")
          res(v) -= 1
          edges += ((math.min(u, v), math.max(u, v)))
        }
      }
    }
    val edf = edges.toSeq.toDF("src", "dst").withColumn("weight", lit(1.0))
    LinkGraph.fromEdges(spark, edf, Some(degSeq.select("id")))
  }

  /** ClusteredRandomGraphGenerator (generators/ClusteredRandomGraphGenerator.cpp:
    * 17-48): each node joins a uniformly random cluster of k, then every pair gets a
    * Bernoulli(pin) coin inside a cluster and Bernoulli(pout) across. The reference's
    * per-pair coin loop is Θ(n²); this engine keeps the model (same expected density
    * per block pair) but materializes the expected edge COUNT per block pair through
    * the existing stochasticBlockmodel machinery — index-parallel, no n² scan.
    * Membership is the pure (seed, id) draw formula, so the DuckDB oracle replays it
    * exactly; the graph side is gated by the planted-recovery spec. Returns
    * (graph, planted (id, block) partition). */
  def clusteredRandomGraph(spark: SparkSession, n: Long, k: Int, pin: Double,
                           pout: Double, seed: Long = 42L): (LinkGraph, DataFrame) = {
    require(pin >= pout, "pin >= pout (reference asserts this)")
    val base = seed * 104729L
    val membership = spark.range(n).select(col("id"),
      (expr(draw(s"id + $base")) % k).as("block"))
    val aff = Seq.tabulate(k, k)((a, b) => if (a == b) pin else pout)
    (stochasticBlockmodel(spark, membership, aff, seed), membership)
  }

  private def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)

  /** Batched per-group Chung-Lu: expected-degree sampling where BOTH endpoints of a
    * pair come from the same `block` — one pipeline over all groups (pair budget
    * W_c/2 per group via a cumulative-weight interval join), no per-group loop. Input
    * (id, w, block); output canonical undirected edges. */
  def chungLuGrouped(spark: SparkSession, degSeq: DataFrame, seed: Long): DataFrame = {
    import graft.layout.Layout
    val cum = Layout.prefixSum(degSeq.select(col("id"), col("w"), col("block")),
      Seq(col("block").asc, col("id").asc), "w", "cum")
    val totalW = cum.agg(coalesce(sum("w"), lit(0L))).head().getLong(0)
    if (totalW < 2) { cum.unpersist(); return degSeq.select(col("id").as("src"),
      col("id").as("dst")).filter(lit(false)) }
    val gAgg = cum.groupBy("block")
      .agg(sum("w").as("gw"), min("cum").as("goff"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    gAgg.count()
    val bucketSize = math.max(1L, totalW / math.max(32L, totalW / 64L))
    // Node intervals [cum, cum+w) in the GLOBAL weight space (blocks are contiguous).
    val nodeIvals = cum.filter(col("w") > 0L)
      .select(col("id"), col("cum"), col("w"),
        explode(expr(s"sequence(cum div $bucketSize, (cum + w - 1) div $bucketSize)")).as("b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Pair k (k < totalW/2) belongs to the block whose weight range contains 2k;
    // its endpoints are drawn within that block's [goff, goff+gw).
    val mTarget = totalW / 2L
    val gIvals = gAgg.filter(col("gw") > 0L)
      .select(col("block"), col("goff"), col("gw"),
        explode(expr(s"sequence(goff div $bucketSize, (goff + gw - 1) div $bucketSize)")).as("b"))
    val pairs = spark.range(mTarget)
      .select(col("id").as("pair"), (col("id") * 2L).as("pos"))
      .withColumn("b", expr(s"pos div $bucketSize"))
      .join(gIvals, "b")
      .filter(col("pos") >= col("goff") && col("pos") < col("goff") + col("gw"))
      .select(col("pair"), col("goff"), col("gw"))
    val withDraws = pairs.select(col("pair"),
      (col("goff") + expr(s"(${draw(s"pair*2 + $seed*60013")} * ${GraphSpec.M} + " +
        s"${draw(s"pair*2 + 1 + $seed*60013")})") % col("gw")).as("u0"),
      (col("goff") + expr(s"(${draw(s"pair*2 + $seed*31337")} * ${GraphSpec.M} + " +
        s"${draw(s"pair*2 + 1 + $seed*31337")})") % col("gw")).as("u1"))
    def resolve(df: DataFrame, uCol: String, out: String): DataFrame = df
      .withColumn("b", expr(s"$uCol div $bucketSize"))
      .join(nodeIvals, "b")
      .filter(col(uCol) >= col("cum") && col(uCol) < col("cum") + col("w"))
      .select(col("pair"), col("id").as(out))
    val e = resolve(withDraws.select(col("pair"), col("u0")), "u0", "src")
      .join(resolve(withDraws.select(col("pair"), col("u1")), "u1", "dst"), "pair")
      .filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("src"),
        greatest(col("src"), col("dst")).as("dst"))
      .distinct()
    nodeIvals.unpersist(); gAgg.unpersist(); cum.unpersist()
    e
  }

  /** MocnikGeneratorBasic, dim=2
    * (/root/reference/networkit/cpp/generators/MocnikGeneratorBasic.cpp:43-90): n
    * points uniform in the ball B½(center); DIRECTED edge i→j iff
    * dist(i,j) <= k * min_{l≠i} dist(i,l). Deterministic twin: fixed-point integer
    * coordinates on a Q=2^20 grid from the (seed,index) draw; the rejection loop
    * becomes "first n accepted candidates by candidate index" (distributed rank);
    * ball test and both distance comparisons run in exact int64 SQUARED space —
    * bit-identical in DuckDB's brute-force replay (floats appear nowhere in a
    * comparison).
    *
    * Distributed shape (the 100-TB design point; the reference is O(n²) pairs):
    *   - nearest neighbor via GRID DOUBLING: bucket points into cells sized so the
    *     expected occupancy is ~1, join each unresolved point's 3×3 cell
    *     neighborhood; a candidate min d² <= (cell side)² is CERTIFIED exact (any
    *     point outside the neighborhood is farther than one cell side), the rest
    *     escalate to a 2× coarser level. Expected one or two levels; every join is
    *     cell-key-partitioned, nothing quadratic.
    *   - edges: each point explodes to the (2r+1)² cells inside its own certified
    *     radius r = ceil(k·dmin/cell)+1 (k is small and dmin ~ one cell side, so r is
    *     a small constant), joins points on cell, filters the exact predicate. */
  def mocnik(spark: SparkSession, n: Long, k: Int, seed: Long = 42L): LinkGraph = {
    val pts = mocnikPoints(spark, n, seed)
    val edges = mocnikEdgeSet(spark, pts, k).withColumn("weight", lit(1.0))
    val g = LinkGraph.fromEdges(spark, edges, Some(pts.select("id")))
    g.edges.count()
    pts.unpersist()
    g
  }

  /** Full multi-layer MocnikGenerator (generators/MocnikGenerator.cpp:288-333 —
    * the round-3 gap; only the Basic single-layer twin shipped before): ONE shared
    * point set (the first max(ns) accepted ball points, :313-325), then per layer j
    * the SAME k·dmin edge rule over the first ns(j) points with that layer's k
    * (:327-331 → addEdgesToGraph :215-284, which re-sizes its cell grid per layer —
    * mirrored here because mocnikEdgeSet derives its grid from its own point count).
    * The base layer adds all its edges; later layers add only edges NOT already
    * present, with weight = that layer's relativeWeight (first layer wins, :280-282).
    * Same grid-doubling NN + ring-join distributed shape as [[mocnik]]; the DuckDB
    * twin replays the per-layer brute-force definition with anti-join folds. */
  def mocnikMultiLayer(spark: SparkSession, ns: Seq[Long], ks: Seq[Int],
                       relativeWeights: Seq[Double] = Nil,
                       seed: Long = 42L): LinkGraph = {
    require(ns.nonEmpty && ks.length == ns.length)
    val relW = if (relativeWeights.isEmpty) Seq.fill(ns.length)(1.0)
               else relativeWeights
    require(relW.length == ns.length)
    val pts = mocnikPoints(spark, ns.max, seed)
    var acc: DataFrame = null
    for (((nl, kl), j) <- ns.zip(ks).zipWithIndex) {
      val e = mocnikEdgeSet(spark, pts.filter(col("id") < nl), kl)
        .withColumn("weight", lit(relW(j)))
      acc = if (acc == null) e.cutLineage
      else acc.union(
        e.join(acc.select("src", "dst"), Seq("src", "dst"), "left_anti"))
        .cutLineage
    }
    val g = LinkGraph.fromEdges(spark, acc, Some(pts.select("id")))
    g.edges.count()
    pts.unpersist()
    g
  }

  /** First `n` accepted candidates in the ball B½(center) on the Q=2^20 integer
    * grid (persisted). Shared by [[mocnik]] and [[mocnikMultiLayer]]. */
  private def mocnikPoints(spark: SparkSession, n: Long, seed: Long): DataFrame = {
    val Q = 1L << 20
    val H = Q / 2
    val cand = spark.range(2 * n).select(col("id").as("c"),
      expr(s"(${draw(s"id*2 + $seed*50021")} div 128) % $Q").as("x"),
      expr(s"(${draw(s"id*2 + 1 + $seed*50021")} div 128) % $Q").as("y"))
    val accepted = cand
      .filter(expr(s"(x - $H)*(x - $H) + (y - $H)*(y - $H) < ${H * H}"))
    val pts = graft.layout.Layout.zipWithRank(accepted, "c", "id")
      .filter(col("id") < n).select("id", "x", "y")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    pts.count() // == n for any sane n (acceptance rate ~pi/4 over 2n draws)
    pts
  }

  /** Directed Mocnik edge set (src, dst) over `pts`: i→j iff d(i,j) ≤ k·dmin(i).
    * Grid-doubling exact NN + certified ring join — see [[mocnik]]'s scaladoc. */
  private def mocnikEdgeSet(spark: SparkSession, pts0: DataFrame,
                            k: Int): DataFrame = {
    require(k >= 2)
    val Q = 1L << 20
    val pts = pts0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nPts = pts.count()

    val baseCell = math.max(1L, Q / math.max(1L, math.ceil(math.sqrt(nPts.toDouble)).toLong))
    def withCell(df: DataFrame, cs: Long): DataFrame =
      df.withColumn("cell", expr(s"(x div $cs) * 4194304 + (y div $cs)"))

    // Grid-doubling exact nearest neighbor: (id, d2min).
    var unresolved = pts
    var best: DataFrame = pts.filter(lit(false))
      .select(col("id"), lit(0L).as("d2min"))
    var cs = baseCell
    while (unresolved.count() > 0) {
      val bucketed = withCell(pts, cs)
        .select(col("id").as("jid"), col("x").as("jx"), col("y").as("jy"), col("cell"))
      val probes = withCell(unresolved, cs)
        .select(col("id"), col("x"), col("y"),
          explode(expr("sequence(-1, 1)")).as("dx"), col("cell"))
        .select(col("id"), col("x"), col("y"),
          (col("cell") + col("dx") * 4194304L).as("cell0"),
          explode(expr("sequence(-1, 1)")).as("dy"))
        .select(col("id"), col("x"), col("y"), (col("cell0") + col("dy")).as("cell"))
      val mnd = probes.join(bucketed, "cell")
        .filter(col("jid") =!= col("id"))
        .select(col("id"),
          ((col("x") - col("jx")) * (col("x") - col("jx")) +
            (col("y") - col("jy")) * (col("y") - col("jy"))).as("d2"))
        .groupBy("id").agg(min("d2").as("d2min"))
      // Certified iff no point outside the 3x3 neighborhood can be closer.
      val resolved = mnd.filter(col("d2min") <= cs * cs).cutLineage
      best = best.union(resolved).cutLineage
      unresolved = unresolved.join(resolved.select("id"), Seq("id"), "left_anti").cutLineage
      cs = math.min(Q, cs * 2)
    }

    // Edge phase: per-point certified cell radius, explode ring, exact filter.
    val src = pts.join(best, "id")
      .withColumn("r",
        (ceil(lit(k.toDouble) * sqrt(col("d2min").cast("double")) / baseCell.toDouble) + 1L)
          .cast("long"))
    val probes = src
      .select(col("id"), col("x"), col("y"), col("d2min"),
        expr(s"x div $baseCell").as("cx"), expr(s"y div $baseCell").as("cy"),
        explode(expr("sequence(-r, r)")).as("dx"), col("r"))
      .select(col("id"), col("x"), col("y"), col("d2min"),
        (col("cx") + col("dx")).as("cx"), col("cy"),
        explode(expr("sequence(-r, r)")).as("dy"))
      .select(col("id"), col("x"), col("y"), col("d2min"),
        (col("cx") * 4194304L + col("cy") + col("dy")).as("cell"))
    val bucketed = withCell(pts, baseCell)
      .select(col("id").as("jid"), col("x").as("jx"), col("y").as("jy"), col("cell"))
    val edges = probes.join(bucketed, "cell")
      .filter(col("jid") =!= col("id"))
      .filter(((col("x") - col("jx")) * (col("x") - col("jx")) +
        (col("y") - col("jy")) * (col("y") - col("jy"))) <= lit(k.toLong * k) * col("d2min"))
      .select(col("id").as("src"), col("jid").as("dst")).distinct()
      .cutLineage // eager: safe to release this layer's point cache below
    pts.unpersist()
    edges
  }

  /** PubWeb generator (/root/reference/networkit/cpp/generators/PubWebGenerator.cpp:18-160):
    * n points on the unit TORUS, a fraction clustered into `areas` dense discs, edges
    * between points within neighborhood radius R subject to a per-node max-degree cap.
    * The reference inserts eligible edges in scan order with a mutable degree cap
    * (order-dependent); the deterministic re-expression keeps an edge iff each
    * endpoint ranks the other within its `maxNeigh` NEAREST in-radius candidates
    * (mutual-kNN — same radius + cap semantics, order-free, so both engines replay it
    * exactly). Integer grid coordinates (Q = 2^20), exact integer torus d², rank ties
    * broken by id.
    *
    * Distributed shape: positions are pure (seed, index) arithmetic; the radius join
    * buckets points into R-sized cells and probes the 3×3 cell ring with torus wrap
    * (each point meets only its ~9-cell neighborhood, never n²); the rank is a window
    * per point over its in-radius candidates — group size is the local point density,
    * the same working set the reference's per-node priority queue holds. */
  /** PubWeb point coordinate (off 0 = x, 1 = y) as a dialect-aware SQL fragment over
    * a column `id` — shared verbatim by the engine and the DuckDB oracle. */
  def pubWebCoordSql(off: Int, areas: Int, Q: Long, R: Long, seed: Long,
                     duck: Boolean): String = {
    import GraphSpec.idiv
    def drw(x: String) = drawSql(x, duck)
    val aSel = s"(${drw(s"id*7 + $seed*70001")} % ${areas + 3})"
    val bg = s"((${idiv(drw(s"id*2 + $off + $seed*90001"), "128", duck)}) % $Q)"
    val ctr = s"((${idiv(drw(s"(($aSel) - 3)*2 + $off + $seed*80021"), "128", duck)}) % $Q)"
    val dlt = s"(((${idiv(drw(s"id*2 + $off + $seed*60007"), "128", duck)}) % ${2 * R + 1}) - $R)"
    s"CASE WHEN $aSel < 3 THEN $bg ELSE (($ctr + $dlt + $Q) % $Q) END"
  }

  def pubWeb(spark: SparkSession, n: Long, areas: Int = 10, maxNeigh: Int = 8,
             rDiv: Int = 64, seed: Long = 42L): LinkGraph = {
    require(rDiv >= 4 && (1L << 20) % rDiv == 0, "rDiv must divide the grid")
    val Q = 1L << 20
    val R = Q / rDiv
    val pts = spark.range(n)
      .select(col("id"),
        expr(pubWebCoordSql(0, areas, Q, R, seed, duck = false)).as("x"),
        expr(pubWebCoordSql(1, areas, Q, R, seed, duck = false)).as("y"))
    pubWebFromPoints(spark, pts, maxNeigh, rDiv)
  }

  /** Mutual-kNN torus graph of an explicit integer point table (id, x, y) on the
    * 2^20 grid — the static generator's cell-ring core, shared with the
    * movement-driven dynamic twin. */
  def pubWebFromPoints(spark: SparkSession, points: DataFrame, maxNeigh: Int,
                       rDiv: Int): LinkGraph = {
    val Q = 1L << 20
    val R = Q / rDiv
    val C = rDiv.toLong // cells per axis
    val pts = points
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    pts.count()
    val bucketed = pts.select(col("id").as("jid"), col("x").as("jx"), col("y").as("jy"),
      (expr(s"x div $R") * C + expr(s"y div $R")).as("cell"))
    val probes = pts
      .select(col("id"), col("x"), col("y"), expr(s"x div $R").as("cx"),
        expr(s"y div $R").as("cy"), explode(expr("sequence(-1, 1)")).as("ddx"))
      .select(col("id"), col("x"), col("y"),
        pmod(col("cx") + col("ddx"), lit(C)).as("cx"), col("cy"),
        explode(expr("sequence(-1, 1)")).as("ddy"))
      .select(col("id"), col("x"), col("y"),
        (col("cx") * C + pmod(col("cy") + col("ddy"), lit(C))).as("cell"))
    val d2 = {
      val adx = abs(col("x") - col("jx")); val ady = abs(col("y") - col("jy"))
      val dx = least(adx, lit(Q) - adx);   val dy = least(ady, lit(Q) - ady)
      dx * dx + dy * dy
    }
    val cand = probes.join(bucketed, "cell")
      .filter(col("jid") =!= col("id"))
      .select(col("id").as("u"), col("jid").as("v"), d2.as("d2"))
      .filter(col("d2") <= lit(R * R))
      .distinct() // corner pairs can meet through 2 probe cells on the wrapped torus
    val ranked = cand.withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("u")
          .orderBy(col("d2"), col("v"))).cast("long"))
      .filter(col("rn") <= maxNeigh.toLong)
    val edges = ranked.select(col("u"), col("v"))
      .join(ranked.select(col("v").as("u"), col("u").as("v")), Seq("u", "v"), "left_semi")
      .filter(col("u") < col("v"))
      .select(col("u").as("src"), col("v").as("dst"))
      .withColumn("weight", lit(1.0))
    val g = LinkGraph.fromEdges(spark, edges, Some(pts.select("id")))
    g.edges.count()
    pts.unpersist()
    g
  }

  /** Regular ring lattice (/root/reference/networkit/cpp/generators/RegularRingLatticeGenerator.cpp:14-33):
    * node i connects to its k/2 clockwise neighbors — the Watts–Strogatz β=0 lattice
    * as its own generator. Pure index arithmetic, no draws, no shuffle until layout. */
  def regularRingLattice(spark: SparkSession, n: Long, k: Int): LinkGraph = {
    require(k >= 2 && k % 2 == 0, "k must be even and >= 2")
    val half = k / 2
    val edges = spark.range(n * half)
      .select(expr(s"id div $half").as("src"),
        expr(s"(id div $half + id % $half + 1) % $n").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .withColumn("weight", lit(1.0))
    LinkGraph.fromEdges(spark, edges, Some(spark.range(n).select(col("id"))))
  }

  /** Dorogovtsev–Mendes
    * (/root/reference/networkit/cpp/generators/DorogovtsevMendesGenerator.cpp:20-41):
    * start from a triangle; each new node t picks a uniform existing edge and links to
    * BOTH its endpoints. The reference's sequential `G.randomEdge()` loop becomes the
    * same pointer-chasing shape as [[barabasiAlbert]]: node t's pick
    * p(t) = draw(t) % (2t−3) is a closed-form edge index, an edge's NEWER endpoint is
    * closed-form (its creating node), and only the inherited older endpoint chases
    * through earlier picks — a chain that strictly decreases the edge index, resolved
    * by iterated column arithmetic (no joins at all in the chase). The DuckDB twin
    * replays the identical chase as a recursive CTE. */
  def dorogovtsevMendes(spark: SparkSession, n: Long, seed: Long = 42L): LinkGraph = {
    require(n >= 3)
    import org.apache.spark.storage.StorageLevel
    val triangle = Seq((0L, 1L), (1L, 2L), (2L, 0L))
    // Edge j >= 3 belongs to node t = 3 + (j-3) div 2, slot (j-3)%2; both slots chase
    // node t's pick p = draw(t) % (2t-3). want: 0 = older endpoint (lo), 1 = newer (hi).
    val pSql = s"(${draw(s"t*31 + $seed*1299709")} % (2*t - 3))"
    var unresolved = spark.range(2L * (n - 3L)).select(
        (col("id") + 3L).as("j"),
        (lit(3L) + expr("id div 2")).as("t"),
        pmod(col("id"), lit(2L)).cast("int").as("want"))
      .withColumn("q", expr(pSql))
      .select(col("j"), col("t").as("src"), col("want"), col("q"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var resolved: DataFrame = unresolved.filter(lit(false))
      .select(col("j"), col("src"), col("q").as("dst"))
    var left = unresolved.count()
    while (left > 0) {
      // Terminal cases: base-triangle edges (q < 3) via the lo/hi lookup; want=hi on a
      // later edge resolves to its creating node 3 + (q-3) div 2.
      val marked = unresolved.withColumn("dst",
        when(col("q") < 3L,
          when(col("want") === 0, element_at(array(lit(0L), lit(1L), lit(0L)), col("q").cast("int") + 1))
            .otherwise(element_at(array(lit(1L), lit(2L), lit(2L)), col("q").cast("int") + 1)))
          .when(col("want") === 1, lit(3L) + expr("(q - 3) div 2")))
      resolved = resolved.union(
        marked.filter(col("dst").isNotNull).select("j", "src", "dst"))
      // Chase: want=lo on edge q >= 3 re-enters at q's own pick.
      val next = marked.filter(col("dst").isNull)
        .select(col("j"), col("src"),
          pmod(col("q") - 3L, lit(2L)).cast("int").as("want"),
          expr("3 + (q - 3) div 2").as("t"))
        .withColumn("q", expr(pSql))
        .select(col("j"), col("src"), col("want"), col("q"))
        .cutLineage
      left = next.count()
      unresolved = next
    }
    import spark.implicits._
    val edges = triangle.toDF("src", "dst")
      .unionByName(resolved.select(col("src"), col("dst")))
      .withColumn("weight", lit(1.0))
    LinkGraph.fromEdges(spark, edges, Some(spark.range(n).select(col("id"))))
  }
}
