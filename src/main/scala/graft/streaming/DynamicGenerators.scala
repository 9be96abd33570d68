package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.synth.Generators

/** Dynamic graph sources — the reference's dynamics-side generators (the
  * DynamicGraphGenerator.h surface; timestamped DGS replay per io/DynamicGraphReader.h
  * + generators/DynamicDGSParser.h lives in GraphEvents.parseDgs)
  * (/root/reference/networkit/cpp/dynamics/ + generators/DynamicBarabasiAlbertGenerator.cpp: each time step adds one node plus k preferential-attachment
  * edges, emitted as a GraphEvent stream).
  *
  * The engine's static Barabási–Albert generator is already a pure (seed, index)
  * function whose edge i attaches node `init + i/k` to an earlier node — so the
  * event stream is a VIEW over it: order the edges by their later endpoint's
  * arrival step and interleave the node-addition events. Deterministic, replayable
  * from any offset (resumable ingestion), and foldable back to exactly the static
  * graph (spec-checked) — the property the reference's DynamicGraphSource contract
  * (dynamics/GraphEventProxy) demands of a generator/updater pair.
  */
object DynamicGenerators {

  /** Event rows (etype, u, v, w, t) of the dynamic BA process: t is the time step
    * (= arriving node's index), each step emits one "an" (node addition) followed by
    * its k "ae" edge additions; the k initial nodes arrive at t=0. Total order:
    * (t, etype desc "an" first, edge index). */
  def dynamicBarabasiAlbert(spark: SparkSession, k: Int, n: Long,
                            seed: Long = 42L): DataFrame = {
    val g = Generators.barabasiAlbert(spark, k, n, seed)
    val nodeEvents = g.vertices.select(
      lit("an").as("etype"), col("id").as("u"), lit(null).cast("long").as("v"),
      lit(1.0).as("w"), greatest(col("id") - (k - 1).toLong, lit(0L)).as("t"))
    val edgeEvents = g.edges.select(
      lit("ae").as("etype"), col("src").as("u"), col("dst").as("v"),
      col("weight").as("w"), (col("src") - (k - 1).toLong).as("t"))
    nodeEvents.union(edgeEvents)
  }

  /** The graph state after replaying events with t <= `upTo` (prefix fold) —
    * what a DynAlgorithm consumer sees mid-stream. */
  def prefixEdges(events: DataFrame, upTo: Long): DataFrame =
    GraphEvents.applyBatch(
      events.filter(lit(false)).select(col("u").as("src"), col("v").as("dst"), col("w").as("weight")),
      events.filter(col("t") <= upTo))

  /** Step-ordered prefix fold: one applyBatch per time step t <= upTo (GraphUpdater
    * semantics — [[prefixEdges]]'s single-batch set fold is only valid for
    * append-only streams; movement streams toggle edges across steps). */
  def foldSteps(spark: SparkSession, events: DataFrame, upTo: Long): DataFrame = {
    import graft.DataFrameLineageOps
    var edges = events.filter(lit(false))
      .select(col("u").as("src"), col("v").as("dst"), col("w").as("weight"))
    val ts = events.filter(col("t") <= upTo).select("t").distinct()
      .orderBy("t").collect().map(_.getLong(0))
    ts.foreach { t =>
      edges = GraphEvents.applyBatch(edges, events.filter(col("t") === t)).cutLineage
    }
    edges
  }

  /** DynamicPathGenerator (generators/DynamicPathGenerator.cpp:12-29): step t adds
    * node t and edge (t−1, t). Pure index arithmetic — the oracle replays it. */
  def dynamicPath(spark: SparkSession, steps: Long): DataFrame = {
    val nodes = spark.range(steps + 1).select(lit("an").as("etype"),
      col("id").as("u"), lit(null).cast("long").as("v"), lit(1.0).as("w"),
      col("id").as("t"))
    val edges = spark.range(1, steps + 1).select(lit("ae").as("etype"),
      (col("id") - 1L).as("u"), col("id").as("v"), lit(1.0).as("w"),
      col("id").as("t"))
    nodes.union(edges)
  }

  /** DynamicDorogovtsevMendesGenerator (generators/DynamicDorogovtsevMendes
    * Generator.cpp): DM is incremental by construction — node t >= 3 arrives at
    * step t−2 with its two edges (the static generator records the creating node
    * as src), the seed triangle at t=0. An event VIEW over the static generator,
    * foldable back to it at every prefix. */
  def dynamicDorogovtsevMendes(spark: SparkSession, n: Long,
                               seed: Long = 42L): DataFrame = {
    val g = Generators.dorogovtsevMendes(spark, n, seed)
    val nodeEvents = g.vertices.select(lit("an").as("etype"), col("id").as("u"),
      lit(null).cast("long").as("v"), lit(1.0).as("w"),
      greatest(col("id") - 2L, lit(0L)).as("t"))
    val edgeEvents = g.edges.select(lit("ae").as("etype"), col("src").as("u"),
      col("dst").as("v"), col("weight").as("w"),
      greatest(col("src") - 2L, lit(0L)).as("t"))
    nodeEvents.union(edgeEvents)
  }

  /** Shared movement-model dynamic source: snapshot events at t=0 (all nodes +
    * G_0's edges), then per step the graphDifference edit script G_{t−1} → G_t.
    * Folding the prefix back reproduces G_t exactly (spec-gated). */
  private def movementEvents(spark: SparkSession, n: Long, steps: Int,
                             graphAt: Int => graft.model.LinkGraph): DataFrame = {
    import graft.DataFrameLineageOps
    var prev = graphAt(0)
    var ev = spark.range(n).select(lit("an").as("etype"), col("id").as("u"),
        lit(null).cast("long").as("v"), lit(1.0).as("w"), lit(0L).as("t"))
      .union(prev.canonicalUndirected.select(lit("ae").as("etype"),
        col("src").as("u"), col("dst").as("v"), col("weight").as("w"),
        lit(0L).as("t")))
      .cutLineage
    var t = 1
    while (t <= steps) {
      val cur = graphAt(t)
      ev = ev.union(GraphEvents
          .graphDifference(prev.canonicalUndirected, cur.canonicalUndirected)
          .withColumn("t", lit(t.toLong)))
        .cutLineage
      prev.canonicalUndirected.unpersist()
      prev = cur
      t += 1
    }
    prev.canonicalUndirected.unpersist()
    ev
  }

  /** DynamicHyperbolicGenerator (generators/DynamicHyperbolicGenerator.cpp — node
    * movement in the hyperbolic disk re-derives the threshold graph): each node
    * drifts angularly by its own per-node LCG rate per step; events are the
    * per-step edge diffs. Geometric floats keep this spec-gated (fold-back parity)
    * rather than oracle-hashed. */
  def dynamicHyperbolic(spark: SparkSession, n: Long, R: Double, steps: Int,
                        driftFrac: Double = 0.02, alpha: Double = 1.0,
                        seed: Long = 42L): DataFrame = {
    val M = graft.synth.GraphSpec.M.toDouble
    val driftSql = s"(CAST(${Generators.drawSql(s"id*3 + $seed*104651", duck = false)} AS DOUBLE)" +
      s" / $M - 0.5) * ${2.0 * math.Pi * driftFrac}"
    movementEvents(spark, n, steps, t => {
      val pts = Generators.hyperbolicPoints(spark, n, R, alpha, seed)
        .select(col("id"),
          (col("theta") + lit(t.toDouble) * expr(driftSql)).as("theta"), col("r"))
      Generators.hyperbolicFromPoints(spark, pts, n, R)
    })
  }

  /** DynamicPubWebGenerator (generators/DynamicPubWebGenerator.cpp — point
    * movement on the torus): each node gets an integer per-node velocity (vx, vy)
    * from the LCG, position at step t = (p + t·v) mod 2^20 — ALL integer
    * arithmetic, so the DuckDB oracle replays every step's mutual-kNN graph and
    * the edit stream hash-exactly. */
  def dynamicPubWeb(spark: SparkSession, n: Long, steps: Int, areas: Int = 10,
                    maxNeigh: Int = 8, rDiv: Int = 64,
                    seed: Long = 42L): DataFrame = {
    val Q = 1L << 20
    val R = Q / rDiv
    val V = R / 8
    def vel(off: Int) = s"((${graft.synth.GraphSpec.idiv(
      Generators.drawSql(s"id*5 + $off + $seed*130003", duck = false), "128", duck = false)}" +
      s" % ${2 * V + 1}) - $V)"
    movementEvents(spark, n, steps, t => {
      val pts = spark.range(n).select(col("id"),
        pmod(expr(Generators.pubWebCoordSql(0, areas, Q, R, seed, duck = false)) +
          lit(t.toLong) * expr(vel(0)), lit(Q)).as("x"),
        pmod(expr(Generators.pubWebCoordSql(1, areas, Q, R, seed, duck = false)) +
          lit(t.toLong) * expr(vel(1)), lit(Q)).as("y"))
      Generators.pubWebFromPoints(spark, pts, maxNeigh, rDiv)
    })
  }

  /** DynamicForestFireGenerator (/root/reference/networkit/cpp/generators/
    * DynamicForestFireGenerator.cpp:24-140, Leskovec's forest-fire model): each step
    * adds one node, picks an ambassador, "burns" BFS-style — every burned node w
    * burns Geometric(p) of its unvisited out-neighbors (plus Geometric(p·r) of its
    * in-neighbors when directed) — and the new node links to all burned nodes.
    *
    * Deterministic re-expression: the reference draws a geometric count by repeated
    * uniform failures and picks burn targets uniformly without replacement; here the
    * count is the same Geometric(p) via the inverse-CDF of one LCG uniform per
    * (step, node), and the burned subset is the k candidates with smallest LCG hash
    * — identical distribution family, reproducible across partitionings. The burn
    * state is graph-dependent, so steps fold sequentially on the driver while each
    * step's frontier expansion is a distributed join (the reference is fully
    * sequential). Returns the event stream (etype, u, v, w, t): "an"/"ae" rows plus
    * one "st" TIME_STEP per step (new node's edges directed v -> burned). */
  def dynamicForestFire(spark: SparkSession, steps: Int, p: Double,
                        directed: Boolean = false, r: Double = 1.0,
                        seed: Long = 42L): DataFrame = {
    import spark.implicits._
    import graft.DataFrameLineageOps
    require(p > 0 && p < 1, "burn probability must be in (0,1)")
    val M = graft.synth.GraphSpec.M
    val (lcgA, lcgC) = (graft.synth.GraphSpec.A, graft.synth.GraphSpec.C)
    def unif(x: org.apache.spark.sql.Column) =
      (pmod(lit(lcgA) * pmod(lit(lcgA) * pmod(x, lit(M)) + lit(lcgC), lit(M)) + lit(lcgC),
        lit(M)).cast("double") + lit(1.0)) / lit((M + 1).toDouble)
    // geometric(p): #successes before first failure = floor(ln U / ln p) ... but the
    // reference burns while q <= prob, so k ~ floor(log_p(U)) with U uniform (0,1]
    def geo(x: org.apache.spark.sql.Column) =
      floor(log(unif(x)) / lit(math.log(p))).cast("long")
    def geoBack(x: org.apache.spark.sql.Column) =
      floor(log(unif(x)) / lit(math.log(math.min(p * r, 0.999999)))).cast("long")

    var edges = Seq.empty[(Long, Long)].toDF("src", "dst").cutLineage // directed v -> burned
    val events = scala.collection.mutable.ArrayBuffer[(String, Long, Long, Double, Long)]()
    events += (("an", 0L, 0L, 1.0, 0L))
    events += (("st", 0L, 0L, 0.0, 0L))
    var n = 1L
    for (t <- 1 to steps) {
      val newNode = n
      // ambassador: LCG pick over existing node ids 0..n-1
      val a = math.floorMod(graft.synth.GraphSpec.A * (seed + 31L * t) + graft.synth.GraphSpec.C, M) % n
      events += (("an", newNode, 0L, 1.0, t.toLong))
      var burned = Seq((a, 0L)).toDF("id", "ord").cutLineage
      var frontier = burned.select("id")
      var more = true
      var depth = 0
      while (more && depth < 32) {
        val fwd = frontier.withColumnRenamed("id", "src")
          .join(edges, Seq("src")).select(col("src").as("b"), col("dst").as("cand"))
        val bwd = frontier.withColumnRenamed("id", "dst")
          .join(edges, Seq("dst")).select(col("dst").as("b"), col("src").as("cand"))
        val cand = (if (directed) Seq(("f", fwd), ("b", bwd)) else Seq(("f", fwd.union(bwd))))
          .map { case (dirTag, c) =>
            val fresh = c.join(burned.select(col("id").as("cand")), Seq("cand"), "left_anti")
              .distinct()
            val kCol = if (dirTag == "f") geo(col("b") * lit(1009L) + lit(t.toLong * 104729L))
                       else geoBack(col("b") * lit(1013L) + lit(t.toLong * 104729L + 7L))
            fresh
              .withColumn("h", pmod(col("cand") * lit(2654435761L) + col("b") * lit(97L)
                + lit(t.toLong), lit(M)))
              .withColumn("rn", row_number().over(
                org.apache.spark.sql.expressions.Window.partitionBy("b")
                  .orderBy(col("h"), col("cand"))))
              .filter(col("rn") <= kCol)
              .select(col("cand").as("id"))
          }.reduce(_ union _)
          .distinct()
          .join(burned.select(col("id")), Seq("id"), "left_anti")
          .cutLineage
        val cnt = cand.count()
        if (cnt == 0) more = false
        else {
          burned = burned.union(cand.select(col("id"), lit(depth.toLong + 1).as("ord")))
            .cutLineage
          frontier = cand.select("id")
        }
        depth += 1
      }
      val burnedRows = burned.orderBy("ord", "id").collect().map(_.getLong(0))
      burnedRows.foreach(w => events += (("ae", newNode, w, 1.0, t.toLong)))
      events += (("st", 0L, 0L, 0.0, t.toLong))
      val prevEdges = edges
      edges = edges.union(burnedRows.toSeq.map(w => (newNode, w)).toDF("src", "dst"))
        .cutLineage
      prevEdges.releaseState(); burned.releaseState()
      n += 1
    }
    events.toSeq.toDF("etype", "u", "v", "w", "t")
  }
}
