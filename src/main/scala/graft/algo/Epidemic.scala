package graft.algo

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.DataFrameLineageOps
import graft.model.LinkGraph
import graft.synth.GraphSpec

/** SEIR epidemic simulation over the undirected contact graph
  * (/root/reference/networkit/cpp/simulation/EpidemicSimulationSEIR.cpp:16-100).
  *
  * States: 0=Susceptible, 1=Exposed, 2=Infectious, 3=Removed. Per time step t:
  * every node Infectious at the START of the step contacts each neighbor; a
  * Susceptible neighbor becomes Exposed (ts=t) if any contact's draw succeeds;
  * Exposed nodes with t−ts ≥ eTime become Infectious; Infectious nodes with
  * t−ts ≥ iTime become Removed (after contacting — same order as the reference's
  * sweep). The reference's `Aux::Random::probability()` draw is replaced by the
  * repo-wide deterministic nonlinear LCG on (v, u, t, seed), so the run is exactly
  * replayable by the DuckDB oracle; the reference's in-sweep read/write races
  * (a node exposed mid-sweep) are resolved to synchronous step semantics.
  *
  * Per step: one frontier-restricted join (infectious ⋈ edges ⋈ susceptible) + an
  * n-row state map — the level-synchronous BFS shape; state is lineage-cut per step.
  * Returns the census time series (t, n_s, n_e, n_i, n_r), t = 0..tMax.
  */
object Epidemic {

  /** Success threshold for probability p as an exact integer against the 31-bit draw. */
  def threshold(p: Double): Long = (p * GraphSpec.M).toLong

  /** Draw for contact (infectious u → susceptible v) at step t, as a SQL fragment
    * (the EdgeScores nonlinear two-round LCG; all intermediates < 2^63). */
  def drawSql(v: String, u: String, t: String, seed: Long, duck: Boolean): String = {
    import GraphSpec.lcg
    val x = s"(($v)*1000003 + ($u)*97 + ($t)*1000081 + $seed)"
    s"(((${lcg(x)} * ${lcg(s"($x) + 1000003")}) ${if (duck) "//" else "div"} 65536) % ${GraphSpec.M})"
  }

  def seir(spark: SparkSession, g: LinkGraph, tMax: Int, transP: Double,
           eTime: Int, iTime: Int, zero: Long, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    val thr = threshold(transP)
    val bi = g.bidirected.select("src", "dst").persist(StorageLevel.MEMORY_AND_DISK)
    bi.count()

    var state = g.vertices
      .select(col("id"),
        when(col("id") === zero, lit(2)).otherwise(lit(0)).as("state"),
        lit(0L).as("ts"))
      .cutLineage

    val census = ArrayBuffer[(Long, Long, Long, Long, Long)]()
    def record(t: Long): Unit = {
      val row = state.agg(
        sum(when(col("state") === 0, 1L).otherwise(0L)),
        sum(when(col("state") === 1, 1L).otherwise(0L)),
        sum(when(col("state") === 2, 1L).otherwise(0L)),
        sum(when(col("state") === 3, 1L).otherwise(0L))).head()
      census += ((t, row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3)))
    }
    record(0L)

    var t = 1
    while (t <= tMax) {
      // Nodes contacted successfully this step: infectious source at step start,
      // susceptible target, any successful draw (distinct collapses multiples).
      val contacted = bi
        .join(state.filter(col("state") === 2).select(col("id").as("src")), "src")
        .join(state.filter(col("state") === 0).select(col("id").as("dst")), "dst")
        .filter(expr(drawSql("dst", "src", t.toString, seed, duck = false)) < thr)
        .select(col("dst").as("id")).distinct()
      state = state.join(contacted.withColumn("hit", lit(1)), Seq("id"), "left")
        .select(col("id"),
          when(col("state") === 0 && col("hit").isNotNull, lit(1))
            .when(col("state") === 1 && lit(t.toLong) - col("ts") >= eTime, lit(2))
            .when(col("state") === 2 && lit(t.toLong) - col("ts") >= iTime, lit(3))
            .otherwise(col("state")).as("state"),
          when((col("state") === 0 && col("hit").isNotNull) ||
               (col("state") === 1 && lit(t.toLong) - col("ts") >= eTime) ||
               (col("state") === 2 && lit(t.toLong) - col("ts") >= iTime),
            lit(t.toLong)).otherwise(col("ts")).as("ts"))
        .cutLineage
      record(t.toLong)
      t += 1
    }
    bi.unpersist()
    census.toSeq.toDF("t", "n_s", "n_e", "n_i", "n_r")
  }
}
