package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.synth.Generators

/** Dynamic graph sources — the reference's dynamics-side generators
  * (/root/reference/networkit/cpp/dynamics/ + generators/DynamicBarabasiAlbert
  * Generator.cpp: each time step adds one node plus k preferential-attachment
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
}
