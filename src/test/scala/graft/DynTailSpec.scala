package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.algo.{ConnectedComponents, Distances}
import graft.model.LinkGraph
import graft.streaming.{DynamicGenerators, GraphEvents}

/** Dynamic tail: DynWeaklyConnectedComponents, GraphDistance,
  * DynamicForestFireGenerator, DynBetweennessOneNode. */
class DynTailSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("dynWeaklyCC: remove-split + insert-merge equals cold recompute (directed)") {
    val s = spark; import s.implicits._
    // two directed chains 0->1->2->3 and 10->11->12, plus bridge 3->10
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (10L, 11L), (11L, 12L), (3L, 10L))
      .map { case (a, b) => (a, b, 1.0) }.toDF("src", "dst", "weight")
    val g = LinkGraph.fromEdges(spark, edges)
    val cold = ConnectedComponents.run(spark, g).labels
    // batch: remove the bridge, add 12->0
    val events = Seq(("re", 3L, 10L, 1.0), ("ae", 12L, 0L, 1.0))
      .toDF("etype", "u", "v", "w")
    val warm = GraphEvents.dynWeaklyCC(spark, cold, g.edges, events)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // mutated graph is one weak component again (12->0 re-merges)
    assert(warm.values.toSet == Set(0L))
    // now remove the merge edge too: two components
    val events2 = Seq(("re", 3L, 10L, 1.0), ("re", 12L, 0L, 1.0)).toDF("etype", "u", "v", "w")
    val warm2 = GraphEvents.dynWeaklyCC(spark, cold, g.edges, events2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L to 3L).map(warm2).toSet == Set(0L))
    assert(Seq(10L, 11L, 12L).map(warm2).toSet == Set(10L))
  }

  test("dynWeaklyCC: antiparallel twin keeps the pair connected after one-direction removal") {
    val s = spark; import s.implicits._
    val edges = Seq((0L, 1L, 1.0), (1L, 0L, 1.0), (1L, 2L, 1.0)).toDF("src", "dst", "weight")
    val g = LinkGraph.fromEdges(spark, edges)
    val cold = ConnectedComponents.run(spark, g).labels
    val events = Seq(("re", 0L, 1L, 1.0)).toDF("etype", "u", "v", "w")
    val warm = GraphEvents.dynWeaklyCC(spark, cold, g.edges, events)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(warm.values.toSet == Set(0L)) // 1->0 still holds the weak link
  }

  test("graphDistance: unweighted and weighted pair distances") {
    val s = spark; import s.implicits._
    val edges = Seq((0L, 1L, 1.0), (1L, 2L, 1.0), (0L, 2L, 1.0), (2L, 3L, 1.0))
      .toDF("src", "dst", "weight")
    val g = LinkGraph.fromEdges(spark, edges,
      Some((Seq(0L, 1L, 2L, 3L, 99L)).toDF("id"))) // 99 exists but is isolated
    assert(Distances.graphDistance(spark, g, 0L, 3L).head().getLong(2) == 2L)
    // weighted: w(u,v) = 1 + (u+v)%5 -> 0-2 direct costs 3; 0-1-2 costs 2+4=6
    val w = lit(1L) + pmod(col("src") + col("dst"), lit(5L))
    assert(Distances.graphDistance(spark, g, 0L, 2L, Some(w)).head().getLong(2) == 3L)
    assert(Distances.graphDistance(spark, g, 0L, 99L).head().getLong(2) == -1L)
  }

  test("dynamicForestFire: stream shape, connectivity, determinism") {
    val ev1 = DynamicGenerators.dynamicForestFire(spark, steps = 12, p = 0.4).collect()
    val ev2 = DynamicGenerators.dynamicForestFire(spark, steps = 12, p = 0.4).collect()
    assert(ev1.map(_.toSeq).toSeq == ev2.map(_.toSeq).toSeq) // integer-deterministic
    val rows = ev1.map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(4)))
    assert(rows.count(_._1 == "an") == 13) // initial node + one per step
    assert(rows.count(_._1 == "st") == 13)
    // each new node v links to >= 1 burned node, and only to OLDER nodes
    val adds = rows.filter(_._1 == "ae")
    assert(adds.nonEmpty)
    assert(adds.forall { case (_, v, w, _) => w < v })
    (1 to 12).foreach { t =>
      assert(adds.exists(_._4 == t.toLong), s"step $t should add at least one edge")
    }
    // burning spreads: some step burns beyond the ambassador alone
    val perStep = adds.groupBy(_._4).map(_._2.size)
    assert(perStep.exists(_ > 1), "fire should spread past the ambassador sometimes")
  }

  test("dynamicForestFire directed: backward burn scaled by r still yields valid stream") {
    val ev = DynamicGenerators.dynamicForestFire(spark, steps = 8, p = 0.35,
      directed = true, r = 0.5).collect()
    val adds = ev.filter(_.getString(0) == "ae")
    assert(adds.nonEmpty)
    assert(adds.forall(r => r.getLong(2) < r.getLong(1)))
  }
}
