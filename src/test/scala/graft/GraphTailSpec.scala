package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.algo.{Cliques, Coarsening, Distances, Matching, Measures}
import graft.model.LinkGraph

/** MaxClique / MatchingCoarsening / ClusteringProjector / DynSSSP. */
class GraphTailSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("maxClique: karate's maximum clique has size 5") {
    val g = LinkGraph.fromEdges(spark,
      TestSpark.directed(Fixtures.karateEdges.map(e => (e._1, e._2, 1.0))),
      Some(spark.range(34).select(col("id"))))
    val r = Cliques.maxClique(spark, g).head()
    assert(r.getAs[Long]("k") == 5L)
    // Karate has two 5-cliques ({0,1,2,3,7} and {0,1,2,3,13}); the deterministic
    // tie-break picks the lexicographically smaller.
    assert(r.getAs[scala.collection.Seq[Long]]("members").toSeq == Seq(0L, 1L, 2L, 3L, 7L))
  }

  test("matchingCoarsening: contracted pairs vanish, weights conserve") {
    val g = LinkGraph.forSf(spark, "/root/testdata/sf0.001")
    val m = Matching.localMaxMatching(spark, g, 15)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val coarse = Coarsening.matchingCoarsening(spark, g, m)
    // Total weight conserves (self-loop rows keep intra-pair weight).
    val wFine = g.canonicalUndirected.agg(sum("weight")).head().getDouble(0)
    val wCoarse = coarse.agg(sum("w")).head().getLong(0)
    assert(wCoarse.toDouble == wFine)
    // Every matched pair maps to ONE coarse node: no coarse edge between the pair's
    // two fine endpoints can survive (they became a self-loop at the min endpoint).
    val part = Coarsening.matchingPartition(spark, g, m)
    val pairLabels = m
      .join(part.select(col("id").as("src"), col("label").as("ls")), "src")
      .join(part.select(col("id").as("dst"), col("label").as("ld")), "dst")
    assert(pairLabels.filter(col("ls") =!= col("ld")).count() == 0)
    m.unpersist()
  }

  test("projectBack: identity map returns the coarse clustering itself") {
    import spark.implicits._
    val f2c = Seq((0L, 10L), (1L, 10L), (2L, 20L)).toDF("id", "label")
    val cl = Seq((10L, 7L), (20L, 9L)).toDF("id", "label")
    val fine = Coarsening.projectBack(f2c, cl)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fine == Map(0L -> 7L, 1L -> 7L, 2L -> 9L))
  }

  test("weightedSsspWarm equals cold recompute on the mutated graph") {
    val g = LinkGraph.forSf(spark, "/root/testdata/sf0.001")
    val w = lit(1L) + pmod(col("src") + col("dst"), lit(5L))
    val prev = Distances.weightedSssp(spark, g, 0L, w)
    val added = g.vertices.filter(col("id") % 199 === 0 && col("id") =!= 0L)
      .select(lit(0L).as("src"), col("id").as("dst"))
      .withColumn("w", lit(1L) + pmod(col("src") + col("dst"), lit(5L)))
    val warm = Distances.weightedSsspWarm(spark, g, prev, added, w)
    // Cold: rebuild the graph with the added edges and re-run Bellman-Ford.
    val gNew = LinkGraph.fromEdges(spark,
      g.edges.select(col("src"), col("dst"), col("weight"))
        .union(added.select(col("src"), col("dst"), lit(1.0).as("weight"))),
      Some(g.vertices))
    val cold = Distances.weightedSssp(spark, gNew, 0L, w)
    assert(warm.exceptAll(cold).count() == 0 && cold.exceptAll(warm).count() == 0)
    // And the repair actually changed something (the star shrinks distances).
    assert(warm.exceptAll(prev).count() > 0)
  }
}
