package graft.algo

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.model.LinkGraph

/** MaximalCliques — distributed Bron–Kerbosch
  * (/root/reference/networkit/cpp/clique/MaximalCliques.cpp:1-220: the
  * Eppstein–Löffler–Strash sequential algorithm over a degeneracy ordering).
  *
  * Distributed re-architecture: fix the repo-wide total order (degree, id). For each
  * node v, every maximal clique whose MINIMUM-order member is v is found by a LOCAL
  * pivot Bron–Kerbosch on v's neighborhood: candidates P = later neighbors,
  * exclusion X = earlier neighbors (needed for maximality — a clique extending with
  * an earlier node is not v-minimal), with the induced adjacency AMONG v's neighbors
  * shipped to the group. Every maximal clique has exactly one minimum member, so the
  * union over v enumerates each clique exactly once. The ordering choice affects only
  * work balance, not the output set — (degree, id) mirrors ELS's degeneracy intent
  * (the low-order member sees few later neighbors: |P| = O(√m) on heavy-tailed
  * graphs).
  *
  * Plan: the neighbor-pair (triangle) join produces 3·T rows total — the per-group
  * payload is v's triangle count, NOT deg²; groups are processed by `flatMapGroups`
  * (genuine per-partition imperative logic: BK is recursive with data-dependent
  * branching — the documented last-resort case). Worst-case BK is exponential; on
  * web-scale graphs the (degree,id) orientation keeps P small and the 3^(k/3)
  * bound is over the LOCAL neighborhood only.
  */
object Cliques {

  /** All maximal cliques (size >= 2) as (rep = min member, k = size, members sorted
    * ascending). Isolated vertices and leaves yield their maximal edge cliques. */
  def maximalCliques(spark: SparkSession, g: LinkGraph): DataFrame = {
    import spark.implicits._
    // canonicalUndirected / oriented / undirectedDegrees are all persisted
    // per-graph views — nothing extra to pin here.
    val und = g.canonicalUndirected.select(col("src").as("s"), col("dst").as("t"))
    val deg = g.undirectedDegrees
    val bi = und.select(col("s").as("v"), col("t").as("x"))
      .union(und.select(col("t").as("v"), col("s").as("x")))
    // kind 0: neighbor row (x, later? 1 : 0); kind 1: induced edge (x, y) among N(v).
    val nbrRows = bi
      .join(deg.select(col("id").as("v"), col("deg").as("dv")), "v")
      .join(deg.select(col("id").as("x"), col("deg").as("dx")), "x")
      .select(col("v"), lit(0).as("kind"), col("x"),
        when(col("dv") < col("dx") ||
          (col("dv") === col("dx") && col("v") < col("x")), 1L)
          .otherwise(0L).as("y"))
    // Induced edges among N(v) = the 3 per-corner views of the oriented triangle
    // listing (3T rows total — no deg² wedge blow-up on hubs).
    val tri = Triangles.triangleCorners(Triangles.oriented(g))
    val edgeRows = tri.select(col("a").as("v"), lit(1).as("kind"),
        col("b").as("x"), col("c").as("y"))
      .union(tri.select(col("b").as("v"), lit(1).as("kind"),
        col("a").as("x"), col("c").as("y")))
      .union(tri.select(col("c").as("v"), lit(1).as("kind"),
        col("a").as("x"), col("b").as("y")))
    val grouped = nbrRows.union(edgeRows)
      .as[(Long, Int, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (v, it) =>
        val later = scala.collection.mutable.ArrayBuffer[Long]()
        val earlier = scala.collection.mutable.ArrayBuffer[Long]()
        val adj = scala.collection.mutable.Map[Long, scala.collection.mutable.Set[Long]]()
        def link(a: Long, b: Long): Unit = {
          adj.getOrElseUpdate(a, scala.collection.mutable.Set[Long]()) += b
          adj.getOrElseUpdate(b, scala.collection.mutable.Set[Long]()) += a
        }
        it.foreach {
          case (_, 0, x, lat) => if (lat == 1L) later += x else earlier += x
          case (_, _, a, b)   => link(a, b)
        }
        def nbrsOf(x: Long): scala.collection.Set[Long] =
          adj.getOrElse(x, scala.collection.immutable.Set.empty[Long])
        val out = scala.collection.mutable.ArrayBuffer[Array[Long]]()
        def bk(r: List[Long], p: Set[Long], x: Set[Long]): Unit =
          if (p.isEmpty && x.isEmpty) out += (v :: r).sorted.toArray
          else {
            // Pivot: the candidate/excluded node covering most of P.
            val pivot = (p ++ x).maxBy(u => (p & nbrsOf(u).toSet).size)
            var pp = p
            var xx = x
            for (w <- (p -- nbrsOf(pivot)).toSeq.sorted) {
              val nw = nbrsOf(w).toSet
              bk(w :: r, pp & nw, xx & nw)
              pp -= w; xx += w
            }
          }
        bk(Nil, later.toSet, earlier.toSet)
        out.iterator
      }
    val cliques = grouped.toDF("members")
      .filter(size(col("members")) >= 2)
    cliques.select(element_at(col("members"), 1).as("rep"),
      size(col("members")).cast("long").as("k"), col("members"))
  }

  /** MaxClique (/root/reference/networkit/cpp/clique/MaxClique.cpp): one maximum
    * clique — the largest maximal clique, ties broken by the lexicographically
    * smallest member list (the reference keeps whichever branch its sequential
    * search finds first; a total order makes the distributed answer deterministic).
    * Output one row (k, members). */
  def maxClique(spark: SparkSession, g: LinkGraph): DataFrame = {
    maximalCliques(spark, g)
      .orderBy(desc("k"), asc("members"))
      .limit(1)
      .select(col("k"), col("members"))
  }
}
