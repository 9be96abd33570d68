package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.algo.Biconnected
import graft.model.LinkGraph

/** Tarjan-Vishkin distributed biconnectivity vs a sequential Hopcroft-Tarjan oracle
  * (the reference's own algorithm, components/BiconnectedComponents.cpp:19-160),
  * compared as PARTITIONS of the edge set (component ids are representation-specific,
  * the grouping is not). */
class BiconnectedSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  /** Sequential Hopcroft-Tarjan on an undirected edge list: returns the edge
    * partition as a Set of Sets of canonical (min,max) edges. Iterative DFS (explicit
    * stack) so large fixtures cannot blow the JVM stack. */
  private def hopcroftTarjan(edges: Seq[(Long, Long)]): Set[Set[(Long, Long)]] = {
    val canon = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct.filter(e => e._1 != e._2)
    val adj = scala.collection.mutable.Map[Long, List[Long]]().withDefaultValue(Nil)
    canon.foreach { case (a, b) => adj(a) ::= b; adj(b) ::= a }
    val verts = canon.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val num = scala.collection.mutable.Map[Long, Int]()
    val low = scala.collection.mutable.Map[Long, Int]()
    var counter = 0
    val estack = scala.collection.mutable.Stack[(Long, Long)]()
    val comps = scala.collection.mutable.ListBuffer[Set[(Long, Long)]]()
    def ce(a: Long, b: Long) = (math.min(a, b), math.max(a, b))
    for (r <- verts if !num.contains(r)) {
      // frames: (v, parent, remaining neighbors)
      val stack = scala.collection.mutable.Stack[(Long, Long, Iterator[Long])]()
      num(r) = counter; low(r) = counter; counter += 1
      stack.push((r, -1L, adj(r).iterator))
      while (stack.nonEmpty) {
        val (v, p, it) = stack.top
        if (it.hasNext) {
          val w = it.next()
          if (!num.contains(w)) {
            estack.push(ce(v, w))
            num(w) = counter; low(w) = counter; counter += 1
            stack.push((w, v, adj(w).iterator))
          } else if (w != p && num(w) < num(v)) {
            estack.push(ce(v, w))
            low(v) = math.min(low(v), num(w))
          }
        } else {
          stack.pop()
          if (p >= 0L) {
            low(p) = math.min(low(p), low(v))
            if (low(v) >= num(p)) { // p is an articulation point (or root) for v
              val comp = scala.collection.mutable.Set[(Long, Long)]()
              var done = false
              while (!done && estack.nonEmpty) {
                val e = estack.pop()
                comp += e
                if (e == ce(p, v)) done = true
              }
              comps += comp.toSet
            }
          }
        }
      }
    }
    comps.toSet
  }

  private def partitionOf(g: LinkGraph): Set[Set[(Long, Long)]] = {
    val ec = Biconnected.run(spark, g).edgeComponents
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    ec.groupBy(_._3).values.map(_.map(e => (e._1, e._2)).toSet).toSet
  }

  private def graphOf(edges: Seq[(Long, Long)], n: Long): LinkGraph =
    LinkGraph.fromEdges(spark,
      TestSpark.directed(edges.map(e => (e._1, e._2, 1.0))),
      Some(spark.range(n).select(col("id"))))

  test("hand graphs: cycle, path, two triangles sharing an articulation vertex") {
    // 5-cycle: one biconnected component
    val cyc = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 0L))
    assert(partitionOf(graphOf(cyc, 5)) == hopcroftTarjan(cyc))
    assert(partitionOf(graphOf(cyc, 5)).size == 1)
    // path: every edge is a bridge = its own component
    val path = Seq((0L, 1L), (1L, 2L), (2L, 3L))
    assert(partitionOf(graphOf(path, 4)) == hopcroftTarjan(path))
    assert(partitionOf(graphOf(path, 4)).size == 3)
    // bowtie: two triangles sharing vertex 2 -> two components; 2 is articulation
    val bow = Seq((0L, 1L), (1L, 2L), (0L, 2L), (2L, 3L), (3L, 4L), (2L, 4L))
    val r = Biconnected.run(spark, graphOf(bow, 5))
    assert(partitionOf(graphOf(bow, 5)) == hopcroftTarjan(bow))
    val arts = r.nodeComponents.filter(col("comps") > 1L)
      .collect().map(_.getLong(0)).toSet
    assert(arts == Set(2L))
  }

  test("karate matches Hopcroft-Tarjan exactly") {
    val edges = Fixtures.karateEdges
    val g = graphOf(edges, 34)
    assert(partitionOf(g) == hopcroftTarjan(edges))
  }

  test("deterministic ER graphs (multi-component, with bridges) match the oracle") {
    // LCG-generated sparse graphs: several components + bridges + cycles
    for (seed <- Seq(1L, 7L)) {
      var s = seed
      def nxt(): Long = { s = (s * 6364136223846793005L + 1442695040888963407L); (s >>> 33) }
      val n = 60L
      val edges = (1 to 80).map { _ =>
        val a = nxt() % n; val b = nxt() % n; (math.min(a, b), math.max(a, b))
      }.filter(e => e._1 != e._2).distinct
      val g = graphOf(edges, n)
      assert(partitionOf(g) == hopcroftTarjan(edges), s"seed $seed")
    }
  }
}
