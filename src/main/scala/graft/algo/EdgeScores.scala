package graft.algo

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.model.LinkGraph

/** Per-edge scores + sparsification (/root/reference/networkit/cpp/edgescores/
  * TriangleEdgeScore.cpp:18-110, JaccardSimilarityAttributizer, and sparsification/
  * GlobalThresholdFilter.cpp):
  *
  *   - triangle count per logical undirected edge, via the same degree-ordered
  *     orientation as [[Triangles]] (each triangle found once; hub-skew capped);
  *   - neighborhood Jaccard per edge = tri(e) / (deg(u) + deg(v) - tri(e)) — exact
  *     integers + one double division;
  *   - GlobalThresholdFilter: keep edges with score above/below a threshold — the
  *     backbone/sparsification primitive (`edges.filter(score >= t)`).
  */
object EdgeScores {

  /** (src, dst, tri) triangle count per canonical undirected edge; edges in no triangle
    * get 0. */
  def triangleEdgeScore(spark: SparkSession, g: LinkGraph): DataFrame = {
    val oc = Triangles.oriented(g).persist(StorageLevel.MEMORY_AND_DISK)
    oc.count()
    // Each triangle (a,b,c) — raw ids, (deg,id)-ordered a<b<c — hits its three oriented
    // edges (a,b), (b,c), (a,c); count per edge, left-join back so 0-triangle edges stay.
    val perEdge = Triangles.triangleCorners(oc).select(
        explode(array(
          struct(col("a").as("x"), col("b").as("y")),
          struct(col("b").as("x"), col("c").as("y")),
          struct(col("a").as("x"), col("c").as("y")))).as("e"))
      .groupBy(col("e.x").as("x"), col("e.y").as("y")).agg(count(lit(1)).as("tri"))
    oc.join(perEdge, oc("a") === perEdge("x") && oc("b") === perEdge("y"), "left")
      .select(least(col("a"), col("b")).as("src"),
        greatest(col("a"), col("b")).as("dst"),
        coalesce(col("tri"), lit(0L)).as("tri"))
  }

  /** (src, dst, tri, jaccard) neighborhood Jaccard per canonical undirected edge. */
  def jaccardEdgeScore(spark: SparkSession, g: LinkGraph): DataFrame = {
    val deg = g.bidirected.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
    triangleEdgeScore(spark, g)
      .join(deg.select(col("id").as("src"), col("deg").as("ds")), "src")
      .join(deg.select(col("id").as("dst"), col("deg").as("dd")), "dst")
      .select(col("src"), col("dst"), col("tri"),
        (col("tri").cast("double") / (col("ds") + col("dd") - col("tri"))).as("jaccard"))
  }

  /** LocalDegreeScore (sparsification/LocalDegreeScore.cpp:32-91): per node u, rank
    * its neighbors v by degree DESC with competition ranking (ties share the smallest
    * rank — exactly `rank()`); the directed exponent is 1 − ln(rank)/ln(deg u)
    * (1 when deg u <= 1); the edge score is the max over both directions. The window
    * partitions by node (never global), ordering only on the neighbor's degree — the
    * per-node partitions are the same skew surface as the degree aggregation itself.
    * Scores are rounded to 7 decimals so the libm-vs-DuckDB ln ulp can't flip the
    * cross-engine hash. Output (src, dst, score) per canonical undirected edge. */
  def localDegreeScore(spark: SparkSession, g: LinkGraph): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val deg = g.bidirected.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
    val ranked = g.bidirected.select("src", "dst")
      .join(deg.select(col("id").as("src"), col("deg").as("du")), "src")
      .join(deg.select(col("id").as("dst"), col("deg").as("dv")), "dst")
      .withColumn("rnk",
        rank().over(Window.partitionBy(col("src")).orderBy(col("dv").desc)))
      .select(col("src"), col("dst"),
        when(col("du") <= 1L, lit(1.0))
          .otherwise(lit(1.0) - log(col("rnk").cast("double")) / log(col("du").cast("double")))
          .as("e"))
    ranked.select(least(col("src"), col("dst")).as("src"),
        greatest(col("src"), col("dst")).as("dst"), col("e"))
      .groupBy("src", "dst").agg(round(max(col("e")), 7).as("score"))
  }

  /** GlobalThresholdFilter (sparsification/GlobalThresholdFilter.cpp): edges whose
    * score meets the threshold. `above=true` keeps score >= t, else score <= t. */
  def globalThresholdFilter(scored: DataFrame, scoreCol: String, t: Double,
                            above: Boolean = true): DataFrame =
    if (above) scored.filter(col(scoreCol) >= t) else scored.filter(col(scoreCol) <= t)
}
