package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.layout.Layout
import graft.model.LinkGraph

/** Graph file readers/writers as distributed Catalyst pipelines — the engine's analog
  * of /root/reference/networkit/cpp/io/:
  *
  *   - METIS (io/METISGraphReader.cpp:17-100): header `n m [fmt]`, line i = adjacency
  *     of node i (1-based); fmt%10==1 ⇒ `w1 v1 w2 v2 ...` pairs.
  *   - EdgeList (io/EdgeListReader.h:27-66): separator / firstNode / comment-prefix
  *     options; non-continuous string ids resolved through a dictionary join.
  *   - SNAP (io/SNAPGraphReader.cpp): tab-separated directed pairs with `#` comments —
  *     an EdgeList configuration.
  *
  * Everything is `spark.read.text` + split/posexplode + joins: the file parallelizes by
  * line ranges, so a 1 TB edge list scans on all executors.
  */
object GraphReaders {

  /** Read a METIS .graph file. `%` comment lines are dropped BEFORE data-line numbering
    * (the format allows comments anywhere and the reference's reader skips them without
    * shifting node indices, io/METISGraphReader.cpp:17-38); data line 0 is the header,
    * data line i is the adjacency of node i-1. Numbering is distributed
    * (Layout.zipWithRank over monotonically_increasing_id, which is ascending in file
    * order) — no global window. */
  def readMetis(spark: SparkSession, path: String): LinkGraph = {
    val lines = spark.read.text(path)
      .withColumn("mid", monotonically_increasing_id())
      .filter(!col("value").startsWith("%"))
    val numbered = Layout.zipWithRank(lines, "mid", "lineno").drop("mid")
    val header = numbered.filter(col("lineno") === 0).head()
    val parts = header.getString(0).trim.split("\\s+")
    val n = parts(0).toLong
    val weighted = parts.length >= 3 && parts(2).toLong % 10 == 1
    val adj = numbered.filter(col("lineno") >= 1)
      .select((col("lineno") - 1).as("src"),
        posexplode_outer(split(trim(col("value")), "\\s+")).as(Seq("pos", "tok")))
      .filter(col("tok").isNotNull && col("tok") =!= "")
    val edges =
      if (!weighted)
        adj.select(col("src"), (col("tok").cast("long") - 1).as("dst"),
          lit(1.0).as("weight"))
      else
        adj.withColumn("pair", (col("pos") / 2).cast("long"))
          .groupBy("src", "pair")
          .agg(max(when(col("pos") % 2 === 0, col("tok"))).as("d"),
            max(when(col("pos") % 2 === 1, col("tok"))).as("w"))
          .select(col("src"), (col("d").cast("long") - 1).as("dst"),
            col("w").cast("double").as("weight"))
    LinkGraph.fromEdges(spark, edges,
      vertices = Some(spark.range(n).select(col("id"))))
  }

  /** Read a separator-delimited edge list. `firstNode` is subtracted from numeric ids
    * (METIS-style 1-based lists -> 0-based); `continuous=false` builds a string-id
    * dictionary instead (EdgeListReader.h:57-65). */
  def readEdgeList(spark: SparkSession, path: String, sep: String = "\\s+",
                   comment: String = "#", firstNode: Long = 0,
                   continuous: Boolean = true): LinkGraph = {
    val lines = spark.read.text(path)
      .filter(!col("value").startsWith(comment) && trim(col("value")) =!= "")
      .select(split(trim(col("value")), sep).as("f"))
    val raw = lines.select(col("f").getItem(0).as("su"), col("f").getItem(1).as("sv"),
      coalesce(expr("try_element_at(f, 3)").cast("double"), lit(1.0)).as("weight"))
    if (continuous)
      LinkGraph.fromEdges(spark, raw.select(
        (col("su").cast("long") - firstNode).as("src"),
        (col("sv").cast("long") - firstNode).as("dst"), col("weight")))
    else {
      val dict = Layout.zipWithRank(
        raw.select(col("su").as("name")).union(raw.select(col("sv"))).distinct(),
        "name", "id")
      val e = raw
        .join(dict.select(col("name").as("su"), col("id").as("src")), "su")
        .join(dict.select(col("name").as("sv"), col("id").as("dst")), "sv")
        .select("src", "dst", "weight")
      LinkGraph.fromEdges(spark, e, Some(dict.select("id")))
    }
  }

  /** SNAP format = tab/space-separated directed edge list with '#' comments. */
  def readSnap(spark: SparkSession, path: String): LinkGraph =
    readEdgeList(spark, path, sep = "\\s+", comment = "#")

  /** Write an edge list (TSV `src dst weight`) — EdgeListWriter analog. */
  def writeEdgeList(g: LinkGraph, path: String): Unit =
    g.edges.select(col("src"), col("dst"), col("weight"))
      .write.mode("overwrite").option("sep", "\t").csv(path)

  /** Write (id,label) partition table — PartitionWriter analog. */
  def writePartition(labels: DataFrame, path: String): Unit =
    labels.write.mode("overwrite").parquet(path)
}
