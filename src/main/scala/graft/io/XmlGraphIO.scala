package graft.io

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.LinkGraph

/** GraphML + GEXF exchange formats and the LineFileReader, mirroring the reference's
  * Python IO layer (/root/reference/networkit/GraphMLIO.py:1-222,
  * /root/reference/networkit/GEXFIO.py:1-396) and
  * /root/reference/networkit/cpp/io/LineFileReader.cpp:9-27.
  *
  * Like the reference (single-file SAX/minidom parsers), these are fixture-scale
  * single-file formats: parse happens on the driver over collected lines — the same
  * convention as [[GraphReaders.readGml]]. Bulk data at scale travels through the
  * parquet/Thrill/binary paths; XML is for interchange with Gephi-style tools.
  *
  * The XML subset understood is the one both reference writers emit: elements with
  * double-quoted attributes, self-closing tags, text content only inside <data>.
  */
object XmlGraphIO {

  // ---- tiny driver-side XML tokenizer (elements + attrs + immediate text) ----
  private val TagRe  = """<(/?)([A-Za-z][\w.:+-]*)((?:"[^"]*"|'[^']*'|[^>"'])*?)(/?)\s*>""".r
  private val AttrRe = """([\w.:+-]+)\s*=\s*"([^"]*)"""".r

  private sealed trait Tok
  private final case class Open(name: String, attrs: Map[String, String], selfClose: Boolean) extends Tok
  private final case class Close(name: String) extends Tok
  private final case class Text(s: String) extends Tok

  private def tokenize(doc: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var last = 0
    for (m <- TagRe.findAllMatchIn(doc)) {
      val between = doc.substring(last, m.start).trim
      if (between.nonEmpty) out += Text(between)
      last = m.end
      if (m.group(1) == "/") out += Close(m.group(2))
      else {
        val attrs = AttrRe.findAllMatchIn(m.group(3)).map(a => a.group(1) -> a.group(2)).toMap
        out += Open(m.group(2), attrs, m.group(4) == "/")
        if (m.group(4) == "/") out += Close(m.group(2))
      }
    }
    out.result()
  }

  private def slurp(spark: SparkSession, path: String): Vector[Tok] = {
    import spark.implicits._
    GraphReaders.guardDriverParse(spark, path, "GraphML/GEXF reader")
    tokenize(spark.read.text(path).as[String].collect().mkString("\n"))
  }

  /** GraphML reader (GraphMLIO.py:6-95): nodes take dense ids in document order; the
    * graph is weighted iff a `<key for="edge" attr.name="weight" attr.type="double">`
    * is declared, with per-edge weight from the matching `<data>` (0.0 if absent —
    * reference initial value); directed iff `edgedefault="directed"`. */
  def readGraphMl(spark: SparkSession, path: String): LinkGraph = {
    import spark.implicits._
    val toks = slurp(spark, path)
    val mapping = mutable.LinkedHashMap.empty[String, Long]
    val edges = Vector.newBuilder[(Long, Long, Double)]
    var directed = false
    var weightedId: Option[String] = None
    var inEdge: Option[(String, String)] = None
    var inWeightData = false
    var edgeWeight = 0.0
    toks.foreach {
      case Open("graph", a, _) => directed = a.get("edgedefault").contains("directed")
      case Open("key", a, _)
        if a.get("for").contains("edge") && a.get("attr.name").contains("weight") &&
          a.get("attr.type").contains("double") =>
        weightedId = a.get("id")
      case Open("node", a, _) =>
        a.get("id").foreach(id => mapping.getOrElseUpdate(id, mapping.size.toLong))
      case Open("edge", a, _) =>
        inEdge = Some((a("source"), a("target"))); edgeWeight = 0.0
      case Open("data", a, _) if inEdge.nonEmpty && weightedId.exists(a.get("key").contains(_)) =>
        inWeightData = true
      case Text(s) if inWeightData => edgeWeight = s.toDouble
      case Close("data") => inWeightData = false
      case Close("edge") =>
        inEdge.foreach { case (u, v) =>
          edges += ((mapping(u), mapping(v), if (weightedId.isDefined) edgeWeight else 1.0))
        }
        inEdge = None
      case _ =>
    }
    val raw = edges.result()
    val canon = if (directed) raw
      else raw.map { case (a, b, w) => (math.min(a, b), math.max(a, b), w) }
    LinkGraph.fromEdges(spark, canon.toDF("src", "dst", "weight"),
      Some(spark.range(mapping.size).select(col("id"))))
  }

  /** GraphML writer (GraphMLIO.py:97-222): weight key d1 when weighted; node ids are
    * the graph's node numbers; edges carry source/target/id (+ weight data). Readable
    * back by [[readGraphMl]]. */
  def writeGraphMl(g: LinkGraph, path: String, directed: Boolean = true,
                   weighted: Boolean = false): Unit = {
    val spark = g.edges.sparkSession
    import spark.implicits._
    val dirStr = if (directed) "directed" else "undirected"
    val header = Seq(
      (0L, 0L, """<?xml version="1.0" encoding="utf-8"?>"""),
      (0L, 1L, """<graphml xmlns="http://graphml.graphdrawing.org/xmlns">"""),
      (0L, 2L, if (weighted)
        """  <key for="edge" id="d1" attr.name="weight" attr.type="double" />""" else ""),
      (0L, 3L, s"""  <graph edgedefault="$dirStr" id="G">"""))
    val nodes = g.vertices.select(lit(1L).as("k"), col("id").as("o"),
      concat(lit("""    <node id=""""), col("id"), lit("\" />")).as("line"))
    val e = if (directed) g.edges else g.canonicalUndirected
    val ranked = graft.layout.Layout.zipWithRankBy(
      e.select("src", "dst", "weight"), Seq(col("src"), col("dst")), "eid")
    val edgeRows =
      if (weighted)
        ranked.select(lit(2L).as("k"), col("eid").as("o"),
          concat(lit("""    <edge directed=""""), lit(directed.toString),
            lit("""" source=""""), col("src"), lit("""" target=""""), col("dst"),
            lit("""" id="e"""), col("eid"), lit("\">"),
            lit("""<data key="d1">"""), col("weight").cast("double"),
            lit("</data></edge>")).as("line"))
      else
        ranked.select(lit(2L).as("k"), col("eid").as("o"),
          concat(lit("""    <edge directed=""""), lit(directed.toString),
            lit("""" source=""""), col("src"), lit("""" target=""""), col("dst"),
            lit("""" id="e"""), col("eid"), lit("\" />")).as("line"))
    header.toDF("k", "o", "line")
      .union(nodes).union(edgeRows)
      .union(Seq((3L, 0L, "  </graph>"), (3L, 1L, "</graphml>")).toDF("k", "o", "line"))
      .filter(col("line") =!= "")
      .repartition(1).sortWithinPartitions(col("k"), col("o")).select("line")
      .write.mode("overwrite").text(path)
    ranked.unpersist()
  }

  /** Static-mode GEXF reader (GEXFIO.py:21-114): nodes dense in document order, edges
    * with optional `weight` attribute, directed iff `defaultedgetype="directed"`. */
  def readGexf(spark: SparkSession, path: String): LinkGraph = {
    import spark.implicits._
    val toks = slurp(spark, path)
    val mapping = mutable.LinkedHashMap.empty[String, Long]
    val edges = Vector.newBuilder[(Long, Long, Double)]
    var directed = false
    toks.foreach {
      case Open("graph", a, _) => directed = a.get("defaultedgetype").contains("directed")
      case Open("node", a, _)  =>
        a.get("id").foreach(id => mapping.getOrElseUpdate(id, mapping.size.toLong))
      case Open("edge", a, _)  =>
        edges += ((mapping(a("source")), mapping(a("target")),
          a.get("weight").map(_.toDouble).getOrElse(1.0)))
      case _ =>
    }
    val raw = edges.result()
    val canon = if (directed) raw
      else raw.map { case (a, b, w) => (math.min(a, b), math.max(a, b), w) }
    LinkGraph.fromEdges(spark, canon.toDF("src", "dst", "weight"),
      Some(spark.range(mapping.size).select(col("id"))))
  }

  /** Dynamic-mode GEXF: spells / inline start-end intervals on nodes and edges become
    * GraphEvent rows (GEXFIO.py:116-216 rules: add at start — restore counts as add —
    * remove at end; first dynamic-weight attvalue adds, later ones update weight; an
    * element with no start joins the initial graph and is NOT an event). Returns
    * (etype, u, v, w, t) with the repo's event codes (ae/re/ce/an/rn) plus "st"
    * TIME_STEP markers between distinct times, sorted by time. Node ids must be
    * numeric or `n<int>` — the same restriction the reference parser imposes. */
  def readGexfEvents(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val toks = slurp(spark, path)
    def nodeId(s: String): Long = if (s.startsWith("n")) s.drop(1).toLong else s.toLong
    val events = mutable.ArrayBuffer.empty[(Double, String, Long, Long, Double)]
    var hasDynamicWeights = false
    // first pass: dynamic-weight attribute declared?
    toks.foreach {
      case Open("attribute", a, _) if a.get("id").contains("weight") => hasDynamicWeights = true
      case _ =>
    }
    // element context while walking
    var elemType = ""            // "n" | "e"
    var u = 0L; var v = 0L; var w = 1.0
    var added = false; var deleted = false
    def spell(a: Map[String, String]): Unit = {
      val start = a.get("start").orElse(a.get("startopen")).map(_.toDouble)
      val end   = a.get("end").orElse(a.get("endopen")).map(_.toDouble)
      (start, end) match {
        case (Some(s), Some(e)) =>
          if (s < e && !deleted) { events += ((s, "a" + elemType, u, v, w)); added = true }
          else events += ((s, "a" + elemType, u, v, w)) // restoration == re-addition
          events += ((e, "d" + elemType, u, v, w)); deleted = true
        case (Some(s), None) =>
          events += ((s, "a" + elemType, u, v, w)); added = true
        case (None, Some(e)) =>
          if (!added) added = true // joins the initial graph silently
          events += ((e, "d" + elemType, u, v, w)); deleted = true
        case _ =>
      }
    }
    toks.foreach {
      case Open("node", a, _) =>
        elemType = "n"; u = nodeId(a("id")); v = 0L; w = 1.0
        added = false; deleted = false
        spell(a)
      case Open("edge", a, _) =>
        elemType = "e"; u = nodeId(a("source")); v = nodeId(a("target"))
        w = a.get("weight").map(_.toDouble).getOrElse(1.0)
        added = false; deleted = false
        spell(a)
      case Open("spell", a, _) => spell(a)
      case Open("attvalue", a, _)
        if elemType == "e" && hasDynamicWeights && a.get("for").contains("weight") =>
        val t = a.get("start").orElse(a.get("startopen")).map(_.toDouble).getOrElse(0.0)
        val nw = a.get("value").map(_.toDouble).getOrElse(1.0)
        if (!added) { events += ((t, "ae", u, v, nw)); added = true }
        else events += ((t, "ce", u, v, nw))
      case _ =>
    }
    // repo event codes: additions/restorations ae|an, removals re|rn, updates ce
    val coded = events.toSeq.map { case (t, et, eu, ev, ew) =>
      val code = et match {
        case "ae" | "an" | "ce" => et
        case "de" => "re"
        case "dn" => "rn"
        case other => other
      }
      (t, code, eu, ev, ew)
    }.sortBy(e => (e._1, e._2, e._3, e._4))
    val withSteps = coded ++
      coded.map(_._1).distinct.sorted.dropRight(1).map(t => (t, "st", 0L, 0L, 0.0))
    withSteps.sortBy(e => (e._1, e._2 != "st", e._2, e._3, e._4)) // step closes its time
      .map { case (t, et, eu, ev, ew) => (et, eu, ev, ew, t) }
      .toDF("etype", "u", "v", "w", "t")
  }

  /** Static GEXF writer (GEXFIO.py:269-356, static path). */
  def writeGexf(g: LinkGraph, path: String, directed: Boolean = true): Unit = {
    val spark = g.edges.sparkSession
    import spark.implicits._
    val dirStr = if (directed) "directed" else "undirected"
    val header = Seq(
      (0L, 0L, """<?xml version="1.0" encoding="UTF-8"?>"""),
      (0L, 1L, """<gexf xmlns="http://www.gexf.net/1.2draft" version="1.2">"""),
      (0L, 2L, s"""  <graph defaultedgetype="$dirStr" mode="static">"""),
      (0L, 3L, "    <nodes>"))
    val nodes = g.vertices.select(lit(1L).as("k"), col("id").as("o"),
      concat(lit("""      <node id=""""), col("id"),
        lit("""" label=""""), col("id"), lit("\" />")).as("line"))
    val e = if (directed) g.edges else g.canonicalUndirected
    val ranked = graft.layout.Layout.zipWithRankBy(
      e.select("src", "dst", "weight"), Seq(col("src"), col("dst")), "eid")
    val edgeRows = ranked.select(lit(3L).as("k"), col("eid").as("o"),
      concat(lit("""      <edge id=""""), col("eid"),
        lit("""" source=""""), col("src"), lit("""" target=""""), col("dst"),
        lit("""" weight=""""), col("weight").cast("double"), lit("\" />")).as("line"))
    header.toDF("k", "o", "line")
      .union(Seq((2L, 0L, "    </nodes>"), (2L, 1L, "    <edges>")).toDF("k", "o", "line"))
      .union(nodes).union(edgeRows)
      .union(Seq((4L, 0L, "    </edges>"), (4L, 1L, "  </graph>"), (4L, 2L, "</gexf>"))
        .toDF("k", "o", "line"))
      .repartition(1).sortWithinPartitions(col("k"), col("o")).select("line")
      .write.mode("overwrite").text(path)
    ranked.unpersist()
  }

  /** LineFileReader (io/LineFileReader.cpp:9-27): the file's lines, in order, with
    * their 0-based line number — the distributed analog of `vector<string>`.
    * RDD zipWithIndex (partition order = file-offset order for a text split) is the
    * one primitive that recovers global line order without a single-partition sort. */
  def readLineFile(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.textFile(path).rdd.zipWithIndex()
      .toDF("line", "lineno").select(col("lineno"), col("line"))
  }
}
