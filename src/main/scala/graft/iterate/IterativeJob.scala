package graft.iterate

import java.nio.file.{Files, Paths, StandardOpenOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-loop harness for the iterative algorithms (PageRank / CC / PLP / Katz ...).
  *
  * The reference iterates in-place over shared memory; on Spark every iteration's lineage
  * would otherwise grow without bound, so each step is truncated via checkpoint. With a
  * `checkpointDir` the state is written to Parquet per iteration together with a JSON
  * manifest line carrying per-partition lineage (row counts + xor-of-hash checksums) and
  * the iteration's convergence metric — making a killed job resumable from the last
  * complete iteration (north rule: "per-iteration checkpointing, per-partition lineage,
  * and convergence metrics so jobs are resumable mid-computation").
  *
  * Without a dir (unit tests, bench inner loops) it degrades to `localCheckpoint`,
  * which still truncates lineage but is not resumable.
  */
final case class IterativeJob(spark: SparkSession, checkpointDir: Option[String], name: String) {

  /** The two live locally-checkpointed states. `step` returns a LAZY local checkpoint
    * so the caller's convergence action (count / agg) materializes it in the same job —
    * one job per iteration instead of two. Contract: the caller MUST run an action on
    * the returned frame before calling `step` again (all algorithms do — the
    * convergence check is the action). `pending` is the frame returned by the last
    * step (materialized by the caller's action); `retired` is its predecessor, whose
    * blocks can be freed once `pending` is materialized — without this cleanup a
    * 100-iteration run holds 100 copies of the state and GC-thrashes the executors. */
  private var pending: DataFrame = null
  private var retired: DataFrame = null

  private def iterPath(i: Int) = checkpointDir.map(d => s"$d/$name/iter_$i").orNull
  private def manifestPath = checkpointDir.map(d => s"$d/$name/manifest.jsonl").orNull

  /** Highest iteration with a complete checkpoint on disk, or -1. */
  def lastCompleteIteration: Int = checkpointDir match {
    case None => -1
    case Some(_) =>
      val p = Paths.get(manifestPath)
      if (!Files.exists(p)) -1
      else {
        val iters = scala.jdk.CollectionConverters.ListHasAsScala(Files.readAllLines(p)).asScala
          .filter(_.contains("\"complete\":true"))
          .flatMap(l => "\"iter\":(\\d+)".r.findFirstMatchIn(l).map(_.group(1).toInt))
        if (iters.isEmpty) -1 else iters.max
      }
  }

  /** Resume state from iteration i (must exist). */
  def load(i: Int): DataFrame = spark.read.parquet(iterPath(i))

  def init(df: DataFrame): DataFrame = checkpointDir match {
    case None =>
      pending = Lineage.cut(df, eager = true)
      pending
    case Some(_) => df // init state is re-derivable; first step() persists
  }

  /** Truncate iteration i's lineage; returns the frame to iterate on (lazy local
    * checkpoint — the caller's convergence action materializes it). */
  def step(i: Int, df: DataFrame): DataFrame = checkpointDir match {
    case None =>
      if (retired != null) Lineage.release(retired)
      retired = pending
      pending = Lineage.cut(df, eager = false)
      pending
    case Some(_) =>
      val path = iterPath(i)
      df.write.mode("overwrite").parquet(path)
      val back = spark.read.parquet(path)
      // Per-partition lineage: rows + order-independent checksum per partition.
      val lineage = back
        .withColumn("part", spark_partition_id())
        .withColumn("h", xxhash64(back.columns.map(col): _*))
        .groupBy("part")
        .agg(count(lit(1)).as("rows"), expr("bit_xor(h)").as("checksum"))
        .collect()
        .map(r => s"""{"part":${r.getInt(0)},"rows":${r.getLong(1)},"checksum":${r.getLong(2)}}""")
        .mkString("[", ",", "]")
      appendManifest(s"""{"iter":$i,"complete":true,"path":"$path","partitions":$lineage}""")
      back
  }

  def recordMetric(i: Int, key: String, value: Double): Unit =
    if (checkpointDir.isDefined)
      appendManifest(s"""{"iter":$i,"metric":"$key","value":$value}""")

  private def appendManifest(line: String): Unit = {
    val p = Paths.get(manifestPath)
    Files.createDirectories(p.getParent)
    Files.writeString(p, line + "\n", StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }
}
