package graft.layout

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.DataFrameLineageOps

/** Distributed layout primitives codified once (SURVEY.md §4): dense-rank assignment
  * without a global window, and explicit two-level (salted) aggregation for
  * high-degree hubs.
  *
  * Both exist because the naive Spark formulations hide a scale cliff:
  *   - `row_number().over(Window.orderBy(...))` funnels the whole table through ONE
  *     task ("No Partition Defined" — the round-1 scale-killer in the vertex
  *     dictionary);
  *   - a `join`/`groupBy` keyed on a vertex id sends a 10^6-degree hub's entire
  *     adjacency to one reducer.
  */
object Layout {

  /** Dense rank 0..n-1 of `orderCol` (rows must be distinct on it), fully distributed:
    * range-repartition + sort within partitions, then per-partition local row numbers
    * shifted by the partition-size prefix sums. Equivalent to
    * `row_number().over(Window.orderBy(orderCol)) - 1` but with no single-partition
    * stage; the only driver-side state is one row count per partition.
    *
    * The ids produced are a pure function of the data (rank in `orderCol` order) —
    * independent of partition boundaries, so re-sampling of range bounds between runs
    * cannot change the result. */
  def zipWithRank(df: DataFrame, orderCol: String, rankCol: String,
                  partitions: Int = 0): DataFrame =
    zipWithRankBy(df, Seq(col(orderCol)), rankCol, partitions)

  /** Multi-column variant; `orderCols` may carry asc/desc and MUST be a total order
    * (tie-free) for the rank to be deterministic.
    *
    * OWNERSHIP: the returned frame is an EAGER LOCAL CHECKPOINT — already
    * materialized, lineage-free, blocks MEMORY_AND_DISK. They live as long as the
    * returned plan is referenced (ContextCleaner frees them on driver GC);
    * `unpersist()` on it is a no-op, `Lineage.release` frees them immediately. */
  def zipWithRankBy(df: DataFrame, orderCols: Seq[Column], rankCol: String,
                    partitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val parts = if (partitions > 0) partitions
                else spark.conf.get("spark.sql.shuffle.partitions").toInt
    // FREEZE the range-partitioned layout with an eager lineage cut
    // (localCheckpoint), not a mere persist: the collected per-partition offsets are
    // driver-side constants keyed by __pid, so ANY later re-evaluation of the sorted
    // frame (cache pressure under concurrent queries) would re-run the range
    // partitioner's reservoir SAMPLING — whose samples depend on nondeterministic
    // shuffle-fetch order — and stamp fresh __pids against the stale offsets,
    // silently corrupting ranks (observed: an r5 concurrent verify pass produced
    // duplicate ranks with max 90052 of 91173 while the same query alone is
    // bit-stable). After the cut the plan IS the checkpointed blocks; bounds can
    // never be re-sampled. Blocks live exactly as long as downstream plans
    // reference them (ContextCleaner frees them on GC).
    val sorted = df
      .repartitionByRange(parts, orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
      .withColumn("__pid", spark_partition_id())
      .cutLineage
    val counts = sorted.groupBy("__pid").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = counts.scanLeft((0, 0L)) { case ((_, acc), (pid, c)) => (pid, acc + c) }
    val offByPid = counts.map(_._1).zip(offsets.map(_._2)).toMap // pid -> rows before it
    import spark.implicits._
    val offDf = offByPid.toSeq.toDF("__pid", "__off")
    val out = sorted
      .withColumn("__local",
        row_number().over(Window.partitionBy("__pid").orderBy(orderCols: _*)).cast("long"))
      .join(broadcast(offDf), "__pid")
      .withColumn(rankCol, col("__off") + col("__local") - 1L)
      .drop("__pid", "__local", "__off")
    // The result is ALSO an eager checkpoint, not a persist: an InMemoryRelation
    // whose child plan contains a checkpoint LogicalRDD measurably poisons the whole
    // session (A/B/C-tested on the sf0.1 bench: persist-over-checkpoint ran plp5 at
    // 46-51 s and triangles at 40 s vs 14 s / 4.4 s with the double checkpoint —
    // checkpoint-only is as fast as round 4's persist-only while keeping the
    // re-sample immunity). Downstream plans read the frozen blocks directly.
    val result = out.cutLineage
    // Free the intermediate sorted copy NOW (its blocks are a full second copy of
    // the input); `result` reads its own checkpoint blocks, never `sorted`'s.
    graft.iterate.Lineage.release(sorted)
    result
  }

  /** EXCLUSIVE prefix sum of `valueCol` in `orderCols` order (sum of all values
    * strictly before the row; the order must be total/tie-free): same two-job shape
    * as [[zipWithRankBy]] — range-repartition + local sort, per-partition totals
    * collected (one row per partition), broadcast offsets, per-partition running sums
    * under a partition-local window. No single-partition stage. Same persisted-result
    * ownership contract as [[zipWithRankBy]]. */
  def prefixSum(df: DataFrame, orderCols: Seq[Column], valueCol: String, outCol: String,
                partitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val parts = if (partitions > 0) partitions
                else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val sorted = df
      .repartitionByRange(parts, orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
      .withColumn("__pid", spark_partition_id())
      .cutLineage // freeze partition identity vs the collected offsets (see zipWithRankBy)
    val totals = sorted.groupBy("__pid").agg(sum(valueCol).as("t"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = totals.scanLeft((0, 0L)) { case ((_, acc), (pid, t)) => (pid, acc + t) }
    val offByPid = totals.map(_._1).zip(offsets.map(_._2)).toMap
    import spark.implicits._
    val offDf = offByPid.toSeq.toDF("__pid", "__off")
    val out = sorted
      .withColumn("__local",
        sum(valueCol).over(Window.partitionBy("__pid").orderBy(orderCols: _*)
          .rowsBetween(Window.unboundedPreceding, -1)))
      .join(broadcast(offDf), "__pid")
      .withColumn(outCol, col("__off") + coalesce(col("__local"), lit(0L)))
      .drop("__pid", "__local", "__off")
    val result = out.cutLineage // checkpoint, not persist — see zipWithRankBy
    graft.iterate.Lineage.release(sorted)
    result
  }

  /** Two-level (salted) sum aggregation: `groupBy(key).sum(valueCol)` where a single
    * key may carry 10^6+ rows (a web hub). Level 1 groups by (key, salt) — the hub's
    * rows spread over `salts` reducers — level 2 combines the partial sums. Exact for
    * any associative sum; integer-valued inputs stay exact.
    *
    * Note Spark's hash aggregate already does map-side partial aggregation, which
    * absorbs hub skew when the NUMBER OF DISTINCT GROUPS per map task is small; the
    * explicit salt is for the case partial agg cannot save — e.g. (hub, label)
    * frequency maps where every row is a distinct group. */
  def saltedSum(df: DataFrame, keyCols: Seq[String], valueCol: String,
                saltExpr: Column, salts: Int, out: String): DataFrame = {
    val keyed = df.withColumn("__salt", pmod(saltExpr, lit(salts)))
    val partial = keyed
      .groupBy((keyCols :+ "__salt").map(col): _*)
      .agg(sum(valueCol).as("__partial"))
    partial.groupBy(keyCols.map(col): _*).agg(sum("__partial").as(out))
  }

  /** Salted argmax: per key, the struct-max of (weight, tieBreak) computed in two
    * levels so a hub key's candidates never collapse into one reducer. Returns
    * keyCols + `top` (the winning struct). `max(struct)` is order-independent, so the
    * two-level result is bit-identical to the direct one. */
  def saltedArgMax(df: DataFrame, keyCols: Seq[String], top: Column,
                   saltExpr: Column, salts: Int): DataFrame = {
    val keyed = df.withColumn("__salt", pmod(saltExpr, lit(salts)))
    val partial = keyed
      .groupBy((keyCols :+ "__salt").map(col): _*)
      .agg(max(top).as("__top"))
    partial.groupBy(keyCols.map(col): _*).agg(max("__top").as("top"))
  }

  /** Salted state join: `big` (edge-like, keyed `bigKey`, hub-skewed) joined to the
    * per-vertex `state` (unique on `stateKey`). The state side is replicated `salts`
    * times; each big row picks one replica via a hash of its OTHER columns, so a hub
    * key's rows land on `salts` different join partitions instead of one. */
  def saltedStateJoin(big: DataFrame, bigKey: String, pickSalt: Column,
                      state: DataFrame, stateKey: String, salts: Int): DataFrame = {
    require(bigKey != stateKey, "rename the state key to avoid output ambiguity")
    val sDf = state.withColumn("__ssalt", explode(sequence(lit(0), lit(salts - 1))))
    val bDf = big.withColumn("__bsalt", pmod(pickSalt, lit(salts)))
    bDf.join(sDf, bDf(bigKey) === sDf(stateKey) && bDf("__bsalt") === sDf("__ssalt"))
      .drop("__bsalt", "__ssalt", stateKey)
  }
}
