package org.apache.spark.sql

import org.apache.spark.sql.classic.{Dataset, SparkSession}
import org.apache.spark.sql.execution.LogicalRDD

/** Engine-internal shim (lives in org.apache.spark.sql for `private[sql]` access).
  *
  * `Dataset.localCheckpoint` wraps the materialized RDD in a [[LogicalRDD]] that
  * PROPAGATES the origin plan's size statistics (`originStats`). In an iterative
  * algorithm that checkpoints every round, those size estimates compound: a round plan
  * joins the previous checkpoint k times, so the estimated sizeInBytes exponent grows
  * ~k× per round, and after a few dozen rounds Catalyst's SizeInBytesOnlyStatsPlanVisitor
  * is multiplying million-bit BigIntegers — the driver burns minutes of CPU *per
  * iteration* in ToomCook3 multiplication (observed live via jstack; see BENCH.md).
  *
  * [[freshStats]] rebuilds the checkpointed Dataset over the same RDD with
  * `originStats = None`, so each iteration's stats start from the default leaf size
  * again. No data is touched — it is purely a logical-plan surgery.
  */
object GraftInternals {

  def freshStats(df: DataFrame): DataFrame = df.queryExecution.analyzed match {
    case lr: LogicalRDD =>
      val clean = new LogicalRDD(lr.output, lr.rdd, lr.outputPartitioning,
        lr.outputOrdering, lr.isStreaming, lr.stream)(
        df.sparkSession.asInstanceOf[SparkSession], None, None)
      Dataset.ofRows(df.sparkSession.asInstanceOf[SparkSession], clean)
    case _ => df
  }

  /** localCheckpoint without inherited statistics — the safe per-iteration lineage cut
    * for driver-loop algorithms. */
  def cleanLocalCheckpoint(df: DataFrame, eager: Boolean): DataFrame =
    freshStats(df.localCheckpoint(eager))

  /** Free a retired checkpoint's blocks NOW. `Dataset.unpersist` only drops
    * CacheManager entries, but localCheckpoint persists at the RDD level — so the
    * retired state of an iterative loop would otherwise only be reclaimed by
    * ContextCleaner after a driver GC (a 100-iteration run meanwhile holds 100 state
    * copies). Unpersisting the LogicalRDD's rdd releases the blocks immediately; the
    * caller must guarantee nothing will read the frame again (a released local
    * checkpoint is unrecoverable by design). */
  def releaseCheckpoint(df: DataFrame): Unit = df.queryExecution.analyzed match {
    case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
    case _ => ()
  }
}
