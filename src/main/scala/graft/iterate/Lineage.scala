package graft.iterate

import org.apache.spark.sql.DataFrame

/** Per-iteration lineage cut for driver-loop algorithms: localCheckpoint + drop the
  * checkpoint's inherited size statistics (see org.apache.spark.sql.GraftInternals —
  * inherited stats compound exponentially across iterations and melt the driver in
  * BigInteger arithmetic). All engine loops cut lineage through here. */
object Lineage {
  def cut(df: DataFrame, eager: Boolean = true): DataFrame =
    org.apache.spark.sql.GraftInternals.cleanLocalCheckpoint(df, eager)

  /** Free a retired iteration state's blocks immediately: drops any CacheManager entry
    * AND unpersists the local checkpoint's underlying RDD (Dataset.unpersist alone is a
    * no-op for localCheckpoint blocks). Callers must not read the frame afterwards. */
  def release(df: DataFrame): Unit = {
    df.unpersist(false)
    org.apache.spark.sql.GraftInternals.releaseCheckpoint(df)
  }
}
