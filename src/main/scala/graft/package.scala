import org.apache.spark.sql.DataFrame

package object graft {
  /** Postfix lineage-cut for driver-loop algorithms: localCheckpoint with the
    * inherited-statistics fix (see graft.iterate.Lineage). `cutLineageLazy` defers
    * materialization so the caller's convergence action shares the job. */
  implicit class DataFrameLineageOps(private val df: DataFrame) extends AnyVal {
    def cutLineage: DataFrame = iterate.Lineage.cut(df, eager = true)
    def cutLineageLazy: DataFrame = iterate.Lineage.cut(df, eager = false)
    /** Free a retired iteration state's blocks NOW (cache entry + checkpoint RDD);
      * the frame must never be read again. */
    def releaseState(): Unit = iterate.Lineage.release(df)
  }
}
