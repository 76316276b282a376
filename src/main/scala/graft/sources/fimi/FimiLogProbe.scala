package graft.sources.fimi

/** Dev-only probe: exposes [[FimiLog.contentOpens]] to scratch mains
  * outside the package (specs use the package-private counter
  * directly). Not part of the driver contract. */
object FimiLogProbe {
  def opens: Long = FimiLog.contentOpens.get()

  /** Driver-side metadata pass of a change-feed plan: history fetch +
    * range diff + partition split, returning the partition count. */
  def diffPlan(fs: org.apache.hadoop.fs.FileSystem,
      conf: org.apache.hadoop.conf.Configuration,
      table: org.apache.hadoop.fs.Path,
      maxSplitBytes: Long): Int = {
    val hist = FimiLog.history(fs, table)
    FimiChanges.planPartitions(fs, conf, table,
      FimiChanges.diffRange(fs, table, 1, hist.last.version, hist),
      maxSplitBytes).length
  }
}
