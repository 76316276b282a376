package graft

import org.apache.spark.sql.SparkSession

/** Dev scratch main for round-19 optimization experiments (not part of
  * the driver contract). Edited freely between runs. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val df = operators.Relational.relProfile(spark, dir)
    df.collect()
    val ops = org.apache.spark.sql.graft.Bridge.runtimeOps(df.queryExecution.executedPlan)
    println("[scratch] node names after execution:")
    ops.foreach(o => println("  " + o.nodeName))
    val scans = ops.count(_.isInstanceOf[org.apache.spark.sql.execution.FileSourceScanExec])
    val reused = ops.count(_.nodeName.contains("ReusedExchange"))
    println(s"[scratch] FileSourceScanExec=$scans reused=$reused")
    spark.stop()
  }
}
