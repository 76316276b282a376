package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch main for round-19 optimization experiments (not part of
  * the driver contract). Edited freely between runs. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = EngineConf.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[scratch] $name%-32s ${(System.nanoTime() - t0) / 1e9}%8.3f s rows=$n")
    }
    // containment dedup stage decomposition
    val ngrams = (t: org.apache.spark.sql.Column) =>
      graft.expressions.NGrams.ngrams(spark, t, 3, keepDistinct = true, shortWhole = true)
    // warm the parquet reader
    time("warm_docs")(Tables.load(spark, dir, "documents").count())
    for (pass <- 1 to 2) {
      val docs = Tables.fanOut(Tables.load(spark, dir, "documents")
        .select(col("doc_id"), col("text")), col("doc_id"))
      time(s"p$pass checkpoint") { docs.localCheckpoint(true).count() }
      val d2 = Tables.fanOut(Tables.load(spark, dir, "documents")
        .select(col("doc_id"), col("text")), col("doc_id")).localCheckpoint(true)
      val sh = d2.select(col("doc_id"), explode(ngrams(col("text"))).as("g"))
      time(s"p$pass explode_only") { sh.count() }
      val byShingle = sh.groupBy("g")
        .agg(sort_array(collect_list(col("doc_id"))).as("ds"))
        .filter(size(col("ds")) <= 50 && size(col("ds")) >= 2)
      time(s"p$pass posting_lists") { byShingle.count() }
      val pairsOfShingle = flatten(transform(col("ds"), (x, i) =>
        transform(slice(col("ds"), i + 2, size(col("ds"))),
          y => struct(x.as("a"), y.as("b")))))
      val pairs = byShingle.select(explode(pairsOfShingle).as("p"))
        .groupBy(col("p.a").as("doc_a"), col("p.b").as("doc_b"))
        .agg(count(lit(1)).as("shared"))
      time(s"p$pass pair_agg") { pairs.count() }
      time(s"p$pass full_key") { operators.LlmOps.containmentDedup(spark, dir).count() }
    }
    spark.stop()
  }
}
