package graft
import org.apache.spark.sql.SparkSession

// Scratch profiling main (not committed): per-key timing + plan dumps
// for the round-14 selection-family rewrites.
object ProfQ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("PQ_DIR", "/root/testdata/sf0.1")
    def time(name: String, n: Int = 3)(f: => Long): Unit = {
      val ts = (1 to n).map { _ =>
        val t0 = System.nanoTime(); val r = f
        ((System.nanoTime() - t0) / 1e9, r)
      }
      println(f"[prof] $name%-28s ${ts.map(_._1).min}%8.3f s (passes: ${ts.map(t => f"${t._1}%.2f").mkString(", ")})  rows=${ts.head._2}")
    }
    time("warmup")(Tables.load(spark, dir, "lineitem").count())
    time("quantile_hist")(operators.Relational.relAggQuantile(spark, dir).count())
    time("quantile_bucketed")(operators.Relational.relAggQuantileBucketed(spark, dir).count())
    time("hist_equidepth")(operators.Relational.relHistEquidepth(spark, dir).count())
    time("window_ntile")(operators.Relational.relWindowNtile(spark, dir).count())
    time("abc_pareto")(operators.Relational.relAbcPareto(spark, dir).count())
    time("skyline")(operators.Relational.relSkyline(spark, dir).count())
    if (sys.env.contains("PQ_PLAN")) {
      val df = operators.Relational.relAggQuantileBucketed(spark, dir)
      df.count()
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
