package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev scratch main for round-20 optimization experiments (not part of
  * the driver contract). Edited freely between runs. Current contents:
  * quantile/equidepth pass-2 variants — fanOut on/off (replica of
  * Relational.valuesAtRanks with a switch). */
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
    def time(name: String, passes: Int = 6)(f: => Long): Unit = {
      val ts = (1 to passes).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[scratch] $name%-34s min=${ts.min}%6.3f s  all=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    operators.Relational.warm(spark, dir)

    def logCell(v: Column, k: Int): Column =
      when(v.cast("double") <= 0d, lit(Int.MinValue / 2))
        .otherwise(floor(log(v.cast("double")) * lit(k)).cast("int"))

    def centsFact(fan: Boolean): DataFrame = {
      val f = Tables.load(spark, dir, "lineitem")
        .select(col("l_returnflag").as("grp"),
          (col("l_extendedprice").cast("decimal(18,2)") * lit(100)).cast("long").as("v"))
      if (fan) Tables.fanOut(f, col("grp"), col("v")) else f
    }

    def valuesAtRanks(fact: DataFrame, k: Int,
        mkTargets: DataFrame => DataFrame): DataFrame = {
      val sumSafe: Column => Column = v => v.cast("decimal(28,0)")
      val withCell = fact.withColumn("cell", logCell(col("v"), k))
      val rawCounts = withCell.groupBy("grp", "cell")
        .agg(count(lit(1)).as("c"), sum(sumSafe(col("v"))).as("s"))
      val counts = Tables.index(spark, dir, "qsel_cells64")(rawCounts)
      val stats = counts.groupBy("grp").agg(sum(col("c")).as("n"))
      val wCum = Window.partitionBy("grp").orderBy("cell")
      val cum = Tables.index(spark, dir, "qsel_cum64_scratch")(counts
        .withColumn("hi", sum(col("c")).over(wCum))
        .withColumn("lo", col("hi") - col("c") + lit(1L))
        .withColumn("s_below", sum(col("s")).over(wCum) - col("s")))
      val winners = cum.join(mkTargets(stats), Seq("grp"))
        .filter(col("t") >= col("lo") && col("t") <= col("hi"))
        .select(col("grp").as("g2"), col("cell").as("wc"),
          col("label"), (col("t") - col("lo") + lit(1L)).as("r"),
          col("s_below"))
      val wSel = Window.partitionBy("grp", "cell", "label").orderBy("v")
      withCell.join(broadcast(winners),
          col("grp") === col("g2") && col("cell") === col("wc"))
        .withColumn("rn", row_number().over(wSel))
        .withColumn("run_s", sum(sumSafe(col("v")))
          .over(wSel.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .filter(col("rn") === col("r"))
        .select(col("grp"), col("label"), col("v"),
          (col("s_below") + col("run_s")).as("cum"))
    }

    val qTargets = (stats: DataFrame) => stats
      .select(col("grp"), col("n"),
        explode(array(lit(0.25), lit(0.5), lit(0.75))).as("p"))
      .select(col("grp"), col("p").cast("string").as("label"),
        ceil(col("p") * col("n")).cast("long").as("t"))
    def bucketed(fan: Boolean): Long =
      valuesAtRanks(centsFact(fan), 64, qTargets)
        .select(col("grp").as("l_returnflag"),
          col("label").cast("double").as("p"),
          (col("v").cast("decimal(18,0)") / 100).cast("double").as("q_value"))
        .orderBy("l_returnflag", "p")
        .count()

    bucketed(true); bucketed(false)
    val aT = scala.collection.mutable.ArrayBuffer.empty[Double]
    val aF = scala.collection.mutable.ArrayBuffer.empty[Double]
    for (_ <- 1 to 7) {
      var t0 = System.nanoTime(); bucketed(true); aT += (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime(); bucketed(false); aF += (System.nanoTime() - t0) / 1e9
    }
    println(f"[scratch] bucketed_fanout   min=${aT.min}%6.3f all=${aT.map(t => f"$t%.3f").mkString(",")}")
    println(f"[scratch] bucketed_nofan    min=${aF.min}%6.3f all=${aF.map(t => f"$t%.3f").mkString(",")}")
    time("bucketed_shipped") { SparkEntry.queries("rel_agg_quantile_bucketed")(spark, dir).count() }
    spark.stop()
  }
}
