package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch main for round-20 optimization experiments (not part of
  * the driver contract). Edited freely between runs. Current contents:
  * A/B of the zorder/compact/timetravel fixture decompositions — new
  * (shipped) vs old per-call provisioning forms, one JVM window. */
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
    def time(name: String, passes: Int = 5)(f: => Long): Unit = {
      val ts = (1 to passes).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[scratch] $name%-30s min=${ts.min}%6.3f s  all=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    operators.Mining.warm(spark, dir)

    // old forms, inlined (per-call provisioning)
    def zorderOld(): Long = {
      val base = new java.io.File(
        Tables.workRoot(spark, "graft_fimi_zo_old"),
        new java.io.File(dir).getName).getAbsolutePath + "/t.fimi"
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete(): Unit
      }
      rm(new java.io.File(base))
      operators.Mining.baskets(spark, dir).repartition(3)
        .write.format("fimi").option("snapshots", "true")
        .mode("overwrite").save(base)
      val sfName = new java.io.File(dir).getName
      val root = new java.io.File(base).getParentFile.getParentFile.getAbsolutePath
      spark.conf.set("spark.sql.catalog.graft_dml_zold", "graft.catalog.GraftCatalog")
      spark.conf.set("spark.sql.catalog.graft_dml_zold.root", root)
      spark.sessionState.catalogManager.catalog("graft_dml_zold")
        .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
        .invalidateTable(
          org.apache.spark.sql.connector.catalog.Identifier.of(Array(sfName), "t"))
      val t = s"graft_dml_zold.`$sfName`.t"
      spark.sql(s"ALTER TABLE $t ADD COLUMN q BIGINT")
      spark.sql(s"UPDATE $t SET q = CAST(size(items) AS BIGINT)")
      spark.sql(s"CALL graft_dml_zold.system.optimize(table => '`$sfName`.t', " +
        s"target_file_bytes => ${32L << 10}, zorder => 'q')")
      val z = spark.sql(s"SELECT operation FROM $t.history " +
          "ORDER BY version DESC LIMIT 1")
        .select(col("operation").startsWith("OPTIMIZE ZORDER").as("zordered"))
      spark.table(t)
        .select(col("q"), explode(col("items")).as("item"))
        .groupBy("q", "item").agg(count(lit(1)).as("n"))
        .crossJoin(broadcast(z))
        .orderBy("q", "item")
        .count()
    }
    def compactOld(): Long = {
      val base = new java.io.File(
        Tables.workRoot(spark, "graft_fimi_compact_old"),
        new java.io.File(dir).getName).getAbsolutePath
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete(): Unit
      }
      rm(new java.io.File(base))
      operators.Mining.baskets(spark, dir).repartition(24)
        .write.format("fimi").option("snapshots", "true")
        .mode("overwrite").save(base)
      graft.sources.fimi.FimiCompact.compact(spark, base)
      val back = spark.read.format("fimi").load(base)
      back.select(explode(col("items")).as("item"))
        .groupBy("item").agg(count(lit(1)).as("freq"))
        .crossJoin(broadcast(back.select(count(lit(1)).as("n"))))
        .filter(col("freq") >= col("n") * 0.05)
        .select(col("item"), col("freq"))
        .orderBy("item")
        .count()
    }
    def ttOld(): Long = {
      val base = new java.io.File(
        Tables.workRoot(spark, "graft_fimi_tt_old"),
        new java.io.File(dir).getName).getAbsolutePath
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete(): Unit
      }
      rm(new java.io.File(base))
      val b = operators.Mining.baskets(spark, dir)
      b.write.format("fimi").option("snapshots", "true")
        .mode("overwrite").save(base)
      b.select(array(lit("zz_decoy")).as("items"))
        .write.format("fimi").mode("append").save(base)
      spark.range(1).select(array(lit("zz_reset")).as("items"))
        .write.format("fimi").mode("overwrite").save(base)
      val back = spark.read.format("fimi").option("versionAsOf", "0").load(base)
      back.select(explode(col("items")).as("item"))
        .groupBy("item").agg(count(lit(1)).as("freq"))
        .crossJoin(broadcast(back.select(count(lit(1)).as("n"))))
        .filter(col("freq") >= col("n") * 0.05)
        .select(col("item"), col("freq"))
        .orderBy("item")
        .count()
    }

    // warm both paths once
    SparkEntry.queries("fpm_fimi_zorder")(spark, dir).count(); zorderOld()
    SparkEntry.queries("fpm_fimi_compact")(spark, dir).count(); compactOld()
    SparkEntry.queries("fpm_fimi_timetravel")(spark, dir).count(); ttOld()

    time("zorder_new") { SparkEntry.queries("fpm_fimi_zorder")(spark, dir).count() }
    time("zorder_old") { zorderOld() }
    time("compact_new") { SparkEntry.queries("fpm_fimi_compact")(spark, dir).count() }
    time("compact_old") { compactOld() }
    time("tt_new") { SparkEntry.queries("fpm_fimi_timetravel")(spark, dir).count() }
    time("tt_old") { ttOld() }
    spark.stop()
  }
}
