package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[prof] $name%-28s ${(System.nanoTime()-t0)/1e9}%8.2f s  rows=$n")
    }
    // warmup
    time("warmup_count")(Tables.load(spark, dir, "events").count())
    time("events_plain_agg")(Tables.load(spark, dir, "events")
      .groupBy("event_type").count().count())
    time("get_json_object")(Tables.load(spark, dir, "events")
      .select(get_json_object(col("props"), "$.k").cast("int").as("k"))
      .groupBy((col("k") % 2).as("p")).count().count())
    time("from_json")(Tables.load(spark, dir, "events")
      .select(from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k INT")).getField("k").as("k"))
      .groupBy((col("k") % 2).as("p")).count().count())
    time("regexp_json")(Tables.load(spark, dir, "events")
      .select(regexp_extract(col("props"), "\"k\":\\s*(-?\\d+)", 1).cast("int").as("k"))
      .groupBy((col("k") % 2).as("p")).count().count())
    time("fn_json_full")(graft.functions.Scalar.fnJson(spark, dir).count())
    time("stream_neardup_1")(graft.streaming.Streaming.streamNeardup(spark, dir).count())
    time("stream_neardup_2")(graft.streaming.Streaming.streamNeardup(spark, dir).count())
    time("ann_ivf")(graft.operators.LlmOps.annIvf(spark, dir).count())
    time("embed_cos")(graft.operators.LlmOps.embedCosineNeardup(spark, dir).count())
    time("knn")(graft.operators.LlmOps.similarityKnn(spark, dir).count())
    time("exact_dedup")(graft.operators.LlmOps.exactDedup(spark, dir).count())
    time("set_ops")(graft.operators.Relational.relSetOps(spark, dir).count())
    spark.stop()
  }
}
