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
    // skew-salted join: hinted (shipped) vs sort-merge formulation
    def saltedVariant(hint: Boolean): Long = {
      val nSalt = 8
      val fact = Tables.load(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"), col("l_discount"))
        .withColumn("salt", pmod(hash(col("l_orderkey"), col("l_linenumber")), lit(nSalt)))
      val dim0 = Tables.load(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"))
        .withColumn("salt", explode(array((0 until nSalt).map(lit(_)): _*)))
      val dim = if (hint) dim0.hint("SHUFFLE_HASH") else dim0
      fact.join(dim, fact("l_orderkey") === dim0("o_orderkey") && fact("salt") === dim0("salt"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("line_cnt"))
        .count()
    }
    time("salted_smj_1")(saltedVariant(false))
    time("salted_smj_2")(saltedVariant(false))
    time("salted_shj_1")(saltedVariant(true))
    time("salted_shj_2")(saltedVariant(true))
    time("ann_ivf")(graft.operators.LlmOps.annIvf(spark, dir).count())
    time("embed_cos")(graft.operators.LlmOps.embedCosineNeardup(spark, dir).count())
    time("knn")(graft.operators.LlmOps.similarityKnn(spark, dir).count())
    time("exact_dedup")(graft.operators.LlmOps.exactDedup(spark, dir).count())
    time("set_ops")(graft.operators.Relational.relSetOps(spark, dir).count())
    spark.stop()
  }
}
