package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loader for the driver-generated star schema
  * (see /root/repo/FIXTURES.md for pinned schemas and domains).
  *
  * Scale posture: each table is a plain parquet scan — Catalyst pushes
  * column pruning and predicate filters down to the reader, so callers
  * should `.select(...)`/`.filter(...)` as early as possible and let the
  * optimizer do the rest. On a real cluster these paths would be
  * partitioned directories; nothing here assumes single-file layout.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark 4 rejects by
      // default; read it as long nanos and convert. The generator emits
      // µs-aligned values (probed: ns % 1000 == 0 for every row), so the
      // DIV-1000 conversion is lossless. Integer DIV, not `/`: epoch
      // nanos ≈ 1.7e18 exceeds double's 2^53 exact-integer range.
      // Only convert when ts actually reads back as long — an
      // events-shaped table written with µs timestamps needs none.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$sfDir/$name.parquet")
      if (df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        df.withColumn("ts",
          org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
      else df
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }
}
