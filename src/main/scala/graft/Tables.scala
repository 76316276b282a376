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

  /** Session-scoped memo for shared derived tables (e.g. the exploded
    * transaction table every mining query starts from). A real pipeline
    * materializes these once; queries sharing one session reuse the
    * persisted copy instead of re-deriving the join+distinct each time.
    * Keyed by session identity so a fresh session never sees stale plans. */
  private val memoCache =
    scala.collection.concurrent.TrieMap[(Int, String, String), DataFrame]()

  def memo(spark: SparkSession, dir: String, key: String)(build: => DataFrame): DataFrame =
    memoCache.getOrElseUpdate(
      (System.identityHashCode(spark), dir, key),
      build.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // Timestamp columns have drifted across generator versions:
    // TIMESTAMP(NANOS) (which Spark 4 rejects by default — read events.ts
    // as long nanos, DIV 1000 to µs; integer DIV because epoch nanos
    // ≈ 1.7e18 exceeds double's 2^53 exact range) and µs-naive
    // TIMESTAMP(isAdjustedToUTC=false) (which Spark reads as
    // TIMESTAMP_NTZ; `unix_micros` & friends reject NTZ). Every NTZ
    // column — events.ts, lineitem.l_shipdate, orders.o_orderdate,
    // whatever a future generator emits — casts to TimestampType: the
    // session is pinned UTC, making the cast instant-identical to the
    // naive value the oracle reads, and keeping every downstream
    // operator on the one ts type the query surface was built against.
    if (name == "events")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    val nsFixed =
      if (name == "events" &&
          df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        df.withColumn("ts",
          org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
      else df
    nsFixed.schema.fields
      .filter(_.dataType == org.apache.spark.sql.types.TimestampNTZType)
      .foldLeft(nsFixed) { (d, f) =>
        d.withColumn(f.name,
          org.apache.spark.sql.functions.col(f.name).cast("timestamp"))
      }
  }
}
