package graft.catalog

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.fimi.{FimiCompact, FimiLog}

/** SQL entry points for fimi snapshot-table MAINTENANCE — the lakehouse
  * procedures a deployment runs from plain SQL instead of library calls
  * (Iceberg's `CALL catalog.system.rewrite_data_files` /
  * `expire_snapshots` shape, on Spark 4's native `ProcedureCatalog` +
  * `CALL` statement):
  *
  * {{{
  *   CALL graft.system.optimize(table => '`sf0.01`.t')
  *   CALL graft.system.vacuum(table => '`sf0.01`.t', retain_last => 2)
  * }}}
  *
  * Both delegate to the exact library implementations the API tests pin
  * ([[FimiCompact.compact]] with its optimistic-commit conflict
  * handling, [[FimiLog.vacuum]] with its crash-safe retention order),
  * so the SQL surface inherits their semantics verbatim — conflict
  * aborts (`ConcurrentModificationException` after `MaxAttempts`),
  * no-op commits, reader safety at retained versions. The `table`
  * argument is a multipart identifier string parsed with Spark's own
  * SQL parser, so backquoted namespaces with dots (`` `sf0.01`.t ``)
  * resolve exactly as they do in a query.
  *
  * Scale posture: each procedure is driver-coordinated metadata work
  * plus (for optimize) one Spark job whose tasks move bytes — identical
  * cost to the library call; the procedure layer adds name resolution
  * only. Result rows come back through a [[LocalScan]] (the result set
  * is O(1)).
  */
private[catalog] object GraftProcedures {

  /** One-row result scan for a procedure's O(1) summary output. */
  private final case class ResultScan(
      schema: StructType, data: Array[InternalRow]) extends LocalScan {
    override def rows(): Array[InternalRow] = data
    override def readSchema(): StructType = schema
    override def description(): String = "graft procedure result"
  }

  private def oneScan(schema: StructType, row: InternalRow): java.util.Iterator[Scan] =
    java.util.Collections.singletonList(
      ResultScan(schema, Array(row)): Scan).iterator()

  private def rowsScan(schema: StructType, rows: Array[InternalRow]): java.util.Iterator[Scan] =
    java.util.Collections.singletonList(
      ResultScan(schema, rows): Scan).iterator()

  /** Resolve a `table` procedure argument to the fimi table's path:
    * parse as a multipart identifier (backquote-aware), require
    * `<namespace>.<table>` under this catalog, require the `.fimi`
    * snapshot layout (parquet corpus tables are immutable snapshots —
    * maintenance does not apply). */
  private def fimiPath(cat: GraftCatalog, spark: SparkSession, table: String): Path = {
    val parts = spark.sessionState.sqlParser.parseMultipartIdentifier(table)
    require(parts.length == 2,
      s"procedure table argument must be '<namespace>.<table>' (got '$table'); " +
        "backquote namespaces containing dots: '`sf0.01`.t'")
    val p = cat.fimiTablePath(parts.head, parts(1))
    require(cat.fsFor(p).exists(p),
      s"no fimi table at $p (procedures apply to .fimi snapshot tables; " +
        "parquet corpus tables are immutable and need no maintenance)")
    p
  }

  /** `CALL <cat>.system.optimize(table [, target_file_bytes])` —
    * small-file compaction of the LATEST generation into ~target-size
    * bins (order-preserving byte concatenation, one task per bin,
    * committed as one `#truncate` manifest; concurrent commits retried
    * then aborted — FimiCompact's contract). Returns the new
    * generation's file count, 0 if compaction would not reduce it. */
  final class Optimize(cat: GraftCatalog) extends UnboundProcedure with BoundProcedure {
    override def name(): String = "optimize"
    override def description(): String =
      "compact the latest generation of a fimi snapshot table into " +
        "~target_file_bytes files; zorder => 'c1[,c2..]' sort-clusters the " +
        "rewrite on evolved columns so per-file stats tighten for data skipping"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType)
        .comment("catalog table as '<namespace>.<table>'").build(),
      ProcedureParameter.in("target_file_bytes", LongType)
        .defaultValue((128L << 20).toString)
        .comment("target compacted file size in bytes").build(),
      ProcedureParameter.in("zorder", StringType)
        .defaultValue("''")
        .comment("comma-separated EVOLVED columns to sort-cluster by " +
          "(empty = order-preserving bin-pack)").build())

    private val outSchema = StructType(Seq(
      StructField("table", StringType, nullable = false),
      StructField("output_files", IntegerType, nullable = false)))

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val spark = SparkSession.active
      val table = input.getUTF8String(0).toString
      val target = input.getLong(1)
      val cluster =
        if (input.isNullAt(2)) Nil
        else input.getUTF8String(2).toString.split(",").map(_.trim)
          .filter(_.nonEmpty).toSeq
      val n = FimiCompact.compact(
        spark, fimiPath(cat, spark, table).toString, target, cluster)
      oneScan(outSchema, InternalRow(UTF8String.fromString(table), n))
    }
  }

  /** `CALL <cat>.system.vacuum(table, retain_last)` — retire history:
    * keep the newest `retain_last` versions readable, delete manifests,
    * superseded checkpoints and data files only expired versions
    * referenced (FimiLog.vacuum's crash-safe order: boundary checkpoint
    * first, so retained readers never need deleted manifests).
    * `retain_last` is REQUIRED — history deletion should be an explicit
    * decision, not a default. */
  final class Vacuum(cat: GraftCatalog) extends UnboundProcedure with BoundProcedure {
    override def name(): String = "vacuum"
    override def description(): String =
      "delete history of a fimi snapshot table, keeping the newest retain_last versions"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType)
        .comment("catalog table as '<namespace>.<table>'").build(),
      ProcedureParameter.in("retain_last", IntegerType)
        .comment("number of newest versions to keep readable (>= 1)").build())

    private val outSchema = StructType(Seq(
      StructField("retained_from", LongType, nullable = false),
      StructField("data_files_deleted", IntegerType, nullable = false),
      StructField("manifests_deleted", IntegerType, nullable = false),
      StructField("checkpoints_deleted", IntegerType, nullable = false)))

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val spark = SparkSession.active
      val table = input.getUTF8String(0).toString
      val retain = input.getInt(1)
      val p = fimiPath(cat, spark, table)
      val st = FimiLog.vacuum(cat.fsFor(p), p, retain)
      oneScan(outSchema, InternalRow(st.retainedFrom, st.dataFilesDeleted,
        st.manifestsDeleted, st.checkpointsDeleted))
    }
  }

  /** `CALL <cat>.system.detail(table => ...)` — one-row table summary
    * (Delta's `DESCRIBE DETAIL` affordance): where the table lives, how
    * many commits its retained history spans, and the CURRENT
    * generation's file count and byte size. All driver-side metadata —
    * one names-only log listing, cached manifest parses, one
    * `getFileStatus` per current data file. */
  final class Detail(cat: GraftCatalog) extends UnboundProcedure with BoundProcedure {
    override def name(): String = "detail"
    override def description(): String =
      "one-row summary of a fimi snapshot table (location, versions, current files/bytes)"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType)
        .comment("catalog table as '<namespace>.<table>'").build())

    private val outSchema = StructType(Seq(
      StructField("location", StringType, nullable = false),
      StructField("latest_version", LongType, nullable = false),
      StructField("earliest_retained", LongType, nullable = false),
      StructField("num_commits_retained", IntegerType, nullable = false),
      StructField("num_data_files", IntegerType, nullable = false),
      StructField("size_bytes", LongType, nullable = false)))

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val spark = SparkSession.active
      val table = input.getUTF8String(0).toString
      val p = fimiPath(cat, spark, table)
      val fs = cat.fsFor(p)
      val hist = FimiLog.history(fs, p)
      require(hist.nonEmpty, s"fimi: $p has an empty snapshot log")
      val files = FimiLog.resolve(fs, p, None)
      val bytes = files.map(n => fs.getFileStatus(new Path(p, n)).getLen).sum
      oneScan(outSchema, InternalRow(
        UTF8String.fromString(p.toString),
        hist.last.version,
        hist.head.version,
        hist.size,
        files.size,
        bytes))
    }
  }

  /** `CALL <cat>.system.history(table => ...)` — snapshot-history
    * inspection from SQL (Delta's `DESCRIBE HISTORY` / Iceberg's
    * `snapshots` metadata table): one row per RETAINED commit, version
    * order — commit instant (the `#ts` header each commit stamps),
    * OPERATION (the `#op` header: CREATE TABLE / CTAS / RTAS / APPEND /
    * OVERWRITE / DELETE / UPDATE / MERGE / OPTIMIZE / STREAMING APPEND;
    * derived from the manifest shape for pre-`#op` legacy manifests),
    * the truncate flag (does this commit REPLACE the table?), the
    * streaming epoch if the commit came from the exactly-once sink, and
    * the manifest's file-listing size (files ADDED for an append
    * commit; the generation's FULL listing for a truncate commit).
    *
    * Scale posture: driver-side metadata only — one names-only log
    * listing plus cached manifest parses (FimiLog's immutability cache),
    * O(retained versions) rows through a [[LocalScan]]; VACUUM bounds
    * retention, so history never grows past the retained window. */
  final class History(cat: GraftCatalog) extends UnboundProcedure with BoundProcedure {
    override def name(): String = "history"
    override def description(): String =
      "commit history of a fimi snapshot table (version, ts, operation, files)"
    override def bind(inputType: StructType): BoundProcedure = this
    // deterministic per table state, but the table can advance between
    // calls — same posture as the other procedures
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType)
        .comment("catalog table as '<namespace>.<table>'").build())

    private val outSchema = StructType(Seq(
      StructField("version", LongType, nullable = false),
      StructField("committed_at", TimestampType, nullable = false),
      StructField("operation", StringType, nullable = false),
      StructField("truncated", BooleanType, nullable = false),
      StructField("epoch", LongType, nullable = true),
      StructField("file_count", IntegerType, nullable = false)))

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val spark = SparkSession.active
      val table = input.getUTF8String(0).toString
      val p = fimiPath(cat, spark, table)
      val rows = FimiLog.history(cat.fsFor(p), p).map { h =>
        InternalRow(
          h.version,
          h.tsMillis * 1000L, // TimestampType carries micros
          UTF8String.fromString(h.operation),
          h.truncate,
          h.epoch.map(Long.box).orNull,
          h.fileCount)
      }.toArray
      rowsScan(outSchema, rows)
    }
  }
}
