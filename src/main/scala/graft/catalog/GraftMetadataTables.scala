package graft.catalog

import java.util

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.fimi.FimiLog

/** SELECT-able METADATA TABLES for fimi snapshot tables — the
  * Iceberg-style relational form of the `system.history` / table-layout
  * ledgers (`SELECT * FROM <cat>.<ns>.<t>.history`,
  * `... FROM <cat>.<ns>.<t>.files`): Spark resolves the 4-part name as
  * Identifier(namespace = [ns, t], name = history|files) against this
  * catalog, and the returned relation composes like any table — users
  * JOIN commit history against audit logs and FILTER the file listing
  * by size, which the one-shot `CALL` procedures cannot do (those
  * remain for the imperative verbs: optimize/vacuum take actions,
  * history/detail stay for script compatibility).
  *
  * Both serve the SAME ledgers the procedures read
  * ([[FimiLog.history]] for `history`; [[FimiLog.resolve]] + manifest
  * provenance for `files`), so the relational and procedural forms can
  * never drift (spec-gated equality in GraftCatalogSpec).
  *
  * Scale posture: driver-side metadata only — one names-only log
  * listing plus cached manifest parses per query, rows through a
  * [[LocalScan]] (O(retained versions) / O(current files); VACUUM
  * bounds both). Rows are computed at SCAN planning, so every query
  * sees the ledger as of its own planning instant, like any
  * metadata-table read. */
private[catalog] object GraftMetadataTables {

  /** Metadata relation names served under `<table>.<name>`. */
  val Names: Set[String] = Set("history", "files")

  val HistorySchema: StructType = StructType(Seq(
    StructField("version", LongType, nullable = false),
    StructField("committed_at", TimestampType, nullable = false),
    StructField("operation", StringType, nullable = false),
    StructField("truncated", BooleanType, nullable = false),
    StructField("epoch", LongType, nullable = true),
    StructField("file_count", IntegerType, nullable = false)))

  val FilesSchema: StructType = StructType(Seq(
    StructField("file", StringType, nullable = false),
    StructField("ordinal", IntegerType, nullable = false),
    StructField("size_bytes", LongType, nullable = false),
    StructField("version_added", LongType, nullable = false),
    // the manifest's `#stats` JSON (rows + per-evolved-column
    // min/max/null-count) — the data-skipping ledger, SELECT-able so
    // users can audit why a predicate did (not) prune; null for files
    // written before stats existed or by stat-less writers
    StructField("stats", StringType, nullable = true)))

  def table(kind: String, tableDir: Path, fs: FileSystem): Table =
    new MetaTable(kind, tableDir, fs)

  private def historyRows(fs: FileSystem, dir: Path): Array[InternalRow] =
    FimiLog.history(fs, dir).map { h =>
      InternalRow(
        h.version,
        h.tsMillis * 1000L, // TimestampType carries micros
        UTF8String.fromString(h.operation),
        h.truncate,
        h.epoch.map(Long.box).orNull,
        h.fileCount)
    }.toArray

  private def filesRows(fs: FileSystem, dir: Path): Array[InternalRow] = {
    // provenance: the earliest RETAINED manifest listing each current
    // file (data files are immutable, so any lister is a valid witness;
    // the earliest is the add — or the adopting/truncate re-list when
    // the true add expired). A live file NO retained manifest lists
    // was seeded from a vacuum-boundary checkpoint: its witness is the
    // earliest retained version, never a crash.
    val prov = FimiLog.provenance(fs, dir)
    val earliest = FimiLog.history(fs, dir).headOption.map(_.version).getOrElse(0L)
    val stats = FimiLog.statsAt(fs, dir, None)
    FimiLog.resolve(fs, dir, None).zipWithIndex.map { case (n, ord) =>
      InternalRow(
        UTF8String.fromString(n),
        ord,
        fs.getFileStatus(new Path(dir, n)).getLen,
        prov.fileFirst.getOrElse(n, earliest),
        stats.get(n).map(UTF8String.fromString).orNull)
    }.toArray
  }

  private final case class MetaScan(
      kind: String, schema: StructType, data: Array[InternalRow]) extends LocalScan {
    override def rows(): Array[InternalRow] = data
    override def readSchema(): StructType = schema
    override def description(): String = s"fimi metadata table: $kind"
  }

  private class MetaTable(kind: String, dir: Path, fs: FileSystem)
      extends Table with SupportsRead {

    private val outSchema =
      if (kind == "history") HistorySchema else FilesSchema

    override def name(): String = s"fimi($dir).$kind"
    override def schema(): StructType = outSchema
    override def partitioning(): Array[Transform] = Array.empty
    override def properties(): util.Map[String, String] = util.Collections.emptyMap()
    override def capabilities(): util.Set[TableCapability] =
      util.EnumSet.of(TableCapability.BATCH_READ)

    override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
      new ScanBuilder {
        override def build(): Scan = {
          val rows =
            if (kind == "history") historyRows(fs, dir) else filesRows(fs, dir)
          MetaScan(kind, outSchema, rows)
        }
      }
  }
}
